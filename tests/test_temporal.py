"""Unit tests for the temporal join operators (as-of join, range join).

The driver/oracle parity (events_asof, events_range_pairs vs their DuckDB
twins) proves the big-data path; these tests pin the operator SEMANTICS on
hand-built edges: equal-timestamp ties, unmatched left rows, forward
direction, negative look-back windows, and exact window boundaries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tax_compliance_engine_spark.operators import temporal


@pytest.fixture(scope="module")
def trades(spark):
    # (id, key, ts)
    return spark.createDataFrame(
        [(1, "a", 100), (2, "a", 205), (3, "a", 300), (4, "b", 50), (5, "c", 10)],
        "id long, key string, ts long",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    # (qid, key, ts, px) — a/205 has two equal-ts quotes (tie), c has none
    return spark.createDataFrame(
        [
            (10, "a", 90, 1.0),
            (11, "a", 205, 2.0),
            (12, "a", 205, 3.0),
            (13, "a", 290, 4.0),
            (14, "b", 60, 5.0),
        ],
        "qid long, key string, ts long, px double",
    )


def _rows(df):
    return {r["id"]: r for r in df.collect()}


def test_asof_backward(trades, quotes):
    out = _rows(
        temporal.asof_join(
            trades, quotes, on="ts", by="key", tiebreak="qid",
            right_cols=["qid", "px"],
        )
    )
    assert out[1]["qid_r"] == 10  # plain last-preceding
    # equal-ts quotes ARE eligible (at-or-before); greatest qid wins the tie
    assert out[2]["qid_r"] == 12 and out[2]["px_r"] == 3.0
    assert out[3]["qid_r"] == 13
    # b@50 precedes b's only quote@60 -> unmatched, NULLs kept
    assert out[4]["qid_r"] is None and out[4]["px_r"] is None
    assert out[5]["qid_r"] is None  # key with no right rows at all


def test_asof_forward(trades, quotes):
    out = _rows(
        temporal.asof_join(
            trades, quotes, on="ts", by="key", tiebreak="qid",
            right_cols=["qid", "px"], direction="forward",
        )
    )
    assert out[1]["qid_r"] == 11  # earliest at-or-after; SMALLEST qid tie
    assert out[2]["qid_r"] == 11
    assert out[3]["qid_r"] is None  # nothing after 300
    assert out[4]["qid_r"] == 14
    assert out[5]["qid_r"] is None


def test_asof_keeps_every_left_row_and_column(trades, quotes):
    out = temporal.asof_join(
        trades, quotes, on="ts", by="key", tiebreak="qid", right_cols=["px"]
    )
    assert out.count() == trades.count()
    assert out.columns == ["id", "key", "ts", "px_r"]


def test_asof_rejects_bad_direction(trades, quotes):
    with pytest.raises(ValueError):
        temporal.asof_join(
            trades, quotes, on="ts", by="key", tiebreak="qid",
            right_cols=["px"], direction="sideways",
        )


def test_range_join_exact_pairs(trades, quotes):
    out = temporal.range_join(
        trades, quotes, by="key", left_ts="ts", right_ts="ts",
        lower=-100, upper=0,
    )
    pairs = sorted((r["id"], r["qid"]) for r in out.collect())
    # brute-force expectation
    t = [(1, "a", 100), (2, "a", 205), (3, "a", 300), (4, "b", 50), (5, "c", 10)]
    q = [(10, "a", 90), (11, "a", 205), (12, "a", 205), (13, "a", 290), (14, "b", 60)]
    expect = sorted(
        (tid, qid)
        for tid, tk, tts in t
        for qid, qk, qts in q
        if tk == qk and tts - 100 <= qts <= tts
    )
    assert pairs == expect


def test_range_join_symmetric_window_matches_bruteforce(trades, quotes):
    out = temporal.range_join(
        trades, quotes, by="key", left_ts="ts", right_ts="ts",
        lower=-60, upper=60,
    )
    pairs = sorted((r["id"], r["qid"]) for r in out.collect())
    t = [(1, "a", 100), (2, "a", 205), (3, "a", 300), (4, "b", 50), (5, "c", 10)]
    q = [(10, "a", 90), (11, "a", 205), (12, "a", 205), (13, "a", 290), (14, "b", 60)]
    expect = sorted(
        (tid, qid)
        for tid, tk, tts in t
        for qid, qk, qts in q
        if tk == qk and tts - 60 <= qts <= tts + 60
    )
    assert pairs == expect


def test_range_join_no_duplicate_pairs(trades, quotes):
    out = temporal.range_join(
        trades, quotes, by="key", left_ts="ts", right_ts="ts",
        lower=-100, upper=0,
    )
    assert out.count() == out.select("id", "qid").distinct().count()


def test_range_join_renames_colliding_right_columns(trades, quotes):
    out = temporal.range_join(
        trades, quotes, by="key", left_ts="ts", right_ts="ts",
        lower=-100, upper=0,
    )
    assert "ts_r" in out.columns and "ts" in out.columns


def test_asof_single_shuffle_plan(trades, quotes):
    """The as-of plan must be ONE exchange on the by-key (plus broadcasts) —
    no theta join, no single-partition exchange."""
    out = temporal.asof_join(
        trades, quotes, on="ts", by="key", tiebreak="qid", right_cols=["px"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def _random_frames(spark, seed=7, n_left=300, n_right=200, n_keys=5):
    import random

    rng = random.Random(seed)
    lrows = [
        (i, f"k{rng.randrange(n_keys)}", rng.randrange(0, 5000))
        for i in range(n_left)
    ]
    rrows = [
        (1000 + i, f"k{rng.randrange(n_keys)}", rng.randrange(0, 5000), rng.random())
        for i in range(n_right)
    ]
    left = spark.createDataFrame(lrows, "id long, key string, ts long")
    right = spark.createDataFrame(rrows, "qid long, key string, ts long, px double")
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_sharded_equals_unsharded(spark, direction):
    """The hot-key sharded plan must produce byte-identical output to the
    single-window plan — on random data with duplicate timestamps, empty
    shards, and keys missing from one side."""
    left, right = _random_frames(spark)
    kw = dict(
        on="ts", by="key", tiebreak="qid", right_cols=["qid", "ts", "px"],
        direction=direction,
    )
    plain = temporal.asof_join(left, right, **kw)
    sharded = temporal.asof_join(left, right, shard_width=500, **kw)
    key = lambda r: (r["id"],)
    assert sorted(plain.collect(), key=key) == sorted(
        sharded.collect(), key=key
    )


def test_asof_sharded_tiny_width_still_exact(spark):
    """Width 1 = every timestamp its own shard: the pure seed-table path."""
    left, right = _random_frames(spark, seed=11, n_left=80, n_right=60)
    kw = dict(on="ts", by="key", tiebreak="qid", right_cols=["qid", "px"])
    plain = temporal.asof_join(left, right, **kw)
    sharded = temporal.asof_join(left, right, shard_width=1, **kw)
    key = lambda r: (r["id"],)
    assert sorted(plain.collect(), key=key) == sorted(
        sharded.collect(), key=key
    )


def test_floor_div_exact_at_nano_magnitude(spark):
    """Bucket/shard ids use exact integer floor division: ``F.floor(x/w)``
    routes through DOUBLE (exact only under 2^53) and silently misbuckets
    epoch-nanosecond timestamps (~1.8e18).  Pin the helper against
    Python's // on magnitudes where the double path provably diverges."""
    from tax_compliance_engine_spark.operators.temporal import _floor_div

    w = 3_600 * 10**9  # 1h in ns
    xs = [
        1_600_000_000_000_000_001,
        1_600_000_000_000_000_000 + w - 1,  # just under a boundary
        2**62 + 12345,
        -7,
        -w - 1,
        0,
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {
        r.x: r.q
        for r in df.select("x", _floor_div("x", w).alias("q")).collect()
    }
    assert got == {x: x // w for x in xs}


def test_range_join_exact_at_nano_magnitude(spark):
    """range_join over epoch-nanosecond timestamps finds exactly the pairs
    a brute-force predicate join finds — the bucket assignment stays exact
    where double division would fuzz boundaries by hundreds of ns."""
    base = 1_600_000_000_000_000_000
    w = 10**9  # 1s window in ns
    lrows = [(i, "k", base + i * 997_000_007) for i in range(40)]
    rrows = [(100 + i, "k", base + i * 611_000_003) for i in range(60)]
    left = spark.createDataFrame(lrows, "id long, key string, lts long")
    right = spark.createDataFrame(rrows, "qid long, key string, rts long")
    got = sorted(
        (r.id, r.qid)
        for r in temporal.range_join(
            left, right, by="key", left_ts="lts", right_ts="rts",
            lower=-w, upper=0,
        ).collect()
    )
    want = sorted(
        (i, q)
        for i, _, lt in lrows
        for q, _, rt in rrows
        if lt - w <= rt <= lt
    )
    assert got == want


def test_events_ts_helpers_handle_both_encodings(spark, tmp_path):
    """The driver has shipped events.ts both as parquet TIMESTAMP(NANOS)
    (read as raw int64 nanos) and as plain TIMESTAMP micros — the ts_sec /
    ts_us derivations must yield identical integers for both encodings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tax_compliance_engine_spark.plans.queries import (
        _events_with_ts_sec,
        _events_with_ts_us,
    )

    micros = [1_704_067_200_123_456, 1_704_070_800_999_999]
    base = {
        "event_id": [1, 2],
        "user_id": [10, 10],
        "event_type": ["click", "purchase"],
        "value": [1.0, 2.0],
        "props": ["{}", "{}"],
    }

    d_ts = tmp_path / "ts_us"
    d_ts.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array(micros, pa.timestamp("us"))}),
        d_ts / "events.parquet",
    )
    d_ns = tmp_path / "ts_ns"
    d_ns.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array([m * 1000 for m in micros], pa.int64())}),
        d_ns / "events.parquet",
    )

    for helper, col, expect in (
        (_events_with_ts_sec, "ts_sec", [m // 1_000_000 for m in micros]),
        (_events_with_ts_us, "ts_us", micros),
    ):
        for d in (d_ts, d_ns):
            got = [
                r[col]
                for r in helper(spark, str(d)).orderBy("event_id").collect()
            ]
            assert got == expect, (helper.__name__, d.name)


def test_events_funnel_ordering_semantics(spark, tmp_path):
    """Funnel steps must be STRICTLY ordered per user: a purchase before
    the click doesn't convert, later cheaper events don't resurrect a
    step, and conversion is the exact count ratio."""
    import datetime as dt

    from pyspark.sql import functions as F

    from tax_compliance_engine_spark.plans.queries import (
        events_funnel,
        events_retention,
    )

    def ts(day, hour):
        return dt.datetime(2024, 1, day, hour, 0, 0)

    rows = [
        # user 1: view -> click -> purchase (full conversion)
        (1, ts(1, 1), 1, "view"),
        (2, ts(1, 2), 1, "click"),
        (3, ts(1, 3), 1, "purchase"),
        # user 2: purchase BEFORE click: reaches click only
        (4, ts(1, 1), 2, "view"),
        (5, ts(1, 2), 2, "purchase"),
        (6, ts(1, 3), 2, "click"),
        # user 3: click first, view later, no click after the view
        (7, ts(1, 1), 3, "click"),
        (8, ts(1, 2), 3, "view"),
        # user 4: view only
        (9, ts(2, 1), 4, "view"),
        # user 5: never views (click+purchase don't count at all)
        (10, ts(1, 1), 5, "click"),
        (11, ts(1, 2), 5, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, t, u, e, 1.0, "{}") for i, t, u, e in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.step: (r.event_type, r.n_users, r.conversion)
        for r in events_funnel(spark, str(tmp_path)).collect()
    }
    assert got[1] == ("view", 4, 1.0)  # users 1,2,3,4
    assert got[2] == ("click", 2, 2 / 4)  # users 1,2 (not 3: click precedes)
    assert got[3] == ("purchase", 1, 1 / 4)  # user 1 only
    # retention on the same fixture: user 4's first event is in the
    # same Monday-aligned week (2024-01-01 IS a Monday), so one cohort,
    # one offset-0 row with all 5 users
    ret = events_retention(spark, str(tmp_path)).collect()
    assert [(r.cohort_week, r.week_offset, r.n_users) for r in ret] == [
        ("2024-01-01", 0, 5)
    ]


def test_events_retention_offsets(spark, tmp_path):
    """Cohorts split by first-event week; later-week activity lands at
    the right offset; a user active twice in one week counts once."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import events_retention

    def ev(i, day, user):
        return (i, dt.datetime(2024, 1, day, 12, 0, 0), user, "view", 1.0, "{}")

    rows = [
        ev(1, 1, 1),  # user 1 cohort wk0 (Mon Jan 1)
        ev(2, 2, 1),  # same week again -> still one offset-0 row
        ev(3, 9, 1),  # wk1 activity (Jan 8-14)
        ev(4, 16, 1),  # wk2
        ev(5, 9, 2),  # user 2 cohort wk1
        ev(6, 16, 2),  # wk1 -> offset 1
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        (r.cohort_week, r.week_offset, r.n_users)
        for r in events_retention(spark, str(tmp_path)).collect()
    )
    assert got == [
        ("2024-01-01", 0, 1),
        ("2024-01-01", 1, 1),
        ("2024-01-01", 2, 1),
        ("2024-01-08", 0, 1),
        ("2024-01-08", 1, 1),
    ]


def test_events_anomalies_ewma_recurrence(spark, tmp_path):
    """The spike flag must follow the exact EWMA recurrence (seed x1,
    e_t = 0.25 x_t + 0.75 e_{t-1}) computed in plain Python; the first
    hour never flags; a 10x burst after a calm baseline flags."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import events_anomalies

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    counts = [4, 4, 4, 4, 40, 4]  # hour 4 bursts 10x
    for h, n in enumerate(counts):
        for j in range(n):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=h, seconds=j), 1, "click",
                 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        events_anomalies(spark, str(tmp_path)).collect(),
        key=lambda r: r.hour_start,
    )
    assert [r.n_events for r in got] == counts
    e = None
    for r, x in zip(got, counts):
        if e is None:
            assert r.ewma_prev is None and r.is_spike is False
        else:
            assert r.ewma_prev == e
            assert r.is_spike == (float(x) > 2.0 * e)
        e = float(x) if e is None else 0.25 * float(x) + 0.75 * e
    assert [r.is_spike for r in got] == [
        False, False, False, False, True, False
    ]


def test_events_transitions_chain_semantics(spark, tmp_path):
    """Transitions pair CONSECUTIVE events per user only (no cross-user
    pairs, last event of a user pairs with nothing); probabilities are
    exact count ratios summing to 1 per prev_type."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import events_transitions

    def ts(hour):
        return dt.datetime(2024, 1, 1, hour, 0, 0)

    rows = [
        # user 1: view -> click -> view  (pairs: v->c, c->v)
        (1, ts(1), 1, "view"),
        (2, ts(2), 1, "click"),
        (3, ts(3), 1, "view"),
        # user 2: view -> view  (pair: v->v); last view pairs with nothing
        (4, ts(1), 2, "view"),
        (5, ts(2), 2, "view"),
        # user 3: single event -> contributes no pair at all
        (6, ts(1), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, t, u, e, 1.0, "{}") for i, t, u, e in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.prev_type, r.next_type): (r.n_pairs, r.prob)
        for r in events_transitions(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_events_transitions_tie_break_on_event_id(spark, tmp_path):
    """Equal timestamps order by event_id — the pair direction flips if
    the tie-break is wrong."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import events_transitions

    t0 = dt.datetime(2024, 1, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [(2, t0, 1, "click", 1.0, "{}"), (1, t0, 1, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = [
        (r.prev_type, r.next_type)
        for r in events_transitions(spark, str(tmp_path)).collect()
    ]
    assert got == [("view", "click")]


def test_events_key_skew_bucket_boundaries(spark, tmp_path):
    """Counts 1, 2, 3, 4, 8 land in buckets 0, 1, 1, 2, 3 with exact
    lower bounds 1, 2, 4, 8 and integer stats."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import events_key_skew

    rows = []
    eid = 0
    # user u gets `n` events
    for user, n in [(1, 1), (2, 2), (3, 3), (4, 4), (5, 8)]:
        for k in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1, 0, k, 0), user, "view", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = [
        (r.bucket, r.bucket_lo, r.n_users, r.min_events, r.max_events,
         r.total_events)
        for r in events_key_skew(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (0, 1, 1, 1, 1, 1),
        (1, 2, 2, 2, 3, 5),
        (2, 4, 1, 4, 4, 4),
        (3, 8, 1, 8, 8, 8),
    ]


def test_basket_part_pairs_crafted(spark, tmp_path):
    """Pair counts come from distinct per-order part sets (duplicate
    lineitems collapse), the min-2-orders floor applies, and lift is the
    exact (n_both·N)/(n_a·n_b) ratio."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import basket_part_pairs

    d = dt.date(1995, 1, 1)
    # orders: 1:{10,20} 2:{10,20} 3:{10,30} 4:{30} ; order 2 lists part 10
    # twice (must collapse)
    rows = [
        (1, 10), (1, 20),
        (2, 10), (2, 10), (2, 20),
        (3, 10), (3, 30),
        (4, 30),
    ]
    df = spark.createDataFrame(
        [
            (ok, pk, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O", d)
            for i, (ok, pk) in enumerate(rows)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = [
        (r.part_a, r.part_b, r.n_both, r.n_part_a, r.n_part_b, r.support,
         r.lift)
        for r in basket_part_pairs(spark, str(tmp_path)).collect()
    ]
    # only (10,20) co-occurs >= 2 times; N=4 orders, n_10=3, n_20=2
    assert got == [(10, 20, 2, 3, 2, 2 / 4, (2.0 * 4.0) / (3.0 * 2.0))]


def test_gapfill_locf_semantics(spark):
    # series "a": obs in buckets 0 and 7200 (gap at 3600);
    # series "b": first obs at 3600 (NULL fill before it);
    # bucket 7200/"a" has two obs — LOCF must carry the LATER one
    # by (ts_us, event_id), not the larger value.
    ev = spark.createDataFrame(
        [
            (1, "a", 100, 100_000_000, 10.0),
            (2, "a", 7300, 7_300_000_000, 99.0),
            (3, "a", 7400, 7_400_000_000, 20.0),
            (4, "b", 3700, 3_700_000_000, 5.0),
        ],
        "event_id long, event_type string, ts_sec long, ts_us long, value double",
    )
    out = {
        (r["event_type"], r["bucket_sec"]): r
        for r in temporal.gapfill_locf(ev).collect()
    }
    # spine = global bounds [0, 7200] x {a, b} = 6 cells
    assert len(out) == 6
    a0, a1, a2 = out[("a", 0)], out[("a", 3600)], out[("a", 7200)]
    assert (a0["n_events"], a0["filled_value"], a0["is_gap"]) == (1, 10.0, False)
    assert (a1["n_events"], a1["filled_value"], a1["is_gap"]) == (0, 10.0, True)
    # later (ts_us, event_id) wins within the bucket: value 20.0, not 99.0
    assert (a2["n_events"], a2["filled_value"]) == (2, 20.0)
    b0, b1, b2 = out[("b", 0)], out[("b", 3600)], out[("b", 7200)]
    assert b0["n_events"] == 0 and b0["filled_value"] is None and b0["is_gap"]
    assert (b1["n_events"], b1["filled_value"]) == (1, 5.0)
    assert (b2["n_events"], b2["filled_value"], b2["is_gap"]) == (0, 5.0, True)


@pytest.mark.parametrize("n_cust", [7, 23, 40])
def test_customer_value_deciles_matches_native_ntile(spark, tmp_path, n_cust):
    """The arithmetic tile-from-(rank, N) must equal Spark's own
    ntile(10) over the (rev DESC, custkey) order — including N < k and
    N % k != 0 — and the shares must be exact cents ratios."""
    import datetime as dt

    from pyspark.sql.window import Window

    from tax_compliance_engine_spark.plans.queries import (
        customer_value_deciles,
    )

    d = dt.datetime(1995, 1, 1)
    rows = []
    for c in range(1, n_cust + 1):
        for j in range((c % 3) + 1):  # 1-3 orders per customer
            rows.append((c * 100 + j, c, "O", float(c * 7 + j) + 0.25, d, "x"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    out = {r["decile"]: r for r in customer_value_deciles(spark, str(tmp_path)).collect()}

    rev = (
        spark.read.parquet(f"{tmp_path}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("rev_cents")
        )
    )
    native = (
        rev.withColumn(
            "decile",
            F.ntile(10).over(
                Window.orderBy(F.desc("rev_cents"), F.asc("o_custkey"))
            ),
        )
        .groupBy("decile")
        .agg(F.count("*").alias("n"), F.sum("rev_cents").alias("cents"))
    )
    exp = {r["decile"]: r for r in native.collect()}
    assert set(out) == set(exp)
    total = sum(r["cents"] for r in exp.values())
    cum = 0
    for dec in sorted(exp):
        cum += exp[dec]["cents"]
        assert out[dec]["n_customers"] == exp[dec]["n"]
        assert out[dec]["revenue_cents"] == exp[dec]["cents"]
        assert out[dec]["revenue_share"] == exp[dec]["cents"] / total
        assert out[dec]["cum_share"] == cum / total


def test_events_audience_overlap_bitmap_exact(spark, tmp_path):
    """Bitmap-word intersection equals the brute-force distinct-user
    overlap, across word boundaries (users 61/62/124) and duplicate
    events; zero-overlap pairs are dropped."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import (
        events_audience_overlap,
    )

    t0 = dt.datetime(2024, 1, 1)
    # a: {1, 61, 62, 124}   b: {61, 62, 200}   c: {999}
    rows = [
        (1, t0, 1, "a", 1.0, ""),
        (2, t0, 61, "a", 1.0, ""),
        (3, t0, 61, "a", 1.0, ""),  # duplicate (absorbed by OR)
        (4, t0, 62, "a", 1.0, ""),
        (5, t0, 124, "a", 1.0, ""),
        (6, t0, 61, "b", 1.0, ""),
        (7, t0, 62, "b", 1.0, ""),
        (8, t0, 200, "b", 1.0, ""),
        (9, t0, 999, "c", 1.0, ""),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = {
        (r["type_a"], r["type_b"]): r
        for r in events_audience_overlap(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("a", "b")}  # c overlaps nothing -> dropped
    r = out[("a", "b")]
    assert (r["n_a"], r["n_b"], r["n_both"]) == (4, 3, 2)
    assert r["jaccard"] == 2.0 / 5.0


def test_lineitem_regression_exact_fit(spark, tmp_path):
    """On perfectly collinear data (price = 300 + 50·qty cents) the
    exact sufficient-statistics solve recovers slope/intercept with NO
    float error; on a known small set the coefficients match the
    hand-computed closed form."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import (
        lineitem_regression,
    )

    d = dt.datetime(1995, 1, 1)
    rows = []
    # flag A: exact line y_cents = 300 + 50 x  (prices in dollars)
    for i, x in enumerate([1, 2, 5, 10, 20]):
        rows.append((i, 1, 1, i, float(x), (300 + 50 * x) / 100.0, "A"))
    # flag B: hand-computed: points (1, 100c), (2, 200c), (3, 250c)
    for i, (x, c) in enumerate([(1, 100), (2, 200), (3, 250)]):
        rows.append((100 + i, 1, 1, i, float(x), c / 100.0, "B"))
    df = spark.createDataFrame(
        [
            (ok, pk, sk, ln, q, p, 0.0, 0.0, fl, "O", d)
            for ok, pk, sk, ln, q, p, fl in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {
        r["l_returnflag"]: r
        for r in lineitem_regression(spark, str(tmp_path)).collect()
    }
    a = out["A"]
    assert a["slope_cents_per_unit"] == 50.0
    assert a["intercept_cents"] == 300.0
    b = out["B"]
    # n=3 Sx=6 Sy=550 Sxx=14 Sxy=1250: num=3*1250-6*550=450, den=3*14-36=6
    assert (b["slope_num"], b["slope_den"]) == (450.0, 6.0)
    assert b["slope_cents_per_unit"] == 75.0
    assert b["intercept_cents"] == (550.0 - 75.0 * 6.0) / 3.0


def test_events_pivot_zero_fill(spark, tmp_path):
    """Hours where a type is absent get an exact 0 column (not NULL),
    and n_total sums only the pinned vocabulary."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import events_pivot

    h0 = dt.datetime(2024, 1, 1, 0, 30)
    h1 = dt.datetime(2024, 1, 1, 1, 15)
    rows = [
        (1, h0, 1, "click", 1.0, ""),
        (2, h0, 2, "click", 1.0, ""),
        (3, h0, 3, "view", 1.0, ""),
        (4, h1, 1, "purchase", 1.0, ""),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["hour_sec"]: r for r in events_pivot(spark, str(tmp_path)).collect()}
    assert len(out) == 2
    a = out[min(out)]
    assert (a["n_click"], a["n_view"], a["n_purchase"], a["n_error"]) == (2, 1, 0, 0)
    assert a["n_total"] == 3
    b = out[max(out)]
    assert b["n_purchase"] == 1 and b["n_total"] == 1 and b["n_click"] == 0


def test_events_attribution_linear_split(spark, tmp_path):
    """A purchase with two trailing-hour clicks splits its cents in
    half at pair grain; clicks outside the hour or on other users don't
    count; a purchase with no trailing click is absent."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import (
        events_attribution_linear,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    rows = [
        (1, t(0), 1, "click", 0.0, ""),
        (2, t(30), 1, "click", 0.0, ""),
        (3, t(59), 1, "purchase", 10.01, ""),   # both clicks in window
        (4, dt.datetime(2024, 1, 1, 10, 0), 2, "click", 0.0, ""),
        (5, t(30), 2, "purchase", 5.0, ""),     # click 2h earlier -> absent
        (6, t(10), 3, "click", 0.0, ""),
        (7, t(20), 1, "view", 0.0, ""),         # wrong type never counts
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = events_attribution_linear(spark, str(tmp_path)).collect()
    assert {(r["purchase_id"], r["click_id"]) for r in out} == {(3, 1), (3, 2)}
    for r in out:
        assert r["n_touches"] == 2 and r["share_cents"] == 1001 / 2


def test_doc_mad_outliers_hand_medians(spark, tmp_path):
    """Lower medians and the 3-MAD rule on hand-computable lengths."""
    from tax_compliance_engine_spark.plans.queries_dataops import (
        doc_mad_outliers,
    )

    # lengths 10,10,12,14,100: lower median 12; devs 2,2,0,2,88 ->
    # sorted 0,2,2,2,88, lower median (MAD) = 2; outliers: dev > 6 -> {100}
    lens = [10, 10, 12, 14, 100]
    docs = [
        (i, "x" * n, "en", "s", n) for i, n in enumerate(lens)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = doc_mad_outliers(spark, str(tmp_path)).collect()[0]
    assert (r["n_docs"], r["median_chars"], r["mad_chars"], r["n_outliers"]) == (
        5, 12, 2, 1,
    )


def test_events_active_users_sliding_exact(spark, tmp_path):
    """WAU counts a user once across repeat days in the window, the
    window slides off after 7 days, and word-boundary users (61/62)
    stay distinct."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import (
        events_active_users,
    )

    day = lambda d: dt.datetime(2024, 1, 1 + d, 5)
    rows = [
        (1, day(0), 61, "click", 1.0, ""),
        (2, day(0), 62, "click", 1.0, ""),
        (3, day(1), 61, "click", 1.0, ""),   # repeat user in window
        (4, day(8), 99, "click", 1.0, ""),   # 8 days later: 61/62 aged out
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["day"]: r for r in events_active_users(spark, str(tmp_path)).collect()}
    d0 = int(
        (dt.datetime(2024, 1, 1, 5) - dt.datetime(1970, 1, 1)).total_seconds()
        // 86400
    )  # epoch day of day(0)
    assert out[d0]["dau"] == 2 and out[d0]["wau"] == 2
    assert out[d0 + 1]["dau"] == 1 and out[d0 + 1]["wau"] == 2  # 61 once
    assert out[d0 + 6]["dau"] == 0 and out[d0 + 6]["wau"] == 2
    # day 7: day-0 events aged out, day-1 repeat of 61 still inside
    assert out[d0 + 7]["dau"] == 0 and out[d0 + 7]["wau"] == 1
    # day 8 window = days 2..8 -> only user 99
    assert out[d0 + 8]["dau"] == 1 and out[d0 + 8]["wau"] == 1


def test_events_debounce_collapses_bursts(spark, tmp_path):
    """A 3-click burst inside 5 s collapses to one episode carrying the
    FIRST event's id and the burst span; a 4th click 6 s later starts a
    new episode; other types/users never merge."""
    import datetime as dt

    from tax_compliance_engine_spark.plans.queries import events_debounce

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        (1, s(0), 1, "click", 0.0, ""),
        (2, s(3), 1, "click", 0.0, ""),     # +3s  -> same episode
        (3, s(7), 1, "click", 0.0, ""),     # +4s  -> still chained
        (4, s(13), 1, "click", 0.0, ""),    # +6s  -> NEW episode
        (5, s(1), 1, "view", 0.0, ""),      # other type: own episode
        (6, s(2), 2, "click", 0.0, ""),     # other user: own episode
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        (r["user_id"], r["event_type"], r["episode"]): r
        for r in events_debounce(spark, str(tmp_path)).collect()
    }
    assert len(out) == 4
    burst = out[(1, "click", 1)]
    assert burst["first_event_id"] == 1 and burst["n_collapsed"] == 3
    assert burst["end_us"] - burst["start_us"] == 7_000_000
    assert out[(1, "click", 2)]["first_event_id"] == 4
    assert out[(1, "view", 1)]["n_collapsed"] == 1
    assert out[(2, "click", 1)]["n_collapsed"] == 1


def test_bot_regularity_flags_timers_not_humans(spark, tmp_path):
    """Inter-arrival regularity pins: a fixed-timer user flags
    bot-like (cv² = 0), jittered-human traffic does not, users below
    5 gaps get a NULL verdict, and cv² re-derives exactly from the
    integer gap moments."""
    import datetime as dt

    from tax_compliance_engine_spark.plans import queries as q

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: perfect 10s timer, 12 events -> cv2 = 0, bot
    for i in range(12):
        rows.append((eid, base + dt.timedelta(seconds=10 * i), 1, "click", 1.0, "{}"))
        eid += 1
    # user 2: bursty human-ish gaps (1s,60s,2s,300s,5s,45s,3s,600s)
    t = base
    for g in (0, 1, 60, 2, 300, 5, 45, 3, 600):
        t = t + dt.timedelta(seconds=g)
        rows.append((eid, t, 2, "view", 1.0, "{}"))
        eid += 1
    # user 3: only 3 events (2 gaps) -> NULL verdict
    for i in range(3):
        rows.append((eid, base + dt.timedelta(seconds=7 * i), 3, "buy", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.write.parquet(str(sf / "events.parquet"))
    got = {r.user_id: r for r in q.events_bot_regularity(spark, str(sf)).collect()}
    assert got[1].is_bot_like is True and got[1].cv2 == 0.0
    assert got[2].is_bot_like is False
    assert got[3].is_bot_like is None and got[3].n_gaps == 2
    # exact cv2 re-derivation for user 2 (microsecond gaps)
    g = [1, 60, 2, 300, 5, 45, 3, 600]
    gus = [x * 1_000_000 for x in g]
    n, s, ss = len(gus), sum(gus), sum(x * x for x in gus)
    assert got[2].n_gaps == n and got[2].sum_gap == s
    assert got[2].cv2 == float(n * ss - s * s) / float(s * s)
