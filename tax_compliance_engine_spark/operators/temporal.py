"""Temporal join operators Spark lacks natively: as-of join and range join.

Neither exists in the reference (its event handling is row-at-a-time Python;
see `tax_engine/` generally) — these are the SURVEY extension family for
event/time-series processing at training-pipeline scale.

Scale design (100 TB, 1000 executors):
- ``asof_join`` is the union-marker window formulation: tag both inputs,
  union them, and take the last-preceding right row per key with one window
  over one shuffle keyed on ``by``.  This is THE scalable as-of plan — the
  naive ``l.ts >= r.ts`` theta-join is quadratic per key and unbounded in
  shuffle width, while the sort-merge union is O(n log n) per key with no
  intermediate blow-up.  Hot keys are the inherent risk of any per-key
  as-of; the refinement at extreme skew is repartitionByRange on
  (by, on) with per-range boundary seeding (carry the last right row of
  each range forward), which keeps the same output.
- ``range_join`` is the bucketized band join: the right side lands in
  fixed-width time buckets, the left side explodes to the (≤2) buckets its
  window can overlap, and the join is a plain equi-join on (by, bucket)
  followed by the exact range filter.  Candidate volume is bounded by
  window width × per-bucket density instead of |L|×|R| per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _floor_div(col_expr: str, divisor: int) -> Column:
    """Exact integer floor division over a named long column/expression.

    ``F.floor(x / lit)`` would route through DOUBLE division — exact only
    while |x| stays under 2^53, silently wrong for e.g. epoch nanoseconds
    (~1.8e18), where a left-side explode and a right-side bucket could
    disagree and drop matching pairs.  ``(x - pmod(x, w)) div w`` stays in
    64-bit integer arithmetic at any magnitude (the numerator is an exact
    multiple of w, so truncating `div` equals floor, negatives included)."""
    d = int(divisor)
    return F.expr(f"(({col_expr}) - pmod({col_expr}, {d})) div {d}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tiebreak: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    suffix: str = "_r",
    shard_width: int | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, the single right row with the
    greatest ``on`` ≤ left's (``backward``) or smallest ``on`` ≥ left's
    (``forward``) within the same ``by`` key; unmatched left rows keep NULLs.

    ``tiebreak`` must be a right-side column unique within (by, on) — among
    equal-``on`` right rows the greatest (backward) / smallest (forward)
    tiebreak wins, which makes the operator fully deterministic (DuckDB's
    ASOF JOIN leaves that tie unspecified; the oracle twin uses an ordered
    LATERAL instead).

    ``shard_width`` is the hot-key hardening: with it, each key's timeline
    is cut into fixed-width ``on``-ranges and the window runs per
    (key, shard) — a hot key's rows spread over many tasks instead of
    serializing through one.  Matches that cross shard boundaries come from
    a carry-forward seed table with ONE ROW PER (key, shard) (each shard's
    last right row, cumulated per key), so the per-key serial work drops
    from O(rows) to O(shards).  Output is IDENTICAL to the unsharded form;
    requires numeric ``on`` and ``tiebreak`` (negation trick for forward).

    Output: every left column, plus ``right_cols`` renamed with ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lp = F.struct(*[F.col(c) for c in left.columns])
    rp = F.struct(*[F.col(c) for c in right_cols])
    lp_t = left.select(lp.alias("_lp")).schema["_lp"].dataType
    rp_t = right.select(rp.alias("_rp")).schema["_rp"].dataType
    tb_t = right.schema[tiebreak].dataType

    l_side = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_m"),  # left sorts AFTER right at equal `on`:
        F.lit(None).cast(tb_t).alias("_tb"),  # ties are at-or-before matches
        lp.alias("_lp"),
        F.lit(None).cast(rp_t).alias("_rp"),
    )
    r_side = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_m"),
        F.col(tiebreak).alias("_tb"),
        F.lit(None).cast(lp_t).alias("_lp"),
        rp.alias("_rp"),
    )
    u = l_side.unionByName(r_side)

    if shard_width is None:
        if direction == "backward":
            order = [F.asc("_on"), F.asc("_m"), F.asc("_tb")]
        else:
            order = [F.desc("_on"), F.asc("_m"), F.desc("_tb")]
        w = (
            Window.partitionBy("_by")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
        return u.filter(F.col("_m") == 1).select(
            *[F.col(f"_lp.{c}").alias(c) for c in left.columns],
            *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    return _asof_sharded(
        u, left.columns, right_cols, direction, suffix, int(shard_width)
    )


def _asof_sharded(
    u: DataFrame,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    direction: str,
    suffix: str,
    shard_width: int,
) -> DataFrame:
    """Sharded as-of core: per-(key, shard) local windows + cumulative
    per-shard seeds.  Direction is normalized to 'backward' by negating the
    numeric sort keys (so 'latest earlier' is always the scan direction)."""
    sign = 1 if direction == "backward" else -1
    u = u.select(
        "*",
        (F.col("_on") * sign).alias("_s"),
        (F.col("_tb") * sign).alias("_t"),
    ).withColumn("_shard", _floor_div("_s", shard_width))

    # 1. local pass: best right AT-OR-BEFORE each row within its own shard
    w_local = (
        Window.partitionBy("_by", "_shard")
        .orderBy(F.asc("_s"), F.asc("_m"), F.asc("_t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_local", F.last("_rp", ignorenulls=True).over(w_local))

    # 2. seed table: ONE row per (key, shard) — that shard's last right row
    # (max (s, t) among rights; shards with no rights keep NULL), then the
    # carry-forward: last non-null over all STRICTLY EARLIER shards.  The
    # window here is over per-shard summary rows, so a hot key costs
    # O(#shards), not O(#rows).
    shard_last = (
        u.groupBy("_by", "_shard")
        .agg(
            F.max_by(
                F.when(F.col("_m") == 0, F.col("_rp")),
                F.when(F.col("_m") == 0, F.struct("_s", "_t")),
            ).alias("_shard_last")
        )
    )
    w_seed = (
        Window.partitionBy("_by")
        .orderBy(F.asc("_shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = shard_last.withColumn(
        "_seed", F.last("_shard_last", ignorenulls=True).over(w_seed)
    ).select("_by", "_shard", "_seed")

    # 3. left rows: in-shard match if any, else the carried seed
    out = (
        u.filter(F.col("_m") == 1)
        .join(seeds, ["_by", "_shard"], "left")
        .withColumn("_match", F.coalesce("_local", "_seed"))
    )
    return out.select(
        *[F.col(f"_lp.{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """All (left × right) pairs with the same ``by`` key and
    ``right_ts`` ∈ [left_ts + lower, left_ts + upper] (inclusive; ``lower``
    may be negative for look-back windows).  Timestamps are integer columns
    (any fixed unit — callers pick epoch seconds/micros).

    Bucketized band join: bucket width = window width, right rows keyed by
    their own bucket, left rows exploded to the distinct buckets the window
    overlaps (≤2 by construction), then the exact range predicate filters
    the equi-join output.  Each true pair is produced exactly once (a right
    row has one bucket; the left explode list is distinct).

    Output: all left columns, then right's ``by``-excluded columns suffixed
    ``_r`` on name collisions.
    """
    if upper < lower:
        raise ValueError("upper must be >= lower")
    width = int(upper - lower) if upper > lower else 1

    l_buckets = F.array_distinct(
        F.array(
            _floor_div(f"`{left_ts}` + {int(lower)}", width),
            _floor_div(f"`{left_ts}` + {int(upper)}", width),
        )
    )
    l_side = left.withColumn("_bucket", F.explode(l_buckets))
    right_out = [c for c in right.columns if c != by]
    renames = {c: (f"{c}_r" if c in left.columns else c) for c in right_out}
    r_side = right.select(
        F.col(by),
        _floor_div(f"`{right_ts}`", width).alias("_bucket"),
        *[F.col(c).alias(renames[c]) for c in right_out],
    )
    rts = renames[right_ts]
    return (
        l_side.join(r_side, [by, "_bucket"])
        .filter(
            (F.col(rts) >= F.col(left_ts) + F.lit(lower))
            & (F.col(rts) <= F.col(left_ts) + F.lit(upper))
        )
        .drop("_bucket")
    )


def gapfill_locf(
    df: DataFrame,
    series_col: str = "event_type",
    ts_sec_col: str = "ts_sec",
    order_cols: Sequence[str] = ("ts_us", "event_id"),
    value_col: str = "value",
    step: int = 3600,
) -> DataFrame:
    """Time-series gap fill with last-observation-carried-forward (LOCF):
    bucket observations into ``step``-second intervals, generate the
    complete bucket spine from the global min to max bucket, and for
    every (series, bucket) cell emit the exact observation count (0 on
    gaps) plus the value of the latest observation at or before that
    bucket, carried forward across empty buckets (NULL before a series'
    first observation).

    The reference has no time-series surface at all (its event handling
    is row-at-a-time Python; tax_engine/ generally) — this is the
    §2.5-class regularization step every downstream rolling/forecast
    operator assumes: turning an irregular event stream into a dense
    fixed-step series.

    Determinism: the per-bucket representative is the max by
    ``order_cols`` (a unique composite — e.g. (ts_us, event_id)), taken
    as one struct-max aggregate, so the carried double is a VALUE COPY
    (never arithmetic) and stays bit-exact across engines.

    Scale shape (100 TB): one hash aggregation keyed (series, bucket)
    collapses the raw stream map-side; the spine is bounds(1 row,
    scalar agg) × sequence/explode × distinct-series (tiny) — never a
    data-row single-partition exchange; the LOCF window shuffles the
    DENSE cell table (|series| × |buckets| rows, orders of magnitude
    smaller than the input) hash-partitioned by series.  A series whose
    whole spine cannot sit in one task is the same inherent bound any
    per-key window has — shorten the spine (coarser ``step``) or split
    the series key."""
    ordered = list(order_cols)
    bucket = (F.col(ts_sec_col) - F.col(ts_sec_col) % step).cast("long")
    cells = (
        df.withColumn("_bucket", bucket)
        .groupBy(series_col, "_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.struct(*ordered, value_col))
            .getField(value_col)
            .alias("_obs"),
        )
    )
    bounds = df.select(bucket.alias("_b")).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    spine_hours = bounds.select(
        F.explode(
            F.sequence("_lo", "_hi", F.lit(int(step)).cast("long"))
        ).alias("_bucket")
    )
    series = df.select(series_col).distinct()
    spine = spine_hours.crossJoin(F.broadcast(series))
    w = (
        Window.partitionBy(series_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(cells, [series_col, "_bucket"], "left")
        .select(
            F.col(series_col),
            F.col("_bucket").alias("bucket_sec"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("_obs", ignorenulls=True).over(w).alias("filled_value"),
            F.col("n_events").isNull().alias("is_gap"),
        )
        .orderBy(series_col, "bucket_sec")
    )
