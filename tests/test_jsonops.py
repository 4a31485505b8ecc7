"""jsonops: typed flattening + per-key drift profile on crafted JSON
(the testdata's props column is uniform, so the malformed / missing-key /
mixed-type paths are pinned here)."""

from __future__ import annotations

from tax_compliance_engine_spark.operators.jsonops import (
    json_flatten,
    json_key_profile,
)

ROWS = [
    (1, "click", '{"k": 69, "tag": "a"}'),
    (2, "click", '{"k": 7}'),  # tag missing
    (3, "click", '{"k": "oops", "tag": "b"}'),  # k gone stringly
    (4, "view", '{"z": 1.5}'),  # new key appears
    (5, "view", "not json at all"),  # malformed row
    (6, "view", None),  # null payload
]
SCHEMA = "event_id long, event_type string, props string"


def test_json_flatten_typed_permissive(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = json_flatten(df, "props", {"k": "long", "tag": "string"})
    got = {r.event_id: (r.k, r.tag) for r in out.collect()}
    assert got[1] == (69, "a")
    assert got[2] == (7, None)  # missing key -> NULL, row kept
    assert got[3] == (None, "b")  # unparseable-as-long -> NULL
    assert got[4] == (None, None)
    assert got[5] == (None, None)  # malformed -> NULLs, never a crash
    assert got[6] == (None, None)
    # typed columns, original columns intact
    assert dict(out.dtypes)["k"] == "bigint"
    assert "props" in out.columns


def test_json_key_profile_drift_signals(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    prof = {
        (r.event_type, r.json_key): r
        for r in json_key_profile(df, "props", ["event_type"]).collect()
    }
    # malformed + null rows contribute no keys at all
    assert set(prof) == {("click", "k"), ("click", "tag"), ("view", "z")}
    k = prof[("click", "k")]
    assert (k.n_rows, k.n_vals, k.n_distinct) == (3, 3, 3)
    assert k.n_numeric == 2  # the stringly "oops" fails try_cast
    assert (k.min_num, k.max_num) == (7.0, 69.0)
    tag = prof[("click", "tag")]
    assert (tag.n_rows, tag.n_distinct, tag.n_numeric) == (2, 2, 0)
    assert tag.min_num is None and tag.max_num is None
    z = prof[("view", "z")]
    assert (z.n_rows, z.n_numeric, z.min_num) == (1, 1, 1.5)
