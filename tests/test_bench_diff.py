"""bench.regression_diff: the round-over-round per-query comparison must
be a pure artifact fact — correct ratios, contended annotation, noise
floor, and fail-soft on a missing or corrupt previous sidecar."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import regression_diff  # noqa: E402


def _write_sidecar(tmp_path, queries, **meta):
    p = tmp_path / "BENCH_queries_full.json"
    p.write_text(
        json.dumps(
            {
                "queries": queries,
                "wall_clock_utc": "2026-08-16T00:00:00Z",
                "value_core18": 25.72,
                **meta,
            }
        )
    )
    return p


def test_flags_only_above_threshold_and_sorts(tmp_path):
    prev = {"a": 1.0, "b": 2.0, "c": 3.0}
    now = {"a": 1.2, "b": 4.0, "c": 4.2}  # a: 1.2x (clean), b: 2x, c: 1.4x
    meta, regs = regression_diff(now, [], _write_sidecar(tmp_path, prev))
    assert meta == {
        "wall_clock_utc": "2026-08-16T00:00:00Z",
        "value_core18": 25.72,
        "n_queries": 3,
    }
    assert [r["query"] for r in regs] == ["b", "c"]  # ratio-desc order
    assert regs[0] == {
        "query": "b",
        "prev": 2.0,
        "now": 4.0,
        "ratio": 2.0,
        "contended": False,
    }


def test_contended_rows_annotated_not_excluded(tmp_path):
    meta, regs = regression_diff(
        {"q": 2.0}, ["q"], _write_sidecar(tmp_path, {"q": 1.0})
    )
    assert regs == [
        {"query": "q", "prev": 1.0, "now": 2.0, "ratio": 2.0, "contended": True}
    ]


def test_noise_floor_skips_tiny_rows(tmp_path):
    # 0.05 -> 0.15 is 3x but both sides are under the 0.2 s floor; a row
    # CROSSING the floor (0.1 -> 0.5) still reports.
    meta, regs = regression_diff(
        {"tiny": 0.15, "crossed": 0.5},
        [],
        _write_sidecar(tmp_path, {"tiny": 0.05, "crossed": 0.1}),
    )
    assert [r["query"] for r in regs] == ["crossed"]
    assert regs[0]["ratio"] == 5.0


def test_new_query_without_prev_row_is_not_a_regression(tmp_path):
    meta, regs = regression_diff(
        {"new_op": 9.9}, [], _write_sidecar(tmp_path, {"old_op": 1.0})
    )
    assert regs == []
    assert meta["n_queries"] == 1


def test_fail_soft_missing_and_corrupt_sidecar(tmp_path):
    assert regression_diff({"q": 1.0}, [], tmp_path / "nope.json") == (
        None,
        [],
    )
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert regression_diff({"q": 1.0}, [], bad) == (None, [])
