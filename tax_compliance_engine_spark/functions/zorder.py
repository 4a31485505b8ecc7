"""Z-order (Morton) interleaving and the multi-dimension data layout it
enables.

Why this exists at 100 TB: parquet scans prune FILES (and row groups)
with per-column min/max statistics.  Sorting the corpus by one column
makes predicates on THAT column prunable and every other predicate a
full scan; interleaving the bits of two columns into one Morton key and
range-sorting by it clusters BOTH dimensions at once, so a box predicate
(user X AND hour Y) touches O(box) files instead of O(corpus).  This is
the layout primitive behind Delta/Iceberg `OPTIMIZE ZORDER BY` —
re-expressed here as plain Column bit arithmetic plus the
repartitionByRange writer Spark already has.

The interleave is pure 64-bit integer mask-shift steps ("binary magic
numbers"), deterministic and engine-portable — the DuckDB oracle twin
replicates it bit-for-bit (`oracle_corpus.events_zorder_keys_sql`).
No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 64-bit spread masks: after the 5 steps, bit i of a 32-bit input sits at
# bit 2i of the result (the odd positions are zero, left for the other
# dimension).
_SPREAD_STEPS: list[tuple[int, int]] = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]

# inputs must stay below 2^31 so the interleaved key stays below 2^63
# (positive in a signed 64-bit long on both engines)
MAX_INPUT = 1 << 31


def _spread_bits(x: Column) -> Column:
    """Spread a 32-bit non-negative value over the even bit positions of
    a 64-bit long (bit i → bit 2i)."""
    out = x.cast("long")
    for shift, mask in _SPREAD_STEPS:
        out = (
            out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
        )
    return out


def z_value(x: Column, y: Column) -> Column:
    """Morton key of two non-negative ints < 2^31: bits of ``x`` on the
    even positions, ``y`` on the odd — points close in (x, y) are close
    in z, which is what makes a z-sorted file layout prunable on either
    dimension.  Out-of-range inputs raise at execution time (the guard
    feeds the interleave, so it cannot be pruned)."""

    def checked(c: Column, name: str) -> Column:
        return F.when((c >= 0) & (c < F.lit(MAX_INPUT)), c).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"z_value {name} out of [0, 2^31): "),
                    # NULL also lands here (the when-condition is NULL);
                    # coalesce keeps the diagnostic readable
                    F.coalesce(c.cast("string"), F.lit("NULL")),
                )
            )
        )

    return _spread_bits(checked(x, "x")).bitwiseOR(
        F.shiftleft(_spread_bits(checked(y, "y")), 1)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 32,
) -> None:
    """Write ``df`` z-ordered on (x_col, y_col): range-partition by the
    Morton key into ``n_files`` contiguous z-ranges (one file each,
    sorted within), drop the key.  Each output file then covers a small
    square-ish tile of the (x, y) plane, so its parquet min/max stats
    prune box predicates on EITHER OR BOTH columns — the property
    `tests/test_zorder.py::test_zorder_layout_prunes_box_queries`
    measures against a single-column sort of the same data.

    Scale shape: repartitionByRange samples the key (one extra pass over
    a sample, not the data), then a single range shuffle + local sort —
    the same cost as any global sort, paid once at layout time."""
    keyed = df.withColumn("_z", z_value(F.col(x_col), F.col(y_col)))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
