"""Reusable bloom-filter join acceleration: EXACT semi/anti joins whose
shuffle carries only a sketch-filtered fraction of the big side.

The pattern behind ``corpus.decontaminate``'s middle regime, exposed as
a general facility: build a 2-hash bloom bitmap over the SMALL side's
keys as a broadcastable (word, 64-bit-word) table, probe every big-side
row with two broadcast joins + JVM bit tests, and run the exact join
only over what the sketch couldn't rule out.  Bloom negatives are
DEFINITE non-members (every small-side key set its own bits), so:

- semi join: negatives drop immediately; the exact equi-join sees only
  the ~fp-sized positive stream;
- anti join: negatives pass straight to the output; only positives go
  through the exact anti join — the big side's shuffle shrinks the same
  way.

Results are exactly equal to the plain joins in both modes — the sketch
is purely a physical-plan accelerator, so oracle twins never change.
Hashing is engine-internal xxhash64 (the sketch never leaves the plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos(key: Column, m_bits: int, seed: int) -> Column:
    """Bloom bit position for one of the k=2 hash probes."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))


def bloom_bitmap(keys: DataFrame, key_col: str, m_bits: int) -> DataFrame:
    """(word, bits) bitmap table over a key column: both bit positions
    per key, grouped by 64-bit word with a bit_or fold.  One narrow
    shuffle over (word, mask) pairs, ≤ m_bits/64 output rows."""
    pos = keys.select(
        F.explode(
            F.array(
                _pos(F.col(key_col), m_bits, 0),
                _pos(F.col(key_col), m_bits, 1),
            )
        ).alias("p")
    )
    return (
        pos.select(
            F.shiftright(F.col("p"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "b"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_prefilter(
    df: DataFrame, bitmap: DataFrame, key_col: str, m_bits: int
) -> DataFrame:
    """Maybe-members only, with STAGED probes: rows failing probe 0 drop
    before probe 1's hash and broadcast lookup ever run — on the
    dominant miss path (most big-side rows are bloom negatives) each row
    pays one probe, not two.  Use this for semi-style prefiltering;
    ``bloom_split`` pays the both-probe cost only because anti mode
    needs the negative side too."""
    g = df
    for j in (0, 1):
        bm = bitmap.select(
            F.col("w").alias(f"_w{j}"), F.col("bits").alias(f"_bits{j}")
        )
        g = (
            g.withColumn(f"_p{j}", _pos(F.col(key_col), m_bits, j))
            .join(
                F.broadcast(bm),
                F.shiftright(F.col(f"_p{j}"), 6) == F.col(f"_w{j}"),
            )
            .filter(
                F.expr(
                    f"(shiftright(_bits{j}, CAST(_p{j} % 64 AS INT)) & 1)"
                    " = 1"
                )
            )
            .drop(f"_w{j}", f"_bits{j}", f"_p{j}")
        )
    return g


def bloom_split(
    df: DataFrame, bitmap: DataFrame, key_col: str, m_bits: int
) -> tuple[DataFrame, DataFrame]:
    """(maybe_members, definite_non_members): rows whose both bloom bits
    are set vs everything else.  Two broadcast joins + JVM bit tests; no
    false negatives by construction.  The negative side is computed as a
    left join + failed-test filter so both halves come from one probe
    shape."""
    probed = df
    tests = []
    for j in (0, 1):
        bm = bitmap.select(
            F.col("w").alias(f"_w{j}"), F.col("bits").alias(f"_bits{j}")
        )
        probed = probed.withColumn(
            f"_p{j}", _pos(F.col(key_col), m_bits, j)
        ).join(
            F.broadcast(bm),
            F.shiftright(F.col(f"_p{j}"), 6) == F.col(f"_w{j}"),
            "left",
        )
        tests.append(
            F.col(f"_bits{j}").isNotNull()
            & F.expr(
                f"(shiftright(_bits{j}, CAST(_p{j} % 64 AS INT)) & 1) = 1"
            )
        )
    hit = tests[0] & tests[1]
    drop = [c for j in (0, 1) for c in (f"_w{j}", f"_bits{j}", f"_p{j}")]
    return (
        probed.filter(hit).drop(*drop),
        probed.filter(~hit).drop(*drop),
    )


def _auto_bits(n_keys: int, max_bloom_bits: int) -> tuple[int, float]:
    """(m_bits, expected_fp) for a 2-hash bloom at 16 bits/key, capped
    hard at ``max_bloom_bits`` (the 1024 floor only rounds up to it)."""
    import math

    m_bits = min(max(1024, 16 * n_keys), max_bloom_bits)
    fp = (
        (1.0 - math.exp(-2.0 * n_keys / m_bits)) ** 2
        if m_bits >= 64
        else 1.0
    )
    return m_bits, fp


def bloom_accelerated_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    how: str = "semi",
    max_bloom_bits: int = 1 << 28,
) -> DataFrame:
    """EXACT ``semi`` or ``anti`` join of ``big`` against ``small``'s
    distinct keys, with the big side's shuffle shrunk by a bloom
    prefilter.  Counts the small side once to size the bitmap; when even
    the capped bitmap would saturate (expected fp > 0.5) the plain join
    runs unchanged.  Output ≡ ``big.join(small_keys, key, how)`` in all
    regimes.

    The distinct key set is cached here (it is counted for sizing, folded
    into the bitmap, and joined against — three references); the cache
    lifecycle is session-owned, like the repo's other cached plan
    builders: the returned DataFrame references the cached plan lazily,
    so it cannot be unpersisted inside this function.  Long-lived
    sessions issuing many bloom joins over different key sets should
    ``spark.catalog.clearCache()`` between batches."""
    if how not in ("semi", "anti"):
        raise ValueError(f"how must be semi|anti: {how}")
    keys = small.select(key_col).distinct().cache()
    n_keys = keys.count()
    m_bits, fp = _auto_bits(n_keys, max_bloom_bits)
    join_how = "left_semi" if how == "semi" else "left_anti"
    if fp > 0.5:  # saturated: sketch can't help
        return big.join(keys, key_col, join_how)
    bitmap = bloom_bitmap(keys, key_col, m_bits)
    if how == "semi":
        # staged probes: bloom negatives drop at probe 0, never pay probe 1
        maybe = bloom_prefilter(big, bitmap, key_col, m_bits)
        return maybe.join(keys, key_col, join_how)
    maybe, definite_out = bloom_split(big, bitmap, key_col, m_bits)
    return maybe.join(keys, key_col, join_how).unionByName(definite_out)
