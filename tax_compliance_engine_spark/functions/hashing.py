"""Portable hashing primitives shared by the dedup/similarity operators.

Two tiers:

- ``tok_hash_col``: a polynomial rolling hash ((h*31 + ascii) mod P) built
  from pure Column lambdas.  Bit-identical to the DuckDB oracle's
  ``list_reduce`` fold, so every hash-based operator stays oracle-checkable.
- production tier: swap in ``F.xxhash64`` (Spark-only, 64-bit, faster); the
  operators take a ``hash_col`` factory so the swap is one argument.

The MinHash permutation constants (a_i, b_i) and SimHash parameters are
fixed numbers shared with the SQL generator — no RNG at runtime, fully
deterministic across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007  # fits the (h*31 + a) fold comfortably in int64

# 16 fixed (a, b) permutation pairs for MinHash: h_i(x) = (a*x + b) mod P.
# Odd multipliers, arbitrary fixed offsets (seeded once, hardcoded forever).
MINHASH_PERMS: list[tuple[int, int]] = [
    (387421573, 123456791),
    (976369421, 987654323),
    (193877777, 192837465),
    (542918101, 564738291),
    (874296233, 102938475),
    (659128867, 675849302),
    (312771997, 111111113),
    (788120773, 222222227),
    (456789121, 333333331),
    (998244353, 444444443),
    (611953727, 555555557),
    (285714293, 666666667),
    (714285719, 777777779),
    (161803399, 888888883),
    (271828183, 999999937),
    (141421357, 121212121),
]
MINHASH_BANDS = 4  # 4 bands x 4 rows

SIMHASH_BITS = 30  # tok_hash range is < 2^30
SIMHASH_BAND_BITS = 8
SIMHASH_MAX_HAMMING = 6


def tok_hash_col(tok: Column) -> Column:
    """Polynomial fold over the token's characters, mod HASH_MOD.

    Spark:  aggregate(sequence(1, len), 0L, (h, i) -> (h*31 + ascii(substr)))
    DuckDB: list_reduce(list_prepend(0, list_transform(range ...)), ...)
    Both fold left-to-right from 0 — identical integers.
    """
    return F.aggregate(
        F.sequence(F.lit(1), F.length(tok)),
        F.lit(0).cast("long"),
        lambda h, i: (h * 31 + F.ascii(tok.substr(i, F.lit(1)))) % HASH_MOD,
    )
