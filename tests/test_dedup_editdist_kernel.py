"""The Arrow-batched banded-Levenshtein verify kernel (round 9).

``dedup.banded_editdist_batch`` replaced the interpreted
``levenshtein(a, b, bound)`` expression on the SNM candidate stream
(r8 diagnosis: ~1.7 ms/pair, no plan change could win).  These tests pin:

1. the kernel's contract against a reference Wagner-Fischer DP —
   values ≤ bound are EXACT, values > bound are genuinely over-bound
   (hypothesis fuzz over adversarial small alphabets);
2. ``editdist_pairs(verify_kernel="arrow")`` ≡ the original declarative
   ``"expr"`` path row-for-row on a Spark fixture (the oracle twin is
   unchanged — the sweep gates the arrow path end to end);
3. the plan stays Arrow-batched: MapInPandas, never row-at-a-time
   BatchEvalPython.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tax_compliance_engine_spark.operators import dedup


def ref_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


@settings(max_examples=200, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.text(alphabet="ab0", max_size=32),
            st.text(alphabet="ab0", max_size=32),
        ),
        min_size=1,
        max_size=20,
    ),
    bound=st.integers(min_value=1, max_value=20),
)
def test_banded_kernel_matches_reference(pairs, bound):
    """≤ bound ⇒ exact distance; > bound ⇒ reference is also > bound.

    The 3-char alphabet concentrates mass on near-identical strings —
    the regime where band boundaries, the j=0 column and the early
    abort all get exercised."""
    d = dedup.banded_editdist_batch(
        [p[0] for p in pairs], [p[1] for p in pairs], bound
    )
    for i, (a, b) in enumerate(pairs):
        t = ref_levenshtein(a, b)
        if t <= bound:
            assert d[i] == t, (a, b, bound, t, int(d[i]))
        else:
            assert d[i] > bound, (a, b, bound, t, int(d[i]))


def test_banded_kernel_edges():
    cases = [
        ("", ""),
        ("a", ""),
        ("", "b"),
        ("abc", "abc"),
        ("a" * 30, "a" * 29 + "b"),
        ("abcdef", "fedcba"),
        ("a" * 40, "b" * 40),  # far over any small bound
    ]
    d = dedup.banded_editdist_batch(
        [c[0] for c in cases], [c[1] for c in cases], 5
    )
    expected_exact = [0, 1, 1, 0, 1, None, None]
    for i, exp in enumerate(expected_exact):
        if exp is None:
            assert d[i] > 5
        else:
            assert d[i] == exp


@pytest.fixture(scope="module")
def noisy_docs(spark):
    """Docs with typo families: same 30-char stem, small char edits —
    SNM sorts them adjacent, the verify must score them exactly."""
    rows = []
    import random

    rng = random.Random(11)
    for fam in range(40):
        stem = "".join(
            rng.choice("abcdefghij") for _ in range(30)
        ) + "".join(rng.choice("klmnopqrst") for _ in range(30))
        for v in range(4):
            s = list(stem)
            for _ in range(v):  # v char substitutions
                pos = rng.randrange(len(s))
                s[pos] = rng.choice("uvwxyz")
            rows.append((fam * 10 + v, "".join(s)))
    # plus unrelated strings and degenerate rows
    for i in range(50):
        rows.append(
            (9000 + i, "".join(rng.choice("0123456789") for _ in range(60)))
        )
    rows.append((9990, ""))
    rows.append((9991, "!!!"))  # normalizes to empty
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_arrow_equals_expr_kernel(noisy_docs):
    arrow = dedup.editdist_pairs(
        noisy_docs, prefix_len=64, threshold=0.8
    ).collect()
    expr = dedup.editdist_pairs(
        noisy_docs, prefix_len=64, threshold=0.8, verify_kernel="expr"
    ).collect()
    assert len(arrow) > 0  # the typo families must actually match
    assert sorted(map(tuple, arrow)) == sorted(map(tuple, expr))


def test_unknown_kernel_rejected(noisy_docs):
    with pytest.raises(ValueError, match="verify_kernel"):
        dedup.editdist_pairs(noisy_docs, verify_kernel="nope")


def test_arrow_plan_is_mapinpandas_not_batcheval(noisy_docs):
    plan = dedup.editdist_pairs(noisy_docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
