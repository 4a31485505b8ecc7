"""Scale-curve evidence: measure the heaviest queries at sf0.1 and at a
generated 10× scale-up (≈sf1) and report the wall-clock growth ratio.

The plan audit (tests/test_plan_audit.py) proves the plan SHAPES are
scale-safe; this script provides the measured datapoint: per-query sec at
1× vs 10× input, flagged when growth exceeds 13× (1.3× per-row cost) —
the 'no super-linear query' bar from the round-4 verdict.

The 10× dataset is constructed so the WORKLOAD scales linearly by design
(otherwise the data, not the plan, would dominate the curve):
- documents: 10 copies, ids offset, every token prefixed with a
  copy-unique tag — token spaces are disjoint across copies, so near-dup
  structure (pairs, candidates, vocab shape) replicates per copy instead
  of exploding quadratically across copies;
- embeddings: 10 copies, ids offset, each copy's vectors multiplied by a
  copy-specific pseudorandom ±1 sign pattern — an orthogonal transform
  that preserves intra-copy cosines exactly while decorrelating copies;
- orders: 10 copies with offset order keys (uniform modulo-derived
  attributes stay uniform).

Usage: python scripts/scale_curve.py [workdir]  (default /tmp/tce_sf1)
Writes the scaled parquet under workdir (deleted and rebuilt each run)
and prints one JSON line with both timings per query.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
COPIES = 10

SCALE_QUERIES = [
    "tax_state_summary",
    "refund_claims",
    "doc_repetition",
    "doc_tfidf_top_terms",
    "dedup_minhash_pairs",
    "dedup_minhash_est_pairs",
    "embedding_dup_pairs",
    "ivf_knn_portable",
]


def build_scaled(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    orders = spark.read.parquet(f"{BASE}/orders.parquet")

    doc_parts, emb_parts, ord_parts = [], [], []
    for k in range(COPIES):
        tag = f"c{k}_"
        retok = F.concat(
            F.lit(tag), F.replace(F.col("text"), F.lit(" "), F.lit(f" {tag}"))
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + k * 10**9).alias("doc_id"),
                retok.alias("text"),
                "lang",
                "source",
                F.length(retok).alias("n_chars"),
            )
        )
        # ±1 sign per (copy, dim): pmod of an LCG mix, ~balanced, fixed
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + k * 10**9).alias("vec_id"),
                F.expr(
                    f"transform(embedding, (x, i) -> x * (1 - 2 * (pmod({k} * 2654435761 + i * 97, 127) % 2)))"
                ).alias("embedding"),
                "label",
            )
        )
        ord_parts.append(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + k * 10**10
            )
        )

    def union_all(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    out = Path(out_dir)
    union_all(doc_parts).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    union_all(emb_parts).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )
    union_all(ord_parts).write.mode("overwrite").parquet(
        str(out / "orders.parquet")
    )


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tce_sf1"
    shutil.rmtree(workdir, ignore_errors=True)

    import __spark_entry__ as entry
    from tax_compliance_engine_spark.plans import queries as q
    from tax_compliance_engine_spark.plans import queries_dataops as qd
    from tax_compliance_engine_spark.session import get_spark

    spark = get_spark(app_name="tce-scale-curve")
    queries = dict(entry.queries())
    for name in SCALE_QUERIES:
        if name not in queries:
            queries[name] = getattr(q, name, None) or getattr(qd, name)

    build_scaled(spark, workdir)

    def run(fn, sf_dir):
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    results = {}
    for name in SCALE_QUERIES:
        fn = queries[name]
        fn(spark, WARM).write.format("noop").mode("overwrite").save()  # warm
        t1 = run(fn, BASE)
        t10 = run(fn, workdir)
        ratio = round(t10 / t1, 2) if t1 else None
        results[name] = {
            "sf0.1_sec": t1,
            "sf1_sec": t10,
            "ratio": ratio,
            "flag": bool(ratio and ratio > 13.0),
        }
        print(f"{name}: {t1}s -> {t10}s  (x{ratio})", file=sys.stderr)

    print(json.dumps({"copies": COPIES, "queries": results}))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
