"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through full computation with the `noop` datasource
writer (count() alone would let Catalyst prune most of the work).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    "tax_calc",
    "tax_state_summary",
    "refund_records",
    "refund_claims",
    "nexus_status",
    "filing_calendar",
    "pricing_summary",
    "top_customers",
    "customer_order_ranks",
    "events_sessions",
    # training-data pipeline ops
    "doc_text_stats",
    "doc_tfidf_top_terms",
    "dedup_minhash_pairs",
    "dedup_minhash_est_pairs",
    "corpus_decontaminate",
    "knn_bruteforce",
    "ivf_knn_portable",
    "embedding_dup_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry
    from tax_compliance_engine_spark.plans import queries as q
    from tax_compliance_engine_spark.plans import queries_dataops as qd
    from tax_compliance_engine_spark.session import get_spark

    spark = get_spark(app_name="tce-bench")
    # Same resolution rule as scripts/check_oracle.py: names folded into
    # driver-slot composites still bench under their original workload
    # (keeps the headline set comparable across rounds).
    queries = dict(entry.queries())
    for name in BENCH_QUERIES:
        if name not in queries:
            queries[name] = getattr(q, name, None) or getattr(qd, name)

    # Warm the JVM/session on the smallest sf so first-query JIT/codegen/
    # broadcast-planning overhead doesn't pollute the sf-scale measurement.
    for name in BENCH_QUERIES:
        queries[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        # min of 2 runs: steady-state timing, robust to one-off GC/IO stalls
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
