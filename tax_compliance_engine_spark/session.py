"""SparkSession factory with scale-ready defaults.

Defaults are tuned for correctness-first local runs but express the choices
that matter on a 1000-executor cluster: AQE on (runtime coalescing + skew-join
splitting), explicit shuffle partitioning, Arrow for the few pandas-UDF
operators, and ANSI mode off only because the reference semantics are
permissive (unknown states warn instead of raising — SURVEY §2 P4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tax-compliance-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime shuffle-partition coalescing + skew-join splitting.
        # State-keyed aggregations skew toward CA/TX/NY at 100 TB (SURVEY §4.2).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for the pandas-UDF escape hatches (similarity, multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch cap 4000 (default 10000): r14 measured the banded-
        # Levenshtein kernel ~5-15% faster at 4000 but deferred adoption
        # to an idle box; r15's interleaved A/B confirms it — 4000 won
        # all 6 editdist/er/png head-to-heads and 9 of 12 including the
        # binary decoders (the 3 losses all sat in one contended window).
        # Smaller batches are also the memory-safe direction for the
        # multi-MB binary cells the decoders move (guide §4.2: lower the
        # cap for large binary cells).  Env-overridable for cluster
        # tuning where rows are narrow and numeric.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_ARROW_MAX_RECORDS_PER_BATCH", "4000"),
        )
        # Dims are KB-sized; keep the default 10 MB broadcast threshold, but be
        # explicit that broadcasting is expected (we also mark joins F.broadcast).
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # Deterministic session timezone so date/timestamp semantics match the
        # DuckDB oracle regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # HotSpot never JIT-compiles methods over 8000 bytecode bytes
        # (-XX:DontCompileHugeMethods), but Spark only abandons
        # whole-stage codegen above 65535 — in the 8000-65535 window the
        # generated hot loop runs INTERPRETED, slower than Spark's own
        # fallback evaluator with subexpression elimination.  Aligning
        # the limit with HotSpot's makes Spark fall back exactly when
        # the JIT would have given up: measured 5.4× on the incremental
        # minhash screen (55 s → 10.2 s at 10× data, whose 16-component
        # estimate + first-shared-band residual blows past 8000 bytes).
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
