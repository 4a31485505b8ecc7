"""Local replica of the driver's t2 check: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB over the same parquet dir; compare
row counts, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from tax_compliance_engine_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = list(sdf.columns)
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK   {name}: rows-only ({len(spark_rows)} rows, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        if sorted(spark_cols) != sorted(duck_cols):
            print(
                f"FAIL {name}: columns differ\n  spark: {sorted(spark_cols)}\n  duck:  {sorted(duck_cols)}"
            )
            failures.append(name)
            continue
        if len(spark_rows) != len(duck_rows):
            print(
                f"FAIL {name}: row count {len(spark_rows)} (spark) vs {len(duck_rows)} (duck)"
            )
            failures.append(name)
            continue
        s_norm = norm_rows(spark_cols, spark_rows)
        d_norm = norm_rows(duck_cols, duck_rows)
        if s_norm != d_norm:
            ndiff = sum(1 for a, b in zip(s_norm, d_norm) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(s_norm)} rows differ; first diff:")
            for a, b in zip(s_norm, d_norm):
                if a != b:
                    print(f"  spark: {a}\n  duck:  {b}")
                    break
            failures.append(name)
        else:
            print(f"OK   {name}: {len(spark_rows)} rows match")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
