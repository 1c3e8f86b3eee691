"""Local replica of the driver's correctness gate: run each Spark query and
its DuckDB oracle on the same sf dir, compare row count + sorted values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import os

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from dedoc_spark.plans.driver_queries import ORACLES, QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            rel = con.sql(sql)
            d_cols = [c.lower() for c in rel.columns]
            d_rows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue

        _, s_norm = norm_rows([c.lower() for c in s_cols], s_rows)
        _, d_norm = norm_rows(d_cols, d_rows)
        if sorted(c.lower() for c in s_cols) != sorted(d_cols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}")
            failures.append(name)
        elif len(s_norm) != len(d_norm):
            print(f"{name}: ROWCOUNT spark={len(s_norm)} duck={len(d_norm)}")
            failures.append(name)
        elif s_norm != d_norm:
            diff = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
            print(f"{name}: VALUE MISMATCH ({len(s_norm)} rows); first diffs: {diff}")
            failures.append(name)
        else:
            print(f"{name}: OK ({len(s_norm)} rows)")

    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
