"""Local stand-in for the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB over the same parquet tables,
compare row-count + column names + order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is None:
        return "NULL"
    return str(v)


def row_key(row, cols_order):
    return tuple(normalize(row[i]) for i in cols_order)


def compare(name, spark_df, duck_rel) -> list[str]:
    problems = []
    s_cols = list(spark_df.columns)
    d_cols = [d[0] for d in duck_rel.description]
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = duck_rel.fetchall()
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    # align column order by sorted names
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    s_set = sorted(row_key(r, s_order) for r in s_rows)
    d_set = sorted(row_key(r, d_order) for r in d_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
        only_s = [r for r in s_set[:2000] if r not in set(d_set)][:3]
        problems.append(f"values differ; first aligned diffs: {diffs}; spark-only: {only_s}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from df_to_azure_spark.plans.registry import REGISTRY
    from df_to_azure_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    passed, failed, skipped = [], [], []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                print(f"  {name}: rows-only check, {n} rows")
                (passed if n >= 0 else failed).append(name)
                skipped.append(name)
                continue
            problems = compare(name, sdf, con.sql(spec.oracle))
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"]
        if problems:
            failed.append(name)
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            passed.append(name)
            print(f"  ok {name}")

    print(f"\n{len(passed)} passed, {len(failed)} FAILED, {len(skipped)} rows-only")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
