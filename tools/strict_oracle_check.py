"""Stricter local stand-in for the driver's value-hash gate.

The plain ``oracle_check`` compares ``str(value)`` which hides exactly the
divergences that sank 4 queries in round 1 (DuckDB HUGEINT vs Spark BIGINT,
DECIMAL wire forms, TIMESTAMP_NS).  This checker compares the *pandas*
materialization of both sides — dtype-for-dtype and value-for-value — so any
engine-level output-type mismatch shows up locally before the driver sees it.

Usage: python tools/strict_oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    """Canonical repr of one cell, dtype-sensitive where it matters."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # numpy scalars → python
    if hasattr(v, "item") and not isinstance(v, (list, tuple, dict)):
        try:
            return canon_cell(v.item())
        except (ValueError, AttributeError):
            pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def frame_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(canon_cell(v) for v in row))
    out.sort()
    return out


def check(name, spark_df, duck_rel) -> list[str]:
    problems: list[str] = []
    s_pdf = spark_df.toPandas()
    d_pdf = duck_rel.df()
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return [f"columns: spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}"]
    if len(s_pdf) != len(d_pdf):
        problems.append(f"row count: spark={len(s_pdf)} duck={len(d_pdf)}")
    for c in sorted(s_pdf.columns):
        sd, dd = str(s_pdf[c].dtype), str(d_pdf[c].dtype)
        # pandas timestamp resolution (ns vs us) is a materialization detail,
        # not an engine output type — round 1 proved the driver's hash is
        # insensitive to it (every timestamp-emitting query hash-matched).
        if sd.startswith("datetime64") and dd.startswith("datetime64"):
            continue
        if sd != dd:
            problems.append(f"dtype[{c}]: spark={sd} duck={dd}")
    s_rows, d_rows = frame_rows(s_pdf), frame_rows(d_pdf)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:2]
        problems.append(f"values differ; first diffs: {diffs}")
    return problems


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from df_to_azure_spark.plans.registry import REGISTRY
    from df_to_azure_spark.session import get_spark, release_pins

    spark = get_spark(app_name="strict_oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    passed, failed, rows_only = [], [], []
    results: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                rows_only.append(name)
                results[name] = {"status": "rows_only", "rows": n}
                print(f"  {name}: rows-only, {n} rows")
                continue
            problems = check(name, sdf, con.sql(spec.oracle))
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"]
        if problems:
            failed.append(name)
            results[name] = {"status": "FAIL", "problems": problems}
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            passed.append(name)
            results[name] = {"status": "ok"}
            print(f"  ok {name}")
        # pin hygiene (round 15): a 367-entry session otherwise
        # accumulates dead localCheckpoint blocks that tax later entries
        release_pins(spark)

    print(f"\n{len(passed)} passed, {len(failed)} FAILED, {len(rows_only)} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "passed": len(passed),
                    "failed": len(failed),
                    "rows_only": len(rows_only),
                    "results": results,
                },
                f,
                indent=1,
            )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
