"""Capture .explain('formatted') for EVERY headline query (current
HEAD) into plans/r15/current/<name>.txt, plus a one-line shape summary
(Exchange count, join strategies, Python-boundary nodes, scan count)
per query on stdout.

Eager queries (lake builds, pinned frames) execute their build side
during construction; the capture is about plan SHAPE, not timing.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from df_to_azure_spark.plans.registry import headline_queries
    from df_to_azure_spark.session import get_spark

    spark = get_spark(app_name="plan_sweep_r15")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r15" / "current"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, fn in headline_queries().items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
            (out_dir / f"{name}.txt").write_text(
                f"== {name} @ {sf_dir} (HEAD, round 15) ==\n" + txt
            )
            n_ex = len(re.findall(r"\bExchange\b", txt))
            joins = sorted(set(re.findall(
                r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)\b", txt)))
            pyn = sorted(set(re.findall(
                r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                r"FlatMapGroupsInPandas|MapInArrow)\b", txt)))
            scans = len(re.findall(r"Scan parquet", txt))
            rdd = len(re.findall(r"Scan ExistingRDD", txt))
            print(f"{name}\tExchange={n_ex}\tscans={scans}\tpinned={rdd}\t"
                  f"joins={','.join(joins) or '-'}\tpy={','.join(pyn) or '-'}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            print(f"{name}\tERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
