"""Interleaved A/B probe harness for round-15 optimization work.

Usage:
    python probes/ab_r15.py MODULE:FUNC_OLD MODULE:FUNC_NEW [reps] [sf_dir]

Both functions must have the (spark, sf_dir) -> DataFrame signature.
One Spark session; warm-up of both variants; `reps` alternating timed
runs through the noop sink; medians compared; row-identity checked
(sorted collected rows).  Ratios within one session are the only
numbers treated as evidence on this noisy VM (see OPTIMIZATION_r15.md).
"""

from __future__ import annotations

import importlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load(spec: str):
    mod, fn = spec.split(":")
    return getattr(importlib.import_module(mod), fn)


def main() -> None:
    old_spec, new_spec = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from df_to_azure_spark.session import get_spark, release_pins

    spark = get_spark(app_name="ab_r15")
    old_fn, new_fn = _load(old_spec), _load(new_spec)

    def mat(fn, label):
        spark.sparkContext.setJobDescription(label)
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        spark.sparkContext.setJobDescription(None)

    def timed(fn, label):
        t0 = time.monotonic()
        mat(fn, label)
        dt = time.monotonic() - t0
        # match bench.py's round-15 pin lifecycle: dead blocks released
        # BETWEEN runs, outside the timed window
        release_pins(spark)
        return dt

    # row identity first (also serves as warm-up)
    rows_old = sorted(map(tuple, old_fn(spark, sf_dir).collect()))
    rows_new = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
    print(f"rows_equal {rows_old == rows_new}  n={len(rows_old)}/{len(rows_new)}", flush=True)
    release_pins(spark)

    olds, news = [], []
    for i in range(reps):
        olds.append(timed(old_fn, f"AB old #{i}"))
        news.append(timed(new_fn, f"AB new #{i}"))
        print(f"rep{i}: old={olds[-1]:.2f}s new={news[-1]:.2f}s", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(f"OLD samples={['%.2f' % x for x in olds]} median={med(olds):.2f}")
    print(f"NEW samples={['%.2f' % x for x in news]} median={med(news):.2f}")
    print(f"ratio new/old = {med(news) / med(olds):.3f}")


if __name__ == "__main__":
    main()
