"""Time a named subset of headline queries at an arbitrary data dir —
the SF-scalable evidence path (round-15, VERDICT item 3).  Same
methodology as bench.py (noop sink, 1 warm-up + median of 3, pins
released between runs) so numbers are comparable per-query; meant for
the 10x synthesized dir from tools/scale_probe.py.

Usage:
    python probes/bench_subset_r15.py DATA_DIR query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from df_to_azure_spark.plans.registry import headline_queries
    from df_to_azure_spark.session import get_spark, release_pins

    spark = get_spark(app_name="bench_subset_r15")
    hq = headline_queries()
    times: dict[str, float] = {}
    for name in names:
        fn = hq[name]
        spark.sparkContext.setJobDescription(f"subset {name}")
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        release_pins(spark)
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.monotonic() - t0)
            release_pins(spark)
        times[name] = round(sorted(samples)[1], 3)
        print(f"{name}: {times[name]}", flush=True)
    print(json.dumps({"dir": sf_dir, "queries": times}))


if __name__ == "__main__":
    main()
