"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall seconds.

Each query is fully materialized through the noop sink (forces every
operator to execute; no driver-side collect cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from df_to_azure_spark.plans.registry import headline_queries
    from df_to_azure_spark.session import get_spark, release_pins

    spark = get_spark(app_name="bench")

    times: dict[str, float] = {}
    for name, fn in headline_queries().items():
        # first run warms codegen/AQE/classloading for this plan; the
        # steady-state number is the MEDIAN of three timed runs — robust
        # to the one-off scheduler/GC spike a min would hide and the
        # shared-box contention a single run would absorb (round-3
        # lesson: sub-second deltas were pure run variance)
        materialize(fn(spark, sf_dir))
        release_pins(spark)
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            samples.append(time.monotonic() - t0)
            # pin lifecycle (round-15 measurement fix, declared in
            # OPTIMIZATION_r15.md): each run's localCheckpoint pins are
            # garbage once the run's output is materialized, but the
            # ContextCleaner frees them far too lazily for a 45-query x 4-run
            # session — dead storage blocks accumulate and tax every LATER
            # query's numbers.  Releasing between runs keeps each timed run
            # self-contained: pin CREATION still happens (and is timed)
            # inside every run; only the previous run's dead blocks go.
            release_pins(spark)
        times[name] = round(sorted(samples)[1], 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
