"""Mechanism probe for the pin-accumulation tax (round 15, VERDICT
item 1): inside ONE Spark session — immune to the box drift that
confounds cross-run bench comparisons on this VM family — time an
UNRELATED query (q9_product_profit through the noop sink) in three
states:

  A. clean session (pins released),
  B. after accumulating N dead localCheckpoint pins (the state a long
     multi-query bench session reaches mid-run),
  C. after release_pins drains them.

If accumulated dead blocks tax unrelated queries, B > A ≈ C.

Usage: python probes/pin_tax_probe_r15.py [n_pins] [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    n_pins = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from df_to_azure_spark.plans.registry import REGISTRY
    from df_to_azure_spark.session import get_spark, release_pins

    spark = get_spark(app_name="pin_tax_probe")
    fn = REGISTRY["q9_product_profit"].spark

    def timed(label: str) -> list[float]:
        out = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{label} #{i}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            out.append(time.monotonic() - t0)
        spark.sparkContext.setJobDescription(None)
        return out

    med = lambda xs: sorted(xs)[len(xs) // 2]

    # warm the plan/JIT first so state A is steady
    timed("warmup")
    release_pins(spark)
    a = timed("A clean")

    # accumulate dead pins the way a long bench session does (small
    # frames — the tax is block-manager bookkeeping + GC pressure, not
    # data volume)
    junk = []
    for i in range(n_pins):
        junk.append(
            spark.range(2000).withColumn("v", F.col("id") * i).localCheckpoint()
        )
    b = timed("B accumulated")

    junk.clear()
    released = release_pins(spark)
    c = timed("C released")

    print(f"n_pins={n_pins} released={released}")
    print(f"A clean       samples={[f'{x:.2f}' for x in a]} median={med(a):.3f}")
    print(f"B accumulated samples={[f'{x:.2f}' for x in b]} median={med(b):.3f}")
    print(f"C released    samples={[f'{x:.2f}' for x in c]} median={med(c):.3f}")
    print(f"tax B/A = {med(b) / med(a):.3f}   recovery C/A = {med(c) / med(a):.3f}")


if __name__ == "__main__":
    main()
