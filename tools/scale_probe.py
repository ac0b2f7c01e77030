"""Scale probe: synthesize a k× copy of a testdata directory and run the
headline bench against it.

The point is evidence, not a benchmark record: every headline plan must
complete at k× the graded scale factor with the same session settings —
no broadcast OOM, no single-task collapse, no quadratic blowup.  Key
columns are shifted per copy so foreign-key joins stay consistent and
the key space really grows (a naive union would multiply duplicate keys
and silently change join cardinalities).  Bounded dims (region, nation)
are NOT scaled — that is exactly their 100 TB behavior.

Usage:
  python tools/scale_probe.py [k] [src_dir] [dst_dir]
  SPARK_GRAFT_SF_DIR=<dst_dir> python bench.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

# table → columns sharing that table's key domain (child FKs shift with it)
KEY_DOMAINS = {
    "customer": {"customer": "c_custkey", "orders": "o_custkey"},
    "supplier": {"supplier": "s_suppkey", "lineitem": "l_suppkey"},
    "part": {"part": "p_partkey", "lineitem": "l_partkey"},
    "orders": {"orders": "o_orderkey", "lineitem": "l_orderkey"},
    "events": {"events": "event_id"},
    "documents": {"documents": "doc_id"},
    "embeddings": {"embeddings": "vec_id"},
}
SCALED = ["customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]
BOUNDED = ["region", "nation"]
SHIFT = 100_000_000  # beyond any key in the source data


def scaled_copy(spark, src: str, dst: str, k: int) -> None:
    shifts: dict[str, dict[str, object]] = {t: {} for t in SCALED}
    for domain, users in KEY_DOMAINS.items():
        for table, col in users.items():
            shifts[table][col] = True

    for t in BOUNDED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    for t in SCALED:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(k):
            c = df
            for col in shifts[t]:
                c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_probe"
    from df_to_azure_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    scaled_copy(spark, src, dst, k)
    n = spark.read.parquet(f"{dst}/lineitem.parquet").count()
    print(f"wrote {dst} at {k}x: lineitem rows = {n}")


if __name__ == "__main__":
    main()
