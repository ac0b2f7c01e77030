"""Round-13 probe: the checkpoint READ path at 10^7 files (SCALE_r13 §2
ceiling).  The sidecar is constructed directly in Arrow (vectorized —
planting a 4 GB JSON v1 would measure JSON, not the read path) and
registered under a planted empty-files v1 JSON, which resolution
ignores in favor of the sidecar root."""
import sys, os, json, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from df_to_azure_spark import get_spark
from df_to_azure_spark.operators.ckpt import ckpt_to_bytes
from df_to_azure_spark.operators.manifest import VersionedLake, _V_WIDTH

spark = get_spark(cpus=8, shuffle_partitions=8)
n = 10**7

t0 = time.time()
ids = pa.array(np.arange(n, dtype=np.int64))
rel = pc.binary_join_element_wise(
    pa.array(["files/c"] * n),
    pc.utf8_lpad(pc.cast(ids, pa.string()), 9, "0"),
    pa.array(["-part-00000-0123456789abcdef-c000.snappy.parquet"] * n),
    "",
)
mn_k = pc.multiply(ids, 100000)
mx_k = pc.add(mn_k, 99999)
zeros = pa.array(np.zeros(n, dtype=np.int64))
rows = pa.array(np.full(n, 100000, dtype=np.int64))
date_mn = pa.array(["1995-01-01 00:00:00.000000"] * n)
date_mx = pa.array(["1995-12-31 00:00:00.000000"] * n)
tbl = pa.table(
    {
        "rel": rel, "rows": rows,
        "mn:o_orderkey": mn_k, "mx:o_orderkey": mx_k, "nl:o_orderkey": zeros,
        "mn:o_orderdate": date_mn, "mx:o_orderdate": date_mx, "nl:o_orderdate": zeros,
    }
)
t1 = time.time()
root = tempfile.mkdtemp()
lake = VersionedLake(spark, root)
os.makedirs(f"{root}/t/_manifests", exist_ok=True)
schema_json = json.dumps({"type": "struct", "fields": [
    {"name": "o_orderkey", "type": "long", "nullable": True, "metadata": {}},
    {"name": "o_orderdate", "type": "timestamp", "nullable": True, "metadata": {}}]})
with open(f"{root}/t/_manifests/v{1:0{_V_WIDTH}d}.json", "w") as fh:
    json.dump({"version": 1, "op": "create", "files": [], "partition_by": [],
               "dict_columns": [], "schema": schema_json, "batch_ids": [],
               "committed_ms": 0}, fh)
t2 = time.time()
data = ckpt_to_bytes(tbl)
with open(f"{root}/t/_manifests/v{1:0{_V_WIDTH}d}.ckpt.parquet", "wb") as fh:
    fh.write(data)
t3 = time.time()

cold = VersionedLake(spark, root)
t4 = time.time()
m = cold.resolve_manifest("t", 1)
t5 = time.time()
kept, total = cold._prune(
    m, cold._normalize_predicates([("o_orderkey", "between", (5_000_000, 6_000_000))])
)
t6 = time.time()
# steady-state checkpoint advance at this size: one removed + one added
from df_to_azure_spark.operators.ckpt import ckpt_advance
from pyspark.sql import types as T
schema = T.StructType.fromJson(json.loads(schema_json))
first_rel = m["ckpt_table"].column("rel")[0].as_py()
t7 = time.time()
nxt = ckpt_advance(m["ckpt_table"], {first_rel}, ["files/new.parquet"],
                   {"files/new.parquet": {"rows": 5, "cols": {}}}, schema, [])
data2 = ckpt_to_bytes(nxt)
t8 = time.time()
print(json.dumps({
    "n_files": n, "build_arrow_s": round(t1 - t0, 2),
    "serialize_s": round(t3 - t2, 2), "ckpt_mb": round(len(data) / 1e6, 1),
    "cold_resolve_s": round(t5 - t4, 2), "scan_plan_s": round(t6 - t5, 3),
    "kept": len(kept), "total": total,
    "ckpt_advance_plus_serialize_s": round(t8 - t7, 2),
}))
shutil.rmtree(root)
