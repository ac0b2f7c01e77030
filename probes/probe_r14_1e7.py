"""Round-14 probe: DISTRIBUTED checkpoint planning at 10^7 files
(SCALE_r14 — verdict gap #3).  Same planted sidecar as probe_r13_1e7;
measured twice: the round-13 driver path (threshold forced above n) and
the round-14 lazy+distributed path (default threshold), cold instances
each time."""
import sys, os, json, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from df_to_azure_spark import get_spark
from df_to_azure_spark.operators.ckpt import ckpt_to_bytes
from df_to_azure_spark.operators.manifest import VersionedLake, _V_WIDTH

spark = get_spark(cpus=8, shuffle_partitions=8)
n = int(os.environ.get("PROBE_N", 10**7))

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
tbl = pa.table(
    {
        "rel": rel, "rows": rows,
        "mn:o_orderkey": mn_k, "mx:o_orderkey": mx_k, "nl:o_orderkey": zeros,
        "mn:o_orderdate": pa.array(["1995-01-01 00:00:00.000000"] * n),
        "mx:o_orderdate": pa.array(["1995-12-31 00:00:00.000000"] * n),
        "nl:o_orderdate": zeros,
    }
)
root = tempfile.mkdtemp()
os.makedirs(f"{root}/t/_manifests", exist_ok=True)
schema_json = json.dumps({"type": "struct", "fields": [
    {"name": "o_orderkey", "type": "long", "nullable": True, "metadata": {}},
    {"name": "o_orderdate", "type": "timestamp", "nullable": True, "metadata": {}}]})
with open(f"{root}/t/_manifests/v{1:0{_V_WIDTH}d}.json", "w") as fh:
    json.dump({"version": 1, "op": "create", "files": [], "partition_by": [],
               "dict_columns": [], "schema": schema_json, "batch_ids": [],
               "committed_ms": 0}, fh)
data = ckpt_to_bytes(tbl)
with open(f"{root}/t/_manifests/v{1:0{_V_WIDTH}d}.ckpt.parquet", "wb") as fh:
    fh.write(data)
del tbl, ids, rel, mn_k, mx_k, zeros, rows

out = {"n_files": n, "ckpt_mb": round(len(data) / 1e6, 1)}
preds = [("o_orderkey", "between", (5_000_000 * 100000, 5_010_000 * 100000))]

# round-13 driver path: threshold above n forces eager materialization
drv = VersionedLake(spark, root, spark_prune_threshold=n + 1)
t0 = time.time(); m = drv.resolve_manifest("t", 1); t1 = time.time()
kept, total = drv._prune(m, drv._normalize_predicates(preds)); t2 = time.time()
out["driver_cold_resolve_s"] = round(t1 - t0, 2)
out["driver_scan_plan_s"] = round(t2 - t1, 3)
out["driver_kept"] = len(kept); out["driver_total"] = total

# round-14 distributed path: default threshold, cold instance
dist = VersionedLake(spark, root)
t0 = time.time(); m2 = dist.resolve_manifest("t", 1); t1 = time.time()
assert "ckpt_table" not in m2 and "ckpt_path" in m2
kept2, total2 = dist._prune(m2, dist._normalize_predicates(preds)); t2 = time.time()
# second plan on the warm session (JIT/shuffle service warmed)
kept3, _ = dist._prune(m2, dist._normalize_predicates(preds)); t3 = time.time()
out["dist_cold_resolve_s"] = round(t1 - t0, 3)
out["dist_scan_plan_cold_s"] = round(t2 - t1, 2)
out["dist_scan_plan_warm_s"] = round(t3 - t2, 2)
out["dist_kept"] = len(kept2); out["dist_total"] = total2
assert sorted(kept) == sorted(kept2) == sorted(kept3)
assert total == total2
print(json.dumps(out))
shutil.rmtree(root, ignore_errors=True)
