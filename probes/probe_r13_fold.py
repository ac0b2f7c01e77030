import sys, json, time, tempfile, shutil
import os
sys.path.insert(0, "/root/repo"); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_r13_lib import spark, synth_table
from df_to_azure_spark.operators.manifest import VersionedLake

n = 10**6
root = tempfile.mkdtemp()
lakeA = VersionedLake(spark, root, checkpoint_interval=2)
schema_json = synth_table(lakeA, "t", n)
lakeA._commit_delta("t", ["files/zz2-p.parquet"], [], [], schema_json, 1, [],
                    stats={"files/zz2-p.parquet": {"rows": 1, "cols": {}}}, op="append")  # v2 sidecar
lakeB = VersionedLake(spark, root, checkpoint_interval=1000)
for v in range(3, 22):  # 19 deltas
    lakeB._commit_delta("t", [f"files/zz{v}-p.parquet"], [], [], schema_json, v-1, [],
                        stats={f"files/zz{v}-p.parquet": {"rows": 1, "cols": {}}}, op="append")
cold = VersionedLake(spark, root, checkpoint_interval=1000)
t0 = time.time()
m = cold.resolve_manifest("t", 21)
t1 = time.time()
kept, total = cold._prune(m, cold._normalize_predicates([("o_orderkey", "between", (5_000_000, 6_000_000))]))
t2 = time.time()
print(json.dumps({"chain": "sidecar_root+19_deltas", "n_files": total,
                  "cold_resolve_s": round(t1-t0,2), "scan_plan_s": round(t2-t1,3),
                  "kept": len(kept)}))
shutil.rmtree(root)
