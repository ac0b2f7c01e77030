import sys, json, os, time, tempfile, shutil
import os
sys.path.insert(0, "/root/repo"); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_r13_lib import spark, synth_table
from df_to_azure_spark.operators.manifest import VersionedLake

n = 10**6
root = tempfile.mkdtemp()
lake = VersionedLake(spark, root, checkpoint_interval=2, checkpoint_format="parquet")
schema_json = synth_table(lake, "t", n)

def commit(v, expected):
    add = [f"files/zzz{v}-part-00000-new-c000.snappy.parquet"]
    astats = {add[0]: {"rows": 10, "cols": {"o_orderkey": {"mn": -10*v, "mx": -1, "nl": 0}}}}
    t0 = time.time()
    lake._commit_delta("t", add, [], [], schema_json, expected, [], stats=astats, op="append")
    return time.time() - t0

t2 = commit(2, 1)   # transition checkpoint (JSON-rooted): one-time cost
t3 = commit(3, 2)   # plain delta
t4 = commit(4, 3)   # steady-state checkpoint: advance from v2 sidecar
t5 = commit(5, 4)   # plain delta
t6 = commit(6, 5)   # steady-state checkpoint again
print(json.dumps({"n_files": n, "transition_ckpt_s": round(t2,2),
                  "delta_commit_s": round(t3,3),
                  "steady_ckpt_s": round(t4,2),
                  "delta2_s": round(t5,3), "steady_ckpt2_s": round(t6,2)}))
shutil.rmtree(root)
