"""Round-13 probe: checkpoint commit / cold resolve / scan plan at
10^5 and 10^6 files, parquet sidecar vs legacy JSON (SCALE_r13 §2)."""
import sys, os, json, time, tempfile, shutil
sys.path.insert(0, '/root/repo'); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_r13_lib import spark, synth_table
from df_to_azure_spark.operators.manifest import VersionedLake

for n in (10**5, 10**6):

    for fmt in ("parquet", "json"):
        root = tempfile.mkdtemp()
        lake = VersionedLake(spark, root, checkpoint_interval=2, checkpoint_format=fmt)
        schema_json = synth_table(lake, "t", n)
        # commit an append delta v2 = CHECKPOINT version (interval=2)
        add = ["files/zzz-part-00000-new-c000.snappy.parquet"]
        astats = {add[0]: {"rows": 10, "cols": {"o_orderkey": {"mn": -10, "mx": -1, "nl": 0}}}}
        t0 = time.time()
        lake._commit_delta("t", add, [], [], schema_json, 1, [], stats=astats, op="append")
        t1 = time.time()
        # cold resolve + first scan plan
        lake2 = VersionedLake(spark, root, checkpoint_interval=2, checkpoint_format=fmt)
        t2 = time.time()
        m = lake2.resolve_manifest("t", 2)
        t3 = time.time()
        import datetime
        preds = lake2._normalize_predicates([("o_orderkey", "between", (5_000_000, 6_000_000))])
        t4 = time.time()
        kept, total = lake2._prune(m, preds)
        t5 = time.time()
        kept2, _ = lake2._prune(m, lake2._normalize_predicates([("o_orderstatus", "=", "G")]))
        t6 = time.time()
        sz = 0
        for name in os.listdir(f"{root}/t/_manifests"):
            if name.endswith(".ckpt.parquet") or (fmt=="json" and name.endswith("v"+"0"*18+"02.json")):
                sz = os.path.getsize(os.path.join(f"{root}/t/_manifests", name))
        print(json.dumps({"n_files": n, "format": fmt,
              "ckpt_commit_s": round(t1-t0,2), "cold_resolve_s": round(t3-t2,2),
              "range_prune_s": round(t5-t4,3), "kept_range": len(kept),
              "dict_prune_s": round(t6-t5,3), "kept_dict": len(kept2),
              "ckpt_size_mb": round(sz/1e6,1), "total": total}))
        shutil.rmtree(root)
