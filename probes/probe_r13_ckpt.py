"""SCALE_r13 measurement: VersionedLake checkpoint + scan planning at
10^5 and 10^6 synthetic files — parquet sidecar vs legacy JSON."""
import sys, json, os, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
from df_to_azure_spark import get_spark
from df_to_azure_spark.operators.manifest import VersionedLake, _V_WIDTH

spark = get_spark(cpus=8, shuffle_partitions=8)

def synth_table(lake, table, n_files, interval_fill=True):
    """Plant a synthetic manifest chain: v1 full JSON listing n_files
    with stats (simulating a long-lived table), then one real-ish append
    delta v2..;  we only measure manifest machinery, no data files."""
    os.makedirs(f"{lake.root}/{table}/_manifests", exist_ok=True)
    files, stats = [], {}
    for i in range(n_files):
        rel = f"files/c{i:09d}-part-{i%100:05d}-0123456789abcdef-c000.snappy.parquet"
        files.append(rel)
        stats[rel] = {"rows": 100000, "cols": {
            "o_orderkey": {"mn": i*100000, "mx": (i+1)*100000-1, "nl": 0},
            "o_orderdate": {"mn": f"19{92+(i%7)}-01-01 00:00:00.000000", "mx": f"19{92+(i%7)}-12-31 00:00:00.000000", "nl": 0},
            "o_totalprice": {"mn": 857.71, "mx": 555285.16, "nl": 0},
            "o_orderstatus": {"mn": "F", "mx": "P", "nl": 0, "vals": ["F","O","P"]},
        }}
    schema_json = json.dumps({"type":"struct","fields":[
        {"name":"o_orderkey","type":"long","nullable":True,"metadata":{}},
        {"name":"o_orderdate","type":"timestamp","nullable":True,"metadata":{}},
        {"name":"o_totalprice","type":"double","nullable":True,"metadata":{}},
        {"name":"o_orderstatus","type":"string","nullable":True,"metadata":{}}]})
    doc = {"version":1,"op":"create","files":files,"partition_by":[],
           "dict_columns":["o_orderstatus"],"schema":schema_json,
           "batch_ids":[],"committed_ms":int(time.time()*1000),"stats":stats}
    with open(f"{lake.root}/{table}/_manifests/v{1:020d}.json","w") as fh:
        json.dump(doc, fh, separators=(",",":"))
    return schema_json

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
