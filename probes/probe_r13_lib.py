"""Shared builder for the round-13 checkpoint probes: a synthetic
manifest chain planted directly (no data files) so only the manifest
machinery is measured."""
"""SCALE_r13 measurement: VersionedLake checkpoint + scan planning at
10^5 and 10^6 synthetic files — parquet sidecar vs legacy JSON."""
import sys, json, os, time, tempfile, shutil
sys.path.insert(0, "/root/repo")  # run from anywhere
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

