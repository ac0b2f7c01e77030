import json, time, os, tempfile

def synth_manifest(n_files):
    files, stats = [], {}
    for i in range(n_files):
        rel = f"files/abcdef{i:09d}-part-{i:05d}-0123456789abcdef-c000.snappy.parquet"
        files.append(rel)
        stats[rel] = {"rows": 100000, "cols": {
            "o_orderkey": {"mn": i*100000, "mx": (i+1)*100000-1, "nl": 0},
            "o_orderdate": {"mn": "1995-01-01 00:00:00.000000", "mx": "1995-01-02 00:00:00.000000", "nl": 0},
            "o_totalprice": {"mn": 857.71, "mx": 555285.16, "nl": 0},
            "o_orderstatus": {"mn": "F", "mx": "P", "nl": 0, "vals": ["F","O","P"]},
        }}
    return {"version": 12345, "op": "commit", "files": files,
            "partition_by": [], "dict_columns": ["o_orderstatus"],
            "schema": "{}", "batch_ids": [], "committed_ms": 1723800000000, "stats": stats}

for n in (10**5, 10**6):
    doc = synth_manifest(n)
    t0 = time.time(); payload = json.dumps(doc, separators=(",", ":")); t1 = time.time()
    path = os.path.join(tempfile.gettempdir(), f"ckpt_{n}.json")
    with open(path, "w") as fh: fh.write(payload)
    t2 = time.time()
    sz = os.path.getsize(path) / 1e6
    t3 = time.time(); parsed = json.loads(open(path).read()); t4 = time.time()
    # driver-side prune walk over the parsed stats (the scan() hot loop)
    t5 = time.time()
    kept = [r for r in parsed["files"] if parsed["stats"][r]["cols"]["o_orderkey"]["mn"] <= 500000]
    t6 = time.time()
    print(f"n={n}: dumps {t1-t0:.2f}s write {t2-t1:.2f}s size {sz:.0f}MB parse {t4-t3:.2f}s prune-walk {t6-t5:.2f}s")
