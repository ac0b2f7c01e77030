"""Round-12 scale probes: manifest cost at >=10^4 live files, delta vs
full commit cost, resolution-chain read cost, zone-map file skipping on
a real zordered table, and the graph-ANN search 5x data probe.

Run: python probes/probe_r12_manifest.py   (writes JSON lines to stdout)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from df_to_azure_spark import get_spark  # noqa: E402
from df_to_azure_spark.operators.manifest import VersionedLake  # noqa: E402


def manifest_layer_probe(spark, tmp: str) -> None:
    """Pure manifest-layer cost (no data files needed for commit and
    resolution measurements): a table with N live file entries + stats,
    then (a) one O(delta) append commit, (b) one legacy-style full-list
    commit, (c) cold resolution at the longest chain the checkpoint
    interval allows."""
    for n_files in (10_000, 100_000):
        lake = VersionedLake(spark, f"{tmp}/m{n_files}", checkpoint_interval=20)
        table = "t"
        files = [f"files/c0-part-{i:07d}.parquet" for i in range(n_files)]
        stats = {
            r: {"rows": 1000, "cols": {"id": {"mn": i * 1000, "mx": i * 1000 + 999, "nl": 0}}}
            for i, r in enumerate(files)
        }
        schema = '{"type":"struct","fields":[{"name":"id","type":"long","nullable":true,"metadata":{}}]}'
        t0 = time.time()
        lake._commit(table, files, None, schema, None, [], stats=stats)
        t_full_initial = time.time() - t0

        # 18 delta appends of 8 files each (versions 2..19, none hits the
        # 20-interval checkpoint) — the steady-state commit cost
        t0 = time.time()
        for j in range(18):
            add = [f"files/c{j + 1}-part-{i:03d}.parquet" for i in range(8)]
            astats = {r: {"rows": 10, "cols": {}} for r in add}
            lake._commit_delta(
                table, add, [], None, schema, lake.current_version(table),
                [], stats=astats,
            )
        t_delta_each = (time.time() - t0) / 18

        # one legacy-style FULL commit of the same logical append (what
        # every append cost before round 12)
        m = lake.resolve_manifest(table, lake.current_version(table))
        add = ["files/cz-part-000.parquet"]
        t0 = time.time()
        lake._commit(
            table, sorted(set(m["files"]) | set(add)), None, schema,
            lake.current_version(table), [], stats=m["stats"],
        )
        t_full_append = time.time() - t0

        # cold resolution at the longest chain (fresh instance, v19 is
        # 18 deltas off the v1 checkpoint)
        lake2 = VersionedLake(spark, f"{tmp}/m{n_files}", checkpoint_interval=20)
        t0 = time.time()
        resolved = lake2.resolve_manifest(table, 19)
        t_resolve_cold = time.time() - t0
        # history stays O(retained versions)
        t0 = time.time()
        lake2.history(table).collect()
        t_history = time.time() - t0
        print(json.dumps({
            "probe": "manifest_layer",
            "live_files": n_files,
            "full_initial_commit_s": round(t_full_initial, 3),
            "delta_append_commit_s": round(t_delta_each, 4),
            "legacy_full_append_commit_s": round(t_full_append, 3),
            "cold_resolve_chain18_s": round(t_resolve_cold, 3),
            "history_20v_s": round(t_history, 3),
            "resolved_files": len(resolved["files"]),
        }))


def file_skipping_probe(spark, sf_dir: str, tmp: str) -> None:
    """Real-data skipping: orders clustered by o_orderdate, 32 files;
    report files read for a 6-month window and a point lookup."""
    import datetime

    lake = VersionedLake(spark, f"{tmp}/skip")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lake.create(orders, "orders", sort_by=["o_orderdate"], sort_files=32)
    t0 = time.time()
    n = lake.scan(
        "orders",
        [
            ("o_orderdate", ">=", datetime.datetime(1996, 1, 1)),
            ("o_orderdate", "<", datetime.datetime(1996, 7, 1)),
        ],
    ).count()
    t_range = time.time() - t0
    range_files = lake.last_scan_files
    t0 = time.time()
    full = lake.read("orders").where(
        "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'"
    ).count()
    t_full = time.time() - t0
    k = lake.scan("orders", [("o_orderkey", "=", 4000)]).count()
    key_files = lake.last_scan_files
    print(json.dumps({
        "probe": "file_skipping",
        "sf_dir": sf_dir,
        "range_rows": n,
        "full_rows": full,
        "rows_equal": n == full,
        "range_files_read": range_files,
        "pruned_range_scan_s": round(t_range, 3),
        "full_read_filter_s": round(t_full, 3),
        "point_rows": k,
        "point_files_read_unclustered_col": key_files,
    }))


def graph_search_probe(spark) -> None:
    """5x data probe for nn_descent_search (build excluded: priced by
    the build's own probe in SCALE_r11)."""
    from df_to_azure_spark.plans import training_data as TD

    out = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        emb, graph, queries = TD._nnd_search_graph(spark, sf)
        graph = graph.localCheckpoint()  # isolate search cost from build
        from df_to_azure_spark.functions import similarity as SIM

        t0 = time.time()
        SIM.nn_descent_search(
            emb, graph, queries, planes=TD._nnd_planes(),
            k=TD._NND_SEARCH_K, beam=TD._NND_SEARCH_BEAM,
            hops=TD._NND_SEARCH_HOPS, exclude_self=True, checkpoint="local",
        ).count()
        out[sf.rsplit("/", 1)[1]] = round(time.time() - t0, 2)
    print(json.dumps({"probe": "graph_search_5x", **out}))


if __name__ == "__main__":
    import tempfile

    spark = get_spark(app_name="probe_r12", cpus=8, shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="probe_r12_")
    manifest_layer_probe(spark, tmp)
    file_skipping_probe(spark, "/root/testdata/sf0.1", tmp)
    graph_search_probe(spark)
