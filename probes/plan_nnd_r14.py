"""Capture meaningful before/after plans for the nn_descent_knn_graph
collect_set restructure.  The registry query pins every per-round frame
(checkpoint='local'), so its top-level explain collapses to
`Scan ExistingRDD`; the structural change lives in the PER-ROUND pair
generation.  This probe rebuilds ONE refine round exactly as the loop
executes it — on top of the pinned previous-round frame `b` — for the
OLD (union -> distinct -> self-join) and NEW (union -> collect_set ->
double explode) variants, and captures each round-frame's formatted
plan.  That is the plan shape the executed query runs `rounds` times.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from df_to_azure_spark.session import get_spark  # noqa: E402


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="plan_nnd_r14")

    from df_to_azure_spark.functions.similarity import (
        _as_double,
        cosine,
        hyperplane_bucket,
    )
    from df_to_azure_spark.plans import training_data as TD

    emb = TD._nnd_view(spark, sf_dir)
    k, init_cap = TD._NND_K, TD._NND_CAP
    planes = TD._nnd_planes()

    # replicate the build's init exactly (pinned, as executed)
    v = (
        emb.select(
            F.col("vec_id").alias("nid"), _as_double("embedding").alias("vv")
        )
        .select("nid", "vv", hyperplane_bucket(F.col("vv"), planes).alias("cid"))
        .localCheckpoint()
    )
    ranked = v.select("cid", "nid").withColumn(
        "rn", F.row_number().over(W.partitionBy("cid").orderBy("nid"))
    )
    sizes = ranked.groupBy("cid").agg(F.count(F.lit(1)).cast("int").alias("m"))
    ring = (
        ranked.join(sizes, "cid")
        .select(
            "cid", F.col("nid").alias("u"), "rn", "m",
            F.explode(F.sequence(F.lit(1), F.lit(init_cap))).alias("o"),
        )
        .where(F.col("o") <= F.col("m") - 1)
        .select(
            "cid", "u",
            (((F.col("rn") - 1 + F.col("o")) % F.col("m")) + 1).alias("trn"),
        )
        .join(
            ranked.select("cid", F.col("nid").alias("w"), F.col("rn").alias("trn")),
            ["cid", "trn"],
        )
        .select("u", "w")
    )
    vu = v.select(F.col("nid").alias("u"), F.col("vv").alias("uv"))
    vw = v.select(F.col("nid").alias("w"), F.col("vv").alias("wv"))

    def score(pairs):
        return (
            pairs.join(vu, "u")
            .join(vw, "w")
            .select(
                "u", "w",
                F.round(cosine(F.col("uv"), F.col("wv")), 8).alias("cos_sim"),
            )
        )

    def topk(scored):
        wq = W.partitionBy("u").orderBy(F.desc("cos_sim"), F.asc("w"))
        return scored.withColumn("rank", F.row_number().over(wq)).where(
            F.col("rank") <= k
        )

    b = topk(score(ring)).localCheckpoint()  # pinned round-0 frame, as executed
    rev = topk(b.select(F.col("w").alias("u"), F.col("u").alias("w"), "cos_sim"))

    # OLD pair generation: union -> distinct -> self-join on node
    l_nbrs = (
        b.select(F.col("u").alias("node"), F.col("w").alias("nbr"))
        .union(rev.select(F.col("u").alias("node"), F.col("w").alias("nbr")))
        .distinct()
    )
    co_old = (
        l_nbrs.alias("a")
        .join(l_nbrs.alias("b"), "node")
        .select(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("w"))
        .where(F.col("u") != F.col("w"))
    )
    round_old = topk(score(co_old.union(b.select("u", "w")).distinct()))

    # NEW pair generation: union -> collect_set -> double explode
    nbrs = (
        b.select(F.col("u").alias("node"), F.col("w").alias("nbr"))
        .union(rev.select(F.col("u").alias("node"), F.col("w").alias("nbr")))
        .groupBy("node")
        .agg(F.collect_set("nbr").alias("nbrs"))
    )
    co_new = (
        nbrs.select(F.explode("nbrs").alias("u"), "nbrs")
        .select("u", F.explode("nbrs").alias("w"))
        .where(F.col("u") != F.col("w"))
    )
    round_new = topk(score(co_new.union(b.select("u", "w")).distinct()))

    hdr = (
        "nn_descent_knn_graph — ONE refine round as executed (previous-round\n"
        "frame `b` pinned by localCheckpoint, exactly like the registry\n"
        "query's checkpoint='local'); the registry query runs this chain\n"
        "rounds=2 times and its own top-level plan collapses to\n"
        "`Scan ExistingRDD` because the returned frame is also pinned.\n\n"
    )
    out = Path(__file__).resolve().parent.parent / "plans" / "r14"
    (out / "nn_descent_knn_graph_before.txt").write_text(
        hdr
        + "== SECTION: refine round, OLD union -> distinct -> self-join "
        "pair generation ==\n" + fmt(round_old)
    )
    (out / "nn_descent_knn_graph_after.txt").write_text(
        hdr
        + "== SECTION: refine round, NEW union -> collect_set -> double-"
        "explode pair generation ==\n" + fmt(round_new)
    )
    for name in (
        "nn_descent_knn_graph_before.txt",
        "nn_descent_knn_graph_after.txt",
    ):
        txt = (out / name).read_text()
        print(name, "Exchange count:", txt.count("Exchange"))


if __name__ == "__main__":
    main()
