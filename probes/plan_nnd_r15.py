"""Capture before/after PER-ROUND scoring plans for the round-15
nn_descent_graph norm precompute.  The registry query pins every
per-round frame, so the top-level explain collapses to
`Scan ExistingRDD`; the change lives in the scoring projection executed
~|nodes|·(2k)² times per refine round: OLD recomputes
sqrt(dot(a,a))·sqrt(dot(b,b)) per PAIR (three HOF aggregate/zip_with
folds per row), NEW reads the two norms from the pinned node frame (one
fold per row).  This probe builds one round's scored frame both ways on
the same pinned inputs and writes the formatted plans to
plans/r15/nn_descent_round_score_{before,after}.txt.
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
    spark = get_spark(app_name="plan_nnd_r15")

    from df_to_azure_spark.functions.similarity import (
        _as_double,
        cosine,
        dot,
        hyperplane_bucket,
        norm,
    )
    from df_to_azure_spark.plans import training_data as TD

    emb = TD._nnd_view(spark, sf_dir)
    planes = TD._nnd_planes()

    # the round-15 pinned node frame (with norms), exactly as built
    v = (
        emb.select(
            F.col("vec_id").alias("nid"), _as_double("embedding").alias("vv")
        )
        .select(
            "nid", "vv", hyperplane_bucket(F.col("vv"), planes).alias("cid"),
            norm(F.col("vv")).alias("nrm"),
        )
        .localCheckpoint()
    )
    # a stand-in candidate-pair frame keyed like a refine round's pool
    pool = (
        v.select(F.col("nid").alias("u"))
        .crossJoin(v.select(F.col("nid").alias("w")).limit(4))
        .where(F.col("u") != F.col("w"))
    )
    vu_old = v.select(F.col("nid").alias("u"), F.col("vv").alias("uv"))
    vw_old = v.select(F.col("nid").alias("w"), F.col("vv").alias("wv"))
    old = (
        pool.join(vu_old, "u").join(vw_old, "w")
        .select(
            "u", "w",
            F.round(cosine(F.col("uv"), F.col("wv")), 8).alias("cos_sim"),
        )
    )
    vu = v.select(
        F.col("nid").alias("u"), F.col("vv").alias("uv"),
        F.col("nrm").alias("un"),
    )
    vw = v.select(
        F.col("nid").alias("w"), F.col("vv").alias("wv"),
        F.col("nrm").alias("wn"),
    )
    new = (
        pool.join(vu, "u").join(vw, "w")
        .select(
            "u", "w",
            F.round(
                dot(F.col("uv"), F.col("wv")) / (F.col("un") * F.col("wn")),
                8,
            ).alias("cos_sim"),
        )
    )
    out = Path(__file__).resolve().parent.parent / "plans" / "r15"
    hdr = f"== nn_descent round scoring projection @ {sf_dir} =="
    out.joinpath("nn_descent_round_score_before.txt").write_text(
        hdr + " (r14: cosine() — 3 HOF folds/row)\n" + fmt(old)
    )
    out.joinpath("nn_descent_round_score_after.txt").write_text(
        hdr + " (r15: pinned norms — 1 HOF fold/row)\n" + fmt(new)
    )
    for name, df in (("old", old), ("new", new)):
        txt = fmt(df)
        print(name, "aggregate-folds:", txt.count("aggregate("))


if __name__ == "__main__":
    main()
