"""Capture meaningful before/after plans for the tfidf_cosine_pairs
document-frequency restructure.  The structural change (dfreq
groupBy+join -> tok-partitioned COUNT window) lives in the `kept`
subtree, which the query pins with localCheckpoint — so the query's
top-level plan hides it.  This probe builds the pre-pin `kept` chain
for both variants with doc_tfidf_cosine_pairs' exact parameters and
captures each formatted plan.
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
    spark = get_spark(app_name="plan_tfidf_r14")

    from df_to_azure_spark.functions.dedup import _spread, shingles
    from df_to_azure_spark.plans import pipeline3 as PL3
    from df_to_azure_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    id_col, top_m = "doc_id", PL3._TFIDF_TOP_M
    term = shingles("text", PL3._TFIDF_SHINGLE_N)
    per_tok = (
        _spread(docs)
        .select(F.col(id_col), F.explode(term).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_corpus"))
    win = W.partitionBy(id_col).orderBy(F.desc("w"), F.asc("tok"))

    def kept_of(weighted):
        return (
            weighted.withColumn("rk", F.row_number().over(win))
            .where(F.col("rk") <= int(top_m))
            .drop("rk")
        )

    # OLD: dfreq groupBy + join back onto per_tok
    dfreq = per_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df_tok"))
    weighted_old = (
        per_tok.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.expr(
                "ROUND(tf * ROUND(LN(CAST(n_corpus AS DOUBLE)"
                " / CAST(df_tok AS DOUBLE)), 12), 8)"
            ),
        )
        .select(id_col, "tok", "w")
    )

    # NEW: tok-partitioned COUNT window on per_tok itself
    with_df = per_tok.withColumn(
        "df_tok", F.count(F.lit(1)).over(W.partitionBy("tok"))
    )
    weighted_new = (
        with_df.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.expr(
                "ROUND(tf * ROUND(LN(CAST(n_corpus AS DOUBLE)"
                " / CAST(df_tok AS DOUBLE)), 12), 8)"
            ),
        )
        .select(id_col, "tok", "w")
    )

    hdr = (
        "doc_tfidf_cosine_pairs — pre-pin `kept` subtree (the query pins\n"
        "it with localCheckpoint, so the top-level executed plan replays\n"
        "an ExistingRDD and hides this chain).  Captured with the query's\n"
        "exact parameters (3-gram shingle terms, top_m).\n\n"
    )
    out = Path(__file__).resolve().parent.parent / "plans" / "r14"
    (out / "doc_tfidf_cosine_pairs_before.txt").write_text(
        hdr
        + "== SECTION: `kept` chain, OLD dfreq groupBy + join back onto "
        "per_tok ==\n" + fmt(kept_of(weighted_old))
    )
    (out / "doc_tfidf_cosine_pairs_after.txt").write_text(
        hdr
        + "== SECTION: `kept` chain, NEW tok-partitioned COUNT window ==\n"
        + fmt(kept_of(weighted_new))
    )
    for name in (
        "doc_tfidf_cosine_pairs_before.txt",
        "doc_tfidf_cosine_pairs_after.txt",
    ):
        txt = (out / name).read_text()
        print(
            name,
            "Exchange:", txt.count("Exchange"),
            "Scan parquet:", txt.count("Scan parquet"),
        )


if __name__ == "__main__":
    main()
