"""ORC and raw-text source round-trips on the sf0.001 tables."""

from __future__ import annotations

from df_to_azure_spark.sources import read_orc, read_text, write_orc


def test_orc_round_trip_preserves_rows_and_schema(spark, sf_smoke, tmp_path):
    src = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_scan_pushes_filters(spark, sf_smoke, tmp_path):
    src = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    plan = (
        read_orc(spark, path)
        .where("o_orderkey = 7")
        .select("o_orderkey", "o_totalprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:120]


def test_text_source_reads_lines(spark, tmp_path):
    f = tmp_path / "corpus.txt"
    f.write_text("alpha beta\ngamma\n\ndelta\n")
    rows = [r.value for r in read_text(spark, str(f)).collect()]
    assert rows == ["alpha beta", "gamma", "", "delta"]


def test_text_source_whole_file(spark, tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("line one\nline two\n")
    rows = read_text(spark, str(f), whole_file=True).collect()
    assert len(rows) == 1 and rows[0].value == "line one\nline two\n"
