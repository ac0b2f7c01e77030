"""Unit tests for operators.expectations."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from df_to_azure_spark.operators import expectations as E


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (None, 3.0, "A"), (4, None, "C")],
        "id long, price double, status string",
    )


def test_rules_count_violations_in_one_scan(spark):
    out = {
        r.rule: (r.n_rows, r.n_violations, r["pass"])
        for r in E.evaluate_expectations(
            _df(spark),
            [
                E.not_null("id"),
                E.in_range("price", 0, 100),
                E.in_set("status", ["A", "B"]),
            ],
        ).collect()
    }
    assert out["id_not_null"] == (4, 1, False)
    # NULL price fails the range rule (NULL comparison is a violation)
    assert out["price_in_range"] == (4, 2, False)
    assert out["status_in_set"] == (4, 1, False)


def test_all_pass_and_regex_rule(spark):
    df = spark.createDataFrame([("1-HIGH",), ("3-LOW",)], "prio string")
    out = E.evaluate_expectations(df, [E.matches("prio", "^[1-5]-")]).collect()
    assert out[0]["pass"] is True and out[0].n_violations == 0


def test_cross_column_rule_and_quarantine_compose(spark):
    df = spark.createDataFrame([(1, 2), (5, 3)], "lo long, hi long")
    rule = E.Expectation("ordered", F.col("lo") <= F.col("hi"))
    rep = E.evaluate_expectations(df, [rule]).collect()[0]
    assert rep.n_violations == 1
    kept = df.where(rule.condition)  # expect_or_drop composition
    assert kept.count() == 1


def test_empty_and_duplicate_rules_raise(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="empty"):
        E.evaluate_expectations(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        E.evaluate_expectations(df, [E.not_null("id"), E.not_null("id")])


def test_unsafe_rule_names_rejected(spark):
    from pyspark.sql import functions as F

    df = _df(spark)
    bad = E.Expectation("evil'name", F.col("id").isNotNull())
    with pytest.raises(ValueError, match="alphanumeric"):
        E.evaluate_expectations(df, [bad])
