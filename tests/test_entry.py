"""Driver-contract smoke: entry() runs, every queries() entry yields a
stable non-degenerate DataFrame at sf0.001, oracle keys line up."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


# cross joins are intentional ONLY in the brute-force similarity ops
# (shared with test_plans' fusion stub — the cartesian lint runs here)
CARTESIAN_ALLOWED = {"knn_topk", "embedding_neardup_pairs", "lsh_knn"}


def test_all_queries_execute_smoke(spark, sf_smoke):
    from df_to_azure_spark.plans.registry import REGISTRY
    from df_to_azure_spark.session import release_pins

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_smoke)
        assert df.columns, name
        # whole-registry cartesian lint (fused from test_plans — one
        # construction serves the count AND the plan assert; building
        # all 367 entries twice executed every eager lake build twice)
        spec = REGISTRY.get(name)
        if spec is not None and spec.oracle is not None \
                and name not in CARTESIAN_ALLOWED:
            plan = df._jdf.queryExecution().explainString(mode)
            assert "CartesianProduct" not in plan, name
        assert df.count() >= 0, name
        # drain dead localCheckpoint blocks per query — a 367-query loop
        # in one session otherwise accumulates the round-15 pin tax
        release_pins(spark)
