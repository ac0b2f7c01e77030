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


def test_all_queries_execute_smoke(spark, sf_smoke):
    from df_to_azure_spark.session import release_pins

    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_smoke)
        assert df.columns, name
        assert df.count() >= 0, name
        # drain dead localCheckpoint blocks per query — a 367-query loop
        # in one session otherwise accumulates the round-15 pin tax
        release_pins(spark)
