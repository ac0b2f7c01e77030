"""Every registered oracle must BIND in DuckDB against the star schema.

The driver runs oracle SQL once per round; a typo'd oracle would
otherwise surface only in that round's CORRECTNESS file.  EXPLAIN runs
the full parser/binder (catching unknown columns, bad casts, alias
mistakes) without executing, so this stays fast."""

from __future__ import annotations

import duckdb
import pytest

from df_to_azure_spark.plans.registry import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke}/{t}.parquet'")
    return c


def test_every_oracle_binds_in_duckdb(con):
    bad = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            con.sql(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {str(e).splitlines()[0][:160]}")
    assert not bad, "\n".join(bad)


def test_oracle_column_names_are_declared(con):
    """The driver sorts columns by name before hashing — oracle output
    columns must be stable, named (no expression-derived auto-names with
    parens), and unique."""
    bad = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            cols = [d[0] for d in con.sql(spec.oracle).limit(0).description]
        except Exception:
            continue  # covered by the bind test
        if len(set(cols)) != len(cols):
            bad.append(f"{name}: duplicate output columns {cols}")
        weird = [c for c in cols if "(" in c or ")" in c or " " in c]
        if weird:
            bad.append(f"{name}: expression-derived column names {weird}")
    assert not bad, "\n".join(bad)
