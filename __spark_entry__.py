"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``df_to_azure_spark.plans.registry`` — every operator the
engine claims has a ``queries()`` entry there, paired with DuckDB oracle
SQL where the semantics are SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

SMOKE_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session settings on a driver-provided session.

    UTC session tz keeps timestamps oracle-comparable regardless of the
    events parquet's physical encoding (nanos-long / NTZ / TIMESTAMP —
    the source loader normalizes all three, see ``sources/tables.py``).
    ``ensure_package_on_workers`` ships the package zip so Python workers
    can unpickle module-level Pandas-UDF functions even when the harness
    runs from a cwd where ``df_to_azure_spark`` is not importable."""
    from df_to_azure_spark.session import ensure_package_on_workers

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; sources handle both shapes
    ensure_package_on_workers(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from df_to_azure_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(_configure(spark), SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from df_to_azure_spark.plans import registry

    return {
        name: (lambda spark, sf_dir, fn=fn: fn(_configure(spark), sf_dir))
        for name, fn in registry.queries().items()
    }


def oracle_sql() -> dict[str, str]:
    from df_to_azure_spark.plans import registry

    return registry.oracle_sql()
