"""The facade — argument-for-argument mirror of the reference entry point
``df_to_azure(df, tablename, schema, method, id_field, ...)``
(``export.py:20-62``), returning a run report instead of an ADF client.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from df_to_azure_spark import checks
from df_to_azure_spark.operators.lake import ParquetLake


@dataclass
class RunReport:
    """The ``dataRead/dataWritten/copyDuration`` fields the reference logs
    per pipeline run (``utils.py:50-53``), produced locally."""

    table: str
    method: str
    rows_written: int = 0
    duration_sec: float = 0.0
    skipped_empty: bool = False
    details: dict = field(default_factory=dict)


def df_to_spark(
    df: DataFrame,
    tablename: str,
    schema: str = "dbo",
    method: str = "create",
    id_field: str | list[str] | None = None,
    parquet: bool = False,
    lake_root: str | None = None,
    sql_sink=None,
    text_length: int = 255,
    decimal_precision: int = 2,
    dtypes: dict[str, str] | None = None,
    clean_staging: bool = True,
    count_rows: bool = True,
    versioned: bool = False,
) -> RunReport:
    """Land ``df`` in a SQL table (``sql_sink`` — a configured
    :class:`~df_to_azure_spark.operators.sql_sink.SqlSink`) or a parquet
    lake (``parquet=True`` + ``lake_root``), with create/append/upsert
    semantics.  Validations run before any write, like the reference.

    ``versioned=True`` routes the lake path through
    :class:`~df_to_azure_spark.operators.manifest.VersionedLake` —
    atomic manifest commits, OCC against concurrent writers, time
    travel — giving the lake the transactionality the reference's SQL
    path inherits from the database.

    Accepts a ``pandas.DataFrame`` as well (the reference's sole input
    type, ``export.py:20-35``): it is converted via
    ``spark.createDataFrame`` on the active session.  An empty pandas
    frame short-circuits like an empty Spark frame — ``createDataFrame``
    cannot infer a schema from zero rows, and the reference skips the
    run for empty input anyway (``export.py:96-99``).
    """
    t0 = time.monotonic()
    # argument validation FIRST — a misconfigured call must fail the same
    # way for empty and non-empty input (an empty first batch must not
    # mask a bad method/id_field until data arrives)
    checks.validate_method(method)
    keys = checks.validate_id_field(method, id_field)
    try:
        import pandas as _pd
    except ImportError:  # pragma: no cover
        _pd = None
    if _pd is not None and isinstance(df, _pd.DataFrame):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ValueError(
                "pandas input requires an active SparkSession "
                "(create one with df_to_azure_spark.get_spark())"
            )
        if df.empty:
            report = RunReport(table=tablename, method=method, skipped_empty=True)
            report.duration_sec = time.monotonic() - t0
            from df_to_azure_spark.utils import log_run_metrics

            log_run_metrics(report)
            return report
        df = spark.createDataFrame(df)
    checks.ensure_unique_column_names(df)

    report = RunReport(table=tablename, method=method)
    # empty-input short-circuit (reference export.py:96-99); applied to
    # both paths here (the reference's parquet path lacks it — SURVEY V4)
    if checks.is_empty(df):
        report.skipped_empty = True
        report.duration_sec = time.monotonic() - t0
        from df_to_azure_spark.utils import log_run_metrics

        log_run_metrics(report)
        return report

    # rows_written rides the write job via df.observe() instead of a
    # post-hoc df.count() — the count used to be a second full pass over
    # the input, which at pipeline scale doubles the read.  The
    # CollectMetrics node is a plan barrier, so whichever action first
    # consumes the frame (the upsert path's duplicate-key validation
    # scan, or the write itself) satisfies the observation; wrapped
    # AFTER the empty-input check so the limit-1 probe can't.
    obs = None
    if count_rows:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).cast("long").alias("rows"))

    if parquet:
        if not lake_root:
            raise ValueError("parquet=True requires lake_root")
        if versioned:
            from df_to_azure_spark.operators.manifest import VersionedLake

            lake: ParquetLake = VersionedLake(df.sparkSession, lake_root)
        else:
            lake = ParquetLake(df.sparkSession, lake_root)
        lake.write(df, tablename, method=method, id_field=keys or None)
    else:
        if sql_sink is None:
            raise ValueError("SQL path requires a configured SqlSink (sql_sink=...)")
        sql_sink.write(
            df,
            tablename,
            schema=schema,
            method=method,
            id_field=keys,
            text_length=text_length,
            decimal_precision=decimal_precision,
            dtypes=dtypes,
            clean_staging=clean_staging,
        )

    if obs is not None:
        report.rows_written = int(obs.get["rows"])
    report.duration_sec = time.monotonic() - t0
    from df_to_azure_spark.utils import log_run_metrics

    log_run_metrics(report)
    return report
