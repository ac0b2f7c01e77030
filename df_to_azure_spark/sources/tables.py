"""Readers for the engine's table sources.

S2 (CSV with header + inferred types, reference ``tests/__init__.py:24-36``)
and the driver's parquet star schema.  One normalization is applied at the
source: nanosecond parquet timestamps (which Spark reads only as raw longs
under ``spark.sql.legacy.parquet.nanosAsLong``) are projected back to
microsecond timestamps, matching what every other engine (DuckDB, Arrow)
does on read — truncate toward negative infinity to micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# columns known to be TIMESTAMP(NANOS) in the driver's testdata
_NANO_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, []):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


STAR_SCHEMA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_star_schema(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every star-schema table as a temp view so users run plain
    ANSI SQL against the engine (``spark.sql("SELECT ... FROM lineitem
    JOIN orders ...")``) with full Catalyst optimization — the SQL
    passthrough surface.  Views are lazy: registering costs nothing until
    a query scans a table.  Returns the registered view names."""
    names = []
    for t in STAR_SCHEMA_TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """Reference fixture loader semantics: header row + inferred types."""
    return spark.read.csv(path, header=True, inferSchema=True)


def read_json(
    spark: SparkSession, path: str, schema: str | T.StructType | None = None
) -> DataFrame:
    """JSON-lines source (one object per line — the streaming-friendly
    layout Spark splits by line across tasks; multiline JSON documents
    cannot be split and serialize the read).

    Pass ``schema`` in production: schema inference costs a full extra
    pass over the data, and at 100 TB an inferred schema can also drift
    between runs as new keys appear — pinning it keeps the pipeline
    deterministic.  Inference is the convenient default for fixtures."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
