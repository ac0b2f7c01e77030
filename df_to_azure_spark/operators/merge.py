"""Keyed MERGE for SQL targets (reference W3, ``db.py:20-73``).

The reference stages new rows in ``staging.{table}`` and runs a generated
T-SQL ``MERGE`` stored procedure inside Azure SQL (copy activity →
stored-proc activity).  Spark has no JDBC upsert writer, so we keep the
shape: write the staging table with the JDBC sink, execute a generated
``MERGE`` statement over a plain JDBC connection, drop staging.  The data
movement is distributed (executors write staging in parallel); only the
set-based MERGE runs in-database — exactly like the reference.

Semantics pinned by the reference tests (``test_upsert.py``):
- equi-match on the key column(s);
- WHEN MATCHED → UPDATE every non-key column;
- WHEN NOT MATCHED BY TARGET → INSERT;
- **no DELETE clause** — target-only rows survive;
- column names are whitespace-stripped and bracket-quoted (spaces in
  names are legal, ``db.py:18,21-34``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _bq(name: str) -> str:
    """Bracket-quote a (stripped) identifier, T-SQL style."""
    return "[" + name.strip().replace("]", "]]") + "]"


def merge_statement(
    table: str,
    columns: list[str],
    keys: list[str],
    target_schema: str = "dbo",
    staging_schema: str = "staging",
) -> str:
    """The MERGE text the reference wraps in ``UPSERT_{table}``
    (``db.py:36-53``); generated, never string-formatted from user data
    beyond identifier quoting."""
    cols = [c.strip() for c in columns]
    key_set = {k.strip() for k in keys}
    non_keys = [c for c in cols if c not in key_set]
    on = " AND ".join(f"t.{_bq(k)} = s.{_bq(k)}" for k in keys)
    update = ", ".join(f"t.{_bq(c)} = s.{_bq(c)}" for c in non_keys)
    insert_cols = ", ".join(_bq(c) for c in cols)
    insert_vals = ", ".join(f"s.{_bq(c)}" for c in cols)
    lines = [
        f"MERGE {_bq(target_schema)}.{_bq(table)} AS t",
        f"USING {_bq(staging_schema)}.{_bq(table)} AS s",
        f"ON {on}",
    ]
    if update:
        lines.append(f"WHEN MATCHED THEN UPDATE SET {update}")
    lines.append(
        f"WHEN NOT MATCHED BY TARGET THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )
    return "\n".join(lines) + ";"


def upsert_procedure(
    table: str,
    columns: list[str],
    keys: list[str],
    target_schema: str = "dbo",
    staging_schema: str = "staging",
) -> str:
    """Stored-procedure wrapper for byte-compat with targets that want the
    reference's ``UPSERT_{table}`` proc (``db.py:36-41``)."""
    body = merge_statement(table, columns, keys, target_schema, staging_schema)
    return f"CREATE OR ALTER PROCEDURE {_bq(f'UPSERT_{table}')} AS\nBEGIN\n{body}\nEND;"


def drop_staging_statement(table: str, staging_schema: str = "staging") -> str:
    """Cleanup after the merge (reference ``export.py:284-292``)."""
    return f"DROP TABLE IF EXISTS {_bq(staging_schema)}.{_bq(table)};"


def execute_statement(df_or_spark, url: str, properties: dict[str, str], sql: str) -> None:
    """Run a DDL/DML statement over JDBC via the JVM ``DriverManager`` —
    the py4j equivalent of the reference's pyodbc ``execute_stmt``
    (``db.py:104-119``).  Requires the JDBC driver jar on the Spark
    classpath; raises a plain RuntimeError otherwise so callers can gate.
    """
    spark = df_or_spark if not isinstance(df_or_spark, DataFrame) else df_or_spark.sparkSession
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in properties.items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()
