"""Source readers (SURVEY §2.1 S1-S4)."""

from df_to_azure_spark.sources.tables import (
    load_table,
    load_tables,
    normalize_ts_col,
    read_csv,
    read_json,
    read_orc,
    read_text,
    write_orc,
    register_star_schema,
)

__all__ = [
    "load_table",
    "load_tables",
    "normalize_ts_col",
    "read_csv",
    "read_json",
    "read_orc",
    "read_text",
    "write_orc",
    "register_star_schema",
]
