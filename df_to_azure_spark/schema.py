"""Schema inference, SQL type mapping, and data-driven widening.

Rebuilds the reference's type system (``df_to_azure/export.py:218-282``,
see SURVEY.md §1.3) Spark-first:

- ``column_types``-style static map from Spark dtypes to SQL DDL types;
- the two data-driven widening scans (max string length → VARCHAR width,
  int32-bounds → BIGINT promotion) fused into ONE ``df.agg`` job — the
  reference scans every column separately (``export.py:252-282``); at
  100 TB that is the difference between one table scan and 2N of them;
- user ``dtypes`` override with real validation (the reference's check at
  ``export.py:130-133`` never fires; we implement the intent);
- normalization projections applied before any sink: interval → float
  seconds (``export.py:202-216``), optional float → DECIMAL(18, scale).

Precedence (lowest → highest), matching ``export.py:160-163``:
static map < string widening < bigint widening < user ``dtypes``.

Divergence from the reference, on purpose: a max string length of exactly
8000 falls through to the 255 default there (strict ``<`` at
``export.py:260``) — a truncation risk.  Here any length > ``text_length``
widens, and length >= 8000 maps to VARCHAR(MAX).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from df_to_azure_spark.exceptions import WrongDtypeError

INT32_MIN = -2_147_483_648
INT32_MAX = 2_147_483_647
VARCHAR_MAX_THRESHOLD = 8000

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)


def static_sql_type(
    dtype: T.DataType, text_length: int = 255, decimal_precision: int = 2
) -> str:
    """The context-free Spark dtype → SQL DDL map (reference
    ``column_types()``, ``export.py:218-250``).  Raises ``WrongDtypeError``
    for types the sink cannot represent, like the reference's
    ``ValueError("unknown dtype")``.
    """
    if isinstance(dtype, T.StringType):
        return f"VARCHAR({text_length})"
    if isinstance(dtype, T.BooleanType):
        return "BIT"
    if isinstance(dtype, _INT_TYPES):
        return "INT"
    if isinstance(dtype, _FLOAT_TYPES):
        return f"NUMERIC(18, {decimal_precision})"
    if isinstance(dtype, T.DecimalType):
        return f"NUMERIC({dtype.precision}, {dtype.scale})"
    if isinstance(dtype, T.TimestampType) or isinstance(dtype, T.TimestampNTZType):
        return "DATETIME"
    if isinstance(dtype, T.DateType):
        return "DATE"
    if isinstance(dtype, T.DayTimeIntervalType):
        # normalized to float seconds before the sink (see normalize_for_sink)
        return f"NUMERIC(18, {decimal_precision})"
    if isinstance(dtype, T.BinaryType):
        return "VARBINARY(MAX)"
    raise WrongDtypeError(f"unknown dtype for SQL sink: {dtype.simpleString()}")


def widening_stats(df: DataFrame) -> dict[str, dict[str, int | None]]:
    """One distributed pass computing every widening input at once:
    per string column ``max(length)``, per integer column ``min``/``max``.

    Returns ``{col: {"max_len": n}}`` for strings and
    ``{col: {"min": a, "max": b}}`` for ints.  Catalyst collapses the agg
    into a single scan with partial (map-side) aggregation, so this costs
    one read of the table regardless of column count.
    """
    exprs = []
    plan: list[tuple[str, str]] = []
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StringType):
            exprs.append(F.max(F.length(F.col(field.name))).alias(f"len__{field.name}"))
            plan.append((field.name, "len"))
        elif isinstance(field.dataType, _INT_TYPES):
            exprs.append(F.min(F.col(field.name)).alias(f"min__{field.name}"))
            exprs.append(F.max(F.col(field.name)).alias(f"max__{field.name}"))
            plan.append((field.name, "bounds"))
    if not exprs:
        return {}
    row = df.agg(*exprs).collect()[0].asDict()
    out: dict[str, dict[str, int | None]] = {}
    for name, kind in plan:
        if kind == "len":
            out[name] = {"max_len": row[f"len__{name}"]}
        else:
            out[name] = {"min": row[f"min__{name}"], "max": row[f"max__{name}"]}
    return out


def infer_sql_schema(
    df: DataFrame,
    text_length: int = 255,
    decimal_precision: int = 2,
    dtypes: dict[str, str] | None = None,
) -> dict[str, str]:
    """Full inference: static map, then widening, then user overrides.

    ``dtypes`` maps column name → SQL DDL type string (e.g. ``"DATE"``,
    ``"VARCHAR(100)"``) — the validated equivalent of the reference's
    SQLAlchemy-type override dict (``export.py:31,160-163``).
    """
    out = {
        f.name: static_sql_type(f.dataType, text_length, decimal_precision)
        for f in df.schema.fields
    }

    stats = widening_stats(df)
    for col, st in stats.items():
        if "max_len" in st:
            max_len = st["max_len"]
            if max_len is None:  # all-NULL column: keep default
                continue
            if max_len >= VARCHAR_MAX_THRESHOLD:
                out[col] = "VARCHAR(MAX)"
            elif max_len > text_length:
                out[col] = f"VARCHAR({max_len})"
        else:
            lo, hi = st["min"], st["max"]
            if lo is not None and (lo < INT32_MIN or hi > INT32_MAX):
                out[col] = "BIGINT"

    if dtypes:
        _validate_dtype_overrides(df, dtypes)
        out.update(dtypes)
    return out


def _validate_dtype_overrides(df: DataFrame, dtypes: dict[str, str]) -> None:
    """The check the reference intended at ``export.py:130-133`` but never
    executes (it compares ``type(key) == TypeEngine`` over dict keys)."""
    missing = set(dtypes) - set(df.columns)
    if missing:
        raise WrongDtypeError(f"dtypes override for unknown columns: {sorted(missing)}")
    for col, ddl in dtypes.items():
        if not isinstance(ddl, str) or not ddl.strip():
            raise WrongDtypeError(
                f"dtypes[{col!r}] must be a SQL type string, got {type(ddl).__name__}"
            )


def create_table_column_types(schema_map: dict[str, str]) -> str:
    """Render the map as Spark JDBC's ``createTableColumnTypes`` option.

    VARCHAR(MAX)/VARBINARY(MAX) are not parseable by Spark's DDL parser, so
    they are emitted for the raw-DDL path only; here they degrade to the
    widest parseable string type.
    """
    parts = []
    for col, ddl in schema_map.items():
        if ddl.upper() in ("VARCHAR(MAX)", "VARBINARY(MAX)"):
            ddl = "STRING"
        if ddl.upper() == "BIT":
            ddl = "BOOLEAN"
        if ddl.upper() == "DATETIME":
            ddl = "TIMESTAMP"
        parts.append(f"`{col}` {ddl}")
    return ", ".join(parts)


def normalize_for_sink(
    df: DataFrame,
    decimal_precision: int | None = 2,
    cast_floats_to_decimal: bool = False,
) -> DataFrame:
    """Pure projections replacing the reference's in-place mutations:

    - day-time intervals → float total seconds (``export.py:202-216``);
    - optionally float → DECIMAL(18, scale) — the reference's lossy
      NUMERIC(18,2) default (``export.py:228``), off by default here
      because the SQL sink already applies it server-side via DDL;
    - timestamps stay typed (the reference's datetime→string hop at
      ``export.py:188-191`` existed only for the ADF copy; Parquet/JDBC
      handle timestamps natively, and NaT→NULL is free).
    """
    cols = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.DayTimeIntervalType):
            # interval → total seconds with sub-second precision; direct
            # interval/interval division is not a Spark operator, but the
            # ANSI cast to decimal yields seconds for day-time intervals
            cols.append(c.cast(T.DecimalType(28, 6)).cast("double").alias(field.name))
        elif cast_floats_to_decimal and isinstance(field.dataType, _FLOAT_TYPES):
            cols.append(c.cast(T.DecimalType(18, decimal_precision or 2)).alias(field.name))
        else:
            cols.append(c)
    return df.select(*cols)


def schema_diff(before: DataFrame, after: DataFrame) -> list[dict[str, str]]:
    """Structural diff between two frame schemas — the drift report an
    ingest pipeline checks before an append/upsert so an upstream
    producer change (dropped column, silent type widening, new field)
    is a decision, not a surprise.

    Returns one dict per change: ``{"column", "change", "before",
    "after"}`` with ``change`` ∈ {added, removed, type_changed,
    nullability_changed, reordered}.  Pure metadata — no jobs run.
    Column ORDER changes are reported (position matters to positional
    writers like JDBC batch insert) but only for columns present on
    both sides."""
    b = {f.name: f for f in before.schema.fields}
    a = {f.name: f for f in after.schema.fields}
    out: list[dict[str, str]] = []
    for name in b:
        if name not in a:
            out.append(
                {"column": name, "change": "removed",
                 "before": b[name].dataType.simpleString(), "after": ""}
            )
    for name in a:
        if name not in b:
            out.append(
                {"column": name, "change": "added",
                 "before": "", "after": a[name].dataType.simpleString()}
            )
    for name in b:
        if name not in a:
            continue
        bt, at = b[name].dataType, a[name].dataType
        if bt != at:
            out.append(
                {"column": name, "change": "type_changed",
                 "before": bt.simpleString(), "after": at.simpleString()}
            )
        if b[name].nullable != a[name].nullable:
            out.append(
                {"column": name, "change": "nullability_changed",
                 "before": str(b[name].nullable), "after": str(a[name].nullable)}
            )
    shared_b = [f.name for f in before.schema.fields if f.name in a]
    shared_a = [f.name for f in after.schema.fields if f.name in b]
    if shared_b != shared_a:
        out.append(
            {"column": "*", "change": "reordered",
             "before": ",".join(shared_b), "after": ",".join(shared_a)}
        )
    return out
