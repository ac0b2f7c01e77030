"""Engine error types.

Mirrors the reference's exception surface (``df_to_azure/exceptions.py`` —
8 custom types raised on invalid methods, duplicate column names, duplicate
upsert keys, schema mismatches, pipeline failures) so a user of the
reference sees the same failure taxonomy here.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all df_to_azure_spark errors."""


class WrongMethodError(EngineError):
    """``method`` is not one of create / append / upsert."""


class DoubleColumnNamesError(EngineError):
    """Input DataFrame has duplicate column names."""


class DuplicateKeysError(EngineError):
    """Upsert input has duplicate values for the key column(s)."""


class MissingIdFieldError(EngineError):
    """``method='upsert'`` requires ``id_field``."""


class ColumnMismatchError(EngineError):
    """Upsert target and new data have different column sets."""


class WrongDtypeError(EngineError):
    """A column has a type the sink type-map cannot handle, or a user
    ``dtypes`` override is not a valid SQL type string."""


class UpsertError(EngineError):
    """The MERGE step failed (e.g. stale staging table columns)."""


class PipelineRunError(EngineError):
    """A write pipeline failed or exceeded its timeout."""


class ConcurrentWriteError(PipelineRunError):
    """An optimistic manifest commit lost the race to another writer
    (the target manifest version already exists).  The table is
    unchanged; re-running the operation re-reads the new latest version
    and retries the commit one version later."""


class EngineConfigError(EngineError):
    """Required connection/engine configuration is missing (the intent of
    the reference's never-invoked ``check_env_variables``, V6)."""
