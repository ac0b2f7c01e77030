"""df_to_azure_spark — a PySpark-native engine with the query and
data-processing capabilities of zypp-io/df_to_azure, rebuilt Spark-first.

The reference (read-only at /root/reference) is a pandas→Azure ETL library:
schema inference + type mapping, create/append/upsert write modes, Parquet
and SQL sinks, key/schema validation (see SURVEY.md).  Here Spark is both
the control plane and the data plane: DataFrame algebra replaces the ADF
copy pipeline, ``df.write.parquet``/``df.write.jdbc`` replace the blob/SQL
sinks, and everything is partition-parallel so the same code runs on a
1000-executor cluster against 100 TB.

Public surface::

    from df_to_azure_spark import df_to_spark           # the facade
    from df_to_azure_spark.operators import lake        # parquet lake sink
    from df_to_azure_spark.operators import sql_sink    # JDBC sink
    from df_to_azure_spark.functions import text, dedup, similarity
"""

from df_to_azure_spark.api import RunReport, df_to_spark
from df_to_azure_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["df_to_spark", "RunReport", "get_spark", "__version__"]
