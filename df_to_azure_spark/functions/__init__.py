"""Library operators for large-scale training-data pipelines: text
analysis, deduplication, similarity search, multimodal columns.

Everything here is built from JVM-side ``pyspark.sql.functions``
expressions (whole-stage codegen, no Python in the hot path) unless a
docstring says otherwise; the few Pandas-UDF paths are Arrow-batched.
"""
