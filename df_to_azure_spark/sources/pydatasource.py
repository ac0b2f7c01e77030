"""Custom connector via Spark 4's Python DataSource API — the newest
extension surface for sources the built-in readers don't cover (internal
HTTP feeds, bespoke binary formats, synthetic load generators).

The reference has exactly one source shape (a pandas frame handed to
``df_to_azure``, `/root/reference/df_to_azure/export.py`); this shows the
Spark-native way to make ANY programmatic source a first-class,
partitioned, schema-typed table: subclass ``DataSource``/
``DataSourceReader``, register once per session, then ``spark.read
.format(...)`` like any built-in.

``synthlogs`` generates a deterministic synthetic web-log table — the
fixture-data generator a pipeline test-bench needs — with N partitions
each producing R rows of pure-integer-arithmetic values, so (a) the read
is embarrassingly parallel (one task per ``InputPartition``, no driver
bottleneck, the 100 TB shape for any generated/fetched source) and (b) a
SQL oracle can replay every row exactly (the generator is LCG-style
integer math, no RNG state).

Filter pushdown: the reader implements ``pushFilters`` for equality on
``status`` — partitions still generate their slice but skip non-matching
rows at the source, and Spark drops the residual filter from the plan
(observable in ``explain``), demonstrating the API's pushdown contract.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# generator constants — shared with the SQL oracle via synthlogs_oracle_sql()
_MULT = 1103515245
_INC = 12345
_MOD = 2147483648
_USER_MULT = 2654435761
_USER_MOD = 997
_STATUSES = (200, 200, 200, 301, 404, 500)  # skewed like real logs


def _row(log_id: int) -> tuple[int, int, int, int]:
    h = (log_id * _MULT + _INC) % _MOD
    status = _STATUSES[h % len(_STATUSES)]
    user_id = (log_id * _USER_MULT) % _USER_MOD
    n_bytes = h % 100_000
    return (log_id, user_id, status, n_bytes)


class SynthLogsDataSource(DataSource):
    """``spark.read.format("synthlogs").option("partitions", P)
    .option("rows_per_partition", R).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthlogs"

    def schema(self) -> str:
        return "log_id bigint, user_id bigint, status int, n_bytes bigint"

    def reader(self, schema) -> "SynthLogsReader":
        return SynthLogsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthLogsStreamReader":
        return SynthLogsStreamReader(self.options)


class SynthLogsReader(DataSourceReader):
    def __init__(self, options):
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows_per_partition = int(options.get("rows_per_partition", "1000"))
        self.status_eq: int | None = None

    def pushFilters(self, filters):
        """Accept one ``status = <lit>`` equality; everything else is
        returned for Spark to evaluate (the API contract: yield the
        filters you can NOT handle)."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("status",)
                and self.status_eq is None
            ):
                self.status_eq = int(f.value)
            else:
                yield f

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_partitions)]

    def read(self, partition) -> Iterator[tuple]:
        p = partition.value
        base = p * self.rows_per_partition
        for i in range(self.rows_per_partition):
            row = _row(base + i)
            if self.status_eq is not None and row[2] != self.status_eq:
                continue
            yield row


class SynthLogsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the SAME deterministic
    generator exposed as an unbounded source — each micro-batch emits
    the next ``rows_per_batch`` log_ids, the offset is just the high
    watermark ``{"log_id": n}``, and replaying any offset range
    reproduces identical rows (the generator is pure), which is exactly
    the replayability contract Structured Streaming's exactly-once
    recovery needs from a source.  ``readBetweenOffsets`` IS the
    recovery path and falls out of purity for free.

    This is the custom-connector streaming story at any scale: offsets
    are tiny dicts, batches generate on executors, and a batch-mode read
    of the same generator is the exactness oracle (see
    ``tests/test_pydatasource.py`` — streamed accumulation equals the
    batch table row-for-row)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", "100"))
        self.max_rows = int(options.get("max_rows", "1000000000"))

    def initialOffset(self) -> dict:
        return {"log_id": 0}

    def read(self, start: dict):
        first = int(start["log_id"])
        end = min(first + self.rows_per_batch, self.max_rows)
        return (iter([_row(i) for i in range(first, end)]), {"log_id": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["log_id"]), int(end["log_id"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the generator is stateless


def register(spark) -> None:
    """Idempotent session registration.

    Two deployment details handled here so ANY session can read the
    format: (1) the Python-side filter-pushdown capability is gated by a
    runtime SQL conf — a reader that implements ``pushFilters`` refuses
    to plan without it; (2) the class is registered with cloudpickle's
    by-VALUE module pickling, so executors deserialize the generator
    without needing this package importable on their PYTHONPATH (the
    same property closures get for free; classes default to by-reference
    pickling)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthLogsDataSource)
    spark.dataSource.register(JsonLinesDirDataSource)


def synthlogs_oracle_sql(n_partitions: int, rows_per_partition: int) -> str:
    """DuckDB replay of the generator — the same LCG integer math over
    ``range(0, N)``, so any query over the source is oracle-checkable."""
    n = n_partitions * rows_per_partition
    statuses = ", ".join(str(s) for s in _STATUSES)
    return f"""
SELECT log_id,
       (log_id * {_USER_MULT}) % {_USER_MOD} AS user_id,
       CAST(list_value({statuses})[
         CAST((log_id * {_MULT} + {_INC}) % {_MOD} AS BIGINT)
           % {len(_STATUSES)} + 1] AS INT) AS status,
       CAST((log_id * {_MULT} + {_INC}) % {_MOD} AS BIGINT) % 100000
         AS n_bytes
FROM (SELECT unnest(range(0, {n})) AS log_id)
"""


# --------------------------------------------------------------------------
# Custom SINK via the same API: a JSON-lines directory writer with real
# two-phase commit (task-temp files -> driver rename), completing the
# connector surface next to the batch reader and the stream reader.
# --------------------------------------------------------------------------


class _JsonlCommit(WriterCommitMessage):
    """Per-task commit message: where the task staged its file and what
    the final name should be.  Only data the DRIVER needs to finish or
    undo the job belongs here — never row data."""

    def __init__(self, temp_path: str, final_name: str, n_rows: int):
        self.temp_path = temp_path
        self.final_name = final_name
        self.n_rows = n_rows


class JsonLinesDirDataSource(DataSource):
    """``df.write.format("jsonldir").option("path", dir).mode(...)
    .save()`` — a directory of one JSON-lines file per task, written
    with the API's transactional contract:

    - ``write()`` (executors) stages each partition into a uuid temp
      file and returns a commit message; a crash mid-task leaves only
      an invisible temp.
    - ``commit()`` (driver, all tasks succeeded) renames every temp to
      its final ``part-NNNNN.jsonl`` name and drops a ``_SUCCESS``
      marker — readers that respect the marker never observe a partial
      job.
    - ``abort()`` (driver, any task failed) deletes the staged temps —
      nothing of the failed job remains visible.

    ``mode("overwrite")`` removes the previous generation's part files
    inside ``commit()`` (after all new temps are staged), so even an
    overwrite never exposes an empty/partial directory.  Local-FS
    rename semantics stand in for the cloud-store copy/commit a cluster
    deployment would use — the PROTOCOL (stage, message, commit/abort)
    is the portable part, demonstrated end-to-end in
    ``tests/test_pydatasource.py`` including the abort path."""

    @classmethod
    def name(cls) -> str:
        return "jsonldir"

    def schema(self) -> str:  # required override; writer infers from df
        return "log_id bigint"

    def writer(self, schema, overwrite: bool) -> "JsonLinesDirWriter":
        return JsonLinesDirWriter(self.options, schema, overwrite)


class JsonLinesDirWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("jsonldir writer requires .option('path', dir)")
        self.path = path
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # test hook: make one partition fail to exercise abort()
        fail = options.get("fail_partition")
        self.fail_partition = int(fail) if fail is not None else None

    def write(self, iterator) -> _JsonlCommit:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if self.fail_partition is not None and pid == self.fail_partition:
            raise RuntimeError(f"jsonldir test failure on partition {pid}")
        os.makedirs(self.path, exist_ok=True)
        temp = os.path.join(self.path, f".staged-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(temp, "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {k: row[k] for k in self.fields}, sort_keys=False
                    )
                )
                fh.write("\n")
                n += 1
        return _JsonlCommit(temp, f"part-{pid:05d}.jsonl", n)

    def commit(self, messages) -> None:
        import os

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        total = 0
        for m in messages:
            os.replace(m.temp_path, os.path.join(self.path, m.final_name))
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(f"rows={total}\n")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)
