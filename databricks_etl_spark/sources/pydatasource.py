"""Custom connector via the Spark 4 Python DataSource API — the lane
for reading a format Spark has no built-in source for (proprietary
logs, an internal feature store, an HTTP-paged API) without writing a
JVM connector.

The demo source is a DETERMINISTIC sequence generator: every row is a
pure function of its global row id (MINSTD hash arithmetic, the same
portable constants as operators/sampling.py), so the source's output
is exactly reproducible in ANSI SQL (``range()`` + identical
arithmetic) and the whole connector is hash-checkable end-to-end
(q138) — the property a real connector gets from replaying stable
upstream data.

Scale contract: ``partitions()`` returns one InputPartition per chunk;
Spark schedules each to an executor, where ``read()`` yields tuples —
parallelism is the partition count, no driver materialization. A real
connector would put its split planning (file ranges, page tokens,
shard ids) in ``partitions()`` and its decode loop in ``read()``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_P = 1_000_000_007
_A = 48_271


class SeqGenDataSource(DataSource):
    """``spark.read.format("seqgen").option("rows", N)
    .option("partitions", K).load()``"""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, bucket int, val double"

    def reader(self, schema) -> "SeqGenReader":
        return SeqGenReader(
            int(self.options.get("rows", 1000)),
            int(self.options.get("partitions", 4)),
        )

    def simpleStreamReader(self, schema) -> "SeqGenStreamReader":
        return SeqGenStreamReader(
            int(self.options.get("rows", 1000)),
            int(self.options.get("batchrows", 250)),
        )


class SeqGenReader(DataSourceReader):
    def __init__(self, rows: int, partitions: int) -> None:
        self.rows = rows
        self.n_parts = partitions

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        per = -(-self.rows // self.n_parts)  # ceil
        start = partition.value * per
        for i in range(start, min(start + per, self.rows)):
            h = ((i % _P) * _A) % _P
            yield (i, h % 10, h / _P)


class SeqGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming read side of the same connector: the deterministic
    sequence replayed as a micro-batched stream with JSON offsets
    ``{"pos": N}`` — each trigger serves the next ``batchrows`` ids
    until ``rows`` is exhausted. Because every row is a pure function
    of its id, ``readBetweenOffsets`` (the recovery path Structured
    Streaming calls when replaying a committed-but-lost batch) returns
    bit-identical rows to the original ``read`` — the replayability
    contract a real connector meets by re-fetching a stable upstream
    range (Kafka offsets, file ranges, cursor pages)."""

    def __init__(self, rows: int, batch_rows: int) -> None:
        self.rows = rows
        self.batch_rows = batch_rows

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _emit(self, start: int, end: int):
        for i in range(start, end):
            h = ((i % _P) * _A) % _P
            yield (i, h % 10, h / _P)

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.batch_rows, self.rows)
        # a PICKLABLE ITERATOR (iter over a materialized list), not a
        # bare generator: the prefetch wrapper both calls next() on it
        # (empty-batch validation) and pickles it to ship the cached
        # batch to the JVM — which is also why this API is for LOW-
        # throughput sources; a high-volume connector uses the
        # partition-planning DataSourceStreamReader instead
        return iter(list(self._emit(lo, hi))), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._emit(start["pos"], end["pos"])))

    def commit(self, end: dict) -> None:
        pass  # upstream is immutable — nothing to truncate


# ---------------------------------------------------------------------------
# Write side: Python DataSource WRITER with a two-phase commit protocol
# ---------------------------------------------------------------------------


class JsonLinesDataSource(DataSource):
    """``df.write.format("pyjsonl").option("path", dir).mode(...)
    .save()`` — newline-delimited JSON sink via the Python DataSource
    writer API (the lane for pushing to a system Spark has no built-in
    sink for: an internal queue, an HTTP ingest endpoint, a bespoke
    format).

    Exactly-once file semantics by two-phase commit: each task writes
    an invisible ``.tmp`` file and returns its path in a
    WriterCommitMessage; only the driver-side ``commit()`` renames the
    complete set to visible ``part-*.jsonl`` and drops a ``_SUCCESS``
    marker, and ``abort()`` deletes the temps — a failed/partial job
    leaves NOTHING visible. This is the same task-temp + driver-rename
    protocol Spark's FileFormatWriter uses; a real connector would
    replace rename with its system's atomic publish (staging table
    swap, queue transaction commit)."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def schema(self) -> str:  # pragma: no cover — writer never infers
        return "unused string"

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(self.options["path"], overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonLinesStreamWriter":
        return JsonLinesStreamWriter(self.options["path"])


class JsonLinesWriter(DataSourceWriter):
    # minimum age before the overwrite-mode janitor sweeps a foreign
    # temp file: anything younger may belong to a LIVE concurrent job
    # (its rename would fail after the sweep); crashed-job litter is
    # by definition older than any plausible in-flight write
    JANITOR_MIN_AGE_SEC = 3600.0

    def __init__(self, path: str, overwrite: bool) -> None:
        import uuid

        self.path = path
        self.overwrite = overwrite
        # job-scoped temp-name token (driver-side, shipped to every
        # task): lets abort() sweep temps of THIS job's killed tasks —
        # a task killed mid-write never returns a commit message, so
        # per-message cleanup alone would leak its temp file — without
        # touching a concurrent job's temps in the same path
        self.job_token = uuid.uuid4().hex[:12]

    # runs ON EXECUTORS, one call per partition
    def write(self, iterator) -> WriterCommitMessage:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f".part-{self.job_token}-{uuid.uuid4().hex}.tmp"
        )
        n = 0
        try:
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
        except BaseException:
            # task-side prompt cleanup when the INPUT fails mid-write
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return JsonLinesCommit(tmp, n)

    # runs ON THE DRIVER after every task succeeded
    def commit(self, messages) -> None:
        import glob
        import os

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
            # overwrite declares ownership of the directory: sweep temp
            # litter from PRIOR crashed jobs (a task killed after its
            # job's abort() ran can land a temp nobody saw — the same
            # hole Hadoop committers have with zombie speculative
            # tasks; the next successful publish is the janitor).
            # Only temps OLDER than the age threshold are swept: a
            # concurrent job's in-flight temps are seconds old, a
            # crashed job's litter is not — the mtime gate keeps the
            # janitor from racing a live writer sharing the path.
            import time

            now = time.time()
            for stale in glob.glob(os.path.join(self.path, ".part-*.tmp")):
                if f".part-{self.job_token}-" in os.path.basename(stale):
                    continue
                try:
                    age = now - os.path.getmtime(stale)
                except OSError:
                    continue  # already gone (owner cleaned it up)
                if age > self.JANITOR_MIN_AGE_SEC:
                    try:
                        os.remove(stale)
                    except OSError:
                        # two overwrite jobs can both pass the age gate
                        # for the same crashed-job temp; the loser must
                        # not fail its commit (mirrors the getmtime
                        # handling above)
                        continue
        # Per-job unique token in the final names (Spark's FileFormatWriter
        # does the same): without it a second append-mode save() into the
        # same path would os.rename over the previous job's
        # part-00000.jsonl... and silently drop its rows.
        for i, m in enumerate(messages):
            os.rename(
                m.tmp_path,
                os.path.join(
                    self.path, f"part-{i:05d}-{self.job_token}.jsonl"
                ),
            )
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(sum(m.n_rows for m in messages)))

    # runs ON THE DRIVER if any task failed
    def abort(self, messages) -> None:
        import glob
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        # sweep temps of killed tasks (no commit message ever arrived);
        # the job token keeps the sweep scoped to THIS job
        for orphan in glob.glob(
            os.path.join(self.path, f".part-{self.job_token}-*.tmp")
        ):
            os.remove(orphan)


class JsonLinesCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int) -> None:
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class JsonLinesStreamWriter(DataSourceStreamWriter):
    """Streaming side of the jsonl sink: the same task-temp protocol,
    committed PER EPOCH with the batchId in the final file names —
    ``part-<batchId>-<i>.jsonl`` — and commit() first deletes any files
    of its own batchId before renaming, so an epoch REPLAY after a
    failure (Structured Streaming's at-least-once delivery to sinks)
    lands exactly the same files it would have the first time:
    idempotent per-epoch overwrite = exactly-once output, the same
    contract the foreachBatch sink in ``streaming/sinks.py`` proves
    for parquet."""

    def __init__(self, path: str) -> None:
        import uuid

        self.path = path
        self.job_token = uuid.uuid4().hex[:12]  # see JsonLinesWriter

    def write(self, iterator) -> WriterCommitMessage:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f".part-{self.job_token}-{uuid.uuid4().hex}.tmp"
        )
        n = 0
        try:
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return JsonLinesCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        import glob
        import os

        # replay-idempotence: this epoch's previous (possibly partial)
        # output is replaced wholesale
        for old in glob.glob(os.path.join(self.path, f"part-{batchId:05d}-*.jsonl")):
            os.remove(old)
        for i, m in enumerate(messages):
            os.rename(
                m.tmp_path,
                os.path.join(self.path, f"part-{batchId:05d}-{i:05d}.jsonl"),
            )

    def abort(self, messages, batchId: int) -> None:
        import glob
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        for orphan in glob.glob(
            os.path.join(self.path, f".part-{self.job_token}-*.tmp")
        ):
            os.remove(orphan)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SeqGenDataSource)
    spark.dataSource.register(JsonLinesDataSource)
