"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) — the
source-extension surface the reference cannot express at all (its inputs
are fixed JSON dumps; SURVEY.md §2.1): any Python-reachable system (an
internal REST API, a bespoke binary log, a simulation) becomes a
first-class, *partitioned* Spark relation that joins, filters, and
aggregates like any parquet table.

The demo source here is a deterministic synthetic event generator:

- ``partitions()`` declares N independent splits, so the scan is genuinely
  parallel — each executor materializes only its own partition's rows
  (Arrow-batched back to the JVM). On a 1000-executor cluster the
  generator scales out exactly like a file listing does.
- Rows are a pure function of the global row id via a fixed LCG
  (``x = (1103515245·id + 12345) mod 2^31``) — no RNG state, no wall
  clock — so the relation is exactly reproducible ANYWHERE, including in
  plain SQL (the DuckDB oracle replays it from ``range()``); the catalog
  query over it is value-hash checkable end to end.

Registration is per-session (`spark.dataSource.register`); re-registering
the same name is a no-op overwrite, so catalog queries can call
:func:`register_synthetic_events` idempotently.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAVE_PYTHON_DATASOURCE = True
except ImportError:  # pragma: no cover - pyspark 3.x fallback
    HAVE_PYTHON_DATASOURCE = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2**31


def lcg_row(rid: int) -> tuple[int, str, float]:
    """The shared row function: (id, category, value) for global row `rid`.

    Every arithmetic step is exact integer math plus one double division,
    so Spark (this Python generator) and DuckDB (the SQL replay) produce
    bit-identical values.
    """
    x = (_LCG_A * rid + _LCG_C) % _LCG_M
    return rid, f"c{x % 7}", float(x % 10000) / 100.0


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        # option keys arrive lowercased from the reader API
        self.n_partitions = int(options.get("partitions", "8"))
        self.rows_per_partition = int(options.get("rowsperpartition", "1000"))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        base = partition.value * self.rows_per_partition
        for i in range(self.rows_per_partition):
            yield lcg_row(base + i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id BIGINT, category STRING, value DOUBLE"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        # defined later in this module; resolved at call time
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_events(spark: SparkSession) -> None:
    """Idempotent per-session registration of the demo source."""
    if not HAVE_PYTHON_DATASOURCE:  # pragma: no cover
        raise NotImplementedError(
            "custom Python data sources need pyspark >= 4.0"
        )
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# Writer side: a JSONL directory sink with a real distributed commit protocol
# ---------------------------------------------------------------------------

try:  # pyspark >= 4.0
    from dataclasses import dataclass

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    @dataclass
    class _JsonlCommit(WriterCommitMessage):
        tmp_name: str
        rows: int

    class JsonlDirWriter(DataSourceWriter):
        """Task-commit protocol done properly — the property that makes a
        sink safe under task retries and speculative execution at cluster
        scale:

        - each task writes to a uniquely-named ``_tmp_*`` file and returns
          it in its commit message; a re-attempted task writes a DIFFERENT
          temp file, so duplicate attempts never collide;
        - only the driver-side ``commit()`` publishes: exactly one temp
          file per successful task is renamed to its final ``part-NNNNN``
          name and a ``_SUCCESS`` manifest (with row counts) is written
          LAST, so readers gating on the manifest never observe a partial
          job;
        - ``abort()`` deletes every temp file, leaving prior committed data
          untouched.

        Paths are plain POSIX (shared filesystem / object-store mount);
        the protocol — not the IO syscalls — is the point.
        """

        def __init__(self, options: dict, overwrite: bool) -> None:
            import uuid

            self.path = options["path"]
            self.overwrite = overwrite
            # one id per WRITE JOB (generated on the driver, shipped to all
            # tasks): temp files carry it so commit/abort can tell this
            # job's temps from a crashed predecessor's, and final part
            # names carry it so append mode can never clobber a previous
            # job's parts.
            self.job_id = uuid.uuid4().hex[:12]

        def write(self, iterator) -> _JsonlCommit:
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            tmp = f"_tmp_{self.job_id}_{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, tmp), "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                    n += 1
            return _JsonlCommit(tmp_name=tmp, rows=n)

        def commit(self, messages) -> None:
            import json
            import os

            if self.overwrite:
                # clear committed parts AND any stale temps from crashed
                # prior jobs (this job's temps carry self.job_id and are
                # about to be renamed, so they are exempt).
                for f in os.listdir(self.path):
                    stale_tmp = f.startswith("_tmp_") and not f.startswith(
                        f"_tmp_{self.job_id}_"
                    )
                    if f.startswith("part-") or f == "_SUCCESS" or stale_tmp:
                        os.remove(os.path.join(self.path, f))
            manifest = []
            for i, msg in enumerate(messages):
                # job-id in the final name: append-mode jobs can never
                # clobber a previous job's part files.
                final = f"part-{self.job_id}-{i:05d}.jsonl"
                os.rename(
                    os.path.join(self.path, msg.tmp_name),
                    os.path.join(self.path, final),
                )
                manifest.append({"file": final, "rows": msg.rows})
            if not self.overwrite and os.path.exists(
                os.path.join(self.path, "_SUCCESS")
            ):
                prior = json.load(open(os.path.join(self.path, "_SUCCESS")))
                manifest = prior.get("files", []) + manifest
            with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
                json.dump({"files": manifest}, fh)

        def abort(self, messages) -> None:
            import os

            for msg in messages:
                if msg is not None:
                    tmp = os.path.join(self.path, msg.tmp_name)
                    if os.path.exists(tmp):
                        os.remove(tmp)

    class JsonlDirDataSource(DataSource):
        """``df.write.format("jsonl_dir").save(path)`` after registration."""

        @classmethod
        def name(cls) -> str:
            return "jsonl_dir"

        def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
            return JsonlDirWriter(dict(self.options), overwrite)

except ImportError:  # pragma: no cover - pyspark 3.x
    JsonlDirDataSource = None  # type: ignore[assignment]


def register_jsonl_dir(spark: SparkSession) -> None:
    """Idempotent per-session registration of the JSONL commit-protocol sink."""
    if JsonlDirDataSource is None:  # pragma: no cover
        raise NotImplementedError(
            "custom Python data sources need pyspark >= 4.0"
        )
    spark.dataSource.register(JsonlDirDataSource)


# ---------------------------------------------------------------------------
# Streaming side: the same LCG relation as an unbounded micro-batch source
# ---------------------------------------------------------------------------

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked streaming twin of the batch LCG source: each
        micro-batch emits the next ``rowsperbatch`` rows of the SAME global
        row sequence, with offsets as plain row indices.

        The replay contract — the property checkpoint recovery depends on —
        holds by construction: ``readBetweenOffsets(a, b)`` regenerates
        rows a..b bit-identically because rows are a pure function of the
        row id, so a batch re-read after a crash equals the original batch
        (same guarantee a file or log source gives, demonstrated here for
        a custom Python source and pinned by tests/test_scale_joins.py).

        ``SimpleDataSourceStreamReader`` reads on the driver (no partition
        planning) — right for control-plane-sized streams; a
        high-throughput source would implement ``DataSourceStreamReader``
        with ``partitions()`` instead.
        """

        def __init__(self, options: dict) -> None:
            self.rows_per_batch = int(options.get("rowsperbatch", "100"))

        def initialOffset(self) -> dict:
            return {"index": 0}

        def read(self, start: dict):
            i0 = start["index"]
            end = {"index": i0 + self.rows_per_batch}
            return iter([lcg_row(i) for i in range(i0, end["index"])]), end

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter([lcg_row(i) for i in range(start["index"], end["index"])])

except ImportError:  # pragma: no cover - pyspark 3.x
    SyntheticEventsStreamReader = None  # type: ignore[assignment]
