"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API)
— the connector-authoring surface of the engine, demonstrated with a
deterministic synthetic-telemetry source.

The reference ingests fixed file formats; a 100 TB platform also
needs to ATTACH new systems (internal services, simulators, bespoke
feeds) as first-class tables. Spark 4's Python DataSource API makes
that a pure-Python contract, and this module exercises ALL the parts
that matter at scale:

- **partition planning**: ``partitions()`` returns one
  :class:`InputPartition` per sensor shard, so the scan parallelizes
  across executors exactly like a file source splits by file — the
  generator runs WHERE the data is consumed, nothing funnels through
  the driver;
- **filter pushdown INTO Python** (``pushFilters``): ``sensor = k``
  equality prunes whole shards before they are scheduled and day
  bounds shrink each shard's generation loop; consumed filters are
  not re-yielded, so Spark plans them as handled (the ``PushedFilters``
  story of the parquet scans, extended to a custom connector);
- **a streaming twin** (:class:`SimpleDataSourceStreamReader`
  subclass): the same rows delivered one day per micro-batch with a
  monotone offset — the replayable-offset contract a production feed
  needs for exactly-once sinks;
- **the write half** (round-9 continuation): :class:`JsonDirSink` /
  :class:`JsonDirWriter` implement the two-phase staged-commit
  protocol — per-task ``write`` to a staging area returning a
  picklable commit message, driver-side ``commit`` renaming parts
  and writing a ``_SUCCESS`` manifest only when every task
  succeeded, ``abort`` leaving the destination untouched — the
  DataSourceV2 writer contract in pure Python, testable end-to-end
  including injected task failure.

Rows are a CLOSED-FORM function of (sensor, day, slot):
``reading = (sensor*7919 + day*104729 + slot*31) % 10000`` — so a
DuckDB oracle regenerates the identical table with ``range()`` joins
and the q253 driver query hash-checks the whole connector path
end-to-end (registration → pushdown → partition-parallel generation
→ Arrow return) with zero tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: the generation formula's constants (documented so the oracle SQL
#: and any external replayer cannot drift from the source)
READING_MULT_SENSOR = 7919
READING_MULT_DAY = 104729
READING_MULT_SLOT = 31
READING_MOD = 10000

TELEMETRY_SCHEMA = "sensor int, day int, slot int, reading bigint"


def reading_value(sensor: int, day: int, slot: int) -> int:
    return (
        sensor * READING_MULT_SENSOR
        + day * READING_MULT_DAY
        + slot * READING_MULT_SLOT
    ) % READING_MOD


@dataclass
class SensorShard(InputPartition):
    sensor: int
    day_lo: int
    day_hi: int  # inclusive
    slots: int


class TelemetryReader(DataSourceReader):
    """Batch reader: one partition per surviving sensor shard."""

    def __init__(self, options: dict) -> None:
        self.n_sensors = int(options.get("sensors", "8"))
        self.days = int(options.get("days", "30"))
        self.slots = int(options.get("slots", "24"))
        self.sensor_eq: int | None = None
        self.day_lo = 0
        self.day_hi = self.days - 1

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume sensor-equality and day-bound filters (shard
        pruning / generation-loop shrinking); yield everything else
        back as unsupported so Spark re-applies it post-scan. A
        second equality on a different sensor value empties the scan
        (day_lo > day_hi encodes 'nothing survives' uniformly)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("sensor",):
                v = int(f.value)
                if self.sensor_eq is not None and self.sensor_eq != v:
                    self.day_hi = self.day_lo - 1  # contradictory
                self.sensor_eq = v
            elif isinstance(f, GreaterThan) and f.attribute == ("day",):
                self.day_lo = max(self.day_lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == (
                "day",
            ):
                self.day_lo = max(self.day_lo, int(f.value))
            elif isinstance(f, LessThan) and f.attribute == ("day",):
                self.day_hi = min(self.day_hi, int(f.value) - 1)
            elif isinstance(f, LessThanOrEqual) and f.attribute == (
                "day",
            ):
                self.day_hi = min(self.day_hi, int(f.value))
            else:
                yield f

    def partitions(self) -> list[SensorShard]:
        if self.day_lo > self.day_hi:
            return []
        sensors = (
            [self.sensor_eq]
            if self.sensor_eq is not None
            else range(self.n_sensors)
        )
        return [
            SensorShard(s, self.day_lo, self.day_hi, self.slots)
            for s in sensors
            if 0 <= s < self.n_sensors
        ]

    def read(self, part: SensorShard) -> Iterator[tuple]:
        s = part.sensor
        for day in range(part.day_lo, part.day_hi + 1):
            for slot in range(part.slots):
                yield (s, day, slot, reading_value(s, day, slot))


class TelemetryStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: one DAY per micro-batch, offset = next day to
    emit. Replayable: ``read(start)`` regenerates deterministically
    from the offset alone (``readBetweenOffsets`` replays any
    committed range), so a restarted query re-emits exactly the
    uncommitted range — the exactly-once contract. Past ``days`` the
    offset stops advancing and ``read`` returns empty batches; note
    ``availableNow`` over a SIMPLE stream reader drains only the
    batch prefetched at start, so finite test drains poll a
    continuous trigger instead (``tests/test_pydatasource.py``)."""

    def __init__(self, options: dict) -> None:
        self.n_sensors = int(options.get("sensors", "8"))
        self.days = int(options.get("days", "30"))
        self.slots = int(options.get("slots", "24"))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        day = int(start["day"])
        # a list_iterator, never a generator: the engine's prefetch
        # cache copy.copy()s the returned iterator for replay
        # (generators don't copy), and the NO-ADVANCE path calls
        # next(it) expecting StopIteration — a bare list raises
        # TypeError there (datasource_internal.add_result_to_cache),
        # killing the stream the first trigger after the source
        # drains
        if day >= self.days:
            return iter(()), {"day": day}
        rows = [
            (s, day, slot, reading_value(s, day, slot))
            for s in range(self.n_sensors)
            for slot in range(self.slots)
        ]
        return iter(rows), {"day": day + 1}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        # replay for recovery: regenerate [start, end) exactly
        for day in range(int(start["day"]), int(end["day"])):
            for s in range(self.n_sensors):
                for slot in range(self.slots):
                    yield (s, day, slot, reading_value(s, day, slot))


class SyntheticTelemetrySource(DataSource):
    """``spark.read.format("synthetic_telemetry")`` after
    ``spark.dataSource.register(SyntheticTelemetrySource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_telemetry"

    def schema(self) -> str:
        return TELEMETRY_SCHEMA

    def reader(self, schema) -> TelemetryReader:
        return TelemetryReader(self.options)

    def simpleStreamReader(self, schema) -> TelemetryStreamReader:
        return TelemetryStreamReader(self.options)


def register_telemetry_source(spark) -> None:
    """Idempotent PER-SESSION registration.

    The subtlety (observed on Spark 4.1.2, classic mode): after a
    parent session registers, ``spark.newSession().dataSource
    .register(...)`` raises DATA_SOURCE_ALREADY_EXISTS — the
    existence check consults the registering thread's ACTIVE
    session's manager — yet a read from the new session still fails
    with DATA_SOURCE_NOT_FOUND because lookup uses the new session's
    own (empty, cloned-before-registration) ``DataSourceManager``.
    Swallowing the exception is therefore NOT enough; we confirm the
    session's own manager resolves the name and, if not, register
    straight into it (the same JVM call the public API performs,
    minus the mis-scoped exists check).
    """
    _register(spark, SyntheticTelemetrySource)


# ---------------------------------------------------------------------------
# Write path: the connector API's sink half (round-9 continuation)
# ---------------------------------------------------------------------------


@dataclass
class PartFileCommit(WriterCommitMessage):
    """One task's commit message: where its staged part landed and
    how many rows it holds (picklable, collected on the driver)."""

    staged: str
    rows: int


class JsonDirWriter(DataSourceWriter):
    """Staged-commit JSONL directory sink — the two-phase protocol
    every production sink needs, in its minimal observable form:

    - ``write`` (one call per task, ON THE EXECUTOR) streams rows to
      ``<path>/_staging/part-<uuid>.jsonl`` and returns a
      :class:`PartFileCommit`; nothing under ``<path>`` itself is
      touched, so readers never see a half-written job;
    - ``commit`` (driver, only if EVERY task succeeded) renames the
      staged parts to ``part-NNNNN.jsonl`` — clearing prior parts
      first in overwrite mode — and writes a ``_SUCCESS`` manifest
      naming each part and the total row count;
    - ``abort`` (driver, any task failed) deletes whatever was
      staged; the destination is untouched.

    The HARD abort invariant is destination-scoped: no
    ``part-*.jsonl`` appears at the top level and no ``_SUCCESS`` is
    written. Staging residue is only TRANSIENT: Spark calls ``abort``
    while straggler tasks may still be running (task cancellation is
    asynchronous), so a not-yet-interrupted task can legally re-stage
    its part AFTER the driver's first sweep — no two-phase protocol
    can make staging cleanup synchronous (ADVICE r9 #1). ``abort``
    therefore drains with a bounded re-sweep loop (two consecutive
    empty checks), and each JOB stages under its own
    ``_staging/<job_id>/`` namespace (the id is minted driver-side in
    ``__init__`` and shipped to tasks inside the pickled writer), so
    concurrent jobs against one destination never sweep each other's
    in-flight parts.

    Local-filesystem staging keeps the protocol inspectable in
    tests; a production variant swaps the file ops for an object
    store's multipart/rename API — the message flow is identical.
    The ``fail_on_reading`` option injects a mid-write failure so
    the abort path is testable end-to-end.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        import uuid

        self.path = options.get("path") or options.get("__path__")
        if not self.path:
            raise ValueError(
                "jsonl_dir sink requires a path "
                "(.option('path', ...) or .save(path))"
            )
        self.overwrite = overwrite
        # minted ONCE on the driver, before the writer is pickled to
        # tasks: every task of this job stages under the same
        # job-unique directory, and commit/abort sweep ONLY it
        self.job_id = uuid.uuid4().hex
        self.fail_on_reading = (
            int(options["fail_on_reading"])
            if "fail_on_reading" in options
            else None
        )

    def _staging_dir(self) -> str:
        import os

        return os.path.join(self.path, "_staging", self.job_id)

    def write(self, iterator) -> PartFileCommit:
        import json
        import os
        import uuid

        staging = self._staging_dir()
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = row.asDict(recursive=True)
                if (
                    self.fail_on_reading is not None
                    and rec.get("reading") == self.fail_on_reading
                ):
                    raise ValueError(
                        f"injected failure on reading="
                        f"{self.fail_on_reading}"
                    )
                fh.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return PartFileCommit(staged=fname, rows=n)

    def commit(self, messages) -> None:
        import glob
        import json
        import os

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
            old_manifest = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(old_manifest):
                os.remove(old_manifest)
        parts, total = [], 0
        existing = len(
            glob.glob(os.path.join(self.path, "part-*.jsonl"))
        )
        for i, msg in enumerate(m for m in messages if m is not None):
            final = os.path.join(
                self.path, f"part-{existing + i:05d}.jsonl"
            )
            os.replace(msg.staged, final)
            parts.append(os.path.basename(final))
            total += msg.rows
        with open(
            os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"
        ) as fh:
            json.dump({"parts": parts, "rows": total}, fh)
        self._clean_staging()

    def abort(self, messages) -> None:
        import os
        import time

        for msg in messages:
            if msg is not None and os.path.exists(msg.staged):
                os.remove(msg.staged)
        # Straggler drain: Spark invokes abort while task cancellation
        # is still asynchronous, so a not-yet-interrupted task can
        # re-create this job's staging dir and land its part AFTER the
        # first sweep. Re-sweep until two consecutive checks find the
        # job's namespace absent (bounded — a hung task past the
        # deadline leaves only transient staging residue, never
        # anything under the destination's visible surface).
        deadline = time.monotonic() + 10.0
        clean_streak = 0
        while clean_streak < 2 and time.monotonic() < deadline:
            self._clean_staging()
            if os.path.isdir(self._staging_dir()):
                clean_streak = 0
            else:
                clean_streak += 1
            if clean_streak < 2:
                time.sleep(0.1)

    def _clean_staging(self) -> None:
        import os
        import shutil

        staging = self._staging_dir()
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)
        # drop the shared _staging parent only when no other job's
        # namespace is live under it
        parent = os.path.dirname(staging)
        try:
            os.rmdir(parent)  # fails (harmlessly) unless empty
        except OSError:
            pass


class JsonDirStreamWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`JsonDirWriter` — the connector
    API's FOURTH quadrant (batch read / stream read / batch write /
    STREAM WRITE). Per micro-batch the engine calls ``write`` once
    per task (staging exactly like the batch writer: parts land
    under the query-unique ``_staging/<writer_id>/`` namespace,
    never under the destination surface) and then exactly one of
    ``commit(messages, batchId)`` / ``abort(messages, batchId)`` on
    the driver.

    Exactly-once at the sink: Structured Streaming REPLAYS a batch
    after failure, so ``commit`` is IDEMPOTENT PER ``batchId`` — a
    batch's parts are renamed to ``batch-<id>-part-NNNNN.jsonl``
    (replay attempt N > 0 gets an ``-aN-`` infix so attempts NEVER
    share names) and recorded in a ``_commits/<id>.json`` manifest;
    the atomic manifest swap is the single commit point, after which
    every part the manifest does not name is swept. Readers that
    trust the manifests (``committed_rows`` below) therefore never
    dangle AND never double-count, even mid-replay (ADVICE r11 #1:
    with shared part names, a crash after the renames but before the
    swap left the old manifest naming a leftover part whose rows
    duplicated the overwritten ones). A crash between the swap and
    the sweep orphans the old attempt's unreferenced files only
    until the next commit of the same ``batchId`` re-sweeps them.
    ``abort`` restores the batch-writer invariant: the destination
    surface gains nothing, staging is drained with the same bounded
    re-sweep (task cancellation is asynchronous)."""

    def __init__(self, options: dict) -> None:
        import uuid

        self.path = options.get("path") or options.get("__path__")
        if not self.path:
            raise ValueError(
                "jsonl_dir sink requires a path "
                "(.option('path', ...) or .start(path))"
            )
        self.writer_id = uuid.uuid4().hex
        self.fail_on_reading = (
            int(options["fail_on_reading"])
            if "fail_on_reading" in options
            else None
        )

    def _staging_dir(self) -> str:
        import os

        return os.path.join(self.path, "_staging", self.writer_id)

    # task-side staging and the namespace sweep: identical contract
    # to the batch writer, shared verbatim
    write = JsonDirWriter.write
    _clean_staging = JsonDirWriter._clean_staging

    def _manifest(self, batch_id: int) -> str:
        import os

        return os.path.join(
            self.path, "_commits", f"{int(batch_id)}.json"
        )

    def commit(self, messages, batchId: int) -> None:
        import glob
        import json
        import os

        manifest = self._manifest(batchId)
        attempt = 0
        if os.path.exists(manifest):
            with open(manifest, encoding="utf-8") as fh:
                attempt = int(json.load(fh).get("attempt", 0)) + 1
        # crash-ordering (ADVICE r11 #1): attempts never share part
        # names, so renaming this attempt's parts cannot clobber
        # files the live manifest still names — at every
        # intermediate point the on-disk manifest names only files
        # that exist and whose contents are exactly ONE complete
        # attempt. The manifest swap is the single atomic commit
        # point; everything the current manifest does not name is
        # garbage, swept below and re-swept by the next commit of
        # the same batchId (a crash between swap and sweep orphans
        # files only until that replay; a crashed attempt's partial
        # renames are overwritten in place when the attempt number
        # is reused).
        infix = "" if attempt == 0 else f"a{attempt}-"
        parts, total = [], 0
        for i, msg in enumerate(m for m in messages if m is not None):
            final = os.path.join(
                self.path,
                f"batch-{int(batchId)}-{infix}part-{i:05d}.jsonl",
            )
            os.replace(msg.staged, final)
            parts.append(os.path.basename(final))
            total += msg.rows
        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        tmp = manifest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(
                {"parts": parts, "rows": total, "attempt": attempt},
                fh,
            )
        os.replace(tmp, manifest)
        keep = set(parts)
        for old in glob.glob(
            os.path.join(self.path, f"batch-{int(batchId)}-*")
        ):
            if os.path.basename(old) not in keep:
                try:
                    os.remove(old)
                except FileNotFoundError:
                    pass
        self._clean_staging()

    def abort(self, messages, batchId: int) -> None:
        JsonDirWriter.abort(self, messages)


def committed_rows(path: str) -> list[dict]:
    """Read a :class:`JsonDirStreamWriter` destination through its
    commit manifests — the exactly-once view (parts without a
    manifest entry, e.g. from a replayed batch's first attempt, are
    invisible)."""
    import glob
    import json
    import os

    rows: list[dict] = []
    for manifest in sorted(
        glob.glob(os.path.join(path, "_commits", "*.json")),
        key=lambda p: int(os.path.splitext(os.path.basename(p))[0]),
    ):
        with open(manifest, encoding="utf-8") as fh:
            meta = json.load(fh)
        for part in meta["parts"]:
            with open(
                os.path.join(path, part), encoding="utf-8"
            ) as fh:
                rows.extend(json.loads(line) for line in fh)
    return rows


class JsonDirSink(DataSource):
    """``df.write.format("jsonl_dir").option("path", ...)`` (batch)
    or ``df.writeStream.format("jsonl_dir")`` (streaming) after
    :func:`register_jsonl_dir_sink` — the write-capable half of the
    connector surface (the telemetry source is the read half)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonDirWriter:
        return JsonDirWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonDirStreamWriter:
        return JsonDirStreamWriter(self.options)


def register_jsonl_dir_sink(spark) -> None:
    """Per-session registration with the same mis-scoped-exists-check
    workaround as :func:`register_telemetry_source`."""
    _register(spark, JsonDirSink)


def _register(spark, source_cls) -> None:
    if not hasattr(spark, "_jsparkSession"):
        # Spark Connect (no JVM handle): the mis-scoped-exists-check
        # bug is a classic-mode artifact, so the public API is all we
        # have AND all we need. Swallow ONLY the already-exists error
        # — a genuine registration failure must surface here, not as
        # a confusing "source not found" at read time (ADVICE r10 #2).
        try:
            spark.dataSource.register(source_cls)
        except Exception as exc:
            msg = str(exc)
            if (
                "ALREADY_EXISTS" in msg
                or "already exists" in msg.lower()
                or getattr(exc, "getErrorClass", lambda: None)()
                == "DATA_SOURCE_ALREADY_EXISTS"
            ):
                return  # registered earlier in this session
            raise
        return
    mgr = spark._jsparkSession.sessionState().dataSourceManager()
    if mgr.dataSourceExists(source_cls.name()):
        return
    try:
        spark.dataSource.register(source_cls)
    except Exception:
        pass  # mis-scoped ALREADY_EXISTS from a sibling session
    if mgr.dataSourceExists(source_cls.name()):
        return
    # Last resort for the cloned-session hole: perform the same JVM
    # registration the public API does, directly against THIS
    # session's manager. Private-API surface (observed stable on
    # classic-mode Spark 4.1.x) — if an internals rename breaks it,
    # fail with the version assumption spelled out rather than a bare
    # AttributeError (ADVICE r9 #4).
    try:
        from pyspark.sql.udf import _wrap_function

        sc = spark.sparkContext
        wrapped = _wrap_function(sc, source_cls)
        jds = getattr(
            sc._jvm,
            "org.apache.spark.sql.execution.datasources.v2.python"
            ".UserDefinedPythonDataSource",
        )(wrapped)
        mgr.registerDataSource(source_cls.name(), jds)
    except Exception as exc:  # noqa: BLE001 — re-raise with context
        raise RuntimeError(
            f"could not register data source "
            f"{source_cls.name()!r} into this session's "
            f"DataSourceManager; the direct-registration fallback "
            f"assumes classic-mode Spark 4.1.x internals "
            f"(pyspark.sql.udf._wrap_function + "
            f"UserDefinedPythonDataSource). Underlying error: {exc}"
        ) from exc
