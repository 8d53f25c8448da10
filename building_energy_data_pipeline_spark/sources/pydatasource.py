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
  needs for exactly-once sinks.

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
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
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

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        day = int(start["day"])
        if day >= self.days:
            return [], {"day": day}
        # a LIST, not a generator: the engine's prefetch cache
        # copy.copy()s the returned iterator for replay, and
        # generators don't pickle
        rows = [
            (s, day, slot, reading_value(s, day, slot))
            for s in range(self.n_sensors)
            for slot in range(self.slots)
        ]
        return rows, {"day": day + 1}

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
    mgr = spark._jsparkSession.sessionState().dataSourceManager()
    if mgr.dataSourceExists(SyntheticTelemetrySource.name()):
        return
    try:
        spark.dataSource.register(SyntheticTelemetrySource)
    except Exception:
        pass  # mis-scoped ALREADY_EXISTS from a sibling session
    if mgr.dataSourceExists(SyntheticTelemetrySource.name()):
        return
    from pyspark.sql.udf import _wrap_function

    sc = spark.sparkContext
    wrapped = _wrap_function(sc, SyntheticTelemetrySource)
    jds = getattr(
        sc._jvm,
        "org.apache.spark.sql.execution.datasources.v2.python"
        ".UserDefinedPythonDataSource",
    )(wrapped)
    mgr.registerDataSource(SyntheticTelemetrySource.name(), jds)
