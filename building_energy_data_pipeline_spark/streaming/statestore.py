"""RocksDB state store for Structured Streaming — the production
state backend.

The reference has no streaming surface at all (SURVEY §2.11 — this
package is an engine upgrade), so the state-backend choice is pure
Spark posture: the default ``HDFSBackedStateStoreProvider`` keeps
every key of every stateful operator's state ON-HEAP per executor,
which caps total streaming state at a fraction of cluster heap and
stalls GC long before 100 TB-scale key cardinalities. The
``RocksDBStateStoreProvider`` (shipped with Spark —
``rocksdbjni`` is in the distribution, probed by the test) keeps
state off-heap in embedded RocksDB instances, bounded by disk, with
CHANGELOG CHECKPOINTING so each micro-batch uploads only the delta
(not a full snapshot) to the checkpoint location.

State-store configs are read from the session's SQLConf when a
streaming query STARTS, so they can be enabled per-session at
runtime — no new JVM needed. ``enable_rocksdb_state`` flips the
session; ``rocksdb_state_conf`` returns the raw conf dict for
``get_spark(extra_conf=...)`` or spark-submit. Both are exercised
end-to-end (provider engaged, results unchanged vs the default
provider, changelog files present, RocksDB custom metrics reported)
in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Spark's bundled RocksDB provider (org.apache.spark.sql.execution
#: .streaming.state) — the class name is public API, documented under
#: "RocksDB state store implementation" in the Structured Streaming
#: programming guide.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb."
    "changelogCheckpointing.enabled"
)
_BOUNDED_MEM_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"
)
_MEM_LIMIT_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"
)


def rocksdb_state_conf(
    changelog_checkpointing: bool = True,
    bounded_memory_mb: int | None = None,
) -> dict[str, str]:
    """The conf dict that puts streaming state in RocksDB.

    ``changelog_checkpointing`` uploads per-batch changelogs instead
    of full snapshots — the setting that makes commit latency
    independent of total state size (snapshots still happen, async,
    at the maintenance interval). ``bounded_memory_mb`` caps the
    TOTAL RocksDB block-cache + memtable usage across all state
    store instances on an executor — the knob that keeps a
    1000-executor job's off-heap usage predictable.
    """
    conf = {
        _PROVIDER_KEY: ROCKSDB_PROVIDER,
        _CHANGELOG_KEY: str(changelog_checkpointing).lower(),
    }
    if bounded_memory_mb is not None:
        if bounded_memory_mb <= 0:
            raise ValueError(
                f"bounded_memory_mb must be positive, got "
                f"{bounded_memory_mb}"
            )
        conf[_BOUNDED_MEM_KEY] = "true"
        conf[_MEM_LIMIT_KEY] = str(bounded_memory_mb)
    return conf


def enable_rocksdb_state(
    spark: SparkSession,
    changelog_checkpointing: bool = True,
    bounded_memory_mb: int | None = None,
) -> dict[str, str | None]:
    """Switch the session's streaming state backend to RocksDB and
    return the PREVIOUS values of every key touched (None = unset)
    so a caller can restore them — state-store confs bind at query
    start, so this affects queries started after the call, never
    running ones."""
    conf = rocksdb_state_conf(changelog_checkpointing, bounded_memory_mb)
    previous: dict[str, str | None] = {}
    for k, v in conf.items():
        previous[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return previous


def restore_state_conf(
    spark: SparkSession, previous: dict[str, str | None]
) -> None:
    """Undo :func:`enable_rocksdb_state` from its return value."""
    for k, v in previous.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def rocksdb_metrics(query) -> dict[str, int]:
    """The RocksDB-specific custom metrics from a streaming query's
    last progress (empty dict when the query has no progress yet or
    runs on a non-RocksDB provider) — the observability hook a
    capacity planner reads: ``rocksdbTotalMemoryUsageBytes``,
    ``rocksdbBytesCopied``, changelog/commit latencies, ...
    """
    progress = query.lastProgress
    if not progress:
        return {}
    out: dict[str, int] = {}
    for op in progress.get("stateOperators", []):
        for k, v in (op.get("customMetrics") or {}).items():
            if k.startswith(("rocksdb", "Snapshot")):
                out[k] = out.get(k, 0) + int(v)
    return out


def read_state_metadata(spark: SparkSession, checkpoint: str):
    """Operator/state metadata of a streaming checkpoint as a batch
    DataFrame (Spark's ``state-metadata`` data source): one row per
    stateful operator per state store name with partition counts and
    the min/max batch ids available to read — the entry point an
    operator uses to inspect an unfamiliar checkpoint before
    :func:`read_state`."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
    join_side: str | None = None,
):
    """The keyed state of a streaming query's checkpoint as a batch
    DataFrame (Spark's ``statestore`` data source): ``key`` /
    ``value`` structs (the operator's physical state layout — e.g. a
    streaming ``sum`` aggregate exposes its buffer column named
    ``sum``; a session-window aggregation keys on ``(group cols,
    sessionStartTime)`` and carries the merged ``session_window``
    plus the aggregation buffers) plus ``partition_id``. Reads ANY
    provider's checkpoint, RocksDB included — state debugging,
    audits ("which keys are stuck?") and backfills stop requiring a
    running query. Defaults to the latest committed batch; pass
    ``batch_id`` for time travel back to any retained snapshot.

    Stream-stream JOIN state spreads over four stores per join
    (``left/right-keyToNumValues`` and ``-keyWithIndexToValue``);
    pass ``join_side`` ("left" / "right") and the source stitches
    that side's buffered rows back together — ``value`` is the
    buffered input row itself. ``store_name`` reads one raw store
    instead (e.g. the key→count map)."""
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if operator_id:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if join_side is not None:
        if join_side not in ("left", "right"):
            raise ValueError(
                f"join_side must be 'left' or 'right', got {join_side!r}"
            )
        reader = reader.option("joinSide", join_side)
    return reader.load(checkpoint)
