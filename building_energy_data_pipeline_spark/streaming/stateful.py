"""Custom stateful streaming operator (SURVEY §2.12 extension).

``meter_gap_stats`` tracks, per (building_id, meter), the running
count of readings and the largest gap between consecutive timestamps
— the streaming generalization of the batch event-gap query
(plans/queries.py q07, itself the lag-window upgrade of the
reference's monotonicity probe, ``schema_analyzer.py:88``).

Implemented with ``applyInPandasWithState`` (GroupState): state is
one tiny tuple per key — (last_ts, n, max_gap_seconds) — so memory
is O(active keys), independent of stream length. The same callable
also runs in batch via ``applyInPandas`` fallback for testing.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = (
    "building_id string, meter string, n_readings long, max_gap_seconds double"
)
STATE_SCHEMA = "last_ts double, n long, max_gap double"


def _gap_update(
    key: Tuple[str, str],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Fold a micro-batch of one (building_id, meter) group into the
    running (last_ts, n, max_gap) state and emit the updated stats."""
    import pandas as pd

    if state.exists:
        last_ts, n, max_gap = state.get
    else:
        last_ts, n, max_gap = None, 0, 0.0

    # one sort over the WHOLE group: the batch iterator yields
    # multiple Arrow chunks in arbitrary fetch order, and per-chunk
    # sorting would let last_ts run backwards across chunk seams
    ts_all = sorted(
        t
        for pdf in batches
        for t in pd.to_datetime(pdf["timestamp"]).astype("int64") / 1e9
    )
    for t in ts_all:
        if last_ts is not None:
            max_gap = max(max_gap, t - last_ts)
        last_ts = t
        n += 1

    state.update((last_ts, n, max_gap))
    yield pd.DataFrame(
        [
            {
                "building_id": key[0],
                "meter": key[1],
                "n_readings": n,
                "max_gap_seconds": max_gap,
            }
        ]
    )


def meter_gap_stats(stream: DataFrame) -> DataFrame:
    """Per-key running gap statistics over an unbounded stream.

    Update-mode output: one row per key per micro-batch it appears
    in. ``NoTimeout`` — state lives for the job; add
    ``ProcessingTimeTimeout`` + ``state.setTimeoutDuration`` to evict
    idle meters in a production deployment.
    """
    return stream.groupBy("building_id", "meter").applyInPandasWithState(
        _gap_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Exact-integer variant — oracle-checkable through the driver contract
# ---------------------------------------------------------------------------

GAP_US_OUTPUT_SCHEMA = (
    "user_id long, event_type string, n_events long, max_gap_us long"
)
GAP_US_STATE_SCHEMA = "last_us long, n long, max_gap long"


def _gap_us_update(
    key: Tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Integer-microsecond twin of :func:`_gap_update`: the fold runs
    entirely in int64 (no float epoch conversion), so the emitted
    max-gap is bit-exact against a relational lag/max oracle — this
    is what lets a CUSTOM stateful operator be hash-compared to SQL
    instead of settling for a rows-only check."""
    import pandas as pd

    if state.exists:
        last_us, n, max_gap = state.get
    else:
        last_us, n, max_gap = None, 0, 0

    # ts arrives as int64 microseconds (caller projects unix_micros /
    # `ts div 1000`). Sort across ALL chunks of the group at once —
    # the iterator yields Arrow chunks in arbitrary fetch order, so a
    # per-chunk sort would be wrong whenever a key spans chunks
    # (>maxRecordsPerBatch rows). Ties sort adjacent and contribute
    # gap 0, so tiebreak order is irrelevant.
    for t in sorted(int(v) for pdf in batches for v in pdf["ts_us"]):
        if last_us is not None and t - last_us > max_gap:
            max_gap = t - last_us
        last_us = t
        n += 1

    state.update((int(last_us), int(n), int(max_gap)))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "event_type": key[1],
                "n_events": n,
                "max_gap_us": max_gap,
            }
        ]
    )


def event_gap_stats(stream: DataFrame) -> DataFrame:
    """Per (user_id, event_type) running count + largest gap, exact
    to the microsecond. Requires columns ``user_id, event_type,
    ts_us`` (int64 µs). State per key is one 3-int tuple — O(active
    keys) memory, watermark/timeout-evictable in production."""
    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _gap_us_update,
        outputStructType=GAP_US_OUTPUT_SCHEMA,
        stateStructType=GAP_US_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState twin — the Spark 4 arbitrary-state API
# ---------------------------------------------------------------------------


def transform_with_state_available() -> bool:
    """The ``transformWithStateInPandas`` Python worker speaks
    protobuf to the JVM state server; without the ``protobuf``
    package the driver worker crashes at stream start
    (``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE``). Not
    installed in this sandbox — gate, like the media codecs in
    ``operators/multimodal.py``."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_gap_processor():
    """Build the :class:`StatefulProcessor` lazily so importing this
    module never requires the streaming-state client machinery."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class GapStatsProcessor(StatefulProcessor):
        """``transformWithStateInPandas`` form of :func:`_gap_us_update`
        — same int64-exact fold, held in a typed ``ValueState`` instead
        of the GroupState tuple. The v2 API is the forward path: typed
        value/list/map state, TTL, timers, and initial-state seeding,
        with RocksDB-backed stores at cluster scale.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("gap", GAP_US_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                last_us, n, max_gap = self._state.get()
            else:
                last_us, n, max_gap = None, 0, 0
            for t in sorted(int(v) for pdf in rows for v in pdf["ts_us"]):
                if last_us is not None and t - last_us > max_gap:
                    max_gap = t - last_us
                last_us = t
                n += 1
            self._state.update((int(last_us), int(n), int(max_gap)))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "event_type": key[1],
                        "n_events": n,
                        "max_gap_us": max_gap,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return GapStatsProcessor()


def event_gap_stats_v2(stream: DataFrame) -> DataFrame:
    """:func:`event_gap_stats` on the Spark 4
    ``transformWithStateInPandas`` API — identical output contract,
    so the two stateful backends are interchangeable. Requires the
    ``protobuf`` package at runtime (see
    :func:`transform_with_state_available`); the driver-contract
    query surface uses the ``applyInPandasWithState`` form (q64),
    which has no extra dependency."""
    if not transform_with_state_available():
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its state client speaks protobuf to the JVM state server); "
            "use event_gap_stats (applyInPandasWithState) instead"
        )
    return stream.groupBy("user_id", "event_type").transformWithStateInPandas(
        statefulProcessor=_make_gap_processor(),
        outputStructType=GAP_US_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
