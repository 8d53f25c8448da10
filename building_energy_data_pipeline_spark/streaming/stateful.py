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

    for pdf in batches:
        ts = (
            pd.to_datetime(pdf["timestamp"]).astype("int64") / 1e9
        ).sort_values()
        for t in ts:
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
