"""Range join (point-in-interval) via bin bucketing.

The reference has no range join at all — its only interval logic is
the ±1 h overlap predicate inside the idempotent-load gate
(``src/data_loading/data_loader.py:388-390``), evaluated by
PostgreSQL. A naive Spark translation of ``p BETWEEN lo AND hi`` with
no equality key degenerates to BroadcastNestedLoopJoin (O(n·m) pair
evaluations, and a hard failure when neither side fits in a
broadcast). This operator restores an equi-join shape by bucketing:

- every point gets the bin ``floor(point / bin_width)``;
- every interval explodes to the bins it overlaps
  (``sequence(floor(lo/w), floor(hi/w))``);
- the join key is the bin — a plain shuffled/broadcast hash join that
  Catalyst/AQE plans like any other equi-join — and the true range
  predicate runs as a cheap residual filter.

A (point, interval) match is emitted exactly once — the point lives
in exactly one bin — so no post-join dedup is needed. Cost scales
with points + intervals·(avg_span/bin_width) + true matches, not
points×intervals; pick ``bin_width`` near the median interval span so
each interval lands in O(1) bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__BIN = "__rj_bin"


def point_in_interval_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (half-open; numeric or epoch-cast columns).

    ``how`` is ``inner`` or ``left`` (``left`` keeps unmatched points
    with null interval columns, via a final left join back — the
    residual filter would otherwise drop them). Column names must be
    disjoint across the two inputs.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    p = points.withColumn(
        __BIN, F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    iv = intervals.withColumn(
        __BIN,
        F.explode(
            F.expr(
                f"sequence(cast(floor({lo_col} / {bin_width}) as bigint),"
                f" cast(floor({hi_col} / {bin_width}) as bigint))"
            )
        ),
    )
    matched = (
        p.join(iv, __BIN)
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop(__BIN)
    )
    if how == "inner":
        return matched
    if how == "left":
        return points.join(
            matched, on=list(points.columns), how="left"
        )
    raise ValueError(f"unsupported how={how!r}")
