"""CDC apply / MERGE upsert: fold a change batch into a base snapshot.

The reference's loader has no MERGE — its "upsert" is the idempotent
load gate (reject the whole file on overlap,
``src/data_loading/data_loader.py:377-468``, our J1) plus full-table
rewrites. This operator is the missing half of the CDC story started
by the T14 snapshot diff (``schema/ddl.py``, q71): given a base table
and a batch of keyed changes (upserts and delete tombstones), emit the
merged snapshot — ANSI ``MERGE INTO`` semantics re-expressed as a
declarative DataFrame plan.

Semantics (latest-wins):

- rows are keyed by ``keys``; ``(keys..., version)`` is unique across
  ``base ∪ updates`` (the caller's CDC contract — change streams carry
  an LSN / commit timestamp that is unique per key),
- for each key the row with the highest ``version`` survives,
- a surviving row whose ``delete_col`` is true is a tombstone: the key
  is dropped from the snapshot,
- keys present only in ``updates`` are inserts; only in ``base``,
  carried over unchanged.

Scale: ONE hash shuffle of ``base ∪ updates`` on ``keys`` (the same
exchange a SQL MERGE needs), then a per-key window fold — no driver
state, no collect. Map-side nothing is dropped early because the max
version must be global per key; at warehouse scale the win is to
bucket both sides on ``keys`` (``operators/scale.write_bucketed``) so
the exchange disappears and MERGE becomes a co-located
zipper. Skewed keys are not a concern: keys are unique-ish by
construction (a key has one base row + its change rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str = "version",
    delete_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge of ``updates`` into ``base`` (MERGE INTO).

    Both frames must share a schema containing ``keys`` and
    ``version_col`` (and ``delete_col`` if given). Returns the merged
    snapshot with the bookkeeping columns intact — callers that want
    a clean table drop ``version_col``/``delete_col`` afterwards.
    """
    unioned = base.unionByName(updates)
    w = W.partitionBy(*keys).orderBy(F.col(version_col).desc())
    latest = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_col is not None:
        latest = latest.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        )
    return latest


def merge_upsert_sql(
    base_sql: str,
    updates_sql: str,
    keys: list[str],
    version_col: str = "version",
    delete_col: str | None = None,
) -> str:
    """DuckDB oracle twin of :func:`merge_upsert` (QUALIFY form).

    ``base_sql`` / ``updates_sql`` are subqueries producing the same
    columns; returns a SELECT of the merged snapshot.
    """
    keys_csv = ", ".join(keys)
    latest = f"""
    SELECT * FROM (
      SELECT * FROM ({base_sql})
      UNION ALL BY NAME
      SELECT * FROM ({updates_sql})
    )
    QUALIFY row_number() OVER (
      PARTITION BY {keys_csv} ORDER BY {version_col} DESC) = 1
    """
    if delete_col is None:
        return latest
    # the tombstone filter runs AFTER latest-wins selection (an outer
    # query) — filtering before QUALIFY would resurrect the version
    # underneath a delete
    return f"""
    SELECT * FROM ({latest})
    WHERE NOT COALESCE({delete_col}, false)
    """
