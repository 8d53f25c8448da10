"""As-of (most-recent-prior) join — the time-series alignment
operator the reference lacks (SURVEY §2.3 flags it absent: the
natural raw↔weather alignment at BDG2 scale; flagged for the §7
extension path).

Spark has no ASOF JOIN (DuckDB/Pandas do), and the naive formulation
— range join + per-left-row argmax — explodes to O(|L|·|R|) pairs per
key before the argmax prunes them. This implementation is the
**union–sort–carry-forward** plan instead:

1. tag right rows 0, left rows 1 and union them into one stream;
2. one window per key, ordered by (ts, tag): ``last(right_struct,
   ignoreNulls=True)`` carries the most recent right row forward
   (tag order makes a right row at the exact same timestamp visible
   to the left row — ASOF's ``right.ts <= left.ts`` inclusivity);
3. keep left rows, unpack the carried struct.

Cost: ONE shuffle of |L|+|R| rows by key + a per-key sort — the same
shape as a sort-merge join, with no pair blowup at any skew. An
optional tolerance turns matches older than the window into nulls
(dropped, matching ASOF-inner semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "right_",
    tolerance: str | None = None,
    right_order: list[str] | None = None,
    right_unique: bool = False,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` per ``on`` key (inner semantics: left
    rows with no prior right row are dropped).

    Output: all left columns + ``{right_prefix}<col>`` for right's
    non-key, non-ts payload columns + ``{right_prefix}ts``.

    ``right_order`` breaks ties among right rows sharing the same
    (key, ts): the greatest tuple of those columns wins, making the
    result deterministic regardless of partitioning / sort stability.
    Defaults to all payload columns (a total order when right rows
    are distinct); pass an id column explicitly when payloads contain
    non-orderable types (maps).

    ``right_unique=True`` asserts (key, ts) is unique on the right
    side and SKIPS the tie-break struct entirely — (key, ts) is then
    already a total order, so the result is deterministic without it,
    and the per-key sort drops the struct comparison (VERDICT r4
    measured the unconditional tie-break at +38% on the q36 bench
    entry). If the assertion is violated, which right row wins among
    exact (key, ts) duplicates is partitioning-dependent — only set
    it when uniqueness is a data invariant (e.g. a (sensor, reading
    timestamp) stream after dedup).
    """
    payload = [
        c for c in right.columns if c not in on and c != right_ts
    ]
    tiebreak = payload if right_order is None else right_order
    if not tiebreak:
        # key+ts-only right table: zero-field struct() fails analysis;
        # the ts column is a valid (if redundant) total order there
        tiebreak = [right_ts]
    tie_cols_r = (
        []
        if right_unique
        else [F.struct(*[F.col(c) for c in tiebreak]).alias("__tie")]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *tie_cols_r,
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(c) for c in payload],
        ).alias("__rstruct"),
    )
    tie_cols_l = (
        []
        if right_unique
        else [F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie")]
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *tie_cols_l,
        F.lit(None).cast(r.schema["__rstruct"].dataType).alias("__rstruct"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # nulls-first __tie keeps left rows (null tie) ordered before
    # nothing that matters: among equal __ts, right rows (__tag 0)
    # precede left rows, and within right rows the LAST — greatest
    # __tie — is the one last(ignorenulls) carries forward.
    order = [F.col("__ts"), F.col("__tag")]
    if not right_unique:
        order.append(F.asc_nulls_first("__tie"))
    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "__match", F.last("__rstruct", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__tag") == 1).filter(
        F.col("__match").isNotNull()
    )
    if tolerance is not None:
        out = out.filter(
            F.col("__match.ts") >= F.expr(f"__ts - INTERVAL {tolerance}")
        )
    for c in ["ts"] + payload:
        out = out.withColumn(f"{right_prefix}{c}", F.col(f"__match.{c}"))
    return out.drop("__ts", "__tag", "__tie", "__rstruct", "__match")
