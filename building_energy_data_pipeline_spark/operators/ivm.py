"""Incremental aggregate (materialized-view) maintenance.

The reference keeps latest-state tables only and re-derives every
summary by full query (``src/data_loading/data_loader.py`` reloads,
``postgres_manager.py`` re-aggregates); a lakehouse serving the same
summaries at 100 TB cannot re-scan the fact table per refresh. This
operator keeps a grouped rollup (count / sums / min / max) in sync
with a CDC batch touching an arbitrarily small slice of the data, at
a cost proportional to the BATCH — not the table:

- **count/sum** are self-maintainable: inserts add, deletes
  subtract; the delta folds map-side over the CDC batch alone.
- **min/max** are self-maintainable on INSERT (``least``/
  ``greatest`` against the stored extreme) but not on DELETE: a
  delete that removes the last witness of the stored extreme makes
  the new extreme unknowable from the state. Such groups — and ONLY
  such groups (a deleted value equal to the stored min or max) —
  are marked dirty and recomputed from the post-change detail via a
  broadcast semi-join, i.e. a partition-prunable scan of the dirty
  groups' slices.
- groups whose count reaches zero are dropped; keys never seen
  before enter through the full-outer join with their insert-only
  aggregates — UNLESS the batch also deletes rows of that key
  (updates are modeled as delete + insert, so an unseen key can
  carry intra-batch I+D pairs): with no stored extreme to compare
  against, a delete may have removed the batch's own insert
  extreme, so such keys route to the dirty recompute too.

This is the standard IVM treatment of non-invertible aggregates
(dirty-group recompute; cf. the summary-delta method of Mumick et
al., "Maintenance of Data Cubes and Summary Tables", SIGMOD 1997 —
public literature), expressed as three DataFrame passes: CDC fold,
state patch, dirty recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: CDC operation column: 'I' (insert) or 'D' (delete). Updates are
#: modeled as delete + insert, the q105/q115 convention.
OP_COL = "op"


def _has_delete_extremes(minmax_cols: list[str]) -> str:
    """SQL predicate: the folded batch contains at least one delete
    carrying a non-null value for some min/max column. Per-column
    nullness of ``dmin_<c>``/``dmax_<c>`` coincides (both come from
    the same D rows), so probing ``dmin`` suffices; a D row whose
    value is NULL can never have been an extreme witness, so it
    needs no recompute."""
    return " OR ".join(
        f"dmin_{c} IS NOT NULL" for c in minmax_cols
    ) or "false"


def _dirty_pred(minmax_cols: list[str]) -> str:
    """SQL predicate over a state⋈delta row: some delete may have
    removed the last witness of a stored extreme. Per column this is
    a non-null delete extreme that (a) ties or passes the stored
    min/max, or (b) meets a NULL stored extreme — a seen group whose
    base values were all NULL has no extreme to compare against, so
    an intra-batch insert+delete pair would otherwise fabricate one
    from the insert side (same bug class as the unseen-key rule, one
    branch later). Never NULL: every disjunct is guarded by the
    IS NOT NULL probe."""
    return " OR ".join(
        f"(dmin_{c} IS NOT NULL AND (min_{c} IS NULL"
        f" OR dmin_{c} <= min_{c} OR dmax_{c} >= max_{c}))"
        for c in minmax_cols
    ) or "false"


def rollup_state(detail: DataFrame, keys: list[str], sum_cols: list[str], minmax_cols: list[str]) -> DataFrame:
    """The materialized rollup this module maintains: per ``keys``,
    ``cnt`` plus ``sum_<c>`` for each sum column and ``min_<c>`` /
    ``max_<c>`` for each min/max column. Build it once from the
    detail table; thereafter :func:`maintain_rollup` keeps it
    current per CDC batch."""
    aggs = [F.count("*").alias("cnt")]
    aggs += [
        F.expr(f"cast(sum({c}) as bigint)").alias(f"sum_{c}")
        for c in sum_cols
    ]
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return detail.groupBy(*keys).agg(*aggs)


def _delta(cdc: DataFrame, keys: list[str], sum_cols: list[str], minmax_cols: list[str]) -> DataFrame:
    """Map-side CDC fold: per key, the count/sum deltas plus the
    insert extremes (algebraic patches) and delete extremes (dirty
    probes)."""
    sign = F.expr(f"CASE WHEN {OP_COL} = 'I' THEN 1 ELSE -1 END")
    aggs = [F.sum(sign).alias("cnt_d")]
    aggs += [
        F.expr(
            f"cast(sum(CASE WHEN {OP_COL} = 'I' THEN {c}"
            f" ELSE -{c} END) as bigint)"
        ).alias(f"sumd_{c}")
        for c in sum_cols
    ]
    for c in minmax_cols:
        aggs += [
            F.expr(
                f"min(CASE WHEN {OP_COL} = 'I' THEN {c} END)"
            ).alias(f"imin_{c}"),
            F.expr(
                f"max(CASE WHEN {OP_COL} = 'I' THEN {c} END)"
            ).alias(f"imax_{c}"),
            F.expr(
                f"min(CASE WHEN {OP_COL} = 'D' THEN {c} END)"
            ).alias(f"dmin_{c}"),
            F.expr(
                f"max(CASE WHEN {OP_COL} = 'D' THEN {c} END)"
            ).alias(f"dmax_{c}"),
        ]
    return cdc.groupBy(*keys).agg(*aggs)


def maintenance_census(
    state: DataFrame,
    cdc: DataFrame,
    keys: list[str],
    minmax_cols: list[str],
) -> DataFrame:
    """Per-key maintenance path the batch will take — ``untouched``
    (no CDC rows), ``new`` (insert-only unseen key), ``dropped``
    (count reaches zero), ``dirty`` (a delete ties a stored extreme
    → slice recompute), or ``algebraic`` (patched from the batch
    alone). Diagnostic twin of :func:`maintain_rollup` — the audit
    that sizes the recompute BEFORE running it (dirty share is the
    refresh cost driver at scale)."""
    d = _delta(cdc, keys, [], minmax_cols)
    j = state.join(d, keys, "full_outer")
    has_deletes = _has_delete_extremes(minmax_cols)
    return j.select(
        *keys,
        F.expr(
            "CASE"
            " WHEN cnt_d IS NULL THEN 'untouched'"
            # unseen key whose inserts and deletes cancel: no state
            # row is produced and no recompute runs — 'dropped',
            # faithful to maintain_rollup's new_cnt > 0 gate
            " WHEN cnt IS NULL AND cnt_d <= 0 THEN 'dropped'"
            # an unseen key whose batch also deletes rows (intra-
            # batch I+D, the update convention) cannot be patched
            # from inserts alone — it is dirty, not 'new'
            f" WHEN cnt IS NULL AND ({has_deletes}) THEN 'dirty'"
            " WHEN cnt IS NULL THEN 'new'"
            " WHEN cnt + cnt_d <= 0 THEN 'dropped'"
            f" WHEN {_dirty_pred(minmax_cols)} THEN 'dirty'"
            " ELSE 'algebraic' END"
        ).alias("path"),
    )


def maintain_rollup(
    state: DataFrame,
    cdc: DataFrame,
    detail_after: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    minmax_cols: list[str],
) -> DataFrame:
    """Apply one CDC batch to a :func:`rollup_state` aggregate.

    ``cdc`` carries the detail schema plus :data:`OP_COL`;
    ``detail_after`` is the post-change detail table (maintained by
    the CDC apply itself, q105/q115) and is touched ONLY for dirty
    groups. Returns the refreshed state with the same schema.

    NULL convention for sum columns: the algebraic patch folds with
    ``coalesce(_, 0)``, so a surviving group whose remaining sum-
    column values are ALL NULL reports ``sum_<c> = 0`` where a fresh
    :func:`rollup_state` would report NULL (SQL SUM over no non-null
    rows). Callers needing SQL NULL semantics should track a
    non-null count column alongside. Min/max columns are exact in
    every case — NULL stored extremes route to the dirty recompute
    whenever a non-null delete extreme meets them (see
    :func:`_dirty_pred`).
    """
    delta = _delta(cdc, keys, sum_cols, minmax_cols)

    j = state.join(delta, keys, "full_outer")
    new_cnt = F.expr("coalesce(cnt, 0L) + coalesce(cnt_d, 0L)")
    # a delete tying/passing the stored extreme — or meeting a NULL
    # stored extreme — may remove the last witness; an unseen key
    # (cnt IS NULL) with any non-null delete extreme is dirty
    # outright: the delete may have removed the batch's own insert
    # extreme, and there is no stored extreme to patch from (ADVICE
    # r7 + the seen-key NULL-extreme case of the same bug class).
    # _dirty_pred is never NULL (IS NOT NULL-guarded disjuncts), so
    # a group with no deletes cleanly reads "not dirty".
    has_deletes = _has_delete_extremes(minmax_cols)
    patched = j.withColumn("new_cnt", new_cnt).withColumn(
        "is_dirty",
        F.expr(
            f"CASE WHEN cnt IS NULL THEN ({has_deletes})"
            f" ELSE {_dirty_pred(minmax_cols)} END"
        ),
    )

    dirty_keys = (
        patched.where("is_dirty AND new_cnt > 0").select(*keys)
    )
    recomputed = rollup_state(
        detail_after.join(F.broadcast(dirty_keys), keys, "left_semi"),
        keys,
        sum_cols,
        minmax_cols,
    )

    clean_cols = [F.col("new_cnt").alias("cnt")]
    clean_cols += [
        F.expr(
            f"coalesce(sum_{c}, 0L) + coalesce(sumd_{c}, 0L)"
        ).alias(f"sum_{c}")
        for c in sum_cols
    ]
    for c in minmax_cols:
        # insert-only extension (or a brand-new group's inserts)
        clean_cols.append(
            F.expr(f"least(min_{c}, imin_{c})").alias(f"min_{c}")
        )
        clean_cols.append(
            F.expr(f"greatest(max_{c}, imax_{c})").alias(f"max_{c}")
        )
    clean = (
        patched.where("NOT is_dirty AND new_cnt > 0")
        .select(*keys, *clean_cols)
    )
    return clean.unionByName(recomputed)
