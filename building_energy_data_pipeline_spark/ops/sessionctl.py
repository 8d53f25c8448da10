"""Session / job control (SURVEY §2.10 C11).

The reference manages PostgreSQL sessions: lists activity
(``pg_stat_activity``), cancels backends, and bounds statements with
timeouts (``src/postgres_managing/postgres_manager.py:31-32,134-147``).
The Spark analogues are job groups + the status tracker:

- :func:`active_job_ids` / :func:`active_stage_ids` — the
  ``pg_stat_activity`` view of the cluster;
- :func:`run_in_job_group` — tag a unit of work so it can be
  observed and cancelled as one (``SET application_name`` + backend
  pid, in PG terms);
- :func:`cancel_job_group` — ``pg_cancel_backend``;
- :func:`run_with_timeout` — ``statement_timeout``: run an action in
  an inheritable thread under a fresh job group and cancel the whole
  group if the deadline passes.

Scale: all control-plane — these touch the scheduler, never data.
"""

from __future__ import annotations

import uuid
from typing import Any, Callable, TypeVar

from pyspark import InheritableThread
from pyspark.sql import SparkSession

T = TypeVar("T")


def active_job_ids(spark: SparkSession) -> list[int]:
    """Currently-running job ids (status-tracker view)."""
    return list(spark.sparkContext.statusTracker().getActiveJobsIds())


def active_stage_ids(spark: SparkSession) -> list[int]:
    return list(spark.sparkContext.statusTracker().getActiveStageIds())


def run_in_job_group(
    spark: SparkSession,
    group_id: str,
    fn: Callable[[], T],
    description: str = "",
) -> T:
    """Run ``fn`` (which triggers Spark actions) tagged with a job
    group, so every job it spawns is observable and cancellable as a
    unit. ``interruptOnCancel=True`` interrupts executor task threads
    on cancel — without it a cancel only prevents new stages."""
    sc = spark.sparkContext
    sc.setJobGroup(group_id, description, interruptOnCancel=True)
    try:
        return fn()
    finally:
        # clear the tag so later actions on this thread aren't lumped
        # into (and cancellable via) the finished group
        sc.setJobGroup("", "")


def cancel_job_group(spark: SparkSession, group_id: str) -> None:
    spark.sparkContext.cancelJobGroup(group_id)


def run_with_timeout(
    spark: SparkSession,
    fn: Callable[[], T],
    timeout_s: float,
    group_id: str | None = None,
) -> T:
    """``statement_timeout`` for Spark actions: execute ``fn`` in an
    :class:`~pyspark.InheritableThread` (job-group tags propagate to
    it) under a fresh group; if the deadline passes, cancel the group
    and raise ``TimeoutError``. The reference bounds every statement
    the same way via connection options
    (``postgres_manager.py:31-32``).
    """
    gid = group_id or f"timeout-{uuid.uuid4().hex[:8]}"
    outcome: dict[str, Any] = {}

    def target() -> None:
        try:
            outcome["value"] = run_in_job_group(
                spark, gid, fn, f"run_with_timeout({timeout_s}s)"
            )
        except Exception as exc:  # noqa: BLE001 — re-raised on caller thread
            outcome["error"] = exc

    worker = InheritableThread(target=target, daemon=True)
    worker.start()
    worker.join(timeout_s)
    if worker.is_alive():
        cancel_job_group(spark, gid)
        worker.join(30)
        raise TimeoutError(
            f"action exceeded {timeout_s}s; job group {gid!r} cancelled"
        )
    if "error" in outcome:
        raise outcome["error"]
    return outcome["value"]
