"""Engine-wide static plan audit.

Every registered query's physical plan is linted for scale-killers
(`ops.observe.plan_lint`): cartesian products, nested-loop join
fallbacks, row-at-a-time Python UDFs, single-partition exchanges, and
windows with no partition spec. The per-query plan pins in
`test_plan_shapes.py` check specific shapes; this audit is the
blanket rule — a NEW query cannot land a scale-killer unnoticed,
because it has no pin yet but is still in the registry.

Single-partition windows are allowed only for the queries whose
docstrings invoke the compact-table policy (the window's input is
bounded by a catalog / calendar / price-domain cardinality, never by
data volume) — listed explicitly below so every exemption is a
reviewed decision.
"""

from __future__ import annotations

from building_energy_data_pipeline_spark.ops.observe import plan_lint
from building_energy_data_pipeline_spark.plans.queries import REGISTRY

from conftest import SF_DIR

#: name -> allowed finding codes. Every entry must correspond to a
#: documented compact-table (or equivalent) justification in the
#: query's docstring.
ALLOWED: dict[str, set[str]] = {
    # the compact-table policy's namesake: vocab-rank window over the
    # distinct-token table; its feeding sort-exchange is the same
    # sanctioned window
    "q108_zipf_coverage": {
        "unpartitioned-window",
        "single-partition-exchange",
    },
    # post-Gram algebra on d^2-bounded rows (d=16); driver never
    # sees G, the single partition holds ~d^2/2 rows by construction
    "q150_power_iteration": {
        "unpartitioned-window",
        "single-partition-exchange",
    },
    # RRF fusion touches <= 2*k candidate rows (TakeOrdered depth)
    "q178_rrf_hybrid": {"unpartitioned-window"},
    # per-week survival factors: week-cardinality (calendar-bounded)
    "q201_kaplan_meier": {"unpartitioned-window"},
    # cross-bucket prefix max over the price-DOMAIN-bounded bucket
    # table
    "q228_pareto_skyline": {"unpartitioned-window"},
    # running sweep level over the per-day net table
    # (calendar-bounded forever)
    "q230_peak_concurrency": {"unpartitioned-window"},
}


def test_lint_detects_planted_killers(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    # with broadcast disabled, a condition-free inner join can only
    # plan as CartesianProductExec
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cart = n.crossJoin(r)
        assert any(
            f.startswith("cartesian-product")
            for f in plan_lint(cart)
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", thresh
        )
    win = n.select(
        F.row_number().over(W.orderBy("n_nationkey")).alias("rn")
    )
    assert any(
        f.startswith("unpartitioned-window") for f in plan_lint(win)
    )
    funnel = n.repartition(1).select("n_name")
    assert any(
        f.startswith("single-partition-exchange")
        for f in plan_lint(funnel)
    )


def test_every_registered_plan_is_clean_and_within_shuffle_snapshot(
    spark,
):
    """Two registry-wide audits in one plan-building pass:

    1. `plan_lint` — no unexplained scale-killer in ANY plan;
    2. shuffle-count snapshot — every query's exchange count is
       pinned in `tests/shuffle_budgets_all.json` (the full-registry
       extension of the hand-annotated headline budgets in
       `test_shuffle_budget.py`): a refactor that adds an exchange to
       ANY registered query fails here with the delta, and a NEW
       query cannot register without adding its snapshot row.

    Snapshot counts are cold-slot plans (caches released per query,
    the `test_shuffle_budget` convention). Regenerate with
    ``python tests/regen_shuffle_budgets.py`` — which REFUSES to
    absorb a pin DECREASE unless each one is named with
    ``--allow-decrease`` (VERDICT r8 #7: a lost exchange can be a
    lost repartition guard, not just a win; the acknowledgment
    belongs in the command, not in a silent rewrite).
    """
    import json
    import pathlib

    from building_energy_data_pipeline_spark import caching
    from building_energy_data_pipeline_spark.ops.observe import (
        shuffle_count,
    )

    snapshot = json.loads(
        (
            pathlib.Path(__file__).parent / "shuffle_budgets_all.json"
        ).read_text()
    )
    # both directions: every query pinned, no dead pins lingering
    # after a rename/delete (the headline twin's set-equality rule)
    stale = set(snapshot) - set(REGISTRY)
    assert stale == set(), f"remove stale snapshot rows: {stale}"
    bad: dict[str, list[str]] = {}
    missing: list[str] = []
    over: dict[str, tuple[int, int]] = {}
    for name in sorted(REGISTRY):
        caching.release_caches()
        df = REGISTRY[name].spark(spark, SF_DIR)
        findings = [
            f
            for f in plan_lint(df)
            if f.split(":")[0] not in ALLOWED.get(name, set())
        ]
        if findings:
            bad[name] = findings
        if name not in snapshot:
            missing.append(name)
        else:
            got = shuffle_count(df)
            if got > snapshot[name]:
                over[name] = (got, snapshot[name])
    assert bad == {}, bad
    assert missing == [], f"add snapshot rows for {missing}"
    assert over == {}, (
        f"shuffle regressions (got, pinned): {over} — a broadcast "
        "was lost or a partitioning stopped being reused"
    )
