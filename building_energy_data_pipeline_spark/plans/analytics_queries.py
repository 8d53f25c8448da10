"""Warehouse / experimentation / robust-stats analytics — q169 onward.

Round-7 second batch: the slowly-changing-dimension, experiment-
readout, robust-outlier, smoothing, and graph-metric surface a
production lakehouse layers on top of the reference's relational ETL
(the reference keeps only latest-state tables,
``src/data_loading/data_loader.py``; it has no history tracking,
experiment tooling, or graph analytics). Every query ships a DuckDB
oracle over the same parquet inputs; where the two engines must agree
bit-for-bit on derived numbers, the arithmetic is integer/DECIMAL
until a final deterministic double op (see q167's pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query

# ---------------------------------------------------------------------------
# SCD Type-2 history build — q169
# ---------------------------------------------------------------------------


@query(
    "q169_scd2_history",
    headline=True,
    oracle="""
    WITH log AS (
      SELECT o_custkey AS custkey, o_orderpriority AS status,
             CAST(epoch(o_orderdate) AS BIGINT) AS d, o_orderkey AS k
      FROM orders),
    chg AS (
      SELECT custkey, status, d, k,
             lag(status) OVER w AS prev
      FROM log WINDOW w AS (PARTITION BY custkey ORDER BY d, k)),
    runs AS (
      SELECT custkey, status, d, k FROM chg
      WHERE prev IS NULL OR prev <> status)
    SELECT custkey, status,
           d AS eff_from,
           lead(d) OVER w AS eff_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(d) OVER w IS NULL) AS is_current
    FROM runs WINDOW w AS (PARTITION BY custkey ORDER BY d, k)
    """,
)
def q169_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build: collapse each
    customer's order-priority change log into effective-dated
    history rows (``eff_from``/``eff_to``/``version``/``is_current``)
    — the warehouse op that turns an append-only change feed into a
    point-in-time-joinable dimension. Consecutive repeats of the
    same value are collapsed into one validity interval (run-length
    collapse via ``lag``); the open row has ``eff_to IS NULL``.

    The reference keeps only latest-state tables (its loader
    upserts in place); this is the history-preserving alternative
    its users ask for first.

    Scale: one shuffle on ``custkey`` serves every window (lag,
    lead, row_number share the same partition ordering — Spark
    plans a single sort/exchange); partitions are customer-grained,
    so no data-scaled single-partition window exists. Ordering ties
    are broken by ``o_orderkey``, so the history is deterministic
    under any row arrival order.
    """
    w = W.partitionBy("custkey").orderBy("d", "k")
    log = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("status"),
        F.expr("unix_timestamp(o_orderdate)").alias("d"),
        F.col("o_orderkey").alias("k"),
    )
    runs = (
        log.withColumn("prev", F.lag("status").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("status")))
        .drop("prev")
    )
    return runs.select(
        "custkey",
        "status",
        F.col("d").alias("eff_from"),
        F.lead("d").over(w).alias("eff_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.lead("d").over(w).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch guard — q170
# ---------------------------------------------------------------------------

#: shared chi-square text: per-arm contribution (obs-exp)^2/exp from
#: integer counts and the planned weight — both engines evaluate the
#: same double expression on the same exact inputs
_SRM_EXP = "(wt * n_total)"
_SRM_CONTRIB = f"((n_obs - {_SRM_EXP}) * (n_obs - {_SRM_EXP}) / {_SRM_EXP})"


@query(
    "q170_srm_check",
    oracle=f"""
    WITH users AS (
      SELECT DISTINCT user_id FROM events),
    assign AS (
      SELECT CASE WHEN user_id % 4 <= 1 THEN 'control'
                  WHEN user_id % 4 = 2 THEN 'treat_a'
                  ELSE 'treat_b' END AS arm,
             CASE WHEN user_id % 4 <= 1 THEN 0.5 ELSE 0.25 END AS wt
      FROM users),
    obs AS (
      SELECT arm, MIN(wt) AS wt,
             CAST(COUNT(*) AS DOUBLE) AS n_obs
      FROM assign GROUP BY arm),
    tot AS (SELECT CAST(SUM(n_obs) AS DOUBLE) AS n_total FROM obs),
    contrib AS (
      SELECT arm, n_obs, wt, n_total,
             {_SRM_CONTRIB} AS c
      FROM obs, tot),
    chi AS (SELECT SUM(c) AS chi2 FROM contrib)
    SELECT arm,
           CAST(n_obs AS BIGINT) AS n_users,
           CAST(floor({_SRM_EXP} * 1000000) AS BIGINT) AS expected_u,
           CAST(floor(c * 1000000) AS BIGINT) AS contrib_u,
           CAST(floor(chi2 * 1000000) AS BIGINT) AS chi2_u,
           (chi2 > 13.816) AS srm_alert
    FROM contrib, chi
    """,
)
def q170_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for experiment assignment: users
    hash into arms with a planned 2:1:1 allocation; the chi-square
    statistic of observed vs planned counts (df=2) flags broken
    randomization (``chi2 > 13.816`` ≈ p<0.001, the standard SRM
    alert threshold). SRM is the first validity check every
    experimentation platform runs before reading a metric — a
    mismatched ratio invalidates q167's CUPED readout upstream.

    All inputs to the double chi-square text are exact (integer
    counts, the planned weight); both engines evaluate the same
    expression string, so ``chi2_u`` hash-pins the statistic.

    Scale: one distinct on ``user_id`` (map-side combined), then
    arm-cardinality aggregates; the totals row broadcasts. At 100 TB
    the distinct is the only real shuffle and is exactly the
    dedup-by-key shape AQE handles.
    """
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    assign = users.select(
        F.expr(
            "CASE WHEN user_id % 4 <= 1 THEN 'control'"
            " WHEN user_id % 4 = 2 THEN 'treat_a'"
            " ELSE 'treat_b' END"
        ).alias("arm"),
        F.expr(
            "CASE WHEN user_id % 4 <= 1 THEN 0.5 ELSE 0.25 END"
        ).alias("wt"),
    )
    obs = assign.groupBy("arm").agg(
        F.min("wt").alias("wt"),
        F.count("*").cast("double").alias("n_obs"),
    )
    tot = obs.agg(F.expr("cast(sum(n_obs) as double)").alias("n_total"))
    contrib = obs.crossJoin(F.broadcast(tot)).withColumn(
        "c", F.expr(_SRM_CONTRIB)
    )
    chi = contrib.agg(F.sum("c").alias("chi2"))
    return contrib.crossJoin(F.broadcast(chi)).select(
        "arm",
        F.expr("cast(n_obs as bigint)").alias("n_users"),
        F.expr(f"cast(floor({_SRM_EXP} * 1000000) as bigint)").alias(
            "expected_u"
        ),
        F.expr("cast(floor(c * 1000000) as bigint)").alias("contrib_u"),
        F.expr("cast(floor(chi2 * 1000000) as bigint)").alias("chi2_u"),
        F.expr("chi2 > 13.816").alias("srm_alert"),
    )


# ---------------------------------------------------------------------------
# Robust MAD outliers — q171
# ---------------------------------------------------------------------------

#: 1 / Φ⁻¹(3/4): the consistency constant that makes MAD estimate σ
#: under normality; written once, evaluated identically by both engines
_MAD_K = "(mad / 0.6744897501960817)"


@query(
    "q171_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type)
    SELECT m.event_type, m.n,
           CAST(floor(m.med * 1000000) AS BIGINT) AS med_u,
           CAST(floor(d.mad * 1000000) AS BIGINT) AS mad_u,
           CAST(SUM(CASE WHEN abs(e.value - m.med) >
                         3.0 * {_MAD_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m USING (event_type) JOIN mad d ON m.event_type = d.event_type
    GROUP BY m.event_type, m.n, m.med, d.mad
    """,
)
def q171_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median / MAD
    (median absolute deviation) with the 0.6745 normal-consistency
    constant — the estimator that, unlike mean/stddev z-scores,
    does not let the outliers it is hunting inflate its own scale.
    A reading is flagged when ``|v - med| > 3·MAD/0.6745`` (the
    "robust 3σ" rule).

    Both engines compute the exact interpolating median
    (Spark ``percentile``, DuckDB ``quantile_cont`` — identical
    (a+b)/2 interpolation on identical doubles), so ``med_u`` /
    ``mad_u`` / outlier counts hash-match.

    Scale: three scans, each reducing to event-type cardinality with
    map-side partials; the 5-row median/MAD tables broadcast back.
    Exact grouped ``percentile`` buffers per-group values — the
    documented 100 TB swap is ``approx_percentile`` (KLL sketch,
    mergeable, bounded memory; q158 pins the error-bound contract),
    which changes only the agg function, not the plan shape.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"),
        F.count("*").alias("n"),
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med", "mad")
        .agg(
            F.expr(
                f"cast(sum(case when abs(value - med) > 3.0 * {_MAD_K}"
                " then 1 else 0 end) as bigint)"
            ).alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.expr("cast(floor(med * 1000000) as bigint)").alias("med_u"),
            F.expr("cast(floor(mad * 1000000) as bigint)").alias("mad_u"),
            "n_outliers",
        )
    )


# ---------------------------------------------------------------------------
# Integer-exact EWMA smoothing — q172
# ---------------------------------------------------------------------------

#: EWMA α=1/4 over a 16-row frame with INTEGER weights: lag-k weight
#: is 3^k·4^(15-k) (newest k=0 → 4^15). All weights and products are
#: exact BIGINTs (≤ ~1.7e17 total, inside int64), so the only float
#: op is one final num/den divide on identical int64s — deterministic
#: in both engines. pow() doubles are exact for these small powers.
_EWMA_W = "cast(pow(3, {k}) * pow(4, 15 - ({k})) as bigint)"


@query(
    "q172_ewma_smoothing",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_id,
             CAST(floor(value * 10000) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT r1.user_id, r1.event_id,
           CAST(COUNT(*) AS BIGINT) AS n_frame,
           CAST(floor(
             CAST(SUM(r2.v * {_EWMA_W.format(k='r1.rn - r2.rn')}) AS DOUBLE)
             / CAST(SUM({_EWMA_W.format(k='r1.rn - r2.rn')}) AS DOUBLE)
             * 100) AS BIGINT) AS ewma_u
    FROM r r1 JOIN r r2
      ON r1.user_id = r2.user_id AND r2.rn BETWEEN r1.rn - 15 AND r1.rn
    GROUP BY r1.user_id, r1.event_id
    """,
)
def q172_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=1/4, 16-row frame)
    of each user's event values — the smoothing primitive behind
    rate limiting, anomaly baselines, and metric dashboards. EWMA's
    recursive definition does not distribute; the bounded-frame form
    (weights decay 3/4 per lag, truncated at 16 rows ≈ weight 1%)
    does, and with INTEGER weights ``3^k·4^(15-k)`` the whole sum
    stays exact int64 until one final division — so the oracle
    hash-pins every smoothed value, something float-accumulated
    EWMAs cannot do across engines.

    Spark side: one window (``collect_list`` over a ROWS frame) and
    a JVM-side ``zip_with``/``aggregate`` fold — no Python, no
    explode, no self-join. The oracle re-derives the same numbers
    relationally (bounded self-join on row numbers).

    Scale: one shuffle on ``user_id`` + per-user sort; frames are
    O(16) regardless of series length, and partitioning is
    user-grained — the 100 TB plan is identical.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-15, 0)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("cast(floor(value * 10000) as bigint)").alias("v"),
    )
    wk = _EWMA_W.format(k="k")
    return (
        ev.withColumn("xs", F.collect_list("v").over(frame))
        .select(
            "user_id",
            "event_id",
            F.expr("cast(size(xs) as bigint)").alias("n_frame"),
            F.expr(
                "cast(floor("
                " cast(aggregate(zip_with(xs, sequence(size(xs) - 1, 0, -1),"
                f"   (x, k) -> x * {wk}), 0L, (acc, t) -> acc + t) as double)"
                " / cast(aggregate(sequence(size(xs) - 1, 0, -1), 0L,"
                f"   (acc, k) -> acc + {wk}) as double)"
                " * 100) as bigint)"
            ).alias("ewma_u"),
        )
    )


# ---------------------------------------------------------------------------
# Triangle counting / global clustering — q173
# ---------------------------------------------------------------------------


@query(
    "q173_triangle_count",
    headline=True,
    oracle="""
    WITH co AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-10-01'),
    e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM co a JOIN co b ON a.o = b.o AND a.p < b.p),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node),
    tri AS (
      SELECT COUNT(*) AS n_tri
      FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3
        ON e3.u = e1.u AND e3.v = e2.v),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg),
    ecnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
    SELECT n_nodes, n_edges, n_wedges,
           CAST(n_tri AS BIGINT) AS n_triangles,
           CAST(floor(3.0 * n_tri / n_wedges * 1000000) AS BIGINT)
             AS gcc_u
    FROM agg, ecnt, tri
    """,
)
def q173_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    part-co-purchase graph (parts are adjacent when they appear in
    the same order; the first ~quarter of ship dates keeps the
    graph at demo density). Triangle density is the standard structure probe
    on similarity/co-occurrence graphs — it separates genuinely
    clustered corpora from hub artifacts before anything expensive
    (community detection, GNN sampling) runs on them.

    Spark side counts each triangle once via **degree-ordered
    orientation**: every edge points from its (degree, id)-smaller
    endpoint, which caps out-degree at O(√m) on any graph and makes
    the wedge join's fan-out bounded — the Cohen / GraphX strategy.
    The oracle counts the same triangles with the simpler numeric
    orientation (u<v<w), so the counts agree while the plans differ
    where scale demands it.

    Scale: edge build shuffles on order key (per-order fan-out ≤
    C(lines,2)); wedge join and closure join are equi-joins on node
    ids; nothing is quadratic in |V| — pair space is Σ out-deg²,
    the orientation-bounded optimum.
    """
    from .. import caching

    co = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1996-10-01"))
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # the edge list feeds FOUR consumers (deg, orientation, wedge
    # closure, edge count) — stage it once or every branch re-runs
    # the co-purchase self-join
    e = caching.slot_persist(
        "q173_edges",
        co.alias("a")
        .join(co.alias("b"), "o")
        .filter(F.expr("a.p < b.p"))
        .select(F.expr("a.p").alias("u"), F.expr("b.p").alias("v"))
        .distinct(),
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # orient every edge toward the (degree, id)-larger endpoint;
    # staged too — the oriented table drives both wedge sides AND
    # the closure probe (three consumers)
    ed = (
        e.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("d", "du")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"),
            "v",
        )
        .select(
            F.expr(
                "case when (du, u) < (dv, v) then u else v end"
            ).alias("s"),
            F.expr(
                "case when (du, u) < (dv, v) then v else u end"
            ).alias("t"),
            F.expr(
                "case when (du, u) < (dv, v) then dv else du end"
            ).alias("dt"),
        )
        .withColumn("tkey", F.struct("dt", "t"))
        .drop("dt")
    )
    ed = caching.slot_persist("q173_oriented", ed)
    wedges = (
        ed.alias("x")
        .join(ed.alias("y"), F.expr("x.s = y.s and x.tkey < y.tkey"))
        .select(F.expr("x.t").alias("a"), F.expr("y.t").alias("b"))
    )
    closed = wedges.join(
        ed.select(
            F.least("s", "t").alias("a2"), F.greatest("s", "t").alias("b2")
        ),
        F.expr(
            "least(a, b) = a2 and greatest(a, b) = b2"
        ),
    )
    tri = closed.agg(F.count("*").alias("n_tri"))
    agg = deg.agg(
        F.count("*").alias("n_nodes"),
        F.expr("cast(sum(d * (d - 1) div 2) as bigint)").alias("n_wedges"),
    )
    ecnt = e.agg(F.count("*").alias("n_edges"))
    return (
        agg.crossJoin(F.broadcast(ecnt))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.expr("cast(n_tri as bigint)").alias("n_triangles"),
            F.expr(
                "cast(floor(3.0 * n_tri / n_wedges * 1000000) as bigint)"
            ).alias("gcc_u"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source quantile normalization — q174
# ---------------------------------------------------------------------------


@query(
    "q174_quantile_normalize",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id)
                  AS BIGINT) AS rank
      FROM documents),
    grid AS (
      SELECT rank,
             SUM(n_chars) * 1000000 // COUNT(*) AS qnorm_u
      FROM r GROUP BY rank)
    SELECT r.doc_id, r.source, r.n_chars, r.rank,
           CAST(grid.qnorm_u AS BIGINT) AS qnorm_u
    FROM r JOIN grid USING (rank)
    """,
)
def q174_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document lengths across sources
    (the batch-effect correction used to make per-source score
    distributions comparable before mixing weights are fit): each
    document is re-assigned the ACROSS-SOURCE mean of the length at
    its within-source rank, so every source ends up with the same
    marginal distribution while preserving within-source order.

    ``qnorm_u`` is exact integer arithmetic (``sum·10⁶ div count``)
    — no float averaging, so the oracle hash pins every remapped
    value.

    Scale: one window partitioned by ``source`` (source-grained
    partitions; a skewed mega-source is the known caveat and would
    be range-salted like q114), one rank-cardinality aggregate, and
    a broadcast-back join on rank. Corpus bytes are read once.
    """
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    r = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )
    grid = r.groupBy("rank").agg(
        F.expr("sum(n_chars) * 1000000 div count(*)").alias("qnorm_u")
    )
    return r.join(F.broadcast(grid), "rank").select(
        "doc_id", "source", "n_chars", "rank",
        F.col("qnorm_u").cast("bigint").alias("qnorm_u"),
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking + edit-distance verify — q175
# ---------------------------------------------------------------------------


@query(
    "q175_sorted_neighborhood",
    oracle="""
    WITH s AS (
      SELECT doc_id, lower(text[1:16]) AS k,
             lower(text[1:40]) AS probe
      FROM documents),
    r AS (
      SELECT doc_id, probe,
             CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT)
               AS rn
      FROM s)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(b.rn - a.rn AS BIGINT) AS gap,
           CAST(levenshtein(a.probe, b.probe) AS BIGINT) AS lev
    FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3
    WHERE levenshtein(a.probe, b.probe) <= 20
    """,
)
def q175_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernández &
    Stolfo's merge/purge): documents sort by a normalized key (first
    16 chars lowercased), and only rows within a 3-row window of
    each other are compared — O(n·w) candidate pairs instead of
    O(n²) — then verified by Levenshtein distance over a 40-char
    probe. The classic complement to hash blocking (q68) and LSH
    (q28): it catches near-misses that land in DIFFERENT hash
    buckets but adjacent sort positions.

    Spark side has no O(n) global window: the global sort rank comes
    from ``scale.global_row_index`` (range partition + offset), and
    the neighbor pairing is an EQUI-join on ``rn + δ`` (δ exploded
    from [1,2,3]) — no banded non-equi join, no BNLJ. The oracle
    re-derives the same pairs with a plain window + range join.

    Scale: one range exchange for the sort, a ×3 map-side fan-out,
    one equi-join on the dense rank — every piece is the shape
    distributed ORDER BY already uses; window width w is the only
    tuning knob.
    """
    from ..operators import scale

    s = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("lower(substring(text, 1, 16))").alias("k"),
        F.expr("lower(substring(text, 1, 40))").alias("probe"),
    )
    r = scale.global_row_index(s, ["k", "doc_id"], index_name="rn").select(
        "doc_id", "probe", "rn"
    )
    left = r.select(
        F.col("doc_id").alias("a_id"),
        F.col("probe").alias("a_probe"),
        F.explode(F.expr("array(1L, 2L, 3L)")).alias("gap"),
        (F.col("rn")).alias("a_rn"),
    ).withColumn("rn", F.expr("a_rn + gap"))
    return (
        left.join(r, "rn")
        .select(
            "a_id",
            F.col("doc_id").alias("b_id"),
            "gap",
            F.expr("cast(levenshtein(a_probe, probe) as bigint)").alias(
                "lev"
            ),
        )
        .filter(F.col("lev") <= 20)
    )


# ---------------------------------------------------------------------------
# Signed-random-projection LSH over embeddings — q176
# ---------------------------------------------------------------------------

#: ±1 projection entry for (bit j, dim d): parity of the shared md5
#: hash — both engines derive the identical sign matrix from the
#: same hex digest, no RNG anywhere.
_SRP_SIGN = (
    "(case when cast(conv(substring(md5(concat(cast({j} as string), ':',"
    " cast({d} as string))), 1, 8), 16, 10) as bigint) % 2 = 0"
    " then cast(1.0 as double) else cast(-1.0 as double) end)"
)
_DUCK_SRP_SIGN = (
    "(CASE WHEN CAST(concat('0x', substring(md5(concat(CAST({j} AS VARCHAR),"
    " ':', CAST({d} AS VARCHAR))), 1, 8)) AS BIGINT) % 2 = 0"
    " THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)"
)

_SRP_BITS = 8

from ..operators import similarity as _sim  # noqa: E402  (oracle text below)


@query(
    "q176_srp_lsh",
    headline=True,
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             (SELECT SUM(CASE WHEN list_reduce(list_prepend(0.0,
                 list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * {_DUCK_SRP_SIGN.format(j='j', d='i - 1')})),
                 (acc, v) -> acc + v) > 0
                 THEN CAST(1 AS BIGINT) * (1 << j) ELSE 0 END)
              FROM generate_series(0, {_SRP_BITS - 1}) AS g(j))
               AS bucket
      FROM embeddings),
    pairs AS (
      SELECT x.vec_id AS a, y.vec_id AS b, x.bucket,
             CAST(floor(
               {_sim.duck_dot_sql('x.embedding', 'y.embedding')}
               / ({_sim.duck_norm_sql('x.embedding')}
                  * {_sim.duck_norm_sql('y.embedding')}) * 1000000)
               AS BIGINT) AS cos_u
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
    SELECT a, b, CAST(bucket AS BIGINT) AS bucket, cos_u
    FROM pairs ORDER BY cos_u DESC, a, b LIMIT 25
    """,
)
def q176_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection (SimHash-for-vectors) LSH: each
    embedding maps to an 8-bit bucket — bit j is the sign of its
    dot product with a pseudo-random ±1 hyperplane derived from a
    shared md5 parity (Charikar 2002) — and only same-bucket pairs
    are cosine-verified, top-25 reported. The cosine counterpart of
    the text-side MinHash (q28) / SimHash (q29) family: collision
    probability is 1 − θ/π per bit, so buckets concentrate
    small-angle pairs while the pair space drops from O(n²) to
    Σ|bucket|².

    The projection is a MAP-ONLY expression (nested zip_with /
    aggregate folds inside codegen — no explode, no Python, no
    shuffle to assign buckets); the oracle rebuilds the identical
    signs from the same md5 text and folds the dot product in the
    same left-to-right order, so bucket ids and ``cos_u`` both
    hash-match.

    Scale: bucket assignment is embarrassingly parallel; the
    self-join is an equi-join on bucket (AQE-handled skew if a hub
    bucket forms); raising bits thins buckets geometrically —
    the standard recall/cost dial.
    """
    from ..operators import similarity

    sign = _SRP_SIGN.format(j="j", d="d")
    bucket_expr = (
        f"aggregate(sequence(0, {_SRP_BITS - 1}), 0L, (acc, j) ->"
        " acc + if(aggregate(zip_with(embedding,"
        " sequence(0, size(embedding) - 1),"
        f" (x, d) -> cast(x as double) * {sign}),"
        " cast(0.0 as double), (a, v) -> a + v) > cast(0.0 as double),"
        " cast(shiftleft(1, j) as bigint), 0L))"
    )
    b = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.expr(bucket_expr).alias("bucket")
    )
    x = b.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("xv"),
        "bucket",
    )
    y = b.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("yv"),
        "bucket",
    )
    cos = (
        f"{similarity.dot_expr('xv', 'yv')}"
        f" / ({similarity.norm_expr('xv')} * {similarity.norm_expr('yv')})"
    )
    return (
        x.join(y, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.col("bucket").cast("bigint").alias("bucket"),
            F.expr(f"cast(floor({cos} * 1000000) as bigint)").alias(
                "cos_u"
            ),
        )
        .orderBy(F.desc("cos_u"), "a", "b")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Point-in-time SCD2 lookup — q177
# ---------------------------------------------------------------------------

#: shared SQL prefix: the q169 change-log collapse, deduped to ONE
#: status per (custkey, day) — latest order key that day wins — so
#: the as-of key (custkey, d) is unique on both engines
_Q177_HIST = """
    log AS (
      SELECT o_custkey AS custkey, o_orderpriority AS status,
             CAST(epoch(o_orderdate) AS BIGINT) AS d, o_orderkey AS k
      FROM orders),
    chg AS (
      SELECT custkey, status, d, k, lag(status) OVER w AS prev
      FROM log WINDOW w AS (PARTITION BY custkey ORDER BY d, k)),
    runs AS (
      SELECT custkey, status, d, k FROM chg
      WHERE prev IS NULL OR prev <> status),
    hist AS (
      SELECT custkey, d, status
      FROM runs QUALIFY row_number() OVER (
        PARTITION BY custkey, d ORDER BY k DESC) = 1)
"""


def _q177_oracle() -> str:
    from ..functions.scalar import dec_sum_sql

    return f"""
    WITH {_Q177_HIST},
    f AS (
      SELECT o.o_custkey AS custkey,
             CAST(epoch(l.l_shipdate) AS BIGINT) AS t,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT h.status AS status_at,
           CAST(COUNT(*) AS BIGINT) AS n_facts,
           {dec_sum_sql("rev")} AS revenue
    FROM f ASOF JOIN hist h
      ON f.custkey = h.custkey AND f.t >= h.d
    GROUP BY h.status
    """


@query("q177_point_in_time_join", headline=True, oracle=_q177_oracle())
def q177_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) fact enrichment against the SCD2
    dimension q169 builds: every lineitem is decorated with the
    customer's order-priority status THAT WAS VALID ON ITS SHIP
    DATE — the feature-store / audit-correct join that prevents
    label leakage from future dimension states (joining the latest
    state, the reference loader's only option, back-dates today's
    status onto yesterday's facts). Rolled up to revenue per
    effective status.

    The change history is deduped to one status per (custkey, day)
    — latest order that day wins — so the as-of key is unique and
    both engines' as-of semantics coincide; the oracle uses DuckDB's
    native ASOF JOIN (the q36 pattern) while the engine routes
    through ``operators/asof.asof_join`` (union – sort – carry-
    forward, ``right_unique=True``).

    Scale: ONE custkey shuffle serves the history windows and the
    as-of union; facts join orders on the orderkey they're already
    co-partitioned by in a keyed warehouse. No interval explosion,
    no range join — the carry-forward trick turns point-in-time
    lookup into a linear merge per key.
    """
    from ..functions.scalar import dec_sum
    from ..operators.asof import asof_join

    w = W.partitionBy("custkey").orderBy("d", "k")
    log = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("status"),
        F.expr("unix_timestamp(o_orderdate)").alias("d"),
        F.col("o_orderkey").alias("k"),
    )
    hist = (
        log.withColumn("prev", F.lag("status").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("status")))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("custkey", "d").orderBy(F.desc("k"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("custkey", "d", "status")
    )
    facts = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            F.expr("unix_timestamp(l_shipdate)").alias("t"),
            F.expr("l_extendedprice * (1 - l_discount)").alias("rev"),
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", F.col("o_custkey").alias("custkey")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("custkey", "t", "rev")
    )
    joined = asof_join(
        facts,
        hist,
        on=["custkey"],
        left_ts="t",
        right_ts="d",
        right_unique=True,
    )
    return joined.groupBy(
        F.col("right_status").alias("status_at")
    ).agg(
        F.count("*").alias("n_facts"),
        dec_sum("rev").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank-fusion hybrid retrieval — q178
# ---------------------------------------------------------------------------

#: RRF constant (Cormack et al. 2009); 60 is the published default
_RRF_K = 60
_RRF_TOP = 20
#: candidate depth per retriever
_RRF_DEPTH = 40


def _q178_oracle() -> str:
    from ..operators import similarity as sim
    from .llm_queries import DTOK, _bm25_exprs, BM25_TERMS

    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    score, matched = _bm25_exprs("//")
    return f"""
    WITH per AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
             {tf_cols}
      FROM (SELECT doc_id, {DTOK} AS toks FROM documents)),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len,
             {df_cols}
      FROM per),
    lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (
               ORDER BY {score} DESC, doc_id) AS BIGINT) AS lex_rank
      FROM per, g WHERE {matched} > 0
      ORDER BY lex_rank LIMIT {_RRF_DEPTH}),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    den AS (
      SELECT vec_id,
             CAST(floor({sim.duck_dot_sql('embedding', 'q')}
               / ({sim.duck_norm_sql('embedding')}
                  * {sim.duck_norm_sql('q')}) * 1000000) AS BIGINT)
               AS cos_u
      FROM embeddings, qv WHERE vec_id <> 0),
    dense AS (
      SELECT vec_id AS doc_id,
             CAST(row_number() OVER (
               ORDER BY cos_u DESC, vec_id) AS BIGINT) AS dense_rank
      FROM den ORDER BY dense_rank LIMIT {_RRF_DEPTH}),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             l.lex_rank, d.dense_rank,
             (CASE WHEN l.lex_rank IS NULL THEN 0
                   ELSE 1000000 // ({_RRF_K} + l.lex_rank) END
              + CASE WHEN d.dense_rank IS NULL THEN 0
                     ELSE 1000000 // ({_RRF_K} + d.dense_rank) END)
               AS rrf_u
      FROM lex l FULL OUTER JOIN dense d USING (doc_id))
    SELECT doc_id, lex_rank, dense_rank, CAST(rrf_u AS BIGINT) AS rrf_u
    FROM fused ORDER BY rrf_u DESC, doc_id LIMIT {_RRF_TOP}
    """


@query("q178_rrf_hybrid", headline=True, oracle=_q178_oracle())
def q178_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal rank fusion (Cormack et al.
    2009): the BM25 lexical ranking (q148's scorer, same persist
    slot) and a dense cosine ranking against a fixed query vector
    (vec_id 0, the q34 brute-force path) each contribute
    ``1e6 div (60 + rank)``; the fused top-{_RRF_TOP} is the
    production first-stage retrieval stack in one declarative plan.
    Rank fusion needs NO score calibration between retrievers —
    exactly why RRF is the default hybrid combiner — and integer
    division keeps the fused score engine-exact.

    Scale: both candidate lists are TakeOrdered {_RRF_DEPTH}-row
    sets — driver-sized regardless of corpus size; the fusion join
    touches ≤2·{_RRF_DEPTH} rows. The corpus-sized work is the two
    scorers, each already plan-audited (q148: slot-staged tf
    projection + broadcast stats; dense: map-only fold against a
    broadcast query row).
    """
    from ..caching import slot_persist
    from ..operators import scale, similarity
    from .llm_queries import BM25_TERMS, TOK, _bm25_exprs

    docs = load_table(spark, sf_dir, "documents")
    per = slot_persist(
        "text.bm25_tf",
        scale.spread_scan(docs, cols=["doc_id", "text"], by=["doc_id"])
        .select("doc_id", F.expr(TOK).alias("toks"))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            *[
                F.expr(f"size(filter(toks, x -> x = '{t}'))")
                .cast("long")
                .alias(f"tf{i}")
                for i, t in enumerate(BM25_TERMS)
            ],
        ),
    )
    g = per.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    score, matched = _bm25_exprs("div")
    lex = (
        per.crossJoin(F.broadcast(g))
        .filter(F.expr(matched) > 0)
        .select("doc_id", F.expr(score).cast("long").alias("s"))
        .orderBy(F.desc("s"), "doc_id")
        .limit(_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("s"), "doc_id"))
            .cast("long")
            .alias("lex_rank"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    cos = (
        f"{similarity.dot_expr('embedding', 'q')}"
        f" / ({similarity.norm_expr('embedding')}"
        f" * {similarity.norm_expr('q')})"
    )
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.expr(f"cast(floor({cos} * 1000000) as bigint)").alias(
                "cos_u"
            ),
        )
        .orderBy(F.desc("cos_u"), "vec_id")
        .limit(_RRF_DEPTH)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number()
            .over(W.orderBy(F.desc("cos_u"), "vec_id"))
            .cast("long")
            .alias("dense_rank"),
        )
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.when(
                F.col("lex_rank").isNull(), F.lit(0)
            ).otherwise(F.expr(f"1000000 div ({_RRF_K} + lex_rank)"))
            + F.when(
                F.col("dense_rank").isNull(), F.lit(0)
            ).otherwise(F.expr(f"1000000 div ({_RRF_K} + dense_rank)"))
        )
        .cast("long")
        .alias("rrf_u"),
    )
    return fused.orderBy(F.desc("rrf_u"), "doc_id").limit(_RRF_TOP)
