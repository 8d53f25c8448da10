"""Count-min sketch — sublinear-memory frequency estimation.

The streaming/sketch complement to the exact two-pass heavy-hitter
miner (``plans/training_queries.py`` q131): a d×w counter grid whose
per-token estimate ``min_r grid[r][h_r(tok)]`` NEVER underestimates
and overestimates by at most ‖stream‖/w per row with probability
1−2^−d (Cormode & Muthukrishnan 2005). Where q131 needs a second
exact pass over the corpus, the sketch answers point queries from
d·w integers — the shape that merges across streams/partitions by
plain addition, so it drops into `foreachBatch` maintenance
(q126's pattern) unchanged.

Hashes are the repo's portable md5 convention (Spark ``conv(substr
(md5(...)))`` ≡ DuckDB ``concat('0x', substring(md5(...)))`` hex
cast — ``operators/dedup.py:176-221``), so the DuckDB twins replay
the exact grid.

Scale: the build explodes each token to its d (row, bucket) cells,
but partial aggregation collapses every task's contribution to at
most d·w rows BEFORE the exchange — the shuffle carries sketch-sized
partials regardless of corpus size, and the grid itself broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default grid: 4 rows × 256 buckets (ε ≈ e/256, δ ≈ 2⁻⁴)
CMS_D = 4
CMS_W = 256


def _bucket_expr(token_expr: str, row_expr: str, w: int) -> str:
    """Spark SQL: md5-derived bucket of ``token_expr`` under hash row
    ``row_expr`` (independent rows via the salt-concat convention)."""
    return (
        f"cast(conv(substring(md5(concat({token_expr}, ':',"
        f" cast({row_expr} as string))), 1, 8), 16, 10) as bigint)"
        f" % {w}"
    )


def duck_bucket_sql(token_expr: str, row_expr: str, w: int) -> str:
    """DuckDB twin of :func:`_bucket_expr` (identical md5 bytes)."""
    return (
        f"CAST(concat('0x', substring(md5(concat({token_expr}, ':',"
        f" CAST({row_expr} AS VARCHAR))), 1, 8)) AS BIGINT) % {w}"
    )


def countmin_build(
    tokens: DataFrame,
    token_col: str = "tok",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Build the d×w counter grid over a token stream (one row per
    token occurrence). Returns ``(row_id int, bucket bigint, c
    bigint)`` — at most d·w rows, broadcastable by construction.

    The per-token explode is d small integers (never the token
    string d times); map-side combine bounds every task's exchange
    contribution at d·w partial counters.
    """
    cells = tokens.select(
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {d} - 1),"
                f" r -> {_bucket_expr(token_col, 'r', w)})"
            )
        ).alias("row_id", "bucket")
    )
    return cells.groupBy("row_id", "bucket").agg(
        F.count("*").cast("long").alias("c")
    )


def countmin_estimate(
    grid: DataFrame,
    probes: DataFrame,
    token_col: str = "tok",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-query the sketch for every probe token: ``cms_est`` =
    the minimum counter across the token's d cells (the CMS upper
    bound on its true frequency). Probe side explodes to d cell
    keys and joins the broadcast grid — map-only."""
    keyed = probes.select(
        "*",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {d} - 1),"
                f" r -> {_bucket_expr(token_col, 'r', w)})"
            )
        ).alias("row_id", "bucket"),
    )
    other = [c for c in probes.columns if c != token_col]
    # LEFT join + coalesce-0: a probe token the stream never touched
    # has empty cells, i.e. counters of ZERO — an inner join would
    # drop those cells and report min-over-present (overestimating a
    # never-seen token, or losing it entirely when all d cells are
    # empty) instead of the correct estimate 0
    return (
        keyed.join(F.broadcast(grid), ["row_id", "bucket"], "left")
        .groupBy(token_col, *other)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
    )


def duck_countmin_sql(
    token_stream_sql: str,
    top_n: int = 20,
    d: int = CMS_D,
    w: int = CMS_W,
) -> str:
    """DuckDB twin of build → exact-top-N probe → estimate: given a
    ``SELECT ... tok`` stream, emits ``(tok, exact_c, cms_est,
    overestimate)`` for the exact top-``top_n`` tokens (count desc,
    token text tiebreak). ``overestimate ≥ 0`` is the CMS guarantee
    the oracle hash pins."""
    bucket_build = duck_bucket_sql("tok", "r", w)
    bucket_probe = duck_bucket_sql("e.tok", "t.r", w)
    return f"""
    WITH toks AS ({token_stream_sql}),
    counters AS (
      SELECT CAST(r AS INT) AS row_id, {bucket_build} AS bucket,
             COUNT(*) AS c
      FROM toks, unnest(range(0, {d})) t(r)
      GROUP BY 1, 2),
    exact AS (
      SELECT tok, COUNT(*) AS exact_c FROM toks
      GROUP BY tok ORDER BY exact_c DESC, tok LIMIT {top_n}),
    est AS (
      SELECT e.tok, e.exact_c, MIN(c.c) AS cms_est
      FROM exact e, unnest(range(0, {d})) t(r)
      JOIN counters c
        ON c.row_id = CAST(t.r AS INT) AND c.bucket = {bucket_probe}
      GROUP BY e.tok, e.exact_c)
    SELECT tok, exact_c, cms_est, cms_est - exact_c AS overestimate
    FROM est
    """
