"""Unit coverage for the BPE merge twins' hard path: overlapping
matches (pair a == b), where greedy left-to-right semantics and the
oracle's run-parity formulation must agree — rare in corpus data, so
the driver oracle rows barely exercise it."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators import text


def _py_greedy_merge(toks: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(toks):
        if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
            out.append(f"{a} {b}")
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


CASES = [
    (["x", "x", "x"], "x", "x"),            # odd run: merge + tail
    (["x", "x", "x", "x"], "x", "x"),       # even run: two merges
    (["x", "x", "x", "x", "x"], "x", "x"),  # longer odd run
    (["a", "b", "a", "b"], "a", "b"),       # disjoint matches
    (["a", "b", "b", "a"], "a", "b"),       # match then miss
    (["y", "x", "x", "x", "y", "x", "x"], "x", "x"),  # runs mid-doc
    (["a"], "a", "a"),                      # single token
    ([], "a", "b"),                         # empty doc
]


class TestBpeMergeTwins:
    def test_spark_fold_matches_python_reference(self, spark):
        rows = [(i, toks) for i, (toks, _, _) in enumerate(CASES)]
        df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
        for i, (toks, a, b) in enumerate(CASES):
            got = (
                df.filter(F.col("doc_id") == i)
                .select(
                    F.expr(
                        text.bpe_merge_expr("toks", f"'{a}'", f"'{b}'")
                    ).alias("m")
                )
                .head()[0]
            )
            assert got == _py_greedy_merge(toks, a, b), (toks, a, b, got)

    def test_duck_run_parity_matches_python_reference(self):
        con = duckdb.connect()
        for toks, a, b in CASES:
            if not toks:
                continue  # empty docs produce no stream rows by design
            arr = "[" + ", ".join(f"'{t}'" for t in toks) + "]"
            sql = f"""
            WITH t AS (SELECT 1 AS doc_id, {arr}::VARCHAR[] AS toks),
            stream0 AS (
              SELECT doc_id, i, toks[i] AS tok
              FROM t, unnest(range(1, len(toks) + 1)) r(i)
            ),
            {text.duck_bpe_round_sql('stream0', 1)}
            SELECT list(tok ORDER BY i) FROM stream1
            """
            # pin the round's top pair to (a, b): single-doc corpora
            # may have other argmax pairs, so substitute directly
            sql = sql.replace(
                f"SELECT a, b FROM pc1 ORDER BY c DESC, a, b LIMIT 1",
                f"SELECT '{a}' AS a, '{b}' AS b",
            )
            got = con.execute(sql).fetchone()[0]
            assert got == _py_greedy_merge(toks, a, b), (toks, a, b, got)


class TestEmptyTopGuard:
    """A corpus with NO adjacent pair anywhere (all single-token
    docs) produces an empty top-pair table; both engines must pass
    the symbol stream through unchanged instead of vanishing it
    (the pre-guard cross joins emptied the stream)."""

    def test_duck_round_passes_stream_through(self):
        con = duckdb.connect()
        sql = f"""
        WITH t AS (
          SELECT * FROM (VALUES (1, ['solo']::VARCHAR[]),
                                (2, ['alone']::VARCHAR[])) v(doc_id, toks)),
        stream0 AS (
          SELECT doc_id, i, toks[i] AS tok
          FROM t, unnest(range(1, len(toks) + 1)) r(i)
        ),
        {text.duck_bpe_round_sql('stream0', 1)}
        SELECT doc_id, list(tok ORDER BY i) FROM stream1 GROUP BY doc_id
        """
        got = dict(con.execute(sql).fetchall())
        assert got == {1: ["solo"], 2: ["alone"]}

    def test_spark_merge_with_null_pair_is_identity(self, spark):
        import pyspark.sql.functions as F

        docs = spark.createDataFrame(
            [(1, ["solo"]), (2, ["alone"])], "doc_id long, toks array<string>"
        )
        empty_top = spark.createDataFrame(
            [], "pair_a string, pair_b string"
        )
        out = {
            r.doc_id: r.merged
            for r in docs.join(F.broadcast(empty_top), F.lit(True), "left")
            .select(
                "doc_id",
                F.expr(
                    text.bpe_merge_expr("toks", "pair_a", "pair_b")
                ).alias("merged"),
            )
            .collect()
        }
        assert out == {1: ["solo"], 2: ["alone"]}
