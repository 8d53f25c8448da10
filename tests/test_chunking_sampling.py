"""Round-7 operator semantics: content-defined chunking stability,
weighted reservoir sampling behavior, and the closed-form ridge
solve (operators/text.py, schema/sampling.py, operators/linear.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators import linear, text
from building_energy_data_pipeline_spark.schema.sampling import (
    weighted_reservoir_sample,
)


def _chunks(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ends = text.cdc_chunk_exprs("text")
    start = "if(ci = 0, 0, element_at(ends, ci))"
    return (
        df.select("doc_id", "text", F.expr(ends).alias("ends"))
        .select(
            "doc_id", "text", "ends",
            F.posexplode("ends").alias("ci", "e"),
        )
        .selectExpr(
            "doc_id",
            f"md5(substring(text, {start} + 1, e - {start})) as h",
            f"e - {start} as ln",
        )
        .collect()
    )


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the fence and the birds sing in the morning sun "
    "as the river flows gently past the old stone bridge near town "
    "where the market opens early and the bakers sell fresh bread "
    "to the travelers who come from far away lands seeking fortune"
)


class TestCdcChunking:
    def test_chunks_reassemble_exactly(self, spark):
        rows = _chunks(spark, [(1, BASE)])
        assert sum(r.ln for r in rows) == len(BASE)

    def test_insertion_shifts_at_most_neighboring_chunks(self, spark):
        """The content-defined property: editing one spot changes
        only the chunk(s) touching it — every other chunk keeps its
        hash (fixed-stride chunking would shift ALL downstream
        chunks). Boundary windows overlap k chars, so allow the
        edited chunk plus one neighbor per side."""
        edited = BASE[:150] + "INSERTED TEXT HERE " + BASE[150:]
        h0 = [r.h for r in _chunks(spark, [(1, BASE)])]
        h1 = [r.h for r in _chunks(spark, [(1, edited)])]
        from collections import Counter

        lost = Counter(h0) - Counter(h1)
        assert len(h0) >= 4  # meaningful split
        assert sum(lost.values()) <= 3  # locality

    def test_short_doc_is_one_whole_chunk(self, spark):
        rows = _chunks(spark, [(1, "tiny")])
        assert len(rows) == 1 and rows[0].ln == 4


class TestWeightedReservoir:
    def test_weights_bias_selection(self, spark):
        # 50 heavy rows (w=1000) among 950 light (w=1): a 50-row
        # sample must be dominated by heavy rows
        df = spark.createDataFrame(
            [(i, 1000.0 if i < 50 else 1.0) for i in range(1000)],
            "k long, w double",
        )
        got = weighted_reservoir_sample(df, "k", "w", 50).collect()
        heavy = sum(1 for r in got if r.k < 50)
        assert heavy >= 35

    def test_deterministic_and_mergeable(self, spark):
        df = spark.createDataFrame(
            [(i, float(i % 7 + 1)) for i in range(500)], "k long, w double"
        )
        a = sorted(r.k for r in weighted_reservoir_sample(df, "k", "w", 20).collect())
        b = sorted(r.k for r in weighted_reservoir_sample(df, "k", "w", 20).collect())
        assert a == b
        # merge property: top-20 of (top-20 of each half) == top-20
        lo = df.filter("k < 250")
        hi = df.filter("k >= 250")
        merged = weighted_reservoir_sample(
            weighted_reservoir_sample(lo, "k", "w", 20)
            .drop("priority_floor")
            .union(
                weighted_reservoir_sample(hi, "k", "w", 20).drop(
                    "priority_floor"
                )
            ),
            "k", "w", 20,
        )
        c = sorted(r.k for r in merged.collect())
        assert a == c


class TestRidgeSolve:
    def test_cramer_matches_numpy(self):
        rng = np.random.default_rng(7)
        w_exprs = linear.ridge3_weight_exprs(lam=1)
        for _ in range(5):
            X = np.column_stack(
                [np.ones(50), rng.integers(1, 100, 50), rng.integers(1, 50, 50)]
            ).astype(float)
            y = rng.integers(0, 2, 50).astype(float)
            G = X.T @ X + np.eye(3)
            b = X.T @ y
            expect = np.linalg.solve(G, b)
            env = {
                "n": 50.0,
                "s1": X[:, 1].sum(), "s2": X[:, 2].sum(),
                "s11": (X[:, 1] ** 2).sum(),
                "s12": (X[:, 1] * X[:, 2]).sum(),
                "s22": (X[:, 2] ** 2).sum(),
                "sy": y.sum(),
                "s1y": (X[:, 1] * y).sum(),
                "s2y": (X[:, 2] * y).sum(),
            }
            got = [
                eval(w_exprs[f"w{j}"].replace("(n + 1)", "(n + 1.0)"), env)
                for j in range(3)
            ]
            np.testing.assert_allclose(got, expect, rtol=1e-9)
