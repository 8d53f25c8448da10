"""Reference-implementation cross-checks for the q148-q151 family:
each query's arithmetic spec re-implemented in plain Python/numpy and
compared against the Spark plan on real test data. The DuckDB parity
suite proves the two ENGINE twins agree; these tests prove the shared
spec agrees with the textbook algorithm."""

from __future__ import annotations

import collections
import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.plans.queries import REGISTRY
from building_energy_data_pipeline_spark.sources.readers import load_table

from conftest import SF_DIR


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _hash32(s: str, seed: int = 0) -> int:
    return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# q148 — BM25 vs a float reference ranking
# ---------------------------------------------------------------------------


class TestBM25:
    def test_integer_scores_track_float_bm25(self, spark, sf_dir):
        """The per-mille-factored integer score must rank documents
        like textbook float BM25 (k1=1.2, b=0.75, rational idf):
        same top-10 ids, and Spearman-positive across the top-40."""
        from building_energy_data_pipeline_spark.plans.llm_queries import (
            BM25_TERMS,
        )

        docs = {
            r.doc_id: _toks(r.text)
            for r in load_table(spark, sf_dir, "documents").collect()
        }
        n = len(docs)
        total = sum(len(t) for t in docs.values())
        avgdl = total / n
        df = {
            t: sum(1 for toks in docs.values() if t in toks)
            for t in BM25_TERMS
        }
        k1, b = 1.2, 0.75

        def fscore(doc_id):
            toks = docs[doc_id]
            dl = len(toks)
            s = 0.0
            for t in BM25_TERMS:
                tf = toks.count(t)
                if not tf:
                    continue
                idf = (n - df[t] + 0.5) / (df[t] + 0.5)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            return s

        got = REGISTRY["q148_bm25_retrieval"].spark(spark, sf_dir).collect()
        ref = sorted(
            (d for d in docs if fscore(d) > 0),
            key=lambda d: (-fscore(d), d),
        )
        # the integer quantization (two per-mille divisions) may swap
        # near-ties; the head of the ranking must agree as a SET and
        # the full lists must be strongly rank-correlated
        got_ids = [r.doc_id for r in got]
        assert set(got_ids[:10]) == set(ref[:10])
        common = [d for d in ref if d in set(got_ids)]
        ranks_got = {d: i for i, d in enumerate(got_ids)}
        xs = [ranks_got[d] for d in common]
        ys = list(range(len(common)))
        rho = np.corrcoef(xs, ys)[0, 1]
        assert rho > 0.95, rho

    def test_scores_monotone_in_tf(self, spark, sf_dir):
        """Within equal-length docs, more occurrences of a query term
        must never lower the score (BM25 saturation is monotone)."""
        got = REGISTRY["q148_bm25_retrieval"].spark(spark, sf_dir).collect()
        assert all(r.score_micro > 0 for r in got)
        assert all(
            got[i].score_micro >= got[i + 1].score_micro
            for i in range(len(got) - 1)
        )


# ---------------------------------------------------------------------------
# q149 — the winnowing guarantee
# ---------------------------------------------------------------------------


def _winnow(toks: list[str], k: int, w: int) -> set[int]:
    grams = [
        _hash32(" ".join(toks[i : i + k]))
        for i in range(len(toks) - k + 1)
    ]
    return {
        min(grams[i : i + w])
        for i in range(len(grams) - w + 1)
    }


class TestWinnowing:
    def test_spark_selection_matches_python_winnow(self, spark, sf_dir):
        """Per-doc fingerprint sets from the Spark window plan must
        equal the direct Python winnowing of the same token stream."""
        from building_energy_data_pipeline_spark.plans.llm_queries import (
            WIN_K,
            WIN_W,
        )
        from building_energy_data_pipeline_spark import caching

        docs = {
            r.doc_id: _toks(r.text)
            for r in load_table(spark, sf_dir, "documents").collect()
        }
        caching.release_caches()
        REGISTRY["q149_winnowing_pairs"].spark(spark, sf_dir).collect()
        sel = caching._CACHE_SLOTS["text.winnow_fps"][1].collect()
        caching.release_caches()
        got = collections.defaultdict(set)
        for r in sel:
            got[r.doc_id].add(r.fp)
        for doc_id, toks in docs.items():
            assert got.get(doc_id, set()) == _winnow(toks, WIN_K, WIN_W), doc_id

    def test_shared_run_guarantee(self):
        """Any two token streams sharing a run of ≥ k + w − 1 tokens
        share at least one winnowing fingerprint (the MOSS paper's
        correctness property), on synthetic adversarial overlaps."""
        from building_energy_data_pipeline_spark.plans.llm_queries import (
            WIN_K,
            WIN_W,
        )

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(50)]
        run_len = WIN_K + WIN_W - 1
        for trial in range(25):
            shared = list(rng.choice(vocab, size=run_len))
            a = list(rng.choice(vocab, size=30)) + shared + list(
                rng.choice(vocab, size=30)
            )
            b = list(rng.choice(vocab, size=17)) + shared + list(
                rng.choice(vocab, size=5)
            )
            fa, fb = _winnow(a, WIN_K, WIN_W), _winnow(b, WIN_K, WIN_W)
            assert fa & fb, (trial, shared)


# ---------------------------------------------------------------------------
# q150 — power iteration vs numpy's eigendecomposition
# ---------------------------------------------------------------------------


class TestPowerIteration:
    def test_v2_matches_numpy_replay_and_climbs_rayleigh(
        self, spark, sf_dir
    ):
        """The Spark output must exactly equal the numpy replay of
        the integer spec, and each iteration must raise the Rayleigh
        quotient vᵀGv/vᵀv — the invariant of power iteration that
        holds for ANY spectrum (the corpus embeddings are near-white,
        so two iterations need not be near the eigenvector yet; the
        planted-direction test below pins fast convergence when a
        dominant direction exists)."""
        emb = np.array(
            [
                r.embedding
                for r in load_table(spark, sf_dir, "embeddings").collect()
            ],
            dtype=np.float64,
        )
        q = np.floor(emb * 1000 + 0.5).astype(np.int64)
        g = q.T @ q
        v1 = g.sum(axis=1)
        u1 = np.floor(
            v1.astype(np.float64) * 1_000_000 / np.abs(v1).max() + 0.5
        ).astype(np.int64)
        v2 = g @ u1
        v2_permille = np.floor(
            v2.astype(np.float64) * 1000 / np.abs(v2).max() + 0.5
        ).astype(np.int64)

        got = (
            REGISTRY["q150_power_iteration"].spark(spark, sf_dir).collect()
        )
        got_u1 = np.array([r.u1_scaled for r in sorted(got, key=lambda r: r.dim)])
        got_v2 = np.array(
            [r.v2_permille for r in sorted(got, key=lambda r: r.dim)]
        )
        assert np.array_equal(got_u1, u1)
        assert np.array_equal(got_v2, v2_permille)

        gf = g.astype(np.float64)

        def rayleigh(v):
            v = v.astype(np.float64)
            return float(v @ gf @ v) / float(v @ v)

        v0 = np.ones(gf.shape[0])
        assert rayleigh(got_u1) >= rayleigh(v0) * (1 - 1e-9)
        assert rayleigh(got_v2) >= rayleigh(got_u1) * (1 - 1e-9)

    def test_planted_direction_converges_in_two_steps(self):
        """On data with one dominant direction, the same integer spec
        reaches cosine > 0.99 with numpy's top eigenvector after the
        two pinned iterations."""
        rng = np.random.default_rng(11)
        d, n = 32, 400
        direction = rng.normal(size=d)
        direction /= np.linalg.norm(direction)
        x = rng.normal(scale=0.1, size=(n, d)) + np.outer(
            rng.normal(scale=1.0, size=n), direction
        )
        q = np.floor(x * 1000 + 0.5).astype(np.int64)
        g = q.T @ q
        v1 = g.sum(axis=1)
        u1 = np.floor(
            v1.astype(np.float64) * 1_000_000 / np.abs(v1).max() + 0.5
        ).astype(np.int64)
        v2 = (g @ u1).astype(np.float64)
        evals, evecs = np.linalg.eigh(g.astype(np.float64))
        top = evecs[:, np.argmax(evals)]
        cos = abs(float(v2 @ top) / (np.linalg.norm(v2) * np.linalg.norm(top)))
        assert cos > 0.99, cos


# ---------------------------------------------------------------------------
# q151 — kappa vs the direct formula
# ---------------------------------------------------------------------------


class TestKappa:
    def test_kappa_matches_direct_formula(self, spark, sf_dir):
        """The integer per-mille kappa must equal the float
        (pₒ−pₑ)/(1−pₑ) computed from the returned confusion marginals
        to within 1 permille quantization."""
        rows = REGISTRY["q151_label_kappa"].spark(spark, sf_dir).collect()
        n = rows[0].n
        agree = sum(r.n_agree for r in rows)
        s_chance = sum(r.n_true * r.n_pred for r in rows)
        po = agree / n
        pe = s_chance / (n * n)
        kappa = (po - pe) / (1 - pe)
        got = rows[0].kappa_permille
        assert abs(got - kappa * 1000) <= 1, (got, kappa)
        assert all(r.kappa_permille == got for r in rows)
        assert sum(r.n_true for r in rows) == n
        assert sum(r.n_pred for r in rows) == n

    def test_perfect_and_orthogonal_raters(self, spark):
        """κ=1000 for a self-rater; κ≤0 when the rater is independent
        of the labels (synthetic confusion replay of the same integer
        spec)."""

        def kappa_permille(conf: dict[tuple[int, int], int]) -> int:
            n = sum(conf.values())
            ks = {a for a, _ in conf} | {b for _, b in conf}
            rows = {k: sum(c for (a, _), c in conf.items() if a == k) for k in ks}
            cols = {k: sum(c for (_, b), c in conf.items() if b == k) for k in ks}
            agree = sum(c for (a, b), c in conf.items() if a == b)
            s = sum(rows[k] * cols[k] for k in ks)
            if n * n == s:
                return 0
            num = agree * n - s
            den = n * n - s
            return (
                num * 1000 // den
                if num >= 0
                else -((-num) * 1000 // den)
            )

        perfect = {(k, k): 10 for k in range(5)}
        assert kappa_permille(perfect) == 1000
        independent = {(a, b): 4 for a in range(5) for b in range(5)}
        assert kappa_permille(independent) == 0
        inverted = {(a, (a + 1) % 5): 10 for a in range(5)}
        assert kappa_permille(inverted) < 0
