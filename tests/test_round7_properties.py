"""Hypothesis properties for the round-7 algebraic machinery — the
identities the engine's distributed formulations rely on, proven
against sequential/naive references on arbitrary inputs (no Spark
session needed: these pin the MATH, the oracle suite pins the
plumbing).
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


class TestCUSUMClosedForm:
    @given(
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=1,
            max_size=300,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_prefix_form_equals_recursion(self, devs):
        # engine form: S_i = cs_i - min(0, running_min(cs))
        cs = np.cumsum(np.array(devs, dtype=np.int64))
        S_closed = cs - np.minimum(np.minimum.accumulate(cs), 0)
        # textbook recursion: S_i = max(0, S_{i-1} + dev_i)
        s, S_rec = 0, []
        for d in devs:
            s = max(0, s + d)
            S_rec.append(s)
        assert S_closed.tolist() == S_rec


class TestDoubledMidranks:
    @given(
        st.lists(
            st.integers(min_value=0, max_value=20),
            min_size=2,
            max_size=200,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_doubled_rank_formula_is_twice_the_midrank(self, xs):
        # q205's per-value formula: dr = 2*(rows_below + 1) + ties - 1
        xs = sorted(xs)
        arr = np.array(xs)
        for v in set(xs):
            below = int((arr < v).sum())
            ties = int((arr == v).sum())
            dr = 2 * (below + 1) + ties - 1
            # true midrank of the tied block
            midrank = (below + 1 + below + ties) / 2
            assert dr == 2 * midrank


class TestKaplanMeierProduct:
    @given(
        st.lists(
            st.integers(min_value=0, max_value=10),
            min_size=1,
            max_size=100,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_uncensored_km_equals_empirical_survival(self, durations):
        # with NO censoring the product-limit estimator must equal
        # the empirical survival function at every event time
        n = len(durations)
        arr = np.array(sorted(durations))
        s = 1.0
        for w in sorted(set(durations)):
            d = int((arr == w).sum())
            at_risk = int((arr >= w).sum())
            s *= 1.0 - d / at_risk
            empirical = int((arr > w).sum()) / n
            assert abs(s - empirical) < 1e-12


class TestLeibnizDetCodegen:
    @given(
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=0, max_value=2**31),
    )
    @settings(max_examples=100, deadline=None)
    def test_generated_expansion_matches_numpy(self, n, seed):
        # q209's _mk_det generates the Leibniz expansion as SQL text;
        # replay the same expansion in python on a random matrix and
        # compare against numpy's LU determinant
        rng = np.random.RandomState(seed % (2**31))
        m = rng.uniform(-1, 1, size=(n, n))
        total = 0.0
        for perm in itertools.permutations(range(n)):
            inv = sum(
                1
                for a in range(n)
                for b in range(a + 1, n)
                if perm[a] > perm[b]
            )
            prod = 1.0
            for i in range(n):
                prod *= m[i][perm[i]]
            total += -prod if inv % 2 else prod
        assert abs(total - np.linalg.det(m)) < 1e-9

    def test_mk_det_text_structure(self):
        from building_energy_data_pipeline_spark.plans.analytics_queries import (
            _mk_det,
        )

        txt = _mk_det(["a", "b"], ["a", "b"], lambda i, j: f"m_{i}_{j}")
        # 2x2: + m_a_a*m_b_b - m_a_b*m_b_a (column order per perm)
        assert txt == "(+ (m_a_a * m_b_b) - (m_a_b * m_b_a))"


class TestSRPSignDerivation:
    def test_hashlib_matches_duckdb_md5_parity(self):
        import duckdb

        from building_energy_data_pipeline_spark.plans.analytics_queries import (
            _srp_sign,
        )

        con = duckdb.connect()
        for j in range(3):
            for d in range(5):
                sql = (
                    "SELECT CAST(concat('0x', substring(md5("
                    f"concat(CAST({j} AS VARCHAR), ':', "
                    f"CAST({d} AS VARCHAR))), 1, 8)) AS BIGINT) % 2"
                )
                duck_parity = con.execute(sql).fetchone()[0]
                want = 1.0 if duck_parity == 0 else -1.0
                assert _srp_sign(j, d) == want, (j, d)


class TestEWMAIntegerWeights:
    @given(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=1,
            max_size=16,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_integer_weights_are_exactly_proportional(self, xs):
        # q172's weights 3^k * 4^(15-k) are exactly (3/4)^k scaled by
        # 4^15 — the integer quotient equals the float EWMA up to the
        # final division's rounding
        k = np.arange(len(xs) - 1, -1, -1)
        wi = (3**k) * (4 ** (15 - k))
        wf = 0.75**k
        num_i = int((np.array(xs, dtype=object) * wi).sum())
        den_i = int(wi.sum())
        ewma_f = float((np.array(xs) * wf).sum() / wf.sum())
        assert abs(num_i / den_i - ewma_f) < 1e-9
