"""Hypothesis properties for the round-8 machinery — the identities
the distributed formulations rely on, proven against sequential/naive
references on arbitrary inputs (no Spark session: these pin the MATH,
the oracle suite pins the plumbing — the test_round7_properties
pattern).
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _ntile_from_rank_py(r: int, n: int, b: int) -> int:
    """Python transliteration of plans/analytics_queries.py
    `_ntile_from_rank`'s SQL text (q211)."""
    k = n // b
    m = n % b
    big = m * (k + 1)
    if r <= big:
        return (r + k) // (k + 1)
    return m + (r - big + k - 1) // k


def _ntile_reference(n: int, b: int) -> list[int]:
    """SQL-standard ntile: first (n mod b) buckets hold ceil(n/b)
    rows, the rest floor(n/b) — built positionally."""
    k, m = divmod(n, b)
    out = []
    for bucket in range(1, b + 1):
        out.extend([bucket] * (k + 1 if bucket <= m else k))
    return out


class TestNtileFromRank:
    @given(
        st.integers(min_value=1, max_value=5000),
        st.integers(min_value=1, max_value=12),
    )
    @settings(max_examples=300, deadline=None)
    def test_formula_equals_positional_ntile(self, n, b):
        got = [_ntile_from_rank_py(r, n, b) for r in range(1, n + 1)]
        assert got == _ntile_reference(n, b)

    @given(
        st.integers(min_value=1, max_value=100000),
        st.integers(min_value=2, max_value=8),
    )
    @settings(max_examples=100, deadline=None)
    def test_bucket_sizes_balanced(self, n, b):
        # equal-frequency contract: sizes differ by at most 1 and
        # bucket ids are the exact prefix 1..min(n, b)
        from collections import Counter

        sizes = Counter(
            _ntile_from_rank_py(r, n, b) for r in range(1, n + 1)
        )
        assert sorted(sizes) == list(range(1, min(n, b) + 1))
        assert max(sizes.values()) - min(sizes.values()) <= 1


class TestIVMRouting:
    """maintain_rollup's branch algebra replayed sequentially: for ANY
    base multiset and ANY applicable CDC batch (deletes may target
    base rows or the batch's own inserts — the intra-batch I+D case
    the round-8 fix routes to the dirty recompute), the patched state
    must equal the full recompute of the post-change detail."""

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),  # key
                st.integers(min_value=-50, max_value=50),  # value
            ),
            max_size=40,
        ),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=-50, max_value=50),
            ),
            max_size=20,
        ),
        st.data(),
    )
    @settings(max_examples=300, deadline=None)
    def test_patch_equals_recompute(self, base, inserts, data):
        # deletes: a random sub-multiset of (base + inserts), so every
        # delete has a witness — the multiset-CDC applicability rule
        pool = base + inserts
        mask = data.draw(
            st.lists(
                st.booleans(), min_size=len(pool), max_size=len(pool)
            )
        )
        deletes = [row for row, d in zip(pool, mask) if d]

        def rollup(rows):
            state = {}
            for g, v in rows:
                c, s, mn, mx = state.get(g, (0, 0, None, None))
                state[g] = (
                    c + 1,
                    s + v,
                    v if mn is None else min(mn, v),
                    v if mx is None else max(mx, v),
                )
            return state

        state0 = rollup(base)
        # post-change detail: base + inserts minus deletes (multiset)
        after = list(base + inserts)
        for row in deletes:
            after.remove(row)
        want = rollup(after)

        # --- the operator's routing, replayed per key ---
        got = {}
        keys = {g for g, _ in base + inserts + deletes}
        for g in keys:
            ins = [v for k, v in inserts if k == g]
            dels = [v for k, v in deletes if k == g]
            c0, s0, mn0, mx0 = state0.get(g, (0, 0, None, None))
            new_cnt = c0 + len(ins) - len(dels)
            if g not in state0:
                # unseen key: dirty iff the batch also deletes
                # (the round-8 fix); else insert-only algebra
                dirty = bool(dels)
            else:
                dirty = bool(dels) and (
                    min(dels) <= mn0 or max(dels) >= mx0
                )
            if new_cnt <= 0:
                continue
            if dirty:
                got[g] = rollup([(g, v) for k, v in after if k == g])[g]
            else:
                mn = (
                    mn0
                    if not ins
                    else (min(ins) if mn0 is None else min(mn0, min(ins)))
                )
                mx = (
                    mx0
                    if not ins
                    else (max(ins) if mx0 is None else max(mx0, max(ins)))
                )
                got[g] = (new_cnt, s0 + sum(ins) - sum(dels), mn, mx)
        assert got == want


class TestIVMRoutingNullable:
    """Same identity with a NULLABLE min/max column (the r8 review's
    seen-key-NULL-extremes bug class): min/max ignore NULLs, a NULL-
    valued delete never dirties, and a non-null delete meeting a NULL
    stored extreme must recompute."""

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.one_of(
                    st.none(), st.integers(min_value=-20, max_value=20)
                ),
            ),
            max_size=25,
        ),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.one_of(
                    st.none(), st.integers(min_value=-20, max_value=20)
                ),
            ),
            max_size=12,
        ),
        st.data(),
    )
    @settings(max_examples=300, deadline=None)
    def test_minmax_patch_equals_recompute(self, base, inserts, data):
        pool = base + inserts
        mask = data.draw(
            st.lists(
                st.booleans(), min_size=len(pool), max_size=len(pool)
            )
        )
        deletes = [row for row, d in zip(pool, mask) if d]

        def mm(rows):
            state = {}
            for g, v in rows:
                c, mn, mx = state.get(g, (0, None, None))
                if v is not None:
                    mn = v if mn is None else min(mn, v)
                    mx = v if mx is None else max(mx, v)
                state[g] = (c + 1, mn, mx)
            return state

        state0 = mm(base)
        after = list(base + inserts)
        for row in deletes:
            after.remove(row)
        want = mm(after)

        got = {}
        keys = {g for g, _ in base + inserts + deletes}
        for g in keys:
            ins = [v for k, v in inserts if k == g]
            dels = [v for k, v in deletes if k == g]
            dels_nn = [v for v in dels if v is not None]
            ins_nn = [v for v in ins if v is not None]
            c0, mn0, mx0 = state0.get(g, (0, None, None))
            new_cnt = c0 + len(ins) - len(dels)
            if g not in state0:
                dirty = bool(dels_nn)
            else:
                # the fixed predicate: non-null delete extreme that
                # ties/passes the stored extreme OR meets a NULL one
                dirty = bool(dels_nn) and (
                    mn0 is None
                    or min(dels_nn) <= mn0
                    or max(dels_nn) >= mx0
                )
            if new_cnt <= 0:
                continue
            if dirty:
                got[g] = mm([(g, v) for k, v in after if k == g])[g]
            else:
                mn = (
                    mn0
                    if not ins_nn
                    else (
                        min(ins_nn)
                        if mn0 is None
                        else min(mn0, min(ins_nn))
                    )
                )
                mx = (
                    mx0
                    if not ins_nn
                    else (
                        max(ins_nn)
                        if mx0 is None
                        else max(mx0, max(ins_nn))
                    )
                )
                got[g] = (new_cnt, mn, mx)
        assert got == want


class TestQ248RankAudit:
    """The rank-space audit accepts any threshold whose true rank
    error is within the sketch guarantee, and rejects one beyond the
    slack — soundness and non-vacuity of the q248 bound."""

    @staticmethod
    def _audit(lats, t, p, slack):
        n = len(lats)
        le = sum(1 for x in lats if x <= t)
        lt = sum(1 for x in lats if x < t)
        target = math.ceil(p * n)
        return le >= target - slack and lt < target + slack

    @given(
        st.lists(
            st.integers(min_value=0, max_value=10000),
            min_size=1,
            max_size=500,
        ),
        st.sampled_from([0.5, 0.9]),
    )
    @settings(max_examples=300, deadline=None)
    def test_accepts_exact_and_near_ranks(self, lats, p):
        lats.sort()
        n = len(lats)
        slack = n // 200 + 2
        target = math.ceil(p * n)
        # any value occupying a rank within +-(slack-1) of target
        for r in range(
            max(1, target - (slack - 1)), min(n, target + (slack - 1)) + 1
        ):
            assert self._audit(lats, lats[r - 1], p, slack), (r, target)

    @given(
        st.integers(min_value=500, max_value=2000),
    )
    @settings(max_examples=50, deadline=None)
    def test_rejects_far_ranks_on_distinct_values(self, n):
        # strictly increasing latencies: a threshold `2*slack` ranks
        # off target must fail the audit (distinct values = each rank
        # occupied by exactly one value, the adversarial case)
        lats = list(range(n))
        p = 0.5
        slack = n // 200 + 2
        target = math.ceil(p * n)
        bad_lo = lats[target - 2 * slack - 1]
        bad_hi = lats[target + 2 * slack - 1]
        assert not self._audit(lats, bad_lo, p, slack)
        assert not self._audit(lats, bad_hi, p, slack)


class TestHLLRegisterDerivation:
    """Pure-hashlib replay of operators/sketch.py's md5 bucket/rho
    derivation plus the mergeability identity: per-slice register
    max-merge equals pooled-slice registers for ANY partitioning of
    any value set (the q246 window-union property, engine-free)."""

    M = 64
    BITS = 33

    @classmethod
    def _regs(cls, values):
        regs = {}
        for v in values:
            h = hashlib.md5(str(v).encode()).hexdigest()
            bucket = int(h[:8], 16) % cls.M
            v32 = int(h[8:16], 16)
            rho = cls.BITS if v32 == 0 else cls.BITS - len(
                bin(v32)[2:]
            )
            regs[bucket] = max(regs.get(bucket, 0), rho)
        return regs

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),  # slice id
                st.integers(min_value=0, max_value=10**6),  # value
            ),
            max_size=400,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_max_merge_equals_pooled(self, rows):
        slices = {}
        for s, v in rows:
            slices.setdefault(s, []).append(v)
        merged = {}
        for vals in slices.values():
            for b, r in self._regs(vals).items():
                merged[b] = max(merged.get(b, 0), r)
        pooled = self._regs([v for _, v in rows])
        assert merged == pooled

    @given(st.lists(st.integers(min_value=0, max_value=10**6), max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_register_table_is_bounded(self, values):
        assert len(self._regs(values)) <= self.M


class TestCodecRoundTrips:
    """Hypothesis fuzz for the pure-numpy container codecs: encode →
    decode is the identity for every array shape/content, including
    the stride-padding widths (w % 4 ≠ 0) and extreme sample
    values — the property the hand-picked unit cases sample."""

    @given(
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=150, deadline=None)
    def test_bmp_identity(self, h, w, seed):
        import numpy as np

        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_bmp,
            encode_bmp,
        )

        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)

    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=200,
        ),
        st.integers(min_value=1, max_value=4),
        st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=150, deadline=None)
    def test_wav_identity(self, flat, channels, rate):
        import numpy as np

        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        n = len(flat) // channels * channels
        if n == 0:
            return
        pcm = np.array(flat[:n], dtype=np.int16).reshape(-1, channels)
        out, sr = decode_wav(encode_wav(pcm, rate))
        assert sr == rate
        assert np.array_equal(out, pcm)


class TestDiscreteQuantileConvention:
    """q245's cross-engine contract: the rank = ceil(p·n) discrete
    quantile (verified identical in Spark percentile_disc and DuckDB
    quantile_disc) re-derived for arbitrary multisets, and its
    monotonicity in p — the property the threshold audit leans on."""

    @given(
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=1,
            max_size=300,
        ),
        st.sampled_from([0.25, 0.5, 0.75, 0.245, 0.255, 0.9]),
    )
    @settings(max_examples=200, deadline=None)
    def test_ceil_rank_value_bounds_cume_dist(self, xs, p):
        xs.sort()
        n = len(xs)
        v = xs[math.ceil(p * n) - 1]
        # defining property: v is the smallest value whose cumulative
        # distribution reaches p
        assert sum(1 for x in xs if x <= v) / n >= p
        smaller = [x for x in xs if x < v]
        if smaller:
            assert len(smaller) / n < p

    @given(
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=1,
            max_size=300,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_monotone_in_p(self, xs):
        xs.sort()
        n = len(xs)
        qs = [xs[math.ceil(p * n) - 1] for p in (0.1, 0.25, 0.5, 0.75, 0.9)]
        assert qs == sorted(qs)
