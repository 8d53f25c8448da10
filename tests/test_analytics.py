"""Semantic invariants for the round-7 analytics batch (q169–q176).

The DuckDB oracles pin cross-engine agreement; these tests pin the
MATH against independent references (pandas/numpy re-derivations and
structural invariants), so a bug shared by both engine texts — the
one failure mode oracle parity cannot see — still gets caught.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from building_energy_data_pipeline_spark.plans.queries import REGISTRY

from conftest import SF_DIR


@pytest.fixture(scope="module")
def run(spark):
    def _run(name: str) -> pd.DataFrame:
        return REGISTRY[name].spark(spark, SF_DIR).toPandas()

    return _run


class TestSCD2:
    def test_history_partitions_time(self, run):
        h = run("q169_scd2_history")
        assert len(h) > 0
        for _, g in h.groupby("custkey"):
            g = g.sort_values("version")
            # versions are dense 1..n
            assert list(g["version"]) == list(range(1, len(g) + 1))
            # exactly one open (current) row, and it is the last
            assert int(g["is_current"].sum()) == 1
            assert bool(g.iloc[-1]["is_current"])
            # intervals chain: eff_to == next row's eff_from
            assert (
                g["eff_to"].iloc[:-1].to_numpy()
                == g["eff_from"].iloc[1:].to_numpy()
            ).all()
            # run-length collapse: consecutive statuses differ
            s = g["status"].to_numpy()
            assert (s[:-1] != s[1:]).all()


class TestSRM:
    def test_chi_square_adds_up(self, run):
        r = run("q170_srm_check")
        assert set(r["arm"]) == {"control", "treat_a", "treat_b"}
        # each arm's floored contribution is within 1 micro-unit of
        # the floored total (floor effects bound the drift)
        assert abs(int(r["contrib_u"].sum()) - int(r["chi2_u"].iloc[0])) <= 3
        # alert flag consistent with the statistic
        chi2_u = int(r["chi2_u"].iloc[0])
        assert (r["srm_alert"] == (chi2_u > 13.816e6 - 1)).all() or (
            r["srm_alert"] == (chi2_u >= 13.816e6)
        ).all()

    def test_expected_matches_planned_weights(self, run):
        r = run("q170_srm_check").set_index("arm")
        total = int(r["n_users"].sum())
        assert int(r.loc["control", "expected_u"]) == total * 500_000
        assert int(r.loc["treat_a", "expected_u"]) == total * 250_000


class TestMAD:
    def test_against_pandas_reference(self, run, spark):
        got = run("q171_mad_outliers").set_index("event_type")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select("event_type", "value")
            .toPandas()
        )
        for et, g in ev.groupby("event_type"):
            v = g["value"].to_numpy(dtype=float)
            med = float(np.median(v))
            mad = float(np.median(np.abs(v - med)))
            row = got.loc[et]
            assert int(row["n"]) == len(v)
            assert abs(int(row["med_u"]) - np.floor(med * 1e6)) <= 1
            assert abs(int(row["mad_u"]) - np.floor(mad * 1e6)) <= 1
            n_out = int(
                (np.abs(v - med) > 3.0 * mad / 0.6744897501960817).sum()
            )
            assert int(row["n_outliers"]) == n_out


class TestEWMA:
    def test_against_float_reference(self, run, spark):
        got = run("q172_ewma_smoothing")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select("user_id", "event_id", "ts", "value")
            .toPandas()
            .sort_values(["user_id", "ts", "event_id"])
        )
        # independent float re-derivation of the truncated EWMA:
        # weights (3/4)^k over the last 16 values, k = lag
        ref = {}
        for _, g in ev.groupby("user_id"):
            vals = np.floor(g["value"].to_numpy(dtype=float) * 10000)
            for i, eid in enumerate(g["event_id"].to_numpy()):
                xs = vals[max(0, i - 15) : i + 1]
                k = np.arange(len(xs) - 1, -1, -1)
                w = 0.75**k
                ref[eid] = float((xs * w).sum() / w.sum()) / 10000.0
        assert len(got) == len(ref)
        for eid, n_frame, ewma_u in got[
            ["event_id", "n_frame", "ewma_u"]
        ].itertuples(index=False):
            assert 1 <= n_frame <= 16
            # integer-weight engine value vs float reference: the
            # scaled weights are exactly proportional, so only the
            # final floor can differ
            assert abs(ewma_u - np.floor(ref[eid] * 10000 * 100)) <= 1, eid


class TestTriangles:
    def test_against_bruteforce(self, run, spark):
        got = run("q173_triangle_count").iloc[0]
        li = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .filter("l_shipdate < '1996-10-01'")
            .select("l_orderkey", "l_partkey")
            .toPandas()
            .drop_duplicates()
        )
        co = li.rename(columns={"l_orderkey": "o", "l_partkey": "p"})
        e = co.merge(co, on="o")
        e = e[e["p_x"] < e["p_y"]][["p_x", "p_y"]].drop_duplicates()
        edges = set(map(tuple, e.to_numpy()))
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        n_tri = 0
        for u, v in edges:
            n_tri += len(
                {w for w in adj[u] & adj[v] if (min(u, w), max(u, w)) in edges
                 and (min(v, w), max(v, w)) in edges}
            )
        n_tri //= 3  # each triangle counted from its 3 edges
        deg = {n: len(s) for n, s in adj.items()}
        wedges = sum(d * (d - 1) // 2 for d in deg.values())
        assert int(got["n_edges"]) == len(edges)
        assert int(got["n_nodes"]) == len(adj)
        assert int(got["n_wedges"]) == wedges
        assert int(got["n_triangles"]) == n_tri
        assert int(got["gcc_u"]) == int(
            np.floor(3.0 * n_tri / wedges * 1e6)
        )


class TestQuantileNormalize:
    def test_marginals_align_and_order_preserved(self, run):
        r = run("q174_quantile_normalize")
        # within-source order preserved: qnorm monotone in rank
        for _, g in r.groupby("source"):
            g = g.sort_values("rank")
            assert g["qnorm_u"].is_monotonic_increasing
        # sources sharing a rank share the remapped value by
        # construction; ranks are dense 1..n per source
        for _, g in r.groupby("source"):
            assert list(g.sort_values("rank")["rank"]) == list(
                range(1, len(g) + 1)
            )
        # the remapped value at a rank is the across-source floor-mean
        chk = r.groupby("rank").agg(
            n=("n_chars", "size"), s=("n_chars", "sum"), q=("qnorm_u", "first")
        )
        assert (
            chk["q"] == (chk["s"] * 1_000_000 // chk["n"])
        ).all()


class TestSortedNeighborhood:
    def test_pairs_respect_window_and_threshold(self, run, spark):
        r = run("q175_sorted_neighborhood")
        assert r["gap"].between(1, 3).all()
        assert (r["lev"] <= 20).all()
        # re-derive: every emitted pair must be within 3 positions in
        # the (key, doc_id) sort order
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .selectExpr(
                "doc_id", "lower(substring(text, 1, 16)) as k"
            )
            .toPandas()
            .sort_values(["k", "doc_id"])
            .reset_index(drop=True)
        )
        pos = {d: i for i, d in enumerate(docs["doc_id"])}
        for a, b, gap in r[["a_id", "b_id", "gap"]].itertuples(index=False):
            assert pos[b] - pos[a] == gap


class TestSRPLSH:
    def test_buckets_and_cosine(self, run):
        r = run("q176_srp_lsh")
        assert len(r) <= 25
        assert r["bucket"].between(0, 255).all()
        assert (r["a"] < r["b"]).all()
        assert r["cos_u"].le(1_000_001).all()
        # the report is the top of the candidate set: descending
        assert r["cos_u"].is_monotonic_decreasing
