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


class TestPointInTime:
    def test_against_pandas_merge_asof(self, run, spark):
        got = run("q177_point_in_time_join").set_index("status_at")
        orders = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .selectExpr(
                "o_custkey as custkey",
                "o_orderpriority as status",
                "cast(unix_timestamp(o_orderdate) as long) as d",
                "o_orderkey as k",
            )
            .toPandas()
            .sort_values(["custkey", "d", "k"])
        )
        # change log -> dedup (custkey, d) keep max k
        hist = []
        for ck, g in orders.groupby("custkey"):
            prev = None
            rows = []
            for _, r in g.iterrows():
                if prev is None or r["status"] != prev:
                    rows.append(r)
                prev = r["status"]
            by_d = {}
            for r in rows:
                if r["d"] not in by_d or r["k"] > by_d[r["d"]]["k"]:
                    by_d[r["d"]] = r
            hist.extend(by_d.values())
        hist = pd.DataFrame(hist)[["custkey", "d", "status"]].sort_values(
            "d", kind="stable"
        )
        li = spark.sql(
            f"""
            SELECT o.o_custkey AS custkey,
                   cast(unix_timestamp(l.l_shipdate) as long) AS t,
                   l.l_extendedprice * (1 - l.l_discount) AS rev
            FROM parquet.`{SF_DIR}/lineitem.parquet` l
            JOIN parquet.`{SF_DIR}/orders.parquet` o
              ON l.l_orderkey = o.o_orderkey
            """
        ).toPandas().sort_values("t", kind="stable")
        merged = pd.merge_asof(
            li, hist, left_on="t", right_on="d", by="custkey"
        )
        merged = merged.dropna(subset=["status"])
        ref = merged.groupby("status").size()
        assert set(got.index) == set(ref.index)
        for st in ref.index:
            assert int(got.loc[st, "n_facts"]) == int(ref[st]), st


class TestRRF:
    def test_fusion_arithmetic(self, run):
        r = run("q178_rrf_hybrid")
        assert 0 < len(r) <= 20
        for doc, lex, dense, rrf in r[
            ["doc_id", "lex_rank", "dense_rank", "rrf_u"]
        ].itertuples(index=False):
            want = 0
            if pd.notna(lex):
                assert 1 <= lex <= 40
                want += 1_000_000 // (60 + int(lex))
            if pd.notna(dense):
                assert 1 <= dense <= 40
                want += 1_000_000 // (60 + int(dense))
            assert int(rrf) == want, doc
        assert r["rrf_u"].is_monotonic_decreasing


class TestKCore:
    def test_against_pandas_peel(self, run, spark):
        got = run("q179_kcore_peeling").sort_values("round")
        li = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .filter("l_shipdate < '1996-10-01'")
            .selectExpr("l_orderkey as o", "l_partkey as p")
            .toPandas()
            .drop_duplicates()
        )
        e = li.merge(li, on="o")
        e = e[e["p_x"] < e["p_y"]][["p_x", "p_y"]].drop_duplicates()
        edges = set(map(tuple, e.to_numpy()))
        rows = []
        nodes = {n for t in edges for n in t}
        rows.append((0, len(nodes), len(edges)))
        for r in (1, 2):
            deg = {}
            for u, v in edges:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            keep = {n for n, d in deg.items() if d >= 3}
            edges = {(u, v) for u, v in edges if u in keep and v in keep}
            rows.append((r, len(keep), len(edges)))
        assert list(map(tuple, got.to_numpy())) == rows
        # survivors shrink monotonically
        assert got["n_nodes"].is_monotonic_decreasing
        assert got["n_edges"].is_monotonic_decreasing


class TestCUSUM:
    def test_closed_form_equals_recursion(self, run, spark):
        got = run("q180_cusum_drift").set_index("event_type")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .selectExpr(
                "event_type", "ts", "event_id",
                "cast(floor(value * 10000) as long) as x",
            )
            .toPandas()
            .sort_values(["event_type", "ts", "event_id"])
        )
        for et, g in ev.groupby("event_type"):
            x = g["x"].to_numpy()
            mu = int(x.sum()) // len(x)
            # the textbook RECURSIVE definition the closed form must
            # reproduce: S_i = max(0, S_{i-1} + x_i - mu - slack)
            s, max_s, n_alerts = 0, 0, 0
            for xi in x:
                s = max(0, s + int(xi) - mu - 50_000)
                max_s = max(max_s, s)
                n_alerts += s > 3_000_000
            row = got.loc[et]
            assert int(row["n"]) == len(x)
            assert int(row["max_s"]) == max_s, et
            assert int(row["n_alerts"]) == n_alerts, et
            assert n_alerts > 0, f"{et}: threshold too high to exercise"


class TestACF:
    def test_against_numpy(self, run, spark):
        got = run("q181_hourly_acf")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .selectExpr(
                "event_type",
                "cast(unix_timestamp(ts) as long) div 3600 as hr",
                "cast(floor(value * 100) as long) as x",
            )
            .toPandas()
        )
        h = (
            ev.groupby(["event_type", "hr"])
            .agg(sx=("x", "sum"), c=("x", "size"))
            .reset_index()
        )
        h["v"] = h["sx"] * 100 // h["c"]
        for (et, lag), row in got.set_index(["event_type", "lag"]).iterrows():
            v = (
                h[h["event_type"] == et]
                .sort_values("hr")["v"]
                .to_numpy(dtype=object)
            )
            n = len(v)
            y = v - (sum(v) // n)
            num = int(sum(y[: n - lag] * y[lag:]))
            den = int(sum(y * y))
            assert int(row["num"]) == num, (et, lag)
            assert int(row["den"]) == den, (et, lag)
            assert int(row["n_pairs"]) == n - lag


class TestBenford:
    def test_shares_and_chi2(self, run):
        import math

        r = run("q182_benford_audit")
        assert sorted(r["d"]) == list(range(1, 10))
        total = int(r["n_obs"].sum())
        # floored shares sum to within 9 micro-units of 1e6
        assert 1_000_000 - 9 <= int(r["share_u"].sum()) <= 1_000_000
        # pinned constants ARE floor(log10(1+1/d)*1e6)
        for d, exp_u in r[["d", "expected_u"]].itertuples(index=False):
            assert int(exp_u) == int(
                math.floor(math.log10(1 + 1 / int(d)) * 1e6)
            )
        # chi2 recompute
        chi2 = 0.0
        for d, n_obs, exp_u in r[
            ["d", "n_obs", "expected_u"]
        ].itertuples(index=False):
            exp_n = int(exp_u) * total / 1e6
            chi2 += (int(n_obs) - exp_n) ** 2 / exp_n
        assert abs(int(r["chi2_m"].iloc[0]) - math.floor(chi2 * 1000)) <= 1
        # synthetic uniform totals are NOT Benford — alert must fire
        assert bool(r["benford_alert"].all())


class TestAttribution:
    def test_against_pandas_merge_asof(self, run, spark):
        got = run("q183_last_touch_attribution").set_index("touch_type")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .selectExpr(
                "event_id", "user_id", "event_type",
                "cast(unix_timestamp(ts) as long) as t", "value",
            )
            .toPandas()
        )
        p = ev[ev["event_type"] == "purchase"].sort_values(
            ["t", "event_id"]
        )
        t = ev[ev["event_type"] != "purchase"].sort_values(
            ["t", "event_id"]
        )
        m = pd.merge_asof(
            p[["event_id", "user_id", "t", "value"]],
            t[["user_id", "t", "event_type", "event_id"]].rename(
                columns={"event_id": "touch_id", "t": "touch_t"}
            ),
            left_on="t",
            right_on="touch_t",
            by="user_id",
        ).dropna(subset=["event_type"])
        m = m[m["t"] - m["touch_t"] <= 7 * 86_400]
        ref = m.groupby("event_type").size()
        assert set(got.index) == set(ref.index)
        for tt in ref.index:
            assert int(got.loc[tt, "n_attributed"]) == int(ref[tt]), tt


class TestSeasonalNaive:
    def test_against_pandas(self, run, spark):
        got = run("q184_seasonal_naive_backtest").set_index("event_type")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .selectExpr(
                "event_type",
                "cast(unix_timestamp(ts) as long) div 3600 as hr",
                "cast(floor(value * 100) as long) as x",
            )
            .toPandas()
        )
        h = (
            ev.groupby(["event_type", "hr"])
            .agg(sx=("x", "sum"), c=("x", "size"))
            .reset_index()
        )
        h["v"] = h["sx"] * 100 // h["c"]
        for et, g in h.groupby("event_type"):
            s = dict(zip(g["hr"], g["v"]))
            errs = [
                v - s[hr - 24] for hr, v in s.items() if hr - 24 in s
            ]
            row = got.loc[et]
            assert int(row["n_forecasts"]) == len(errs), et
            assert int(row["bias_sum"]) == sum(errs), et
            assert int(row["mae_cu"]) == (
                sum(abs(e) for e in errs) * 100 // len(errs)
            ), et
            assert int(row["worst_abs"]) == max(abs(e) for e in errs), et


class TestHLLSetAlgebra:
    def test_structure_and_exactness(self, run):
        r = run("q185_hll_set_algebra").iloc[0]
        # inclusion–exclusion identities on the EXACT side
        assert int(r["exact_intersect"]) == int(r["exact_a"]) + int(
            r["exact_b"]
        ) - int(r["exact_union"])
        assert int(r["exact_union"]) <= int(r["exact_a"]) + int(
            r["exact_b"]
        )
        assert int(r["exact_intersect"]) >= 0
        # m=64 registers → rsd ≈ 13%; each estimate within 5×rsd
        for est, exact in (
            ("est_a", "exact_a"),
            ("est_b", "exact_b"),
            ("est_union", "exact_union"),
        ):
            rel = abs(int(r[est]) - int(r[exact])) / int(r[exact])
            assert rel < 0.65, (est, rel)


class TestStreamingCUSUM:
    def test_stream_equals_batch(self, run):
        # the streamed state must reproduce the batch closed form
        # EXACTLY — same rows, same integers
        got = (
            run("q186_streaming_cusum")
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        batch = (
            run("q180_cusum_drift")[
                ["event_type", "n", "max_s", "n_alerts"]
            ]
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert got.equals(batch), (got, batch)


class TestTWAP:
    def test_against_pandas(self, run, spark):
        got = run("q191_time_weighted_average").set_index("user_id")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .selectExpr(
                "user_id",
                "cast(unix_timestamp(ts) as long) as t",
                "event_id",
                "cast(floor(value * 10000) as long) as x",
            )
            .toPandas()
            .sort_values(["user_id", "t", "event_id"])
        )
        n_checked = 0
        for uid, g in ev.groupby("user_id"):
            t = g["t"].to_numpy()
            x = g["x"].to_numpy()
            dur = t[1:] - t[:-1]
            keep = dur > 0
            if keep.sum() < 5:
                assert uid not in got.index
                continue
            n_checked += 1
            num = int((x[:-1][keep].astype(object) * dur[keep]).sum())
            den = int(dur[keep].sum())
            row = got.loc[uid]
            assert int(row["n_segments"]) == int(keep.sum())
            assert int(row["span_s"]) == den
            assert int(row["twap_u"]) == num // den, uid
        assert n_checked == len(got)


class TestOHLC:
    def test_against_pandas(self, run, spark):
        got = run("q192_ohlc_bars")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .selectExpr(
                "event_type",
                "cast(unix_timestamp(ts) as long) div 86400 as day",
                "cast(unix_timestamp(ts) as long) as t",
                "event_id",
                "cast(floor(value * 10000) as long) as x",
            )
            .toPandas()
            .sort_values(["t", "event_id"])
        )
        ref = ev.groupby(["event_type", "day"]).agg(
            n=("x", "size"),
            open=("x", "first"),
            high=("x", "max"),
            low=("x", "min"),
            close=("x", "last"),
        )
        assert len(got) == len(ref)
        for r in got.itertuples(index=False):
            w = ref.loc[(r.event_type, r.day)]
            assert (
                (int(r.n_ticks), int(r.open_u), int(r.high_u),
                 int(r.low_u), int(r.close_u))
                == (int(w["n"]), int(w["open"]), int(w["high"]),
                    int(w["low"]), int(w["close"]))
            ), (r.event_type, r.day)


class TestTrend:
    def test_against_numpy_lstsq(self, run, spark):
        got = run("q193_trend_regression").set_index("event_type")
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .selectExpr(
                "event_type",
                "cast(unix_timestamp(ts) as long) div 3600 as hr",
                "cast(floor(value * 100) as long) as x",
            )
            .toPandas()
        )
        h = (
            ev.groupby(["event_type", "hr"])
            .agg(sx=("x", "sum"), c=("x", "size"))
            .reset_index()
        )
        h["v"] = h["sx"] * 100 // h["c"]
        for et, g in h.groupby("event_type"):
            t = (g["hr"] - g["hr"].min()).to_numpy(dtype=float)
            v = g["v"].to_numpy(dtype=float)
            slope, intercept = np.polyfit(t, v, 1)
            row = got.loc[et]
            # the exact integer quotient must agree with the float
            # least-squares fit to float precision
            assert abs(int(row["slope_u"]) / 1e6 - slope) < 1e-3, et
            assert abs(int(row["intercept_u"]) - intercept) < 2, et
            assert int(row["slope_num"]) == int(
                len(t) * (t * v).sum() - t.sum() * v.sum()
            )


class TestGini:
    def test_against_pandas(self, run, spark):
        got = run("q194_revenue_gini").set_index("nationkey")
        df = spark.sql(
            f"""
            SELECT o.o_custkey AS ck, c.c_nationkey AS nk,
                   sum(cast(floor(l.l_extendedprice
                                  * (1 - l.l_discount) * 100) as long))
                     AS rev
            FROM parquet.`{SF_DIR}/lineitem.parquet` l
            JOIN parquet.`{SF_DIR}/orders.parquet` o
              ON l.l_orderkey = o.o_orderkey
            JOIN parquet.`{SF_DIR}/customer.parquet` c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
            """
        ).toPandas()
        for nk, g in df.groupby("nk"):
            x = np.sort(g["rev"].to_numpy(dtype=float))
            n = len(x)
            # textbook mean-absolute-difference form — a fully
            # independent formulation of the same coefficient
            gini = np.abs(x[:, None] - x[None, :]).sum() / (
                2 * n * n * x.mean()
            )
            assert (
                abs(int(got.loc[nk, "gini_u"]) / 1e6 - gini) < 2e-6
            ), nk
            assert 0 <= int(got.loc[nk, "gini_u"]) <= 1_000_000


class TestHHI:
    def test_identities(self, run):
        r = run("q195_hhi_concentration")
        # HHI bounds: 10000/n_sources <= hhi <= 10000
        for lang, ns, hhi in r[
            ["lang", "n_sources", "hhi_bp"]
        ].itertuples(index=False):
            assert 10_000 // int(ns) <= int(hhi) <= 10_000, lang


class TestWelch:
    def test_against_float_reference(self, run, spark):
        got = run("q196_welch_ttest").iloc[0]
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .filter("event_type = 'purchase'")
            .selectExpr(
                "user_id % 2 as arm",
                "cast(floor(value * 10000) as long) as x",
            )
            .toPandas()
        )
        a = ev[ev["arm"] == 0]["x"].to_numpy(dtype=float)
        b = ev[ev["arm"] == 1]["x"].to_numpy(dtype=float)
        t = (b.mean() - a.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        assert int(got["n0"]) == len(a) and int(got["n1"]) == len(b)
        assert abs(int(got["t_u"]) / 1e6 - t) < 1e-4
        assert bool(got["significant"]) == (abs(t) > 1.96)


class TestMannWhitney:
    def test_against_numpy_reference(self, run, spark):
        got = run("q205_mann_whitney").iloc[0]
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .filter("event_type = 'view'")
            .selectExpr(
                "user_id % 2 as arm",
                "cast(floor(value * 10000) as long) as x",
            )
            .toPandas()
        )
        # independent midrank computation via scipy-free formula
        x = ev["x"].to_numpy()
        order = np.argsort(x, kind="stable")
        ranks = np.empty(len(x), dtype=float)
        sx = x[order]
        i = 0
        pos = 1
        while i < len(sx):
            j = i
            while j < len(sx) and sx[j] == sx[i]:
                j += 1
            ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2
            pos += j - i
            i = j
        arm = ev["arm"].to_numpy()
        n1 = int((arm == 1).sum())
        n0 = int((arm == 0).sum())
        r1 = float(ranks[arm == 1].sum())
        u1 = r1 - n1 * (n1 + 1) / 2
        assert int(got["n0"]) == n0 and int(got["n1"]) == n1
        assert int(got["u1"]) == int(u1)
        assert int(got["auc_u"]) == int(u1 * 1_000_000 // (n0 * n1))


class TestKS:
    def test_against_numpy_reference(self, run, spark):
        got = run("q206_ks_test").iloc[0]
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .filter("event_type = 'click'")
            .selectExpr(
                "user_id % 2 as arm",
                "cast(floor(value * 10000) as long) as x",
            )
            .toPandas()
        )
        a = np.sort(ev[ev["arm"] == 0]["x"].to_numpy())
        b = np.sort(ev[ev["arm"] == 1]["x"].to_numpy())
        support = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, support, side="right") / len(a)
        fb = np.searchsorted(b, support, side="right") / len(b)
        d = float(np.abs(fa - fb).max())
        assert int(got["n0"]) == len(a) and int(got["n1"]) == len(b)
        assert abs(int(got["d_num"]) / int(got["d_den"]) - d) < 1e-12


class TestCustomerDistribution:
    def test_zero_bucket_alive_and_totals(self, run, spark):
        r = run("q207_customer_distribution")
        n_cust = spark.read.parquet(
            f"{SF_DIR}/customer.parquet"
        ).count()
        # every customer lands in exactly one bucket
        assert int(r["custdist"].sum()) == n_cust
        # the zero bucket exists iff some customer has only urgent
        # (or no) orders — recompute
        n_orders = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .filter("o_orderpriority <> '1-URGENT'")
            .count()
        )
        got_orders = int((r["c_count"] * r["custdist"]).sum())
        assert got_orders == n_orders


class TestSalesOpportunity:
    def test_nonempty_and_eligibility(self, run):
        r = run("q208_sales_opportunity")
        assert len(r) > 0, "degenerate-empty Q22 population"
        assert set(r["cntrycode"]).issubset({0, 2, 4})
        assert (r["numcust"] > 0).all()


class TestMarkovAttribution:
    def test_shares_and_bounds(self, run):
        r = run("q209_markov_attribution")
        assert sorted(r["channel"]) == [
            "click", "error", "signup", "view",
        ]
        # base conversion probability is a probability
        assert r["base_conv_u"].between(0, 1_000_000).all()
        # removal can only lose conversion probability (effects in
        # [0, 1]); floored shares of the positive total sum to 1e6
        # within the floor slack
        assert r["removal_effect_u"].between(-2, 1_000_000).all()
        assert (
            1_000_000 - len(r)
            <= int(r["share_u"].sum())
            <= 1_000_000
        )


class TestSeasonalDecomposition:
    def test_q227_matches_pandas_decomposition(self, spark):
        got = (
            REGISTRY["q227_seasonal_decomposition"]
            .spark(spark, SF_DIR)
            .toPandas()
            .sort_values(["event_type", "how"])
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        secs = ev["ts"].values.astype("datetime64[s]").astype("int64")
        hr = pd.Series(secs // 3600, index=ev.index)
        x = np.floor(ev["value"] * 100).astype("int64")
        h = (
            pd.DataFrame({"t": ev["event_type"], "hr": hr, "x": x})
            .groupby(["t", "hr"])["x"]
            .sum()
        )
        rows = []
        for t, s in h.groupby(level=0):
            s = s.droplevel(0)
            s = s.reindex(
                range(int(s.index.min()), int(s.index.max()) + 1),
                fill_value=0,
            )
            s25 = s.rolling(25, center=True).sum()
            dn = 48 * s - (2 * s25 - s.shift(12) - s.shift(-12))
            dn = dn.dropna().astype("int64")
            for how, grp in dn.groupby(dn.index % 24):
                rows.append(
                    (t, how, len(grp), int(grp.sum()))
                )
        want = (
            pd.DataFrame(
                rows, columns=["event_type", "how", "s_cnt", "s_num"]
            )
            .sort_values(["event_type", "how"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert (got["s_cnt"].values == want["s_cnt"].values).all()
        assert (got["s_num"].values == want["s_num"].values).all()
        # the rendered index is the exact BIGINT quotient, floored
        ref = np.floor(
            want["s_num"].values.astype(float)
            / (48.0 * want["s_cnt"].values)
            * 100.0
        )
        assert (got["seasonal_u"].values == ref).all()


class TestLargestRemainderAllocation:
    def test_q231_reconciles_and_matches_pandas(self, spark):
        got = (
            REGISTRY["q231_largest_remainder_allocation"]
            .spark(spark, SF_DIR)
            .toPandas()
            .sort_values("l_orderkey")
            .reset_index(drop=True)
        )
        # the defining invariant: parts sum EXACTLY to the fee
        assert (got["alloc_sum"] == got["fee_c"]).all()

        o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        fee = pd.DataFrame(
            {
                "l_orderkey": o["o_orderkey"],
                "fee_c": np.floor(
                    o["o_totalprice"] * 100 + 0.5
                ).astype("int64")
                // 50,
            }
        )
        j = li[["l_orderkey", "l_linenumber", "l_quantity"]].merge(
            fee, on="l_orderkey"
        )
        j["w"] = j["l_quantity"].astype("int64")
        checks = {}
        for k, g in j.groupby("l_orderkey"):
            tw = g["w"].sum()
            base = g["fee_c"] * g["w"] // tw
            frac = g["fee_c"] * g["w"] - base * tw
            rem = int(g["fee_c"].iloc[0] - base.sum())
            order = np.lexsort((g["l_linenumber"].values, -frac.values))
            alloc = base.values.copy()
            alloc[order[:rem]] += 1
            checks[k] = int((alloc * g["l_linenumber"].values).sum())
        want = pd.Series(checks, name="alloc_check").sort_index()
        assert (got["alloc_check"].values == want.values).all()


class TestIntervalUnion:
    def test_q232_matches_pandas_interval_merge(self, spark):
        got = (
            REGISTRY["q232_interval_union"]
            .spark(spark, SF_DIR)
            .toPandas()
            .set_index("custkey")
            .sort_index()
        )
        o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        ed = li.groupby("l_orderkey")["l_shipdate"].max()
        iv = o.join(ed, on="o_orderkey", how="inner")
        a = iv["o_orderdate"].values.astype("datetime64[D]")
        b = iv["l_shipdate"].values.astype("datetime64[D]")
        # the synthetic ship dates are independent of order dates, so
        # some intervals arrive inverted — normalize to [min, max],
        # exactly as the query does
        iv["sd"] = np.minimum(a, b)
        iv["ed"] = np.maximum(a, b)
        for ck, g in iv.groupby("o_custkey"):
            segs = []
            for s, e in sorted(
                zip(g["sd"].values, g["ed"].values), key=lambda t: t[0]
            ):
                if segs and s <= segs[-1][1] + np.timedelta64(1, "D"):
                    segs[-1][1] = max(segs[-1][1], e)
                else:
                    segs.append([s, e])
            covered = sum(
                int((e - s) / np.timedelta64(1, "D")) + 1
                for s, e in segs
            )
            row = got.loc[ck]
            assert int(row["n_orders"]) == len(g), ck
            assert int(row["n_periods"]) == len(segs), ck
            assert int(row["covered_days"]) == covered, ck


class TestIntervalUnionEdgeCases:
    def test_sweep_on_crafted_intervals(self, spark):
        import datetime as dt

        from building_energy_data_pipeline_spark.plans.analytics_queries import (
            interval_union,
        )

        D = dt.date
        rows = [
            # k1: identical twice + contained + overlapping
            ("k1", D(2024, 1, 1), D(2024, 1, 10)),
            ("k1", D(2024, 1, 1), D(2024, 1, 10)),
            ("k1", D(2024, 1, 3), D(2024, 1, 5)),
            ("k1", D(2024, 1, 8), D(2024, 1, 15)),
            # k2: ADJACENT (second starts the day after) -> merge
            ("k2", D(2024, 2, 1), D(2024, 2, 5)),
            ("k2", D(2024, 2, 6), D(2024, 2, 9)),
            # k3: one-day gap -> two periods
            ("k3", D(2024, 3, 1), D(2024, 3, 5)),
            ("k3", D(2024, 3, 7), D(2024, 3, 9)),
            # k4: single-day interval
            ("k4", D(2024, 4, 4), D(2024, 4, 4)),
        ]
        iv = spark.createDataFrame(
            rows, "key string, lo date, hi date"
        )
        got = (
            interval_union(iv, "key")
            .toPandas()
            .set_index("key")
            .sort_index()
        )
        assert got.loc["k1"].tolist() == [15, 1, 4]
        assert got.loc["k2"].tolist() == [9, 1, 2]
        assert got.loc["k3"].tolist() == [8, 2, 2]
        assert got.loc["k4"].tolist() == [1, 1, 1]


class TestGreedyCoverage:
    def test_q234_greedy_invariants(self, spark):
        got = (
            REGISTRY["q234_greedy_coverage"]
            .spark(spark, SF_DIR)
            .toPandas()
            .sort_values("rnd")
        )
        assert list(got["rnd"]) == [1, 2, 3]
        assert got["doc_id"].nunique() == 3  # never re-selects
        # submodularity: marginal gains weakly decrease in greedy order
        g = got["gain"].tolist()
        assert g[0] >= g[1] >= g[2] > 0
        # round-1 winner really is the argmax document by distinct
        # shingle count (pandas re-derivation)
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        import re as _re

        def shingles(t):
            toks = [w for w in _re.split(r"\s+", t.lower()) if w]
            if len(toks) < 3:
                return {" ".join(toks)}
            return {
                " ".join(toks[i : i + 3])
                for i in range(len(toks) - 2)
            }

        counts = {
            r.doc_id: len(shingles(r.text))
            for r in docs.itertuples()
        }
        best = min(
            ((-n, d) for d, n in counts.items())
        )
        assert int(got.iloc[0]["doc_id"]) == best[1]
        assert int(got.iloc[0]["gain"]) == -best[0]


class TestGrowthAccounting:
    def test_q240_identity_and_pandas_rederivation(self, spark):
        got = (
            REGISTRY["q240_growth_accounting"]
            .spark(spark, SF_DIR)
            .toPandas()
            .sort_values("wk")
            .reset_index(drop=True)
        )
        # the partition identity: every active is exactly one class
        assert (
            got["actives"]
            == got["n_new"] + got["n_retained"] + got["n_resurrected"]
        ).all()
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        ev = ev[ev["event_type"] == "purchase"]
        secs = ev["ts"].values.astype("datetime64[s]").astype("int64")
        grid = (
            pd.DataFrame(
                {"u": ev["user_id"].values, "wk": secs // 604800}
            )
            .drop_duplicates()
            .sort_values(["u", "wk"])
        )
        grid["prev"] = grid.groupby("u")["wk"].shift()
        grid["first"] = grid.groupby("u")["wk"].transform("min")
        by_wk = grid.groupby("wk")
        want = pd.DataFrame(
            {
                "actives": by_wk.size(),
                "n_new": grid[grid.wk == grid["first"]]
                .groupby("wk")
                .size(),
                "n_retained": grid[grid.prev == grid.wk - 1]
                .groupby("wk")
                .size(),
                "n_resurrected": grid[
                    grid.prev.notna() & (grid.prev < grid.wk - 1)
                ]
                .groupby("wk")
                .size(),
            }
        ).fillna(0).astype(int)
        m = got.set_index("wk")[want.columns]
        assert m.equals(want.sort_index())
        # churn closes the books: actives(w-1) = retained(w) + churned(w)
        prev_act = got["actives"].shift().fillna(0).astype(int)
        assert (
            prev_act == got["n_retained"] + got["n_churned"]
        ).all()


class TestTrimmedWinsorized:
    def test_q242_matches_scipy_style_reference(self, spark):
        got = (
            REGISTRY["q242_trimmed_winsorized_mean"]
            .spark(spark, SF_DIR)
            .toPandas()
            .set_index("event_type")
        )
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        x = np.floor(ev["value"].values * 10000).astype("int64")
        df = pd.DataFrame(
            {"t": ev["event_type"], "x": x, "e": ev["event_id"]}
        )
        for t, g in df.groupby("t"):
            v = g.sort_values(["x", "e"])["x"].values
            n = len(v)
            k = n // 10
            kept = v[k : n - k]
            row = got.loc[t]
            assert int(row["n"]) == n and int(row["k"]) == k
            assert int(row["lo_b"]) == kept[0]
            assert int(row["hi_b"]) == kept[-1]
            assert int(row["trimmed_mean_u"]) == int(
                kept.sum() // (n - 2 * k)
            )
            wins = np.clip(v, kept[0], kept[-1])
            assert int(row["winsor_mean_u"]) == int(wins.sum() // n)


class TestShapleyAttribution:
    def test_q244_matches_closed_form_and_efficiency(self, spark):
        from math import factorial

        got = (
            REGISTRY["q244_shapley_attribution"]
            .spark(spark, SF_DIR)
            .toPandas()
            .set_index("channel")["shapley_u"]
        )
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        secs = ev["ts"].values.astype("datetime64[s]").astype("int64")
        bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
        df = pd.DataFrame(
            {
                "u": ev["user_id"],
                "wk": secs // 604800,
                "bit": ev["event_type"].map(bits).fillna(0).astype(int),
                "conv": (ev["event_type"] == "purchase").astype(int),
            }
        )
        j = df.groupby(["u", "wk"]).agg(
            mask=("bit", lambda b: int(sum(set(b)))),
            conv=("conv", "max"),
        )
        stats = j.groupby("mask").agg(n=("conv", "size"), c=("conv", "sum"))

        def v(mask):
            if mask in stats.index:
                return stats.loc[mask, "c"] / stats.loc[mask, "n"]
            return 0.0

        shap = {}
        for ch, bit in bits.items():
            others = [b for b in bits.values() if b != bit]
            total = 0.0
            terms = []
            for s_id in range(8):
                s = sum(b for k, b in enumerate(others) if s_id >> k & 1)
                w = (
                    factorial(bin(s).count("1"))
                    * factorial(3 - bin(s).count("1"))
                    / factorial(4)
                )
                terms.append((s, w * (v(s | bit) - v(s))))
            for _, t in sorted(terms):
                total += t
            shap[ch] = total
        for ch in bits:
            assert abs(int(got[ch]) - np.floor(shap[ch] * 1e6)) <= 1, ch
        # efficiency: credits telescope to v(all) - v(none) exactly
        assert abs(sum(shap.values()) - (v(15) - v(0))) < 1e-12


class TestNtileFromRank:
    def test_matches_native_ntile_every_small_n(self, spark):
        """q211's rank→bucket formula must reproduce Spark's ntile
        bit-for-bit for every n and bucket count that exercises the
        big/small-bucket split and the k=0 (n < buckets) edge."""
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from building_energy_data_pipeline_spark.plans.analytics_queries import (
            _ntile_from_rank,
        )

        for n in (1, 2, 3, 4, 5, 7, 8, 97, 100):
            df = (
                spark.range(1, n + 1)
                .selectExpr("id as rn", f"cast({n} as bigint) as n_tot")
            )
            for b in (2, 3, 4, 5):
                got = (
                    df.select(
                        "rn", _ntile_from_rank("rn", "n_tot", b).alias("x")
                    )
                    .orderBy("rn")
                    .toPandas()["x"]
                    .tolist()
                )
                want = (
                    spark.range(1, n + 1)
                    .select(
                        F.col("id").alias("rn"),
                        F.ntile(b).over(W.orderBy("id")).alias("x"),
                    )
                    .orderBy("rn")
                    .toPandas()["x"]
                    .tolist()
                )
                assert got == want, (n, b)


class TestRfmApproxThresholds:
    def test_exact_thresholds_match_numpy_rank_rule(self, spark, run):
        """q245's percentile_disc values re-derived independently:
        sorted v, threshold = v[ceil(p*n) - 1] (the convention both
        engines were verified to share)."""
        import math

        from building_energy_data_pipeline_spark.plans.analytics_queries import (
            _rfm_customer_grain,
        )

        got = run("q245_rfm_approx_thresholds").set_index("dim")
        cust = _rfm_customer_grain(spark, SF_DIR).toPandas()
        series = {
            "recency": cust["last_t"],
            "frequency": cust["freq"],
            "monetary": cust["monetary_c"],
        }
        for dim, s in series.items():
            v = np.sort(s.to_numpy())
            n = len(v)
            assert int(got.loc[dim, "n_cust"]) == n
            for p, col in ((0.25, "t25"), (0.50, "t50"), (0.75, "t75")):
                want = int(v[math.ceil(p * n) - 1])
                assert int(got.loc[dim, col]) == want, (dim, col)
        assert got["within_bound"].all()

    def test_thresholds_are_monotone_data_values(self, run):
        got = run("q245_rfm_approx_thresholds")
        assert (got["t25"] <= got["t50"]).all()
        assert (got["t50"] <= got["t75"]).all()


class TestWauHllWindow:
    def test_exact_wau_matches_pandas(self, spark, run):
        got = run("q246_wau_hll_window").set_index("day")
        from building_energy_data_pipeline_spark.sources.readers import (
            load_table,
        )
        from pyspark.sql import functions as F

        ud = (
            load_table(spark, SF_DIR, "events")
            .select(
                "user_id",
                F.expr(
                    "cast(unix_timestamp(ts) as bigint) div 86400"
                ).alias("day"),
            )
            .distinct()
            .toPandas()
        )
        for day in got.index:
            want = ud[(ud["day"] >= day - 6) & (ud["day"] <= day)][
                "user_id"
            ].nunique()
            assert int(got.loc[day, "wau_exact"]) == want
        assert got["within_bound"].all()
        assert (got["err_bp"].abs() <= 3000).all()

    def test_window_merge_equals_pooled_registers(self, spark):
        """HLL mergeability, the property q246 rides on: max-merging
        per-day registers over the window must equal registers built
        from the pooled 7-day slice directly."""
        from building_energy_data_pipeline_spark.operators import sketch
        from building_energy_data_pipeline_spark.sources.readers import (
            load_table,
        )
        from pyspark.sql import functions as F

        ud = (
            load_table(spark, SF_DIR, "events")
            .selectExpr(
                "cast(user_id as string) as tok",
                "cast(unix_timestamp(ts) as bigint) div 86400 as day",
            )
            .distinct()
        )
        anchor = ud.agg(F.max("day")).first()[0]
        merged = (
            sketch.hll_registers(ud, "tok", ["day"])
            .where(f"day between {anchor} - 6 and {anchor}")
            .groupBy("bucket")
            .agg(F.max("register").alias("register"))
            .toPandas()
            .set_index("bucket")["register"]
        )
        pooled = (
            sketch.hll_registers(
                ud.where(f"day between {anchor} - 6 and {anchor}"),
                "tok",
            )
            .toPandas()
            .set_index("bucket")["register"]
        )
        assert merged.sort_index().equals(pooled.sort_index())


class TestIvmRollupCube:
    def test_leaf_cells_equal_q233_state(self, run):
        cube = run("q247_ivm_rollup_cube")
        state = run("q233_incremental_rollup")
        leaves = (
            cube[cube["ym"].notna() & cube["l_returnflag"].notna()]
            .astype({"ym": "int64"})
            .sort_values(["l_returnflag", "ym"])
            .reset_index(drop=True)
        )
        want = state.sort_values(["l_returnflag", "ym"]).reset_index(
            drop=True
        )
        assert leaves[want.columns.tolist()].equals(want)

    def test_hierarchy_is_internally_consistent(self, run):
        cube = run("q247_ivm_rollup_cube")
        leaves = cube[cube["ym"].notna()]
        subs = cube[cube["ym"].isna() & cube["l_returnflag"].notna()]
        total = cube[cube["l_returnflag"].isna()]
        assert len(total) == 1
        for flag, grp in leaves.groupby("l_returnflag"):
            sub = subs[subs["l_returnflag"] == flag].iloc[0]
            assert int(sub["cnt"]) == int(grp["cnt"].sum())
            assert int(sub["sum_qty"]) == int(grp["sum_qty"].sum())
            assert int(sub["min_price_c"]) == int(grp["min_price_c"].min())
            assert int(sub["max_price_c"]) == int(grp["max_price_c"].max())
        assert int(total["cnt"].iloc[0]) == int(leaves["cnt"].sum())


class TestLatencyApproxQuantiles:
    def test_rank_audit_matches_numpy(self, spark, run):
        """q248's exact p50/p90 re-derived with numpy's linear
        interpolation, and the rank audit re-checked offline."""
        got = run("q248_latency_approx_quantiles").set_index("cohort_w")
        from building_energy_data_pipeline_spark.sources.readers import (
            load_table,
        )
        from pyspark.sql import functions as F

        ev = (
            load_table(spark, SF_DIR, "events")
            .select(
                "user_id",
                "event_type",
                F.expr("cast(unix_timestamp(ts) as bigint)").alias("t"),
            )
            .toPandas()
        )
        s = (
            ev[ev["event_type"] == "signup"]
            .groupby("user_id")["t"]
            .min()
            .rename("t_signup")
        )
        p = ev[ev["event_type"] == "purchase"].merge(
            s, on="user_id"
        )
        p = p[p["t"] >= p["t_signup"]]
        conv = (
            p.groupby("user_id")
            .agg(t_conv=("t", "min"), t_signup=("t_signup", "first"))
            .assign(
                cohort_w=lambda d: d["t_signup"] // 604800,
                lat=lambda d: d["t_conv"] - d["t_signup"],
            )
        )
        for cw, grp in conv.groupby("cohort_w"):
            lat = grp["lat"].to_numpy()
            assert int(got.loc[cw, "n_converted"]) == len(lat)
            assert int(got.loc[cw, "p50_hours"]) == int(
                np.percentile(lat, 50, method="linear") // 3600
            )
            assert int(got.loc[cw, "p90_hours"]) == int(
                np.percentile(lat, 90, method="linear") // 3600
            )
        assert got["within_bound"].all()
