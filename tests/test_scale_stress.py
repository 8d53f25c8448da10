"""Volume stress for the engine's scale levers: the sf0.001 suites
prove semantics; these prove the same constructions still behave on
multi-million-row inputs generated with ``spark.range`` — partition-
count independence, no driver funnels, closed forms matching their
sequential definitions at length, skew machinery swallowing a 90 %
hot key. Runtime budget ~2 min on local[32].
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators import scale


N_BIG = 5_000_000


class TestGlobalRowIndexVolume:
    def test_dense_rank_on_5m_rows(self, spark):
        df = spark.range(N_BIG).select(
            (F.col("id") * 2654435761 % 1_000_003).alias("k"),
            "id",
        )
        r = scale.global_row_index(df, ["k", "id"], index_name="rn")
        stats = r.agg(
            F.count("*").alias("n"),
            F.min("rn").alias("lo"),
            F.max("rn").alias("hi"),
            F.count_distinct("rn").alias("nd"),
        ).first()
        assert stats["n"] == N_BIG
        assert (stats["lo"], stats["hi"]) == (1, N_BIG)
        assert stats["nd"] == N_BIG
        plan = r._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan

    def test_rank_order_matches_sort_on_boundary_sample(self, spark):
        # the rows ranked 1..1000 must be exactly the 1000 smallest
        df = spark.range(N_BIG).select(
            (F.col("id") * 40503 % 999_983).alias("k"), "id"
        )
        r = scale.global_row_index(df, ["k", "id"], index_name="rn")
        head = (
            r.filter(F.col("rn") <= 1000)
            .orderBy("rn")
            .select("k", "id")
            .collect()
        )
        want = df.orderBy("k", "id").limit(1000).collect()
        assert [tuple(x) for x in head] == [tuple(x) for x in want]


class TestSkewVolume:
    def test_salted_join_swallows_90pct_hot_key(self, spark):
        n = 2_000_000
        # 90% of fact rows hit key 0; dim has 1000 keys
        fact = spark.range(n).select(
            F.expr(
                "case when id % 10 < 9 then 0L else id % 1000 end"
            ).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("attr")
        )
        got = scale.salted_join(fact, dim, on=["k"], salt=16).agg(
            F.count("*").alias("n"), F.sum("attr").alias("s")
        ).first()
        want = fact.join(dim, "k").agg(
            F.count("*").alias("n"), F.sum("attr").alias("s")
        ).first()
        assert (got["n"], got["s"]) == (want["n"], want["s"])


class TestClosedFormsAtLength:
    def test_cusum_closed_form_on_1m_row_series(self, spark):
        # one key, 1M ordered points: the two-window closed form must
        # equal the sequential recursion — at a length where any
        # off-by-one in frame bounds would diverge wildly
        n = 1_000_000
        df = spark.range(n).select(
            F.lit("k").alias("g"),
            F.col("id").alias("t"),
            ((F.col("id") * 48271) % 1999 - 999).alias("dev"),
        )
        from pyspark.sql import Window as W

        w = (
            W.partitionBy("g")
            .orderBy("t")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        s = (
            df.withColumn("cs", F.sum("dev").over(w))
            .withColumn("rmin", F.min("cs").over(w))
            .selectExpr("t", "cs - least(0L, rmin) as S")
        )
        got = s.agg(
            F.max("S").alias("mx"),
            F.expr("sum(case when S > 100000 then 1 else 0 end)").alias(
                "alerts"
            ),
        ).first()
        dev = (np.arange(n, dtype=np.int64) * 48271) % 1999 - 999
        cs = np.cumsum(dev)
        S = cs - np.minimum(np.minimum.accumulate(cs), 0)
        assert got["mx"] == int(S.max())
        assert got["alerts"] == int((S > 100_000).sum())

    def test_ohlc_argminmax_partitioning_independent(self, spark):
        # min_by/max_by partial merge must give identical bars no
        # matter how the input is split
        n = 3_000_000
        base = spark.range(n).select(
            (F.col("id") % 7).alias("g"),
            F.col("id").alias("t"),
            ((F.col("id") * 22695477) % 100_000).alias("x"),
        )
        agg_exprs = [
            F.expr("min_by(x, t)").alias("open"),
            F.max("x").alias("high"),
            F.min("x").alias("low"),
            F.expr("max_by(x, t)").alias("close"),
        ]
        a = {
            r["g"]: (r["open"], r["high"], r["low"], r["close"])
            for r in base.repartition(64).groupBy("g").agg(*agg_exprs)
            .collect()
        }
        b = {
            r["g"]: (r["open"], r["high"], r["low"], r["close"])
            for r in base.coalesce(2).groupBy("g").agg(*agg_exprs)
            .collect()
        }
        assert a == b

    def test_weighted_median_compact_path_matches_numpy(self, spark):
        n = 2_000_000
        df = spark.range(n).select(
            ((F.col("id") * 69069) % 10_000).alias("price"),
            ((F.col("id") * 1103515245) % 50 + 1).alias("w"),
        )
        g = df.groupBy("price").agg(F.sum("w").alias("tw"))
        from pyspark.sql import Window as W

        c = g.select(
            "price",
            F.sum("tw").over(W.orderBy("price")).alias("cumw"),
            F.sum("tw").over(
                W.partitionBy(F.lit(1))
            ).alias("total"),
        )
        got = c.filter(
            F.col("cumw") * 2 >= F.col("total")
        ).agg(F.min("price")).first()[0]

        price = (np.arange(n, dtype=np.int64) * 69069) % 10_000
        w = (np.arange(n, dtype=np.int64) * 1103515245) % 50 + 1
        order = np.argsort(price, kind="stable")
        cw = np.cumsum(w[order])
        want = int(price[order][np.searchsorted(cw, cw[-1] / 2)])
        assert got == want


class TestGlobalRunningSumVolume:
    def test_matches_serial_window_and_stays_distributed(self, spark):
        n = 2_000_000
        df = spark.range(n).select(
            ((F.col("id") * 2654435761) % 1_000_003).alias("k"),
            "id",
            ((F.col("id") * 31) % 1000).alias("v"),
        )
        r = scale.global_running_sum(df, ["k", "id"], "v", sum_name="cum")
        plan = r._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        # endpoint identities: final prefix == total; all prefixes
        # positive and strictly increasing along the order
        agg = r.agg(
            F.max("cum").alias("mx"), F.sum("v").alias("tot")
        ).first()
        assert agg["mx"] == agg["tot"]
        # spot-check the first 1000 prefixes against a serial window
        from pyspark.sql import Window

        head = (
            r.orderBy("k", "id").limit(1000).select("k", "id", "cum")
        ).collect()
        want = (
            df.orderBy("k", "id")
            .limit(1000)
            .withColumn(
                "cum",
                F.sum("v").over(
                    Window.orderBy("k", "id").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            )
            .select("k", "id", "cum")
        ).collect()
        assert [tuple(x) for x in head] == [tuple(x) for x in want]


class TestIntervalUnionVolume:
    def test_2m_intervals_match_closed_form(self, spark):
        # per key: 1000 decade-groups of two overlapping intervals
        # ([s, s+5] and [s, s+8] at s = 10*j) -> merged coverage is
        # exactly 9 days per group, 1000 disjoint periods, 2000
        # intervals; a construction whose union is known in closed
        # form at any volume
        from building_energy_data_pipeline_spark.ops.observe import (
            plan_lint,
        )
        from building_energy_data_pipeline_spark.plans.analytics_queries import (
            interval_union,
        )

        n_keys, n_iv = 1000, 2000
        iv = spark.range(n_keys * n_iv).select(
            (F.col("id") % n_keys).alias("key"),
            (F.col("id") / n_keys).cast("long").alias("i"),
        ).select(
            "key",
            F.expr(
                "date_add(date'2000-01-01', cast((i div 2) * 10 as int))"
            ).alias("lo"),
            F.expr(
                "date_add(date'2000-01-01',"
                " cast((i div 2) * 10 + 5 + (i % 2) * 3 as int))"
            ).alias("hi"),
        )
        out = interval_union(iv, "key")
        assert plan_lint(out) == []
        stats = out.agg(
            F.count("*").alias("n"),
            F.min("covered_days").alias("c_lo"),
            F.max("covered_days").alias("c_hi"),
            F.min("n_periods").alias("p_lo"),
            F.max("n_periods").alias("p_hi"),
            F.min("n_orders").alias("o_lo"),
            F.max("n_orders").alias("o_hi"),
        ).first()
        assert stats["n"] == n_keys
        assert (stats["c_lo"], stats["c_hi"]) == (9 * 1000, 9 * 1000)
        assert (stats["p_lo"], stats["p_hi"]) == (1000, 1000)
        assert (stats["o_lo"], stats["o_hi"]) == (n_iv, n_iv)


class TestIVMVolume:
    def test_3m_detail_100k_batch_maintains_exactly(self, spark):
        from building_energy_data_pipeline_spark.operators import ivm

        n, n_ins, groups = 3_000_000, 500_000, 1000
        detail = spark.range(n).select(
            (F.col("id") % groups).alias("g"),
            F.col("id").alias("v"),
        )
        # per-group min is id = g itself, so every g % 10 == 0 group
        # loses its min witness -> 100 genuinely dirty groups
        dels = detail.where("v % 10 = 0").withColumn(
            ivm.OP_COL, F.lit("D")
        )
        ins = spark.range(n, n + n_ins).select(
            (F.col("id") % groups).alias("g"),
            F.col("id").alias("v"),
            F.lit("I").alias(ivm.OP_COL),
        )
        cdc = dels.unionByName(ins)
        after = detail.where("v % 10 != 0").unionByName(
            ins.drop(ivm.OP_COL)
        )
        keys, sums, mms = ["g"], ["v"], ["v"]
        state0 = ivm.rollup_state(detail, keys, sums, mms)
        census = dict(
            ivm.maintenance_census(state0, cdc, keys, mms)
            .groupBy("path")
            .count()
            .collect()
        )
        assert census.get("dirty", 0) == groups // 10
        assert census.get("algebraic", 0) == groups - groups // 10
        got = (
            ivm.maintain_rollup(state0, cdc, after, keys, sums, mms)
            .toPandas()
            .set_index("g")
            .sort_index()
        )
        want = (
            ivm.rollup_state(after, keys, sums, mms)
            .toPandas()
            .set_index("g")
            .sort_index()
        )
        assert len(got) == groups
        for col in ("cnt", "sum_v", "min_v", "max_v"):
            assert (got[col] == want[col]).all(), col


class TestNtileFromRankVolume:
    def test_quartiles_on_2m_rows_without_single_partition(self, spark):
        """q211's rank→bucket path at volume: 2M rows through
        global_row_index + _ntile_from_rank must produce four buckets
        whose sizes differ by ≤1 and whose boundaries respect the
        order — with no single-partition stage (native ntile at this
        cardinality would funnel 2M rows through one task)."""
        from building_energy_data_pipeline_spark.plans.analytics_queries import (
            _ntile_from_rank,
        )

        n = 2_000_000
        df = spark.range(n).select(
            (F.col("id") * 2654435761 % 999_983).alias("v"),
            F.col("id").alias("tie"),
        )
        ranked = scale.global_row_index(df, ["v", "tie"], "rn")
        n_df = ranked.agg(F.count("*").alias("n_tot"))
        scored = ranked.crossJoin(F.broadcast(n_df)).select(
            "v", _ntile_from_rank("rn", "n_tot", 4).alias("q")
        )
        from building_energy_data_pipeline_spark.ops.observe import (
            plan_lint,
        )

        # the only SinglePartition exchange allowed is the sanctioned
        # partial→final step of the scalar n_tot aggregate, which
        # plan_lint distinguishes from a data funnel
        assert plan_lint(scored) == []
        sizes = dict(scored.groupBy("q").count().collect())
        assert sorted(sizes) == [1, 2, 3, 4]
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # boundary order: bucket value ranges are monotone (a tied
        # value may straddle adjacent buckets — rank splits ties — so
        # assert lo/hi monotonicity, not strict disjointness)
        b = scored.groupBy("q").agg(
            F.min("v").alias("lo"), F.max("v").alias("hi")
        )
        rows = {r["q"]: (r["lo"], r["hi"]) for r in b.collect()}
        for i in (1, 2, 3):
            assert rows[i][0] <= rows[i + 1][0], rows
            assert rows[i][1] <= rows[i + 1][1], rows


class TestHLLWindowVolume:
    def test_register_fan_is_metadata_sized_at_5m_events(self, spark):
        """q246's core scale claim: 5M (user, day) activity rows fold
        to ≤ 64 registers/day, so the 7-day window union moves
        sketch rows only; the merged estimate stays within the m=64
        error envelope against the exact distinct count."""
        from building_energy_data_pipeline_spark.operators import sketch

        n, days, users = 5_000_000, 30, 200_000
        ud = spark.range(n).select(
            F.expr(f"cast(id % {users} as string)").alias("tok"),
            (F.col("id") % days).alias("day"),
        ).distinct()
        regs = sketch.hll_registers(ud, "tok", ["day"])
        assert regs.count() <= days * sketch.HLL_M
        anchor = days - 1
        merged = (
            regs.where(f"day between {anchor} - 6 and {anchor}")
            .groupBy("bucket")
            .agg(F.max("register").alias("register"))
        )
        est = sketch.hll_estimate(
            merged.withColumn("g", F.lit(1)), ["g"]
        ).first()["hll_est"]
        exact = (
            ud.where(f"day between {anchor} - 6 and {anchor}")
            .select("tok")
            .distinct()
            .count()
        )
        assert abs(est - exact) / exact <= 0.40  # ~3σ for m = 64


class TestCodecVolume:
    """Round-9 continuation: the pure-Python codec stages at volume —
    thousands of real compressed payloads born, encoded, and decoded
    inside mapInPandas tasks with exact integer checksums. Proves the
    q254/q255/q256 shapes keep their per-task economics when the row
    count is 30x the sf0.01 driver runs (the knob a 100 TB scan turns
    is partition count, which this pins at 16)."""

    def test_5k_jpegs_decode_distributed_exact(self, spark):
        from building_energy_data_pipeline_spark.operators import (
            multimodal,
        )

        n = 5_000
        docs = spark.range(n).select(
            F.col("id").alias("media_id"),
            (8 + (F.col("id") % 5) * 6).cast("int").alias("height"),
            (8 + (F.col("id") % 4) * 7).cast("int").alias("width"),
        ).repartition(16)

        def synth(batches):
            import numpy as np
            import pandas as pd

            from building_energy_data_pipeline_spark.operators.jpeg_codec import (
                encode_jpeg,
            )

            for pdf in batches:
                rows = []
                for mid, h, w in zip(
                    pdf["media_id"], pdf["height"], pdf["width"]
                ):
                    mid, h, w = int(mid), int(h), int(w)
                    y, x = np.ogrid[0:h, 0:w]
                    arr = (
                        2 * ((mid * 7 + (y // 8) * 5 + (x // 8) * 3)
                             % 128)
                    ).astype(np.uint8)
                    rows.append(
                        {"media_id": mid,
                         "content": encode_jpeg(arr, 50)}
                    )
                yield pd.DataFrame(rows, columns=["media_id", "content"])

        media = docs.mapInPandas(
            synth, "media_id long, content binary"
        )
        out = multimodal.image_channel_sums(media, use_real_codec=True)
        # closed-form total: sum over media of sum over pixels
        total = out.agg(
            F.count("*").alias("n"),
            F.sum("sum_r").alias("sr"),
            F.sum("sum_g").alias("sg"),
        ).first()
        assert total["n"] == n
        expect = 0
        for mid in range(n):
            h, w = 8 + (mid % 5) * 6, 8 + (mid % 4) * 7
            y, x = np.ogrid[0:h, 0:w]
            expect += int(
                (2 * ((mid * 7 + (y // 8) * 5 + (x // 8) * 3) % 128))
                .sum()
            )
        assert total["sr"] == total["sg"] == expect

    def test_2k_adpcm_streams_decode_distributed_exact(self, spark):
        from building_energy_data_pipeline_spark.operators import (
            multimodal,
        )

        n = 2_000
        docs = spark.range(n).select(
            F.col("id").alias("media_id"),
            (32 + F.col("id") % 32).cast("int").alias("n_samples"),
        ).repartition(16)

        def synth(batches):
            import pandas as pd

            from building_energy_data_pipeline_spark.operators.multimodal import (
                codes_to_adpcm_wav,
            )

            for pdf in batches:
                rows = []
                for mid, ns in zip(pdf["media_id"], pdf["n_samples"]):
                    mid, ns = int(mid), int(ns)
                    codes = [(mid * 3 + k * 7) % 16
                             for k in range(1, ns)]
                    rows.append(
                        {"media_id": mid,
                         "content": codes_to_adpcm_wav(codes, 16000)}
                    )
                yield pd.DataFrame(rows, columns=["media_id", "content"])

        media = docs.mapInPandas(
            synth, "media_id long, content binary"
        )
        got = multimodal.audio_int_stats(media, container="wav").agg(
            F.count("*").alias("n"),
            F.sum("sum_abs").alias("sa"),
            F.max("peak").alias("pk"),
        ).first()
        assert got["n"] == n
        expect_sa, expect_pk = 0, 0
        for mid in range(n):
            ns = 32 + mid % 32
            codes = [(mid * 3 + k * 7) % 16 for k in range(1, ns)]
            samples = multimodal._adpcm_decode_nibbles(codes, 0, 0)
            expect_sa += sum(abs(s) for s in samples)
            expect_pk = max(expect_pk,
                            max(abs(s) for s in samples))
        assert got["sa"] == expect_sa
        assert got["pk"] == expect_pk
