"""Arrow-vectorized ANN scoring: agrees with the bit-exact
expression path within float tolerance, and is faster at bench scale
(not asserted — timing is environment-dependent; see README §scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_arrow,
)


def test_arrow_topk_matches_expression_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, queries, k=3)
    arrow = brute_force_topk_arrow(emb, queries, k=3)
    j = exact.alias("e").join(
        arrow.alias("a"),
        (F.col("e.query_id") == F.col("a.query_id"))
        & (F.col("e.neighbor_id") == F.col("a.neighbor_id")),
        "full",
    )
    rows = j.select(
        F.col("e.query_id").alias("eq"),
        F.col("a.query_id").alias("aq"),
        F.col("e.cos").alias("ec"),
        F.col("a.cos").alias("ac"),
    ).collect()
    # every (query, neighbor) pair chosen by one path is chosen by the
    # other (rank flips only possible at exact cosine ties), and the
    # cosines agree to 1e-9
    for r in rows:
        assert r["eq"] is not None and r["aq"] is not None, f"pair mismatch: {r}"
        assert abs(r["ec"] - r["ac"]) < 1e-9


def test_arrow_scorer_handles_ragged_batches(spark):
    # mixed dimensions in one Arrow batch: zero-padding to the batch
    # max must leave dots and norms unchanged
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 2.0, 0.0]),
        (2, [3.0, 4.0]),
        (3, [1.0, 1.0, 1.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") == 0)
    got = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in brute_force_topk_arrow(emb, queries, k=3).collect()
    }
    # cos((1,0), (3,4)) = 3/5; cos with (0,2,0) = 0; cos with 1-vector = 0.5
    assert abs(got[(0, 2)] - 0.6) < 1e-9
    assert abs(got[(0, 1)] - 0.0) < 1e-9
    assert abs(got[(0, 3)] - 0.5) < 1e-9


class TestFixpointLoops:
    def test_kmeans_train_converges_on_separated_clusters(self, spark):
        from building_energy_data_pipeline_spark.operators.similarity import (
            assign_centroids,
            kmeans_train,
        )

        # two tight, well-separated direction clusters (spherical
        # k-means clusters by cosine): near +x and near +y
        rows = []
        for i in range(20):
            eps = (i % 5) * 0.01
            rows.append((i, [1.0, eps, 0.0]))
            rows.append((100 + i, [eps, 1.0, 0.0]))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        cent = kmeans_train(emb, k=2, max_iter=8)
        assert cent.count() == 2
        assigned = assign_centroids(emb, cent).select(
            "vec_id", "centroid_id"
        )
        groups = (
            assigned.withColumn("truth", (F.col("vec_id") >= 100))
            .groupBy("truth")
            .agg(F.countDistinct("centroid_id").alias("n_cents"))
            .collect()
        )
        # each true cluster maps to exactly one trained centroid
        assert all(r.n_cents == 1 for r in groups)

    def test_assign_centroids_preserves_string_id_type(self, spark):
        """The nprobe=1 fold's null accumulator must take the
        centroid frame's ACTUAL id dtype — a string-keyed centroid
        table keeps string centroid_ids, matching the nprobe>1
        window path (ADVICE r5 #3)."""
        from building_energy_data_pipeline_spark.operators.similarity import (
            assign_centroids,
        )

        emb = spark.createDataFrame(
            [("d1", [1.0, 0.0]), ("d2", [0.0, 1.0])],
            "vec_id string, embedding array<float>",
        )
        cent = spark.createDataFrame(
            [("ca", [1.0, 0.1]), ("cb", [0.1, 1.0])],
            "vec_id string, embedding array<float>",
        )
        one = assign_centroids(emb, cent)
        assert one.schema["centroid_id"].dataType.simpleString() == "string"
        got = {r.vec_id: r.centroid_id for r in one.collect()}
        assert got == {"d1": "ca", "d2": "cb"}
        multi = assign_centroids(emb, cent, nprobe=2)
        assert (
            multi.schema["centroid_id"].dataType.simpleString() == "string"
        )

    def test_pagerank_fixpoint_properties(self, spark):
        from building_energy_data_pipeline_spark.operators.graph import (
            pagerank,
        )

        # a -> b -> c -> a cycle (uniform weights): symmetric, so the
        # stationary distribution is exactly uniform 1/3 each
        edges = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)],
            "w1 string, w2 string, c long",
        )
        ranks = {r.node: r.rank for r in pagerank(edges).collect()}
        assert set(ranks) == {"a", "b", "c"}
        for v in ranks.values():
            assert abs(v - 1 / 3) < 1e-4
        # hub-and-spoke: the hub must outrank every spoke
        edges2 = spark.createDataFrame(
            [("s1", "hub", 3), ("s2", "hub", 1), ("hub", "s1", 1)],
            "w1 string, w2 string, c long",
        )
        r2 = {r.node: r.rank for r in pagerank(edges2).collect()}
        assert r2["hub"] > r2["s1"] > 0

    def test_kmeans_train_keeps_k_on_emptied_cluster(self, spark):
        # duplicate seed vectors: ties all break to the lower centroid
        # id, emptying the other's cluster — the trained quantizer
        # must still have k cells (previous centroid carried forward)
        from building_energy_data_pipeline_spark.operators.similarity import (
            kmeans_train,
        )

        rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0])] + [
            (10 + i, [1.0, 0.001 * i]) for i in range(10)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        cent = kmeans_train(emb, k=2, max_iter=4)
        assert cent.count() == 2

    def test_pagerank_empty_edges(self, spark):
        from building_energy_data_pipeline_spark.operators.graph import (
            pagerank,
        )

        empty = spark.createDataFrame(
            [], "w1 string, w2 string, c long"
        )
        assert pagerank(empty).count() == 0


class TestFixedBudgetMode:
    """tol<=0 pins the training loops to exactly max_iter rounds with
    no convergence aggregate — the deterministic mode the
    oracle-checked q117/q118/q119 run in."""

    def test_kmeans_fixed_budget_is_deterministic(self, spark):
        from building_energy_data_pipeline_spark.operators.similarity import (
            kmeans_train,
        )

        rows = [(i, [1.0 + 0.01 * (i % 7), 0.1 * (i % 3), 1.0]) for i in range(30)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = {
            (r.vec_id, tuple(r.embedding))
            for r in kmeans_train(emb, k=3, max_iter=2, tol=0.0).collect()
        }
        b = {
            (r.vec_id, tuple(r.embedding))
            for r in kmeans_train(emb, k=3, max_iter=2, tol=0.0).collect()
        }
        assert a == b and len(a) == 3

    def test_pagerank_fixed_budget_covers_all_nodes(self, spark):
        from building_energy_data_pipeline_spark.operators.graph import (
            pagerank,
        )

        edges = spark.createDataFrame(
            [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("d", "a", 1)],
            "w1 string, w2 string, c long",
        )
        ranks = {
            r.node: r.rank
            for r in pagerank(edges, max_iter=2, tol=0.0).collect()
        }
        # full node set, source-only node 'd' at the base rank
        assert set(ranks) == {"a", "b", "c", "d"}
        assert abs(ranks["d"] - (1 - 0.85) / 4) < 1e-12
        # two fixed-budget runs are bit-identical (decimal sums)
        again = {
            r.node: r.rank
            for r in pagerank(edges, max_iter=2, tol=0.0).collect()
        }
        assert ranks == again
