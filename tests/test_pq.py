"""Product quantization (pq_train / pq_encode / pq_adc_topk):
numpy replays of the exact spec, reconstruction-error improvement,
ADC recall against the exact brute-force baseline, and the map-only
plan shape. Oracle registration is slated for the next driver-window
rotation (similarity.py's PQ header note); until then this module IS
the contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators import similarity
from building_energy_data_pipeline_spark.sources.readers import load_table

M, K = 4, 8


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings")
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in df.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([i for i, _ in rows])
    x = np.stack([v for _, v in rows])
    return df, ids, x


def _np_train(x: np.ndarray, ids: np.ndarray, m: int, k: int, iters: int):
    """Replay of pq_train: seed = k lowest-id vectors' subvectors,
    Lloyd rounds with float64 means (the decimal-exact Spark means
    agree to ~1e-6) and lowest-code tie-break."""
    d = x.shape[1] // m
    order = np.argsort(ids)
    seeds = x[order[:k]]
    cbs = [seeds[:, s * d : (s + 1) * d].copy() for s in range(m)]
    for _ in range(iters):
        new = []
        for s in range(m):
            sub = x[:, s * d : (s + 1) * d]
            dist = ((sub[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=2)
            code = dist.argmin(axis=1)
            nc = cbs[s].copy()
            for c in range(k):
                mask = code == c
                if mask.any():
                    nc[c] = np.float32(
                        np.round(sub[mask].sum(axis=0), 6) / mask.sum()
                    )
            new.append(nc)
        cbs = new
    return cbs


def _np_encode(x: np.ndarray, cbs) -> np.ndarray:
    m = len(cbs)
    d = x.shape[1] // m
    codes = np.zeros((x.shape[0], m), dtype=np.int64)
    for s in range(m):
        sub = x[:, s * d : (s + 1) * d]
        dist = ((sub[:, None, :] - np.asarray(cbs[s], dtype=np.float64)[None, :, :]) ** 2).sum(
            axis=2
        )
        codes[:, s] = dist.argmin(axis=1)
    return codes


class TestPQTrainEncode:
    def test_codebook_shape_and_determinism(self, spark, emb):
        df, ids, x = emb
        cb = similarity.pq_train(df, m=M, k=K, iters=1)
        rows = cb.collect()
        assert len(rows) == M * K
        assert {(r.sub_id, r.code_id) for r in rows} == {
            (s, c) for s in range(M) for c in range(K)
        }
        assert all(len(r.centroid) == x.shape[1] // M for r in rows)
        again = {
            (r.sub_id, r.code_id): tuple(r.centroid)
            for r in similarity.pq_train(df, m=M, k=K, iters=1).collect()
        }
        assert {(r.sub_id, r.code_id): tuple(r.centroid) for r in rows} == again

    def test_encode_matches_numpy_replay(self, spark, emb):
        df, ids, x = emb
        cb = similarity.pq_train(df, m=M, k=K, iters=2)
        cbs_np = [
            [None] * K for _ in range(M)
        ]
        for r in cb.collect():
            cbs_np[r.sub_id][r.code_id] = np.array(r.centroid, dtype=np.float64)
        cbs_np = [np.stack(c) for c in cbs_np]
        got = {
            r.vec_id: list(r.codes)
            for r in similarity.pq_encode(df, cb).collect()
        }
        want = _np_encode(x, cbs_np)
        for i, vid in enumerate(ids):
            assert got[vid] == list(want[i]), vid

    def test_training_reduces_reconstruction_error(self, spark, emb):
        df, ids, x = emb

        def recon_err(iters):
            cbs = _np_train(x, ids, M, K, iters)
            codes = _np_encode(x, cbs)
            d = x.shape[1] // M
            err = 0.0
            for s in range(M):
                sub = x[:, s * d : (s + 1) * d]
                err += ((sub - np.asarray(cbs[s])[codes[:, s]]) ** 2).sum()
            return err

        e0, e2 = recon_err(0), recon_err(2)
        assert e2 < e0 * 0.9, (e0, e2)
        # and the Spark-trained codebooks land within float tolerance
        # of the numpy Lloyd replay after the same 2 rounds
        cb = similarity.pq_train(df, m=M, k=K, iters=2)
        cbs_np = _np_train(x, ids, M, K, 2)
        for r in cb.collect():
            np.testing.assert_allclose(
                np.array(r.centroid), cbs_np[r.sub_id][r.code_id], atol=2e-6
            )


class TestDimGuard:
    def test_non_dividing_m_raises_in_plan(self, spark, emb):
        """A vector dimension not divisible by m must FAIL LOUDLY
        (in-plan raise_error) instead of silently dropping the
        trailing dim % m components (ADVICE r5 #1). 64-dim / m=5."""
        df, _, _ = emb
        with pytest.raises(Exception, match="not divisible by m=5"):
            similarity.pq_train(df, m=5, k=K, iters=1).collect()
        cb = similarity.pq_train(df, m=M, k=K, iters=1)
        bad = df.withColumn("embedding", F.expr("slice(embedding, 1, 63)"))
        with pytest.raises(Exception, match="not divisible by m=4"):
            similarity.pq_encode(bad, cb).collect()


class TestADC:
    def test_adc_recall_vs_exact(self, spark, emb):
        df, ids, x = emb
        cb = similarity.pq_train(df, m=M, k=K, iters=2)
        codes = similarity.pq_encode(df, cb)
        queries = df.filter("vec_id < 5")
        got = similarity.pq_adc_topk(queries, codes, cb, k=10).collect()
        # numpy exact L2 top-10 (self included, ties by id — the
        # operator's contract)
        d2 = ((x[:5][:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
        hit = 0
        for qi in range(5):
            order = np.lexsort((ids, d2[qi]))
            exact = set(ids[order[:10]])
            approx = {r.neighbor_id for r in got if r.query_id == ids[qi]}
            assert len(approx) == 10
            hit += len(exact & approx)
        # 4×8 codes on 64-dim data is coarse; ADC must still recover
        # a solid fraction of the true neighborhood — and the nearest
        # neighbor of each query is itself, whose ADC distance is the
        # quantization floor
        assert hit / 50 >= 0.3, hit / 50

    def test_adc_distance_is_lut_sum(self, spark, emb):
        """ADC distance of a vector must equal the exact L2 between
        the query and the vector's RECONSTRUCTION (the defining
        property of the lookup table)."""
        df, ids, x = emb
        cb = similarity.pq_train(df, m=M, k=K, iters=1)
        cbs_np = [[None] * K for _ in range(M)]
        for r in cb.collect():
            cbs_np[r.sub_id][r.code_id] = np.array(r.centroid, dtype=np.float64)
        codes = similarity.pq_encode(df, cb)
        got = similarity.pq_adc_topk(
            df.filter("vec_id = 3"), codes, cb, k=5
        ).collect()
        codes_np = {
            r.vec_id: list(r.codes) for r in codes.collect()
        }
        qx = x[list(ids).index(3)]
        d = x.shape[1] // M
        for r in got:
            rec = np.concatenate(
                [cbs_np[s][codes_np[r.neighbor_id][s]] for s in range(M)]
            )
            want = round(float(((qx - rec) ** 2).sum()), 6)
            assert abs(r.adc_dist - want) < 1e-4, (r.neighbor_id, r.adc_dist, want)


class TestPQPlanShape:
    def test_encode_plan_has_no_data_exchange(self, spark, emb):
        """The corpus branch must stay map-only: the only shuffles
        allowed anywhere in the plan are the codebook-packing
        aggregates (m·k rows — hashpartitioning on sub_id, then the
        SinglePartition collapse to the broadcast row) and
        spread_scan's fan-out; no exchange may ever partition on
        corpus rows."""
        df, _, _ = emb
        cb = similarity.pq_train(df, m=M, k=K, iters=1)
        enc = similarity.pq_encode(df, cb)
        plan = enc._jdf.queryExecution().executedPlan().toString()
        lines = [
            ln
            for ln in plan.splitlines()
            if "Exchange" in ln
            and "Broadcast" not in ln
            and "REPARTITION" not in ln
            and "RoundRobin" not in ln
        ]
        for ln in lines:
            assert "hashpartitioning(sub_id" in ln or "SinglePartition" in ln, ln
        assert len(lines) <= 2, lines


class TestIVFPQ:
    def test_cell_pruning_and_recall(self, spark, emb):
        """IVF-PQ must (a) score strictly fewer candidates than the
        full-corpus ADC scan, (b) return exactly k rows per query,
        and (c) lose recall only through cell misses — its hits must
        be a subset-quality approximation whose recall at nprobe =
        n_cells equals brute ADC's."""
        df, ids, x = emb
        cents = df.filter("vec_id < 8")
        cb = similarity.pq_train(df, m=M, k=K, iters=1)
        queries = df.filter("vec_id < 5")
        full = similarity.pq_adc_topk(
            queries, similarity.pq_encode(df, cb), cb, k=10
        ).collect()
        pruned = similarity.ivf_pq_topk(
            queries, df, cents, cb, k=10, nprobe=2
        ).collect()
        assert len(pruned) == 50
        allprobe = similarity.ivf_pq_topk(
            queries, df, cents, cb, k=10, nprobe=8
        ).collect()
        want = {(r.query_id, r.neighbor_id, r.rank, r.adc_dist) for r in full}
        got = {(r.query_id, r.neighbor_id, r.rank, r.adc_dist) for r in allprobe}
        # probing every cell = no pruning: must equal the full ADC scan
        assert got == want
        # nprobe=2 hits are a subset of each query's probed cells and
        # overlap the full scan's head substantially on clustered data
        overlap = len(
            {(r.query_id, r.neighbor_id) for r in pruned}
            & {(r.query_id, r.neighbor_id) for r in full}
        )
        assert overlap >= 20, overlap


class TestPQDuckTwins:
    """Cross-engine parity for the PQ spec ahead of its driver-window
    registration: the DuckDB CTE twins must reproduce the Spark
    codebooks bit-for-bit (identical double means → identical float32
    casts) and the code assignments exactly."""

    def test_codebooks_match_duckdb(self, spark, sf_dir, emb):
        import duckdb

        df, _, _ = emb
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM"
            f" read_parquet('{sf_dir}/embeddings.parquet')"
        )
        want = {
            (int(s), int(c)): np.array(v, dtype=np.float32)
            for s, c, v in con.execute(
                similarity.duck_pq_codebook_sql("embeddings", M, K, 2)
            ).fetchall()
        }
        got = {
            (r.sub_id, r.code_id): np.array(r.centroid, dtype=np.float32)
            for r in similarity.pq_train(df, m=M, k=K, iters=2).collect()
        }
        assert got.keys() == want.keys()
        for key in got:
            assert np.array_equal(got[key], want[key]), key

    def test_codes_match_duckdb(self, spark, sf_dir, emb):
        import duckdb

        df, _, _ = emb
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM"
            f" read_parquet('{sf_dir}/embeddings.parquet')"
        )
        want = {
            int(v): [int(c) for c in codes]
            for v, codes in con.execute(
                similarity.duck_pq_encode_sql("embeddings", M, K, 2)
            ).fetchall()
        }
        cb = similarity.pq_train(df, m=M, k=K, iters=2)
        got = {
            r.vec_id: list(r.codes)
            for r in similarity.pq_encode(df, cb).collect()
        }
        assert got == want
