"""Tests for vector similarity search: exact brute-force top-k checked
against a NumPy oracle; LSH bucket invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from mb8600_clickhouse_spark.operators import similarity as sim

DIM = 8
N = 30


def _vectors():
    rng = np.random.RandomState(7)
    return rng.randn(N, DIM).astype(np.float32)


def _df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


class TestCosineTopK:
    def test_matches_numpy(self, spark):
        vecs = _vectors()
        df = _df(spark, vecs)
        queries = df.filter("vec_id < 3")
        got = sim.cosine_topk(df, queries, k=5).collect()

        v64 = vecs.astype(np.float64)
        normed = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
        sims = normed @ normed.T
        for q in range(3):
            order = sorted(range(N), key=lambda j: (-sims[q, j], j))[:5]
            got_q = sorted(
                (r for r in got if r["query_id"] == q),
                key=lambda r: (-r["cosine_sim"], r["neighbor_id"]),
            )
            assert [r["neighbor_id"] for r in got_q] == order
            for r in got_q:
                assert r["cosine_sim"] == pytest.approx(
                    sims[q, r["neighbor_id"]], rel=1e-9
                )

    def test_self_is_top1(self, spark):
        vecs = _vectors()
        df = _df(spark, vecs)
        got = sim.cosine_topk(df, df.filter("vec_id < 5"), k=1).collect()
        for r in got:
            assert r["neighbor_id"] == r["query_id"]
            assert r["cosine_sim"] == pytest.approx(1.0)


class TestIVFAssign:
    def test_pandas_assign_agrees_with_expr(self, spark):
        """The vectorized (Arrow+numpy) cell assignment must agree with
        the pure-Catalyst HOF fold on every fixture vector (they can
        only diverge at exact fp ties between cells)."""
        vecs = _vectors()
        df = _df(spark, vecs)
        cents = sim.centroid_literals(df.filter("vec_id % 7 = 1"))
        a = {r["id"]: r["cell"] for r in sim.ivf_assign(df, cents).collect()}
        b = {r["id"]: r["cell"] for r in sim.ivf_assign_pandas(df, cents).collect()}
        assert a == b

    def test_pandas_probe_agrees_with_expr(self, spark):
        """Vectorized probe-cell selection must pick the same (query,
        cell) set with the same tie-break (cosine desc, cid asc) as the
        HOF fold path."""
        df = _df(spark, _vectors())
        cents = sim.centroid_literals(df.filter("vec_id % 7 = 1"))
        a = sorted(
            (r["id"], r["cell"])
            for r in sim.ivf_probe_cells(df, cents, nprobe=2).collect()
        )
        b = sorted(
            (r["id"], r["cell"])
            for r in sim.ivf_probe_cells_pandas(df, cents, nprobe=2).collect()
        )
        assert a == b

    def test_topk_impls_identical(self, spark):
        df = _df(spark, _vectors())
        cents_df = df.filter("vec_id % 7 = 1")
        q = df.filter("vec_id < 3")
        got_p = sim.ivf_topk(df, q, cents_df, k=3, nprobe=2, assign_impl="pandas")
        got_e = sim.ivf_topk(df, q, cents_df, k=3, nprobe=2, assign_impl="expr")
        assert sorted(map(tuple, got_p.collect())) == sorted(map(tuple, got_e.collect()))

    def test_kmeans_fit_recovers_clusters(self, spark):
        """Three well-separated direction clusters: after training, every
        vector's assigned cell equals its generating cluster (up to cell
        relabeling), and the fit is deterministic across calls."""
        import numpy as np

        rng = np.random.default_rng(11)
        dirs = np.eye(3)[:, :, None] * np.ones((3, 1, 8))  # 3 orthogonal-ish dirs
        base = np.zeros((3, 8))
        base[0, :3] = [1, 0.1, 0]
        base[1, 3:6] = [1, 0.1, 0.1]
        base[2, 6:] = [1, 0.2]
        rows = []
        for i in range(90):
            c = i % 3
            v = base[c] + rng.normal(0, 0.02, 8)
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = sim.kmeans_fit(df, k=3, n_iter=5)
        assert len(cents) == 3
        cents2 = sim.kmeans_fit(df, k=3, n_iter=5)
        assert cents == cents2  # deterministic
        assigned = sim.ivf_assign_pandas(df, cents).collect()
        by_cluster = {}
        for r in assigned:
            by_cluster.setdefault(r["id"] % 3, set()).add(r["cell"])
        # each generating cluster maps to exactly one cell, all distinct
        assert all(len(cells) == 1 for cells in by_cluster.values())
        assert len(set().union(*by_cluster.values())) == 3

    def test_kmeans_feeds_ivf_topk(self, spark):
        df = _df(spark, _vectors())
        cents = sim.kmeans_fit(df, k=4, n_iter=3)
        q = df.filter("vec_id < 2")
        got = sim.ivf_topk(df, q, None, k=3, nprobe=2, cents=cents)
        rows = got.collect()
        assert len(rows) > 0
        # self-similarity must put each query in its own top-k
        tops = {r["query_id"] for r in rows if r["query_id"] == r["neighbor_id"]}
        assert tops == {0, 1}

    def test_q54_fixture_boundary_margin(self, spark):
        """q54's oracle hash equality rests on the numpy-vs-JVM-fold
        summation orders rounding to the same 4th decimal (ADVICE r04):
        assert, on the ACTIVE sf0.01 driver fixture with q54's exact
        parameters, that every scored cosine sits far enough from a
        .00005 half-boundary that ulp-order noise (~1e-15) cannot flip
        the rounding. A regenerated fixture that lands a cosine within
        1e-9 of a boundary fails HERE, loudly, instead of as a driver
        hash mismatch."""
        from pyspark.sql import functions as F

        from mb8600_clickhouse_spark.tables import load_tables

        emb = load_tables(spark, "/root/testdata/sf0.01")["embeddings"]
        out = sim.ivf_topk(
            corpus=emb.filter(F.col("vec_id") >= 50),
            queries=emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13)),
            centroids=emb.filter(F.col("vec_id") < 8),
            k=5,
            nprobe=2,
        )
        sims = [r["cosine_sim"] for r in out.collect()]
        assert sims, "q54 shape returned no candidates on the fixture"
        # distance from v to the nearest (k + 0.5) / 1e4 rounding boundary
        margin = min(abs(((v * 1e4) % 1.0) - 0.5) / 1e4 for v in sims)
        assert margin > 1e-9, f"cosine within {margin} of a rounding boundary"


class TestLSH:
    def test_bucket_is_deterministic_bitstring(self, spark):
        df = sim.lsh_bucketed(_df(spark, _vectors()))
        a = {(r["vec_id"], r["bucket"]) for r in df.collect()}
        b = {(r["vec_id"], r["bucket"]) for r in df.collect()}
        assert a == b
        for _, bucket in a:
            assert len(bucket) == sim.N_HYPERPLANES
            assert set(bucket) <= {"0", "1"}

    def test_identical_vectors_share_bucket(self, spark):
        vecs = _vectors()
        vecs[1] = vecs[0]
        pairs = {
            (r["id_a"], r["id_b"])
            for r in sim.lsh_candidate_pairs(_df(spark, vecs)).collect()
        }
        assert (0, 1) in pairs

    def test_neardup_requires_threshold(self, spark):
        vecs = _vectors()
        vecs[1] = vecs[0] + 0.001 * np.random.RandomState(1).randn(DIM).astype(np.float32)
        got = sim.embedding_neardup(_df(spark, vecs), threshold=0.99)
        pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
        assert (0, 1) in pairs
        for r in got.collect():
            assert r["cosine_sim"] >= 0.99


class TestLSHScaleLevers:
    def test_degenerate_corpus_bounded_pairs(self, spark):
        """A corpus that collapses into ONE bucket (identical vectors)
        must produce a bounded pair count under max_bucket instead of
        n^2/2 (round-1 verdict #4)."""
        vecs = np.tile(_vectors()[0], (40, 1))
        df = _df(spark, vecs)
        assert sim.lsh_candidate_pairs(df).count() == 40 * 39 // 2
        assert sim.lsh_candidate_pairs(df, max_bucket=5).count() == 5 * 4 // 2

    def test_cap_keeps_lowest_ids(self, spark):
        vecs = np.tile(_vectors()[0], (10, 1))
        got = {
            r["id_a"]
            for r in sim.lsh_candidate_pairs(_df(spark, vecs), max_bucket=3).collect()
        }
        assert got <= {0, 1}  # pairs only among ids 0,1,2

    def test_multi_table_is_superset(self, spark):
        df = _df(spark, _vectors())
        p1 = {(r["id_a"], r["id_b"]) for r in sim.lsh_candidate_pairs(df).collect()}
        p3 = {
            (r["id_a"], r["id_b"])
            for r in sim.lsh_candidate_pairs(df, n_tables=3).collect()
        }
        assert p1 <= p3  # OR-banding only adds candidates


class TestMultimodal:
    def test_payload_plumbing_and_fake_decode(self, spark):
        from mb8600_clickhouse_spark.operators import multimodal as mm

        docs = spark.createDataFrame(
            [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="second doc")]
        )
        with_bin = mm.with_payload(docs)
        rows = {r["doc_id"]: r for r in with_bin.collect()}
        assert bytes(rows[1]["payload"]) == b"hello world"
        assert rows[1]["media_meta"]["n_bytes"] == 11

        feats = {r["doc_id"]: r for r in mm.decode_image_features(with_bin).collect()}
        assert len(feats[1]["features"]) == 8
        assert all(0.0 <= x <= 1.0 for x in feats[1]["features"])
        # deterministic: same payload -> same features
        feats2 = {r["doc_id"]: r for r in mm.decode_image_features(with_bin).collect()}
        assert feats[1]["features"] == feats2[1]["features"]

    def test_strict_raises(self, spark):
        from py4j.protocol import Py4JJavaError

        from mb8600_clickhouse_spark.operators import multimodal as mm

        docs = spark.createDataFrame([Row(doc_id=1, text="x")])
        with pytest.raises(Exception) as ei:
            mm.decode_image_features(mm.with_payload(docs), strict=True).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, Py4JJavaError
        )


class TestMultimodalTransforms:
    def _payloads(self, spark):
        from pyspark.sql import Row

        from mb8600_clickhouse_spark.operators import multimodal as mm

        docs = spark.createDataFrame(
            [Row(doc_id=1, text="x" * 100), Row(doc_id=2, text="y" * 35)]
        )
        return mm.with_payload(docs)

    def test_resize_passthrough_plumbing(self, spark):
        from mb8600_clickhouse_spark.operators import multimodal as mm

        out = {r["doc_id"]: r for r in mm.resize_images(self._payloads(spark), 64, 64).collect()}
        assert out[1]["width"] == 64 and out[1]["height"] == 64
        assert len(bytes(out[1]["payload"])) == 100  # stub passes bytes through

    def test_frame_sampling_fans_out(self, spark):
        from mb8600_clickhouse_spark.operators import multimodal as mm

        rows = mm.sample_frames(self._payloads(spark), every_nth=10, max_frames=8).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc[1]) == 8   # 100 bytes / 10 -> 10, capped at 8
        assert len(by_doc[2]) == 3   # 35 // 10 -> 3 frames
        assert by_doc[2][0]["frame_sha256"] != by_doc[2][1]["frame_sha256"]
        # deterministic across runs
        again = mm.sample_frames(self._payloads(spark), every_nth=10, max_frames=8).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestSemDeDup:
    """similarity.semdedup — SemDeDup's cell-bounded pair scan with the
    deterministic keep-lowest-id rule (q125 is the oracle twin)."""

    def _assigned(self, spark):
        # two cells; ids 1/2 are near-identical in cell 0, id 3 alone in
        # cell 1, id 4 a same-cell exact copy of 2 (chain 1~2~4)
        rows = [
            Row(id=1, v=[1.0, 0.0, 0.0], cell=0),
            Row(id=2, v=[0.9999, 0.001, 0.0], cell=0),
            Row(id=4, v=[0.9999, 0.001, 0.0], cell=0),
            Row(id=3, v=[0.0, 1.0, 0.0], cell=1),
            Row(id=7, v=[0.0, 1.0, 0.0], cell=1),
        ]
        return spark.createDataFrame(rows)

    def test_keep_lowest_id_within_cell(self, spark):
        out = {r["id"]: r["kept"] for r in sim.semdedup(self._assigned(spark), 0.99).collect()}
        assert out == {1: True, 2: False, 4: False, 3: True, 7: False}

    def test_cells_isolate_pairs(self, spark):
        # identical vectors in DIFFERENT cells are never compared
        rows = [
            Row(id=1, v=[1.0, 0.0], cell=0),
            Row(id=2, v=[1.0, 0.0], cell=1),
        ]
        out = {r["id"]: r["kept"] for r in sim.semdedup(spark.createDataFrame(rows), 0.9).collect()}
        assert out == {1: True, 2: True}

    def test_threshold_gates(self, spark):
        rows = [
            Row(id=1, v=[1.0, 0.0], cell=0),
            Row(id=2, v=[0.8, 0.6], cell=0),  # cosine 0.8
        ]
        df = spark.createDataFrame(rows)
        assert all(r["kept"] for r in sim.semdedup(df, 0.9).collect())
        assert {r["id"]: r["kept"] for r in sim.semdedup(df, 0.7).collect()} == {1: True, 2: False}


class TestProductQuantization:
    """similarity.pq_fit / pq_assign_codes / pq_encode_pandas /
    pq_adc_topk — the IVFPQ fine quantizer (q142 is the oracle twin)."""

    def test_fit_deterministic_and_encode_paths_agree(self, spark):
        df = _df(spark, _vectors())  # 30 x 8
        books = sim.pq_fit(df, m=2, ksub=4, n_iter=2)
        assert sim.pq_fit(df, m=2, ksub=4, n_iter=2) == books
        assert len(books) == 2 and len(books[0]) == 4 and len(books[0][0]) == 4
        a = {r["id"]: r["codes"] for r in sim.pq_assign_codes(df, books).collect()}
        b = {r["id"]: r["codes"] for r in sim.pq_encode_pandas(df, books).collect()}
        assert a == b and len(a) == 30

    def test_more_iterations_do_not_worsen_distortion(self, spark):
        import numpy as np

        df = _df(spark, _vectors())
        V = np.stack([np.asarray(v, dtype=np.float64) for v in _vectors()])

        def distortion(books):
            C = [np.array(b) for b in books]
            codes = {
                r["id"]: r["codes"]
                for r in sim.pq_assign_codes(df, books).collect()
            }
            err = 0.0
            for i, v in enumerate(V):
                rec = np.concatenate([C[mi][codes[i][mi]] for mi in range(2)])
                err += float(((v - rec) ** 2).sum())
            return err

        d1 = distortion(sim.pq_fit(df, m=2, ksub=4, n_iter=1))
        d5 = distortion(sim.pq_fit(df, m=2, ksub=4, n_iter=5))
        assert d5 <= d1 + 1e-9

    def test_adc_tracks_exact_topk_on_separated_clusters(self, spark):
        # 3 well-separated direction clusters: ADC's top-1 for a query
        # from cluster c must land in cluster c (PQ distortion is far
        # smaller than the inter-cluster gap)
        import numpy as np

        rng = np.random.default_rng(5)
        rows = []
        for i in range(60):
            c = i % 3
            v = np.zeros(8)
            v[c * 2 : c * 2 + 2] = 1.0
            v += rng.normal(0, 0.02, 8)
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        books = sim.pq_fit(df, m=2, ksub=4, n_iter=3)
        codes = sim.pq_assign_codes(df, books)
        q = df.filter("vec_id < 3")
        got = sim.pq_adc_topk(codes, q, books, k=3).collect()
        assert len(got) == 9
        for r in got:
            assert r["vec_id"] % 3 == r["qid"] % 3, r

    def test_reconstruct_is_codebook_lookup(self, spark):
        from pyspark.sql import functions as F

        books = [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]]
        df = spark.createDataFrame([(0, [1, 0])], "id long, codes array<int>")
        got = df.select(
            sim.pq_reconstruct(F.col("codes"), books).alias("r")
        ).collect()[0]["r"]
        assert got == [3.0, 4.0, 5.0, 6.0]


class TestIvfPqTopk:
    """similarity.ivfpq_topk — the composed IVFPQ read path (q153 is
    the oracle twin)."""

    def test_scores_only_probed_cells(self, spark):
        # two well-separated direction clusters as cells; the query is
        # axis-0-aligned with nprobe=1, so axis-1 corpus vectors must
        # NEVER be scored even if their ADC cosine would rank
        import numpy as np

        rng = np.random.default_rng(3)
        rows = []
        for i in range(40):
            v = np.zeros(8)
            v[(i % 2) * 4 : (i % 2) * 4 + 2] = 1.0
            v += rng.normal(0, 0.01, 8)
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = [(0, [1.0, 1, 0, 0, 0, 0, 0, 0]), (1, [0.0, 0, 0, 0, 1, 1, 0, 0])]
        books = sim.pq_fit(df, m=2, ksub=4, n_iter=1)
        q = spark.createDataFrame(
            [(100, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        got = sim.ivfpq_topk(df, q, cents, books, k=40, nprobe=1).collect()
        assert len(got) == 20  # only the axis-0 cell's members
        assert all(r["vec_id"] % 2 == 0 for r in got)

    def test_nprobe_widens_coverage(self, spark):
        import numpy as np

        rng = np.random.default_rng(4)
        rows = [
            (i, [float(x) for x in (np.eye(2)[i % 2].repeat(4) + rng.normal(0, 0.01, 8))])
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = [(0, [1.0] * 4 + [0.0] * 4), (1, [0.0] * 4 + [1.0] * 4)]
        books = sim.pq_fit(df, m=2, ksub=4, n_iter=1)
        q = df.filter("vec_id = 0")
        n1 = sim.ivfpq_topk(df, q, cents, books, k=100, nprobe=1).count()
        n2 = sim.ivfpq_topk(df, q, cents, books, k=100, nprobe=2).count()
        assert n1 == 10 and n2 == 20


class TestAdcLutScorer:
    """pq_adc_scores_pandas — the lookup-table ADC scorer must agree
    with the reconstruction fold path (pq_adc_topk) after the shared
    DECIMAL(38,4) snap."""

    def test_agrees_with_fold_path(self, spark):
        df = _df(spark, _vectors())  # 30 x 8
        books = sim.pq_fit(df, m=2, ksub=4, n_iter=2)
        codes = sim.pq_assign_codes(df, books)
        q = df.filter("vec_id < 2")
        fold = sim.pq_adc_topk(codes, q, books, k=30).collect()
        qrows = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in q.collect()
        ]
        lut = sim.rank_topk(
            sim.pq_adc_scores_pandas(codes, qrows, books), k=30
        ).collect()
        assert sorted(map(tuple, fold)) == sorted(map(tuple, lut))


class TestIvfTopkFused:
    """ivf_topk_fused (round 9) — the bounded-query-set single-pass
    form must return exactly what the staged pandas pipeline returns
    (after the shared 4-decimal display snap, the documented ulp
    class)."""

    def test_matches_staged_pipeline(self, spark):
        from pyspark.sql import functions as F

        df = _df(spark, _vectors())
        cents = sim.kmeans_fit(df, k=4, n_iter=3)
        q = df.filter("vec_id < 3")
        corpus = df.filter("vec_id >= 3")

        def snap(out):
            return sorted(
                (int(r["query_id"]), int(r["neighbor_id"]),
                 round(float(r["cosine_sim"]), 4))
                for r in out.collect()
            )

        staged = snap(sim.ivf_topk(corpus, q, None, k=4, nprobe=2,
                                   cents=cents))
        fused = snap(sim.ivf_topk_fused(corpus, q, cents, k=4, nprobe=2))
        assert staged == fused and len(fused) > 0

    def test_empty_probe_cells_ok(self, spark):
        # a corpus batch whose cells no query probes contributes nothing
        df = _df(spark, _vectors())
        cents = sim.kmeans_fit(df, k=4, n_iter=3)
        q = df.filter("vec_id = 0")
        out = sim.ivf_topk_fused(df, q, cents, k=2, nprobe=1).collect()
        assert {r["query_id"] for r in out} == {0}
        assert len(out) <= 2


def test_ivf_fused_plan_single_python_stage(spark):
    """ivf_topk_fused's contract: ONE MapInPandas over the corpus, no
    join, one top-k window exchange."""
    df = _df(spark, _vectors())
    cents = sim.kmeans_fit(df, k=4, n_iter=2)
    q = df.filter("vec_id < 2")
    plan = (
        sim.ivf_topk_fused(df, q, cents, k=3, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Join" not in plan  # no broadcast/shuffle join anywhere
