"""Tests for cosine top-k similarity search."""

import math

from flink_ml__spark.functions.similarity import CosineTopK, IVFCosineTopK


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
        (4, [0.1, 0.9]), (5, [-1.0, 0.0]), (6, [0.7, 0.7]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(spark):
    df = _vecs(spark)
    out = CosineTopK().setK(2).transform(df)
    by_query = {}
    for r in out.collect():
        by_query.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"]))
    assert by_query[1][0][1] == 2       # nearest to (1,0) is (0.9,0.1)
    assert by_query[3][0][1] == 4
    ranks = [r for r, _, _ in sorted(by_query[1])]
    assert ranks == [1, 2]
    top = sorted(by_query[1])[0]
    assert math.isclose(
        top[2], 0.9 / math.sqrt(0.9 ** 2 + 0.1 ** 2), abs_tol=1e-9)


def test_ivf_topk_on_embeddings(spark):
    from flink_ml__spark.sources import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    queries = emb.limit(12)
    exact = CosineTopK().setK(5).topk(queries, emb)
    ivf = (IVFCosineTopK().setK(5).setNList(8).setNProbe(4).setSeed(42)
           .topk(queries, emb))
    exact_rows = {(r["query_id"], r["neighbor_id"])
                  for r in exact.collect()}
    ivf_rows = {(r["query_id"], r["neighbor_id"])
                for r in ivf.collect()}
    assert len(ivf_rows) == len(exact_rows)
    # set recall@5 of IVF with half the cells probed should be decent
    assert len(ivf_rows & exact_rows) / len(exact_rows) > 0.5


def test_ivf_index_save_load(spark, tmp_path):
    """The trained coarse quantizer round-trips: a loaded index answers
    identically without re-training."""
    from flink_ml__spark.sources import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    queries = emb.limit(5)
    op = (IVFCosineTopK().setK(3).setNList(8).setNProbe(3).setSeed(42)
          .train(emb))
    p = str(tmp_path / "ivf")
    op.save(p)
    back = IVFCosineTopK.load(spark, p)
    assert back._centroids == op._centroids
    a = sorted(tuple(r) for r in op.topk(queries, emb).collect())
    b = sorted(tuple(r) for r in back.topk(queries, emb).collect())
    assert a == b


def test_ivf_recall_gate_query(spark):
    """The ann_ivf_topk gate is violations-only: an empty result means
    mean recall@5 clears ANN_MEAN_RECALL_FLOOR and no query misses all
    its true neighbors. A recall regression emits rows."""
    from flink_ml__spark.plans.queries import q_ann_ivf_topk

    rows = q_ann_ivf_topk(spark, "/root/testdata/sf0.001").collect()
    assert rows == []
    # the violation frame's schema is the gate contract (WHERE-false
    # oracle mirrors it)
    df = q_ann_ivf_topk(spark, "/root/testdata/sf0.001")
    assert df.columns == ["query_id", "n_exact", "n_hit", "recall_at_5"]


def test_embedding_quantizer_roundtrip(spark):
    from flink_ml__spark.functions.similarity import EmbeddingQuantizer

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in EmbeddingQuantizer()
           .transform(df).collect()}
    assert out[1]["emb_scale"] == 1.0
    assert out[1]["emb_q8"] == [64, -127, 32]          # round(0.5*127)=64
    assert out[2]["emb_scale"] == 0.0
    assert out[2]["emb_q8"] == [0, 0, 0]               # zero vector guard
    # dequantized values stay within half a code step of the original
    for orig, q in zip([0.5, -1.0, 0.25], out[1]["emb_q8"]):
        assert abs(q * 1.0 / 127 - orig) <= 0.5 / 127 + 1e-12


def test_embedding_contamination_goldens(spark):
    import pytest as _pytest

    from flink_ml__spark.functions.similarity import (
        EmbeddingContaminationChecker,
    )

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        ["vec_id", "embedding"])
    corpus = spark.createDataFrame(
        [(1, [2.0, 0.0, 0.0]),      # parallel to bench 100 -> cos 1
         (2, [1.0, 1.0, 0.0]),      # 45 deg to both -> cos ~0.7071
         (3, [0.0, 0.0, 5.0]),      # orthogonal -> 0
         (4, [0.0, 0.0, 0.0])],     # zero vector -> defined as 0
        ["vec_id", "embedding"])
    got = {r["vec_id"]: r for r in
           (EmbeddingContaminationChecker().setThreshold(0.9)
            .transform_against(corpus, bench)).collect()}
    assert got[1]["max_benchmark_cosine"] == _pytest.approx(1.0)
    assert got[1]["is_contaminated"]
    assert got[2]["max_benchmark_cosine"] == _pytest.approx(2 ** -0.5)
    assert not got[2]["is_contaminated"]
    assert got[3]["max_benchmark_cosine"] == 0.0
    assert got[4]["max_benchmark_cosine"] == 0.0

    with _pytest.raises(ValueError):
        EmbeddingContaminationChecker().transform_against(
            corpus, bench.filter("vec_id < 0"))


def test_semdedup_goldens(spark):
    import numpy as np

    from flink_ml__spark.functions.similarity import SemDeDup

    # one cell (nList=1): A and B are semantic duplicates (cos ~0.995),
    # C is orthogonal
    A = [1.0, 0.0]
    B = [0.995, 0.0999]   # ~5.7 deg from A
    C = [0.0, 1.0]
    df = spark.createDataFrame(
        [(1, A), (2, B), (3, C)], ["vec_id", "embedding"])
    op = SemDeDup().setNList(1).setSeed(7).setThreshold(0.98)
    kept = {r["vec_id"] for r in op.transform(df).collect()}
    assert 3 in kept and len(kept) == 2
    # paper keep rule: of {A, B} the one FARTHER from the cell centroid
    # survives — recompute which that is
    def unit(v):
        v = np.asarray(v, dtype=float)
        return v / np.linalg.norm(v)
    centroid = unit(unit(A) + unit(B) + unit(C))
    simA, simB = unit(A) @ centroid, unit(B) @ centroid
    expect = 1 if simA < simB else 2
    assert expect in kept

    # below threshold nothing is removed
    all_kept = (SemDeDup().setNList(1).setSeed(7).setThreshold(0.999)
                .transform(df).count())
    assert all_kept == 3

    # determinism across partition layouts
    big = spark.createDataFrame(
        [(i, [float((i * 7) % 13), float((i * 3) % 5), 1.0])
         for i in range(200)], ["vec_id", "embedding"])
    op2 = SemDeDup().setNList(4).setSeed(42).setThreshold(0.97)
    k1 = {r["vec_id"] for r in op2.transform(big).collect()}
    k2 = {r["vec_id"] for r in op2.transform(big.repartition(13)).collect()}
    assert k1 == k2 and 0 < len(k1) < 200


def test_zero_norm_vectors_never_rank(spark):
    """A zero embedding has no cosine: it must appear in neither the
    exact nor the IVF top-k (NaN would otherwise sort first in the
    IVF window and NULL would pad the exact results)."""
    import numpy as np

    from flink_ml__spark.functions.similarity import (
        CosineTopK,
        IVFCosineTopK,
    )

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(40)]
    rows.append((40, [0.0] * 8))                      # zero corpus vec
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id IN (0, 40)")          # incl. zero query

    exact = CosineTopK().setK(5).topk(queries, df)
    assert exact.filter("neighbor_id = 40").count() == 0
    assert exact.filter("query_id = 40").count() == 0
    assert exact.filter("query_id = 0").count() == 5

    ivf = (IVFCosineTopK().setK(5).setNList(4).setNProbe(4).setSeed(1)
           .topk(queries, df))
    assert ivf.filter("neighbor_id = 40").count() == 0
    assert ivf.filter("query_id = 40").count() == 0
    got = {r["neighbor_id"] for r in ivf.filter("query_id = 0").collect()}
    want = {r["neighbor_id"] for r in exact.filter("query_id = 0").collect()}
    assert got == want                                # full probe = exact


def test_ivf_persistable_index_round_trip(spark, tmp_path):
    """save_index persists the celled corpus + centroids; a fresh
    operator load_index + topk(corpus_indexed=) equals the direct run;
    append mode extends the index under the same quantizer."""
    from flink_ml__spark.functions.similarity import IVFCosineTopK

    import numpy as np

    rng = np.random.default_rng(3)
    corpus = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(60)],
        "vec_id long, embedding array<double>")
    queries = corpus.filter("vec_id % 10 = 0")

    op = IVFCosineTopK().setK(3).setNList(4).setNProbe(2).setSeed(9)
    direct = sorted(map(tuple, op.topk(queries, corpus)
                        .select("query_id", "neighbor_id", "rank")
                        .collect()))

    p = str(tmp_path / "ivf_idx")
    op.save_index(p, corpus)
    fresh = IVFCosineTopK().setK(3).setNList(4).setNProbe(2).setSeed(9)
    idx = fresh.load_index(spark, p)
    via = sorted(map(tuple, fresh.topk(queries, corpus_indexed=idx)
                     .select("query_id", "neighbor_id", "rank")
                     .collect()))
    assert via == direct and via

    # corpus_indexed without centroids is a usage error
    import pytest as _pytest
    bare = IVFCosineTopK().setK(3)
    with _pytest.raises(ValueError, match="centroids"):
        bare.topk(queries, corpus_indexed=idx)
    with _pytest.raises(ValueError, match="corpus"):
        bare.topk(queries)

    # append a batch: its rows become findable neighbors
    batch = spark.createDataFrame(
        [(1000 + i, rng.normal(size=8).tolist()) for i in range(10)],
        "vec_id long, embedding array<double>")
    op.save_index(p, batch, mode="append")
    idx2 = fresh.load_index(spark, p)
    assert idx2.count() == 70


def test_pq_encode_decode_known_codebooks(spark):
    """With hand-set codebooks the argmin code and reconstruction are
    fully determined — no k-means in the loop."""
    from flink_ml__spark.functions.similarity import ProductQuantizer

    pq = ProductQuantizer().setNumSubspaces(2).setBitsPerCode(1)
    pq._codebooks = [[[0.0, 0.0], [1.0, 1.0]],
                     [[2.0, 2.0], [-1.0, 0.0]]]
    df = spark.createDataFrame(
        [(1, [0.9, 1.1, -0.8, 0.1]), (2, [0.1, -0.2, 1.9, 2.2])],
        ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in pq.decode(pq.transform(df)).collect()}
    assert list(out[1]["pq_code"]) == [1, 1]   # nearer (1,1) and (-1,0)
    assert list(out[2]["pq_code"]) == [0, 0]
    assert out[1]["pq_recon"] == [1.0, 1.0, -1.0, 0.0]
    assert out[2]["pq_recon"] == [0.0, 0.0, 2.0, 2.0]
    import math
    assert math.isclose(out[1]["pq_norm"], math.sqrt(1 + 1 + 1 + 0))


def test_pq_train_separates_clusters(spark):
    """Two well-separated clusters per subspace: every vector must
    reconstruct to (near) its cluster center and codes must be valid."""
    from flink_ml__spark.functions.similarity import ProductQuantizer

    rows = []
    for i in range(40):
        base = 0.0 if i % 2 == 0 else 10.0
        rows.append((i, [base + 0.01 * (i % 5), base,
                         -base, -base - 0.01 * (i % 3)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pq = (ProductQuantizer().setNumSubspaces(2).setBitsPerCode(1)
          .setSeed(7).train(df))
    out = pq.decode(pq.transform(df)).collect()
    for r in out:
        orig = list(map(float, r["embedding"]))
        err = sum((a - b) ** 2
                  for a, b in zip(orig, r["pq_recon"])) ** 0.5
        assert err < 0.1, (r["vec_id"], err)
        assert all(0 <= c < 2 for c in r["pq_code"])


def test_pq_adc_topk_matches_exact_on_reconstructible_data(spark):
    """When vectors coincide with codebook entries, reconstruction is
    exact and ADC ranking equals brute-force cosine ranking."""
    from flink_ml__spark.functions.similarity import (
        CosineTopK,
        ProductQuantizer,
    )

    rows = []
    for i in range(24):
        base = [0.0, 10.0, -10.0][i % 3]
        rows.append((i, [base, base + 1.0, -base, 1.0 - base]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pq = (ProductQuantizer().setNumSubspaces(2).setBitsPerCode(2)
          .setSeed(3).setK(4).train(df))
    codes = pq.transform(df)
    queries = df.limit(6)
    adc = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in pq.adc_topk(queries, codes).collect()}
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in CosineTopK().setK(4).topk(queries, df).collect()}
    assert adc == exact


def test_pq_dims_not_divisible_raises(spark):
    from flink_ml__spark.functions.similarity import ProductQuantizer

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])],
                               ["vec_id", "embedding"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="must divide"):
        ProductQuantizer().setNumSubspaces(2).train(df)


def test_pq_save_load_round_trip(spark, tmp_path):
    from flink_ml__spark.sources import load_table
    from flink_ml__spark.functions.similarity import ProductQuantizer

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    pq = (ProductQuantizer().setNumSubspaces(8).setBitsPerCode(4)
          .setSeed(42).train(emb))
    p = str(tmp_path / "pq")
    pq.save(p)
    back = ProductQuantizer.load(spark, p)
    assert back._codebooks == pq._codebooks
    a = sorted(tuple(r) for r in pq.transform(emb.limit(20)).collect())
    b = sorted(tuple(r) for r in back.transform(emb.limit(20)).collect())
    assert a == b


def test_pq_gate_queries_empty(spark):
    """Both PQ driver gates are violations-only and must come back
    EMPTY on the test corpus (schema is the oracle contract)."""
    from flink_ml__spark.plans.queries import (
        q_ann_pq_topk,
        q_pq_invariants_embeddings,
    )

    inv = q_pq_invariants_embeddings(spark, "/root/testdata/sf0.001")
    assert inv.columns == ["vec_id", "check", "detail"]
    assert inv.collect() == []
    rec = q_ann_pq_topk(spark, "/root/testdata/sf0.001")
    assert rec.columns == ["query_id", "n_exact", "n_hit", "recall_at_5"]
    assert rec.collect() == []


def test_pq_invariants_catch_corrupted_codes(spark):
    """Sanity that the invariant gate has teeth: corrupting one code
    past the codebook range trips ``bad_shape``; swapping a code to a
    farther centroid trips ``not_argmin``."""
    from flink_ml__spark.functions.similarity import ProductQuantizer
    from pyspark.sql import functions as F

    pq = ProductQuantizer().setNumSubspaces(2).setBitsPerCode(1)
    pq._codebooks = [[[0.0, 0.0], [1.0, 1.0]],
                     [[2.0, 2.0], [-1.0, 0.0]]]
    df = spark.createDataFrame(
        [(1, [0.9, 1.1, -0.8, 0.1])], ["vec_id", "embedding"])
    good = pq.transform(df)
    # wrong argmin: flip subspace-0 code from 1 to 0
    bad = good.withColumn(
        "pq_code", F.array(F.lit(0), F.col("pq_code")[1]))
    # replicate the gate's Catalyst check on the corrupted frame
    import flink_ml__spark.plans.queries as qmod
    monkey = qmod._trained_pq
    try:
        qmod._trained_pq = lambda spark_, sf_: (pq, df)
        pq.transform = lambda _df: bad  # encode path replaced
        viol = qmod.q_pq_invariants_embeddings(spark, "ignored").collect()
    finally:
        qmod._trained_pq = monkey
        del pq.transform
    checks = {r["check"] for r in viol}
    assert "not_argmin" in checks or "norm_mismatch" in checks


def test_ivfpq_exact_on_clustered_reconstructible_data(spark):
    """Clustered data where cluster means ARE representable: with
    enough cells+codes the residuals quantize to ~0, so IVF-PQ ADC
    ranking matches brute force exactly even without refine."""
    from flink_ml__spark.functions.similarity import (
        CosineTopK,
        IVFPQTopK,
    )

    rows = []
    for i in range(30):
        base = [1.0, 10.0, -5.0][i % 3]
        rows.append((i, [base, base, 2 * base, -base]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    op = (IVFPQTopK().setK(4).setNList(3).setNProbe(3)
          .setNumSubspaces(2).setBitsPerCode(2).setSeed(5)
          .setTrainIter(5).train(df))
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in op.topk(df.limit(6), df).collect()}
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in CosineTopK().setK(4).topk(df.limit(6), df)
             .collect()}
    assert got == exact


def test_ivfpq_residuals_beat_raw_pq_reconstruction(spark):
    """The point of residual encoding: with the same code budget the
    IVF-PQ reconstruction error is below raw PQ's on clustered data."""
    import numpy as np

    from flink_ml__spark.sources import load_table
    from flink_ml__spark.functions.similarity import (
        IVFPQTopK,
        ProductQuantizer,
    )

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    raw = (ProductQuantizer().setNumSubspaces(8).setBitsPerCode(4)
           .setSeed(42).train(emb))
    ivfpq = (IVFPQTopK().setNList(16).setNumSubspaces(8)
             .setBitsPerCode(4).setSeed(42).train(emb))
    X = np.asarray([list(r["embedding"]) for r in
                    emb.select("embedding").collect()], dtype=float)
    # raw PQ recon error
    dec = raw.decode(raw.transform(emb)).select("vec_id", "pq_recon")
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    raw_err = np.mean([
        np.linalg.norm(np.array(r["pq_recon"]) - X[ids.index(r["vec_id"])])
        for r in dec.collect()])
    # ivfpq recon error via the stored recon_norm identity is not a
    # distance; recompute recon driver-side from the model (routing by
    # unit centroid, residual against the raw-mean anchor)
    C = np.asarray(ivfpq._centroids)
    A = np.asarray(ivfpq._anchors)
    B = [np.asarray(b) for b in ivfpq._codebooks]
    from flink_ml__spark.functions.similarity import _unit
    cells = (_unit(X) @ C.T).argmax(1)
    R = X - A[cells]
    recon = A[cells].copy()
    sub = B[0].shape[1]
    for j in range(len(B)):
        Rj = R[:, j * sub:(j + 1) * sub]
        codes = (Rj @ B[j].T - 0.5 * (B[j] ** 2).sum(1)).argmax(1)
        recon[:, j * sub:(j + 1) * sub] += B[j][codes]
    ivfpq_err = np.mean(np.linalg.norm(recon - X, axis=1))
    assert ivfpq_err < raw_err


def test_ivfpq_refine_returns_exact_cosines(spark):
    """With refineFactor > 1 the returned cosine is the TRUE cosine of
    the selected neighbor, bit-equal to the brute-force value."""
    from flink_ml__spark.sources import load_table
    from flink_ml__spark.functions.similarity import (
        CosineTopK,
        IVFPQTopK,
    )

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    queries = emb.limit(5)
    op = (IVFPQTopK().setK(3).setNList(8).setNProbe(8)
          .setNumSubspaces(8).setBitsPerCode(6).setSeed(42)
          .setRefineFactor(8).train(emb))
    got = {(r["query_id"], r["neighbor_id"]): r["cosine"]
           for r in op.topk(queries, emb).collect()}
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in CosineTopK().setK(10).topk(queries, emb).collect()}
    for key, cos in got.items():
        if key in exact:
            assert abs(cos - exact[key]) < 1e-9


def test_ivfpq_index_save_load_round_trip(spark, tmp_path):
    from flink_ml__spark.sources import load_table
    from flink_ml__spark.functions.similarity import IVFPQTopK

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    op = (IVFPQTopK().setK(3).setNList(8).setNProbe(4)
          .setNumSubspaces(8).setBitsPerCode(4).setSeed(42).train(emb))
    p = str(tmp_path / "ivfpq")
    op.save_index(p, emb)
    fresh = IVFPQTopK().setK(3).setNList(8).setNProbe(4) \
        .setNumSubspaces(8).setBitsPerCode(4).setSeed(42)
    idx = fresh.load_index(spark, p)
    a = sorted(tuple(r) for r in
               op.topk(emb.limit(5), corpus_indexed=op.index_table(emb))
               .collect())
    b = sorted(tuple(r) for r in
               fresh.topk(emb.limit(5), corpus_indexed=idx).collect())
    assert a == b


def test_ivfpq_guards(spark):
    import pytest as _pytest

    from flink_ml__spark.functions.similarity import IVFPQTopK

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])],
                               ["vec_id", "embedding"])
    with _pytest.raises(ValueError, match="must divide"):
        IVFPQTopK().setNumSubspaces(2).train(df)
    with _pytest.raises(ValueError, match="train"):
        IVFPQTopK().topk(df, df)
    op4 = spark.createDataFrame([(1, [1.0, 2.0, 3.0, 4.0])],
                                ["vec_id", "embedding"])
    trained = (IVFPQTopK().setNList(1).setNumSubspaces(2)
               .setBitsPerCode(1).setRefineFactor(2).train(op4))
    with _pytest.raises(ValueError, match="raw corpus"):
        trained.topk(op4, corpus_indexed=trained.index_table(op4))


def test_ivfpq_gate_query_empty(spark):
    from flink_ml__spark.plans.queries import q_ann_ivfpq_topk

    df = q_ann_ivfpq_topk(spark, "/root/testdata/sf0.001")
    assert df.columns == ["query_id", "n_exact", "n_hit", "recall_at_5"]
    assert df.collect() == []


# -------------------------------------------------- random projection (JL)

def test_random_projection_matches_numpy(spark):
    import math

    import numpy as np

    from flink_ml__spark.functions.similarity import RandomProjection

    rows = [(i, [float((i * 3 + d) % 7) - 3.0 for d in range(6)])
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    op = RandomProjection().setOutputDim(3).setSeed(11)
    got = {r["vec_id"]: list(r["projected"])
           for r in op.transform(df).collect()}
    P = np.array([[RandomProjection.sign(11, j, i) for i in range(6)]
                  for j in range(3)], dtype=float)
    for vid, emb in rows:
        want = (P @ np.array(emb)) / math.sqrt(3)
        assert np.allclose(got[vid], want, atol=1e-9)


def test_random_projection_norm_preservation_in_expectation(spark):
    import numpy as np

    from flink_ml__spark.functions.similarity import RandomProjection

    # JL with +-1 signs preserves squared norms in expectation;
    # averaged over many vectors the ratio concentrates near 1
    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = (RandomProjection().setOutputDim(8).setSeed(3)
           .transform(df).collect())
    ratios = []
    for r in out:
        x = np.array(rows[r["vec_id"]][1])
        p = np.array(r["projected"])
        ratios.append((p @ p) / (x @ x))
    assert 0.8 < float(np.mean(ratios)) < 1.2


def test_random_projection_null_and_plan(spark):
    from flink_ml__spark.functions.similarity import RandomProjection

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)],
        "vec_id long, embedding array<double>")
    op = RandomProjection().setOutputDim(2).setSeed(1)
    out = op.transform(df)
    got = {r["vec_id"]: r["projected"] for r in out.collect()}
    assert got[2] is None and len(got[1]) == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_hard_negative_miner(spark):
    """Negatives must differ in label, respect the cosine band, and
    rank deterministically; the near-dup band above simHi is excluded."""
    from flink_ml__spark.functions.similarity import HardNegativeMiner

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.999, 0.04], "a"),   # same label: never a negative of 1
        (3, [0.9, 0.43], "b"),     # hard negative of 1
        (4, [0.0, 1.0], "b"),      # orthogonal: below simLo band? cos=0 kept
        (5, [1.0, 0.001], "b"),    # near-dup of 1 (cos>0.95): excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>,"
                                     " label string")
    anchors = df.filter("vec_id = 1")
    out = (HardNegativeMiner().setK(5).setSimLo(0.0).setSimHi(0.95)
           .mine(anchors, df).collect())
    got = [(r["neighbor_id"], r["rank"]) for r in out]
    assert got == [(3, 1), (4, 2)]
    assert all(r["label_negative"] == "b" and r["label_anchor"] == "a"
               for r in out)
    import pytest as _pt
    with _pt.raises(ValueError):
        (HardNegativeMiner().setSimLo(0.9).setSimHi(0.5)
         .mine(anchors, df))


def test_hard_negative_miner_broadcasts_anchors(spark):
    """The corpus side must never broadcast or shuffle: anchors are the
    bounded side by construction."""
    from flink_ml__spark.functions.similarity import HardNegativeMiner
    from flink_ml__spark.sources import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    anchors = emb.filter("vec_id % 50 = 0")
    out = HardNegativeMiner().setK(3).setLabelCol("label") \
        .mine(anchors, emb)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# EmbeddingTruncationAuditor / AnisotropyAuditor
# ---------------------------------------------------------------------------

def test_truncation_audit_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.similarity import (
        EmbeddingTruncationAuditor,
    )
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [1.0, 0.0]), (3, None),
         (4, [0.0, 0.0])],  # zero vector excluded
        "vec_id long, embedding array<float>")
    out = {r["dim_budget"]: r for r in
           (EmbeddingTruncationAuditor().setBudgets(1, 2)
            .evaluate(df).collect())}
    assert out[1]["n_vecs"] == 2
    # fracs at d=1: 9/25 and 1.0
    assert abs(out[1]["avg_energy"] - (0.36 + 1.0) / 2) < 1e-9
    assert abs(out[1]["avg_cos"] - (0.6 + 1.0) / 2) < 1e-9
    # interpolated 5th percentile between 0.36 and 1.0
    assert abs(out[1]["p05_energy"] - (0.36 + 0.05 * 0.64)) < 1e-9
    assert abs(out[2]["avg_energy"] - 1.0) < 1e-12
    assert abs(out[2]["avg_cos"] - 1.0) < 1e-12
    with _pt.raises(ValueError, match="budgets"):
        EmbeddingTruncationAuditor().setBudgets(0)


def test_anisotropy_golden(spark):
    from flink_ml__spark.functions.similarity import AnisotropyAuditor
    op = AnisotropyAuditor()

    def run(vecs):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")
        return op.evaluate(df).first()

    # identical -> 1, orthogonal -> 0, opposite -> -1
    assert abs(run([[1.0, 0.0], [1.0, 0.0]])["mean_pair_cosine"]
               - 1.0) < 1e-9
    assert abs(run([[1.0, 0.0], [0.0, 1.0]])["mean_pair_cosine"]
               ) < 1e-9
    assert abs(run([[1.0, 0.0], [-1.0, 0.0]])["mean_pair_cosine"]
               + 1.0) < 1e-9
    # two clusters of two: exact 1/3; non-unit inputs normalize
    r = run([[2.0, 0.0], [5.0, 0.0], [0.0, 1.0], [0.0, 3.0]])
    assert abs(r["mean_pair_cosine"] - 1 / 3) < 1e-9
    assert r["n_vecs"] == 4 and r["dim"] == 2
    assert abs(r["centroid_norm"] - (8 ** 0.5) / 4) < 1e-9


# ---------------------------------------------------------------------------
# KCenterCoreset
# ---------------------------------------------------------------------------

def test_kcenter_greedy_trajectory_golden(spark):
    """Hand-checkable 1-D greedy: points at 0, 1, 10, 4. Seed = min id
    (point 0.0); farthest is 10 (d²=100); then 4 (min-dist² to {0,10}
    = 16); then 1 (min-dist² to {0,10,4} = 1)."""
    import pytest as _pt

    from flink_ml__spark.functions.similarity import KCenterCoreset

    df = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0]), (3, [10.0]), (4, [4.0])],
        "vec_id long, embedding array<double>")
    out = (KCenterCoreset().setNumCenters(4).select_centers(df)
           .orderBy("step").collect())
    assert [(r["step"], r["vec_id"], r["dist2"]) for r in out] == [
        (1, 1, 0.0), (2, 3, 100.0), (3, 4, 16.0), (4, 2, 1.0)]
    with _pt.raises(ValueError, match="numCenters"):
        KCenterCoreset().setNumCenters(0)
    with _pt.raises(ValueError, match="no rows"):
        KCenterCoreset().select_centers(df.filter("vec_id < 0"))


def test_kcenter_stops_early_on_duplicates(spark):
    """Once every remaining point duplicates a selected center the
    argmax state is 0 and selection stops — no degenerate centers."""
    from flink_ml__spark.functions.similarity import KCenterCoreset

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [3.0, 4.0]),
         (4, [3.0, 4.0])],
        "vec_id long, embedding array<double>")
    out = (KCenterCoreset().setNumCenters(4).select_centers(df)
           .orderBy("step").collect())
    assert [(r["step"], r["vec_id"], r["dist2"]) for r in out] == [
        (1, 1, 0.0), (2, 3, 25.0)]


def test_kcenter_oracle_replays_early_stop(spark):
    """The unrolled DuckDB oracle must emit exactly as many rows as the
    operator when the data has fewer distinct vectors than k — the
    per-leg ``WHERE mind > 0`` filter is the loop break. Without it a
    correct operator would red-flag on row count."""
    import duckdb

    from flink_ml__spark.functions.similarity import KCenterCoreset
    from flink_ml__spark.plans.queries import _kcenter_oracle_sql

    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [3.0, 4.0]),
            (4, [3.0, 4.0])]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    ours = [(r["step"], r["vec_id"], r["dist2"])
            for r in (KCenterCoreset().setNumCenters(4)
                      .select_centers(df).orderBy("step").collect())]

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, "
                "embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    theirs = sorted(con.execute(_kcenter_oracle_sql(4)).fetchall())
    assert [(s, v, float(d)) for s, v, d in theirs] == ours == [
        (1, 1, 0.0), (2, 3, 25.0)]


def test_kcenter_dist2_monotone_and_matches_bruteforce(spark):
    """Greedy k-center's selection distances are nonincreasing, and
    every emitted dist2 equals the brute-force min squared distance
    from that center to the ones selected before it."""
    from flink_ml__spark.functions.similarity import KCenterCoreset

    rows = [(i, [float((i * 37) % 11), float((i * 53) % 7)])
            for i in range(40)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    out = (KCenterCoreset().setNumCenters(6).select_centers(df)
           .orderBy("step").collect())
    vec = dict(rows)
    d2s = [r["dist2"] for r in out[1:]]
    assert d2s == sorted(d2s, reverse=True)
    for t, r in enumerate(out):
        if t == 0:
            continue
        prev = [vec[p["vec_id"]] for p in out[:t]]
        v = vec[r["vec_id"]]
        bf = min(sum((a - b) ** 2 for a, b in zip(v, c)) for c in prev)
        assert abs(r["dist2"] - bf) < 1e-6
