"""DriftMonitor: hand-computable goldens, identity/shift behavior,
NULL exclusion, degenerate columns, validation."""

import math

import pytest
from pyspark.sql import functions as F

from flink_ml__spark.functions.drift import DriftMonitor


def _df(spark, vals, col="a"):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                 f"id long, {col} double")


def test_identical_snapshots_zero_psi(spark):
    ref = _df(spark, [float(i) for i in range(100)])
    s = (DriftMonitor().setInputCols("a").setNumBuckets(4)
         .summary(ref, ref).first())
    assert abs(s["psi"]) < 1e-12 and s["drift_level"] == "stable"


def test_hand_computed_report(spark):
    # ref uniform over 0..19; quartile edges at 4.75, 9.5, 14.25
    ref = _df(spark, [float(i) for i in range(20)])
    # current: everything in the top quartile
    cur = _df(spark, [16.0, 17.0, 18.0, 19.0])
    rep = {r["bucket"]: r for r in
           (DriftMonitor().setInputCols("a").setNumBuckets(4)
            .report(ref, cur).collect())}
    assert [rep[b]["n_ref"] for b in range(4)] == [5, 5, 5, 5]
    assert [rep[b]["n_cur"] for b in range(4)] == [0, 0, 0, 4]
    # floored proportions: p_cur = 1e-6 for empty buckets
    assert rep[0]["p_cur"] == 1e-6
    expected_term3 = (1.0 - 0.25) * math.log(1.0 / 0.25)
    assert abs(rep[3]["psi_term"] - expected_term3) < 1e-12


def test_shift_detected_and_levels(spark):
    import random
    rng = random.Random(3)
    ref = _df(spark, [rng.gauss(0, 1) for _ in range(1000)])
    same = _df(spark, [rng.gauss(0, 1) for _ in range(1000)])
    shifted = _df(spark, [rng.gauss(1.5, 1) for _ in range(1000)])
    m = DriftMonitor().setInputCols("a")
    assert m.summary(ref, same).first()["drift_level"] == "stable"
    s = m.summary(ref, shifted).first()
    assert s["drift_level"] == "action" and s["psi"] > 0.25


def test_nulls_excluded_and_multi_column(spark):
    ref = spark.createDataFrame(
        [(1, 1.0, 10.0), (2, 2.0, None), (3, 3.0, 30.0),
         (4, 4.0, 40.0)], "id long, a double, b double")
    rep = (DriftMonitor().setInputCols(["a", "b"]).setNumBuckets(2)
           .report(ref, ref))
    sums = {r["column"]: r["n"] for r in
            rep.groupBy("column").agg(F.sum("n_ref").alias("n"))
            .collect()}
    assert sums == {"a": 4, "b": 3}


def test_constant_column_zero_psi(spark):
    ref = _df(spark, [5.0] * 50)
    s = (DriftMonitor().setInputCols("a").setNumBuckets(4)
         .summary(ref, ref).first())
    assert abs(s["psi"]) < 1e-12


def test_validation(spark):
    ref = _df(spark, [1.0])
    with pytest.raises(ValueError, match="columns"):
        DriftMonitor().report(ref, ref)
    with pytest.raises(ValueError, match="numBuckets"):
        DriftMonitor().setNumBuckets(1)
    with pytest.raises(TypeError, match="binary"):
        DriftMonitor().setInputCols("a").transform(ref)
    empty = spark.createDataFrame([], "id long, a double")
    with pytest.raises(ValueError, match="non-null"):
        DriftMonitor().setInputCols("a").report(empty, empty)


def test_categorical_identity_and_new_category(spark):
    from flink_ml__spark.functions.drift import CategoricalDriftMonitor

    ref = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
        "id long, c string")
    m = CategoricalDriftMonitor().setInputCols("c")
    s = m.summary(ref, ref).first()
    assert abs(s["psi"]) < 1e-12 and s["drift_level"] == "stable"
    # a brand-new category in current lands in __other__
    cur = spark.createDataFrame(
        [(i, "z") for i in range(100)], "id long, c string")
    rep = {r["category"]: (r["n_ref"], r["n_cur"]) for r in
           m.report(ref, cur).collect()}
    assert rep["__other__"] == (0, 100)
    assert rep["a"] == (50, 0) and rep["b"] == (50, 0)
    assert m.summary(ref, cur).first()["drift_level"] == "action"


def test_categorical_null_category_and_vocab_cap(spark):
    from flink_ml__spark.functions.drift import CategoricalDriftMonitor

    ref = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], "id long, c string")
    m = CategoricalDriftMonitor().setInputCols("c").setMaxCategories(2)
    rep = {r["category"]: r["n_ref"] for r in
           m.report(ref, ref).collect()}
    # top-2 vocabulary: 'a' (2) and '__null__'/'b' tie at 1 ->
    # lexicographic keeps '__null__'; 'b' folds into __other__
    assert rep["a"] == 2
    assert rep["__null__"] == 1
    assert rep["__other__"] == 1 and "b" not in rep


def test_categorical_sentinel_collision_raises(spark):
    # a DATA value literally equal to a sentinel must fail loudly
    # (silently merging with true NULLs / out-of-vocab mass would
    # produce plausible-looking but wrong PSI terms)
    from flink_ml__spark.functions.drift import CategoricalDriftMonitor

    ref = spark.createDataFrame(
        [(1, "a"), (2, "__null__"), (3, "b")], "id long, c string")
    m = CategoricalDriftMonitor().setInputCols("c")
    with pytest.raises(Exception, match="sentinel"):
        m.report(ref, ref).collect()
    ref2 = spark.createDataFrame(
        [(1, "a"), (2, "__other__")], "id long, c string")
    with pytest.raises(Exception, match="sentinel"):
        m.report(ref2, ref2).collect()


def test_categorical_validation(spark):
    import pytest

    from flink_ml__spark.functions.drift import CategoricalDriftMonitor

    ref = spark.createDataFrame([(1, "a")], "id long, c string")
    with pytest.raises(ValueError, match="columns"):
        CategoricalDriftMonitor().report(ref, ref)
    with pytest.raises(ValueError, match="maxCategories"):
        CategoricalDriftMonitor().setMaxCategories(0)
    with pytest.raises(TypeError, match="binary"):
        CategoricalDriftMonitor().setInputCols("c").transform(ref)


def test_approx_percentile_path_agrees_with_exact(spark):
    """The 100 TB production fit (relativeError > 0 →
    approx_percentile) must reproduce the exact fit's report on data
    whose scale the sketch resolves exactly (rank error ≤ rel·n < 1
    row here), and reject invalid settings."""
    ref = _df(spark, [float(i) for i in range(200)])
    cur = _df(spark, [float(i) + 10.0 for i in range(200)])

    exact = (DriftMonitor().setInputCols("a").setNumBuckets(5)
             .report(ref, cur).orderBy("bucket").collect())
    approx = (DriftMonitor().setInputCols("a").setNumBuckets(5)
              .setRelativeError(0.001)
              .report(ref, cur).orderBy("bucket").collect())
    assert len(exact) == len(approx) == 5
    # exact percentile interpolates between order statistics; the GK
    # sketch returns an actual data value — a bucket edge can differ by
    # at most one row at rel·n < 1
    for e, a in zip(exact, approx):
        assert e["bucket"] == a["bucket"]
        assert abs(e["n_ref"] - a["n_ref"]) <= 1
        assert abs(e["n_cur"] - a["n_cur"]) <= 1
        assert a["psi_term"] == pytest.approx(e["psi_term"], abs=5e-3)
    assert sum(a["n_ref"] for a in approx) == 200
    assert sum(a["n_cur"] for a in approx) == 200

    with pytest.raises(ValueError):
        DriftMonitor().setRelativeError(1.5)
    with pytest.raises(ValueError):
        DriftMonitor().setRelativeError(-0.1)


def test_numeric_profile_model_equals_two_frame_path(spark, tmp_path):
    """fit(ref).report(cur) — including through save/load — must be
    row-identical to report(ref, cur): one code path, zero drift."""
    from flink_ml__spark.functions.drift import DriftMonitor, DriftMonitorModel

    ref = _df(spark, [float(i) for i in range(1, 101)])
    cur = _df(spark, [float(i) for i in range(40, 160)])
    mon = DriftMonitor().setInputCols("a").setNumBuckets(5)
    direct = sorted(tuple(r) for r in mon.report(ref, cur).collect())
    model = mon.fit(ref)
    via_model = sorted(tuple(r) for r in model.report(cur).collect())
    assert via_model == direct
    p = str(tmp_path / "profile")
    model.save(p)
    back = DriftMonitorModel.load(spark, p)
    assert sorted(tuple(r) for r in back.report(cur).collect()) == direct
    # the loaded profile answers without touching the reference frame
    assert back._edges == model._edges and back._ref == model._ref


def test_categorical_profile_model_equals_two_frame_path(spark, tmp_path):
    from flink_ml__spark.functions.drift import (
        CategoricalDriftModel,
        CategoricalDriftMonitor,
    )

    ref = spark.createDataFrame(
        [("x",)] * 50 + [("y",)] * 30 + [("z",)] * 20, "c string")
    cur = spark.createDataFrame(
        [("x",)] * 30 + [("y",)] * 30 + [("w",)] * 40, "c string")
    mon = CategoricalDriftMonitor().setInputCols("c").setMaxCategories(2)
    direct = sorted(tuple(r) for r in mon.report(ref, cur).collect())
    model = mon.fit(ref)
    assert sorted(tuple(r)
                  for r in model.report(cur).collect()) == direct
    p = str(tmp_path / "cat_profile")
    model.save(p)
    back = CategoricalDriftModel.load(spark, p)
    assert sorted(tuple(r) for r in back.report(cur).collect()) == direct
    # new category 'w' lands in __other__ through the stored vocab
    cats = {r[1] for r in direct}
    assert CategoricalDriftMonitor.OTHER_CAT in cats


def test_profile_model_guards(spark):
    from flink_ml__spark.functions.drift import (
        CategoricalDriftModel,
        DriftMonitorModel,
    )

    df = _df(spark, [1.0])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="empty profile"):
        DriftMonitorModel().report(df)
    with _pytest.raises(ValueError, match="empty profile"):
        CategoricalDriftModel().report(df)


def test_embedding_drift_monitor(spark):
    """A planted mean shift in one dimension shows up as that dim's
    SMD; identical snapshots report zero drift and cosine 1."""
    from flink_ml__spark.functions.drift import EmbeddingDriftMonitor

    ref = spark.createDataFrame(
        [(i, [1.0, 0.0 + 0.01 * (i % 3), 2.0]) for i in range(30)],
        ["vec_id", "embedding"])
    # dimension 0 shifted by +2, others identical
    cur = ref.selectExpr(
        "vec_id",
        "array(embedding[0] + 2.0, embedding[1], embedding[2])"
        " AS embedding")
    rows = {r["pos"]: r
            for r in EmbeddingDriftMonitor().compare(ref, cur).collect()}
    assert rows[0]["smd"] == 0.0  # std 0 both sides -> guarded 0
    assert rows[0]["mean_cur"] - rows[0]["mean_ref"] == 2.0
    assert rows[1]["smd"] == 0.0 and rows[2]["smd"] == 0.0
    assert rows[-1]["mean_ref"] == 30.0  # summary carries row counts
    same = {r["pos"]: r
            for r in EmbeddingDriftMonitor().compare(ref, ref).collect()}
    assert same[-1]["smd"] == 1.0  # centroid cosine
    assert all(same[p]["smd"] == 0.0 for p in (0, 1, 2))
