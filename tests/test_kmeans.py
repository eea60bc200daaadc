"""KMeans: golden clusters on separable data, determinism,
empty-cluster survival, JVM-side apply, save/load, wssse."""

import math

import pytest

from flink_ml__spark.operators import KMeans, KMeansModel


def _blob_df(spark):
    # two tight blobs around (0,0) and (10,10)
    rows = [([float(i % 3) * 0.1, float(i % 2) * 0.1],) for i in range(20)]
    rows += [([10.0 + (i % 3) * 0.1, 10.0 + (i % 2) * 0.1],)
             for i in range(20)]
    return spark.createDataFrame(rows, "embedding array<double>")


def test_kmeans_separates_blobs(spark):
    df = _blob_df(spark)
    model = KMeans().setK(2).setSeed(7).fit(df)
    out = model.transform(df).collect()
    lo = {r["prediction"] for r in out if r["embedding"][0] < 5}
    hi = {r["prediction"] for r in out if r["embedding"][0] > 5}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi
    cents = sorted(model.centroids)
    assert math.isclose(cents[0][0], 0.095, abs_tol=1e-6)
    assert math.isclose(cents[1][0], 10.095, abs_tol=1e-6)


def test_kmeans_deterministic_across_partitioning(spark):
    df = _blob_df(spark)
    m1 = KMeans().setK(2).setSeed(3).fit(df.repartition(1))
    m2 = KMeans().setK(2).setSeed(3).fit(df.repartition(7))
    for a, b in zip(sorted(m1.centroids), sorted(m2.centroids)):
        for x, y in zip(a, b):
            assert math.isclose(x, y, abs_tol=1e-9)


def test_kmeans_duplicate_points_fewer_distinct_than_k(spark):
    df = spark.createDataFrame([([1.0, 1.0],)] * 30,
                               "embedding array<double>")
    model = KMeans().setK(3).setSeed(1).fit(df)
    # all points identical: every prediction is one cluster, wssse 0
    assert model.wssse(df) == 0.0
    preds = {r["prediction"] for r in model.transform(df).collect()}
    assert len(preds) == 1


def test_kmeans_apply_is_jvm_side(spark):
    df = _blob_df(spark)
    model = KMeans().setK(2).setSeed(7).fit(df)
    plan = (model.transform(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "EvalPython" not in plan  # no Python in the apply path


def test_kmeans_save_load_and_wssse(spark, tmp_path):
    df = _blob_df(spark)
    model = KMeans().setK(2).setSeed(7).fit(df)
    w = model.wssse(df)
    assert w >= 0
    p = str(tmp_path / "km")
    model.save(p)
    loaded = KMeansModel.load(spark, p)
    assert loaded.centroids == model.centroids
    assert math.isclose(loaded.wssse(df), w)
    a = [(r["prediction"]) for r in model.transform(df).collect()]
    b = [(r["prediction"]) for r in loaded.transform(df).collect()]
    assert a == b


def test_kmeans_needs_enough_points(spark):
    df = spark.createDataFrame([([1.0],)], "embedding array<double>")
    with pytest.raises(ValueError):
        KMeans().setK(2).fit(df)
