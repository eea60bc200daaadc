"""Golden tests for Topsis, mirroring the reference test strategy
(``/root/reference/test/java/cn/swust/algorithms/topsis/TopsisTest.java``):
param defaults/round-trip, output schema, golden scores at 1e-4,
save/load round-trip.
"""

import math

import pytest

from flink_ml__spark.operators.topsis import Topsis

# ``TopsisTest.java:37-47``
INPUT = [
    ([9.0, 10.0, 175.0, 120.0],),
    ([8.0, 7.0, 164.0, 80.0],),
    ([6.0, 3.0, 157.0, 90.0],),
]
GOLDEN = {
    (9.0, 10.0, 175.0, 120.0): 0.2033,
    (8.0, 7.0, 164.0, 80.0): 0.5905,
    (6.0, 3.0, 157.0, 90.0): 0.6247,
}


def make_op():
    # ``TopsisTest.java:95-99``
    return (
        Topsis()
        .setCriteriaTypes(1, 2, 3, 4)
        .setWeights(0.4, 0.3, 0.2, 0.1)
        .setBestValue(165.0)
        .setIntervalValue(90.0, 100.0)
    )


def test_params():
    op = Topsis()
    assert op.getFeaturesCol() == "features"
    assert op.getPredictionCol() == "prediction"
    op = make_op().setFeaturesCol("f").setPredictionCol("p")
    assert op.getFeaturesCol() == "f"
    assert op.getPredictionCol() == "p"
    assert op.getCriteriaTypes() == [1, 2, 3, 4]
    assert op.getWeights() == [0.4, 0.3, 0.2, 0.1]
    assert op.getBestValue() == 165.0
    assert op.getIntervalValue() == [90.0, 100.0]


def test_validation(spark):
    with pytest.raises(ValueError, match="best value"):
        Topsis().setCriteriaTypes(3).setWeights(1.0)._validate()
    with pytest.raises(ValueError, match="interval"):
        Topsis().setCriteriaTypes(4).setWeights(1.0)._validate()
    with pytest.raises(ValueError, match="ascending"):
        (Topsis().setCriteriaTypes(4).setWeights(1.0)
         .setIntervalValue(5.0, 1.0)._validate())


def test_golden_scores(spark):
    df = spark.createDataFrame(INPUT, ["features"])
    out = make_op().transform(df)
    assert out.columns == ["features", "prediction"]
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        expected = GOLDEN[tuple(r["features"])]
        assert math.isclose(r["prediction"], expected, abs_tol=1e-4)


def test_vector_input(spark):
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [(Vectors.dense(v),) for (v,) in INPUT], ["features"])
    out = make_op().transform(df).collect()
    for r in out:
        expected = GOLDEN[tuple(r["features"].toArray())]
        assert math.isclose(r["prediction"], expected, abs_tol=1e-4)


def test_save_load(spark, tmp_path):
    path = str(tmp_path / "topsis")
    make_op().save(path)
    op = Topsis.load(spark, path)
    assert op.getCriteriaTypes() == [1, 2, 3, 4]
    assert op.getWeights() == [0.4, 0.3, 0.2, 0.1]
    df = spark.createDataFrame(INPUT, ["features"])
    rows = op.transform(df).collect()
    for r in rows:
        expected = GOLDEN[tuple(r["features"])]
        assert math.isclose(r["prediction"], expected, abs_tol=1e-4)
