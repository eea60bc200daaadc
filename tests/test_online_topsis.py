"""OnlineTopsis golden tests (``/root/reference/test/java/cn/swust/
algorithms/topsis/OnlineTopsisTest.java``)."""

import datetime
import math

from flink_ml__spark.operators.online_topsis import OnlineTopsis, OnlineTopsisModel

# ``OnlineTopsisTest.java:45-54``
INPUT = [
    (1517414400000, [262.000000, 267.899994, 250.029999, 254.259995, 254.259995, 11896100.0]),
    (1517500800000, [247.699997, 266.700012, 245.000000, 265.720001, 265.720001, 12595800.0]),
    (1517587200000, [266.579987, 272.450012, 264.329987, 264.559998, 264.559998, 8981500.0]),
    (1517673600000, [267.079987, 267.619995, 250.000000, 250.100006, 250.100006, 9306700.0]),
    (1517760000000, [253.850006, 255.800003, 236.110001, 249.470001, 249.470001, 16906900.0]),
    (1517846400000, [252.139999, 259.149994, 249.000000, 257.950012, 257.950012, 8534900.0]),
    (1517932800000, [257.290009, 261.410004, 254.699997, 258.269989, 258.269989, 6855200.0]),
    (1518019200000, [260.470001, 269.880005, 260.329987, 266.000000, 266.000000, 10972000.0]),
    (1518105600000, [270.029999, 280.500000, 267.630005, 280.269989, 280.269989, 10759700.0]),
]

# ``OnlineTopsisTest.java:56-66`` — (timestamp, minTimestamp, score)
EXPECTED_MODEL = {
    (1517875199999, 1517673600000): 0.5704,
    (1518134399999, 1517932800000): 0.4296,
    (1517615999999, 1517414400000): 0.3537,
}
# ``OnlineTopsisTest.java:68-77`` — id → score
EXPECTED_SCORES = {
    1517414400000: 0.3537, 1517500800000: 0.3537, 1517587200000: 0.3537,
    1517673600000: 0.5704, 1517760000000: 0.5704, 1517846400000: 0.5704,
    1517932800000: 0.4296, 1518019200000: 0.4296, 1518105600000: 0.4296,
}


def _df(spark):
    rows = [
        (i, v, datetime.datetime.fromtimestamp(i / 1000.0, datetime.timezone.utc)
         .replace(tzinfo=None))
        for i, v in INPUT
    ]
    return spark.createDataFrame(rows, "id long, features array<double>, rowtime timestamp")


def make_estimator():
    # ``OnlineTopsisTest.java:182-189``
    return (OnlineTopsis()
            .setCriteriaTypes(1, 1, 1, 2, 2, 2)
            .setWeights(0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
            .setWindows("3 days"))


def test_params():
    est = OnlineTopsis()
    assert est.getWindows() is None  # GlobalWindows default
    assert est.getMaxAllowedModelDelayMs() == 0
    assert est.getFeaturesCol() == "features"
    assert est.getPredictionCol() == "prediction"


def test_golden_model_data(spark):
    model = make_estimator().fit(_df(spark))
    md = model.getModelData().collect()
    assert len(md) == 3
    for r in md:
        key = (r["timestamp"], r["minTimestamp"])
        assert key in EXPECTED_MODEL, key
        assert math.isclose(r["score"], EXPECTED_MODEL[key], abs_tol=1e-4)


def test_golden_predictions(spark):
    df = _df(spark)
    model = make_estimator().fit(df)
    out = model.transform(df)
    assert out.columns == ["id", "features", "rowtime", "prediction"]
    rows = out.collect()
    assert len(rows) == 9
    for r in rows:
        assert math.isclose(r["prediction"], EXPECTED_SCORES[r["id"]],
                            abs_tol=1e-4), (r["id"], r["prediction"])


def test_model_save_load(spark, tmp_path):
    df = _df(spark)
    model = make_estimator().fit(df)
    path = str(tmp_path / "online_topsis")
    model.save(path)
    loaded = OnlineTopsisModel.load(spark, path)
    out = {r["id"]: r["prediction"] for r in loaded.transform(df).collect()}
    for i, s in EXPECTED_SCORES.items():
        assert math.isclose(out[i], s, abs_tol=1e-4)


def test_set_model_data_transplant(spark):
    # ``OnlineTopsisTest.java:277-291``
    df = _df(spark)
    md = make_estimator().fit(df).getModelData()
    fresh = OnlineTopsisModel().setModelData(md)
    fresh._set(criteriaTypes=[1, 1, 1, 2, 2, 2], weights=[0.1] * 6)
    out = fresh.transform(df)
    assert out.count() == 9


def test_global_window(spark):
    df = _df(spark)
    est = (OnlineTopsis()
           .setCriteriaTypes(1, 1, 1, 2, 2, 2)
           .setWeights(0.1, 0.1, 0.1, 0.1, 0.1, 0.1))
    model = est.fit(df)
    md = model.getModelData().collect()
    assert len(md) == 1
    assert md[0]["minTimestamp"] == 1517414400000
    assert md[0]["timestamp"] == 1518105600000
