"""Pipeline composition: estimators fit in sequence on the running
frame; the fitted model chain round-trips through save/load."""

import math

from flink_ml__spark.functions.feature_gen import (
    MeanImputer,
    TimeFeatureExtractor,
)
from flink_ml__spark.operators import Topsis
from flink_ml__spark.pipeline import Pipeline, PipelineModel


def test_fit_transform_chain(spark):
    # Topsis appends its score; MeanImputer then fits ON the scored
    # frame (estimators see the running frame, not the input) and
    # reduces to its single output column — the reference quirk
    df = spark.createDataFrame(
        [([3.0, 1.0],), ([1.0, 5.0],), ([2.0, 2.0],)],
        "features array<double>")
    scorer = (Topsis().setCriteriaTypes([1, 2]).setWeights([0.5, 0.5])
              .setPredictionCol("score"))
    pipe = Pipeline([scorer,
                     MeanImputer().setInputCol("score")
                     .setOutputCol("score_imp")])
    model = pipe.fit(df)
    out = model.transform(df)
    assert out.columns == ["score_imp"]
    expected = sorted(r["score"]
                      for r in scorer.transform(df).collect())
    got = sorted(r["score_imp"] for r in out.collect())
    for g, e in zip(got, expected):
        assert math.isclose(g, e, abs_tol=1e-12)


def test_pipeline_save_load(spark, tmp_path):
    df = spark.createDataFrame(
        [("2024-03-05",), ("2023-11-30",)], ["d"])
    pipe = Pipeline([TimeFeatureExtractor().setInputCol("d")])
    model = pipe.fit(df)
    p = str(tmp_path / "pipe")
    model.save(p)
    back = PipelineModel.load(spark, p)
    a = sorted(tuple(r) for r in model.transform(df).collect())
    b = sorted(tuple(r) for r in back.transform(df).collect())
    assert a == b
    assert a[0] == (2023, "11", "30")


def test_pipeline_with_estimator_and_transformer(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], ["v"])
    model = Pipeline([MeanImputer().setInputCol("v")
                      .setOutputCol("imputed_value")]).fit(df)
    got = sorted(r["imputed_value"] for r in model.transform(df).collect())
    assert got == [1.0, 1.5, 2.0]
    assert math.isclose(got[1], 1.5)


def test_pipeline_nested_and_unfitted_roundtrip(spark, tmp_path):
    """A PipelineModel must nest as a stage of another pipeline, and a
    saved UNFITTED Pipeline must reload with its stages intact."""
    from flink_ml__spark.functions.text import QualityScorer, TokenCounter
    from flink_ml__spark.pipeline import Pipeline, PipelineModel

    docs = spark.createDataFrame(
        [(1, "some perfectly ordinary text for scoring.")],
        "doc_id long, text string")

    inner = PipelineModel([TokenCounter()])
    outer = PipelineModel([inner, QualityScorer()])
    p1 = str(tmp_path / "nested")
    outer.save(p1)
    loaded = PipelineModel.load(spark, p1)
    a = outer.transform(docs).first().asDict()
    b = loaded.transform(docs).first().asDict()
    assert a == b and "n_tokens" in a and "quality_score" in a

    est = Pipeline([TokenCounter(), QualityScorer()])
    p2 = str(tmp_path / "unfitted")
    est.save(p2)
    reloaded = Pipeline.load(spark, p2)
    assert len(reloaded.stages) == 2
    out = reloaded.fit(docs).transform(docs).first()
    assert out["n_tokens"] > 0 and out["quality_score"] is not None
