"""NaiveBayesTextClassifier: separable-class learning, fixed-point
determinism, tie-breaks, save/load, guards."""

import pytest

from flink_ml__spark.functions import (
    NaiveBayesTextClassifier,
    NaiveBayesTextModel,
)

TRAIN = [
    (1, "spam buy cheap pills now buy buy", "spam"),
    (2, "cheap pills cheap offer buy now", "spam"),
    (3, "meeting agenda for the quarterly review", "ham"),
    (4, "please review the attached agenda notes", "ham"),
    (5, "the quarterly notes and the meeting review", "ham"),
]


def _fit(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string,"
                                      " lang string")
    return NaiveBayesTextClassifier().setLabelCol("lang") \
        .setNumFeatures(256).fit(df), df


def test_nb_learns_separable_classes(spark):
    model, df = _fit(spark)
    assert model.labels == ["ham", "spam"]
    got = {r["doc_id"]: r["nb_pred"]
           for r in model.transform(df).collect()}
    assert got == {1: "spam", 2: "spam", 3: "ham", 4: "ham", 5: "ham"}
    new = spark.createDataFrame(
        [(10, "buy cheap pills"), (11, "agenda for the meeting"),
         (12, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["nb_pred"], r["nb_score"])
           for r in model.transform(new).collect()}
    assert out[10][0] == "spam" and out[11][0] == "ham"
    assert out[12] == (None, None)


def test_nb_scores_are_fixed_point(spark):
    """Scores are int64 sums / 1e6: every emitted score times 1e6 must
    be integral — the property that makes argmax engine-independent."""
    model, df = _fit(spark)
    for r in model.transform(df).collect():
        v = r["nb_score"] * 1_000_000
        assert abs(v - round(v)) < 1e-6


def test_nb_empty_tokens_score_on_priors(spark):
    model, df = _fit(spark)
    new = spark.createDataFrame([(20, "")], "doc_id long, text string")
    r = model.transform(new).first()
    # ham has 3 of 5 training docs -> prior argmax
    assert r["nb_pred"] == "ham"
    assert r["nb_score"] == pytest.approx(
        model._priors[0] / 1_000_000, abs=1e-9)


def test_nb_tie_breaks_to_smaller_label(spark):
    rows = [(1, "aaa", "x"), (2, "aaa", "y")]
    df = spark.createDataFrame(rows, "doc_id long, text string,"
                                     " lang string")
    model = NaiveBayesTextClassifier().setLabelCol("lang") \
        .setNumFeatures(64).fit(df)
    # both classes have identical priors and identical token tables ->
    # exact integer tie on every input -> smaller label wins
    out = model.transform(df).collect()
    assert {r["nb_pred"] for r in out} == {"x"}


def test_nb_save_load_roundtrip(spark, tmp_path):
    model, df = _fit(spark)
    want = sorted((r["doc_id"], r["nb_pred"], r["nb_score"])
                  for r in model.transform(df).collect())
    p = str(tmp_path / "nb")
    model.save(p)
    loaded = NaiveBayesTextModel.load(spark, p)
    got = sorted((r["doc_id"], r["nb_pred"], r["nb_score"])
                 for r in loaded.transform(df).collect())
    assert got == want


def test_nb_guards(spark):
    with pytest.raises(ValueError):
        NaiveBayesTextClassifier().setNumFeatures(1)
    with pytest.raises(ValueError):
        NaiveBayesTextClassifier().setSmoothing(0.0)
    empty = spark.createDataFrame(
        [(1, "text", None)], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="no non-null"):
        NaiveBayesTextClassifier().setLabelCol("lang").fit(empty)
