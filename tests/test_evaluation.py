"""BinaryClassificationEvaluator: hand-computed AUC/confusion goldens,
tie handling, degenerate classes, NULL exclusion."""

import pytest

from flink_ml__spark.functions.evaluation import (
    BinaryClassificationEvaluator,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "label int, score double")


def test_perfect_and_inverted_auc(spark):
    perfect = _df(spark, [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)])
    r = BinaryClassificationEvaluator().evaluate(perfect).first()
    assert r["auc"] == 1.0 and r["accuracy"] == 1.0 and r["f1"] == 1.0
    inverted = _df(spark, [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)])
    assert (BinaryClassificationEvaluator().evaluate(inverted)
            .first()["auc"] == 0.0)


def test_hand_computed_auc_with_tie(spark):
    # pairs: (pos .8 > neg .4)=1, (pos .8 > neg .6)=1,
    #        (pos .6 tie neg .6)=.5, (pos .6 > neg .4)=1 -> auc 3.5/4
    df = _df(spark, [(1, 0.8), (1, 0.6), (0, 0.6), (0, 0.4)])
    r = BinaryClassificationEvaluator().evaluate(df).first()
    assert abs(r["auc"] - 3.5 / 4) < 1e-12
    assert r["n_pos"] == 2 and r["n_neg"] == 2


def test_confusion_at_threshold(spark):
    df = _df(spark, [(1, 0.9), (1, 0.4), (0, 0.7), (0, 0.1)])
    r = (BinaryClassificationEvaluator().setThreshold(0.5)
         .evaluate(df).first())
    # tp=1 (0.9), fp=1 (0.7), fn=1 (0.4), tn=1 (0.1)
    assert r["accuracy"] == 0.5
    assert r["precision"] == 0.5 and r["recall"] == 0.5
    assert r["f1"] == 0.5


def test_single_class_auc_null(spark):
    df = _df(spark, [(1, 0.9), (1, 0.1)])
    r = BinaryClassificationEvaluator().evaluate(df).first()
    assert r["auc"] is None and r["n_neg"] == 0
    assert r["recall"] == 0.5            # threshold still applies
    df0 = _df(spark, [(0, 0.9)])
    r0 = BinaryClassificationEvaluator().evaluate(df0).first()
    # the lone negative IS predicted positive: precision 0/1 = 0.0;
    # recall undefined (no positives) -> NULL, hence f1 NULL
    assert r0["auc"] is None and r0["precision"] == 0.0
    assert r0["recall"] is None and r0["f1"] is None


def test_nulls_excluded_and_clamping(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (None, 0.5), (0, None), (0, -0.3), (1, 1.7)],
        "label int, score double")
    r = BinaryClassificationEvaluator().evaluate(df).first()
    # NULL label/score rows drop; -0.3 clamps to bucket 0, 1.7 to top
    assert r["n_pos"] == 2 and r["n_neg"] == 1
    assert r["auc"] == 1.0


def test_validation(spark):
    with pytest.raises(ValueError, match="numBins"):
        BinaryClassificationEvaluator().setNumBins(1)
