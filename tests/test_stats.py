"""CategoricalAssociation / CorrelationMatrix / CooccurrencePMI:
hand-computed goldens, NULL handling, degenerate inputs, validation."""

import math

import pytest
from pyspark.sql import functions as F

from flink_ml__spark.functions.stats import (
    CategoricalAssociation,
    CooccurrencePMI,
    CorrelationMatrix,
)


def test_association_independent_and_perfect(spark):
    # independent 2x2: every cell 1 -> chi2 0, mi 0
    ind = spark.createDataFrame(
        [("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")],
        "x string, y string")
    m = CategoricalAssociation().setPairs("x:y")
    r = m.transform(ind).first()
    assert r["pair"] == "x:y" and r["n"] == 4
    assert r["dx"] == 2 and r["dy"] == 2 and r["dof"] == 1
    assert abs(r["chi2"]) < 1e-12 and abs(r["mutual_info"]) < 1e-12
    assert abs(r["cramers_v"]) < 1e-9

    # perfectly dependent 2x2: chi2 = n, V = 1, MI = ln 2
    dep = spark.createDataFrame(
        [("a", "p"), ("a", "p"), ("b", "q"), ("b", "q")],
        "x string, y string")
    r = m.transform(dep).first()
    assert abs(r["chi2"] - 4.0) < 1e-9
    assert abs(r["cramers_v"] - 1.0) < 1e-9
    assert abs(r["mutual_info"] - math.log(2)) < 1e-12


def test_association_nulls_multi_pair_degenerate(spark):
    df = spark.createDataFrame(
        [("a", "p", "k"), ("a", None, "k"), (None, "q", "k"),
         ("b", "q", "k")],
        "x string, y string, z string")
    out = {r["pair"]: r for r in
           (CategoricalAssociation().setPairs("x:y", "x:z")
            .transform(df).collect())}
    # x:y keeps only rows with both non-null
    assert out["x:y"]["n"] == 2
    # z constant -> dof 0, all stats zero
    r = out["x:z"]
    assert r["n"] == 3 and r["dy"] == 1 and r["dof"] == 0
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0
    assert abs(r["mutual_info"]) < 1e-12


def test_association_validation(spark):
    with pytest.raises(ValueError, match="pair"):
        CategoricalAssociation().setPairs("xy")
    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(ValueError, match="pairs"):
        CategoricalAssociation().transform(df)


def test_correlation_matrix_golden(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)],
        "a double, b double, c double")
    out = {(r["col_x"], r["col_y"]): r for r in
           (CorrelationMatrix().setInputCols("a", "b", "c")
            .transform(df).collect())}
    assert len(out) == 3
    assert abs(out[("a", "b")]["corr"] - 1.0) < 1e-12
    assert abs(out[("a", "c")]["corr"] + 1.0) < 1e-12
    assert abs(out[("b", "c")]["corr"] + 1.0) < 1e-12
    assert out[("a", "b")]["n"] == 3


def test_correlation_matrix_nulls_and_constant(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, 5.0), (2.0, None, 5.0), (3.0, 3.0, 5.0)],
        "a double, b double, c double")
    out = {(r["col_x"], r["col_y"]): r for r in
           (CorrelationMatrix().setInputCols("a", "b", "c")
            .transform(df).collect())}
    assert out[("a", "b")]["n"] == 2       # pairwise deletion
    assert out[("a", "c")]["n"] == 3
    assert out[("a", "c")]["corr"] is None  # constant side -> NULL
    with pytest.raises(ValueError, match="2 columns"):
        CorrelationMatrix().setInputCols("a").transform(df)
    with pytest.raises(ValueError, match="duplicate"):
        CorrelationMatrix().setInputCols("a", "a")


def test_pmi_golden(spark):
    rows = [(1, "x"), (1, "y"), (1, "y"),   # dup item counts once
            (2, "x"), (2, "y"),
            (3, "x"), (3, "z"),
            (4, "y")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = (CooccurrencePMI().setGroupCol("basket").setItemCol("item")
           .setMinCount(2).transform(df).collect())
    assert len(out) == 1                    # (x,z) has n_ab 1 < 2
    r = out[0]
    assert (r["item_a"], r["item_b"]) == ("x", "y")
    assert r["n_ab"] == 2 and r["n_a"] == 3 and r["n_b"] == 3
    assert abs(r["pmi"] - math.log(2 * 4 / 9)) < 1e-12


def test_pmi_basket_cap_and_validation(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"),   # dropped by cap 2
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = (CooccurrencePMI().setGroupCol("basket").setItemCol("item")
           .setMinCount(1).setMaxBasketSize(2).transform(df).collect())
    assert len(out) == 1
    r = out[0]
    # basket 1 dropped: N=2, pair (a,b) in both remaining baskets
    assert r["n_ab"] == 2 and r["n_a"] == 2 and r["n_b"] == 2
    assert abs(r["pmi"] - math.log(2 * 2 / 4)) < 1e-12
    with pytest.raises(ValueError, match="minCount"):
        CooccurrencePMI().setMinCount(0)
    with pytest.raises(ValueError, match="maxBasketSize"):
        CooccurrencePMI().setMaxBasketSize(1)
