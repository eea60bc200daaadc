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


# ---------------------------------------------------------------------------
# hypothesis properties vs pure-python references (bounded examples:
# each draws a Spark job)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

H = settings(max_examples=5, deadline=None,
             suppress_health_check=list(HealthCheck))


def _assoc_reference(xy):
    """Chi² / MI / Cramér's V from the textbook definitions over the
    FULL contingency table (structural zeros included) — the identity
    the operator uses must agree with the direct formula."""
    from collections import Counter
    n = len(xy)
    cxy, cx, cy = Counter(xy), Counter(x for x, _ in xy), Counter(
        y for _, y in xy)
    chi2 = 0.0
    mi = 0.0
    for x in cx:
        for y in cy:
            e = cx[x] * cy[y] / n
            o = cxy.get((x, y), 0)
            chi2 += (o - e) ** 2 / e
            if o:
                mi += (o / n) * math.log(o * n / (cx[x] * cy[y]))
    dmin = min(len(cx), len(cy)) - 1
    v = math.sqrt(chi2 / (n * dmin)) if dmin > 0 else 0.0
    return chi2, mi, v


@H
@given(xy=st.lists(st.tuples(st.sampled_from("abc"),
                             st.sampled_from("pqr")),
                   min_size=2, max_size=20))
def test_association_matches_reference(spark, xy):
    df = spark.createDataFrame(xy, "x string, y string")
    r = (CategoricalAssociation().setPairs("x:y")
         .transform(df).first())
    chi2, mi, v = _assoc_reference(xy)
    assert r["chi2"] == pytest.approx(chi2, abs=1e-9)
    assert r["mutual_info"] == pytest.approx(mi, abs=1e-12)
    assert r["cramers_v"] == pytest.approx(v, abs=1e-9)


def _triangles_reference(edges):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    return {v: (len(nb),
                sum(1 for u in nb for w in nb
                    if u < w and w in adj[u]))
            for v, nb in adj.items()}


@H
@given(edges=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                      min_size=1, max_size=25))
def test_triangles_match_reference(spark, edges):
    from flink_ml__spark.functions.graph import TriangleCounter

    want = _triangles_reference(edges)
    if not want:        # all self-loops
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["degree"], r["triangles"])
           for r in TriangleCounter().transform(df).collect()}
    assert got == want


@H
@given(rows=st.lists(st.tuples(st.integers(1, 5),
                               st.sampled_from("uvwx")),
                     min_size=1, max_size=20))
def test_pmi_matches_reference(spark, rows):
    from collections import Counter
    from itertools import combinations

    pres = sorted(set(rows))
    baskets = {}
    for g, i in pres:
        baskets.setdefault(g, set()).add(i)
    n_total = len(baskets)
    marg = Counter(i for items in baskets.values() for i in items)
    pair = Counter(p for items in baskets.values()
                   for p in combinations(sorted(items), 2))
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {(r["item_a"], r["item_b"]):
           (r["n_ab"], r["n_a"], r["n_b"], r["pmi"])
           for r in (CooccurrencePMI().setGroupCol("basket")
                     .setItemCol("item").setMinCount(1)
                     .transform(df).collect())}
    assert set(got) == set(pair)
    for p, n_ab in pair.items():
        a, b = p
        assert got[p][0] == n_ab
        assert got[p][1] == marg[a] and got[p][2] == marg[b]
        want = math.log(n_ab * n_total / (marg[a] * marg[b]))
        assert got[p][3] == pytest.approx(want, abs=1e-12)


def test_ab_test_goldens(spark):
    import math

    from flink_ml__spark.functions.stats import ABTestAnalyzer

    # control: [10, 12, 14] (mean 12, var 4); treat: [20, 22, 24, 26]
    # (mean 23, var 20/3); se2 = 4/3 + 5/3 = 3 -> t = 11/sqrt(3)
    rows = ([("control", 10.0), ("control", 12.0), ("control", 14.0),
             ("t", 20.0), ("t", 22.0), ("t", 24.0), ("t", 26.0)])
    df = spark.createDataFrame(rows, "variant string, metric double")
    r = ABTestAnalyzer().evaluate(df).first()
    assert r["variant"] == "t" and r["n_c"] == 3 and r["n_v"] == 4
    assert abs(r["lift"] - 11.0) < 1e-12
    assert abs(r["lift_pct"] - 11 / 12) < 1e-12
    assert abs(r["t_stat"] - 11 / math.sqrt(3)) < 1e-9
    se2 = 4 / 3 + (20 / 3) / 4
    dof = se2 ** 2 / ((4 / 3) ** 2 / 2 + ((20 / 3) / 4) ** 2 / 3)
    assert abs(r["dof"] - dof) < 1e-9
    assert r["significant"] is True


def test_ab_test_degenerate_and_nulls(spark):
    from flink_ml__spark.functions.stats import ABTestAnalyzer

    # single-row arms and zero variance -> t/dof NULL, not an error
    df = spark.createDataFrame(
        [("control", 5.0), ("x", 9.0), ("x", None), (None, 1.0)],
        "variant string, metric double")
    r = ABTestAnalyzer().evaluate(df).first()
    assert r["n_c"] == 1 and r["n_v"] == 1
    assert r["lift"] == 4.0
    assert r["t_stat"] is None and r["dof"] is None
    assert r["significant"] is False
    # constant metric in both arms: se2 = 0 -> NULL t
    cz = spark.createDataFrame(
        [("control", 2.0), ("control", 2.0), ("v", 2.0), ("v", 2.0)],
        "variant string, metric double")
    r = ABTestAnalyzer().evaluate(cz).first()
    assert r["t_stat"] is None and r["significant"] is False


def test_benford_goldens(spark):
    import math

    from flink_ml__spark.functions.stats import BenfordProfiler

    # digits: 1 (from 0.123, 1.0, 19, 1e6), 9 (0.95), 5 (-5.5);
    # zeros/NULLs dropped
    df = spark.createDataFrame(
        [(0.123,), (1.0,), (19.0,), (1e6,), (0.95,), (-5.5,),
         (0.0,), (None,)], "value double")
    out = {r["digit"]: r for r in
           (BenfordProfiler().setInputCol("value")
            .transform(df).collect())}
    assert len(out) == 9
    assert out[1]["n"] == 4 and out[9]["n"] == 1 and out[5]["n"] == 1
    assert out[2]["n"] == 0
    assert abs(out[1]["observed"] - 4 / 6) < 1e-12
    assert abs(out[1]["expected"] - math.log10(2)) < 1e-12
    e1 = math.log10(2)
    assert abs(out[1]["chi2_term"]
               - 6 * (4 / 6 - e1) ** 2 / e1) < 1e-9
    # empty input: 9 rows, n 0, observed/chi2 NULL
    empty = spark.createDataFrame([], "value double")
    rows = (BenfordProfiler().setInputCol("value")
            .transform(empty).collect())
    assert len(rows) == 9
    assert all(r["n"] == 0 and r["observed"] is None
               and r["chi2_term"] is None for r in rows)


# ---------------------------------------------------- two-sample tests

def _ts_df(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + \
           [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "group string, value double")


def test_ks_exact_when_distinct_lt_bins(spark):
    import math

    from flink_ml__spark.functions.stats import KolmogorovSmirnovTest

    a = [1, 2, 3, 4, 5, 6]
    b = [4, 5, 6, 7, 8, 9]
    r = (KolmogorovSmirnovTest().setNumBins(1024)
         .evaluate(_ts_df(spark, a, b)).first())
    assert r["n_a"] == 6 and r["n_b"] == 6
    # exact two-sample D via pure python ECDFs on the pooled grid
    grid = sorted(set(a) | set(b))
    d_exact = max(abs(sum(v <= g for v in a) / 6
                      - sum(v <= g for v in b) / 6) for g in grid)
    assert math.isclose(r["d_stat"], d_exact)
    ne = 36 / 12
    assert math.isclose(r["p_value"],
                        min(1.0, 2 * math.exp(-2 * d_exact ** 2 * ne)))


def test_ks_identical_samples_d_zero(spark):
    from flink_ml__spark.functions.stats import KolmogorovSmirnovTest

    vals = [1, 2, 3, 4, 5]
    r = KolmogorovSmirnovTest().evaluate(_ts_df(spark, vals, vals)).first()
    assert r["d_stat"] == 0.0 and r["p_value"] == 1.0


def test_ks_disjoint_samples_d_one(spark):
    from flink_ml__spark.functions.stats import KolmogorovSmirnovTest

    r = (KolmogorovSmirnovTest()
         .evaluate(_ts_df(spark, [1, 2, 3], [100, 101, 102])).first())
    assert r["d_stat"] == 1.0


def test_ks_other_labels_and_nulls_excluded(spark):
    from flink_ml__spark.functions.stats import KolmogorovSmirnovTest

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 99.0), ("a", None)],
        "group string, value double")
    r = KolmogorovSmirnovTest().evaluate(df).first()
    assert r["n_a"] == 1 and r["n_b"] == 1


def test_mwu_exact_rank_sum_with_ties(spark):
    import math

    from flink_ml__spark.functions.stats import MannWhitneyUTest

    a = [1, 2, 2, 5]
    b = [2, 3, 4, 6]
    r = (MannWhitneyUTest().setNumBins(1024)
         .evaluate(_ts_df(spark, a, b)).first())
    # pooled sorted: 1,2,2,2,3,4,5,6 → ranks 1, (2+3+4)/3=3,3,3, 5,6,7,8
    want_rank_a = 1 + 3 + 3 + 7
    assert math.isclose(r["rank_sum_a"], want_rank_a)
    assert math.isclose(r["u_stat"], want_rank_a - 4 * 5 / 2)
    # tie-corrected z: n=8, ties: one group of 3
    n, na, nb = 8, 4, 4
    tie = 3 ** 3 - 3 + 6 * (1 ** 3 - 1)
    var = na * nb / 12 * ((n + 1) - (tie) / (n * (n - 1)))
    mu = na * nb / 2
    assert math.isclose(r["z_stat"], (r["u_stat"] - mu) / math.sqrt(var))
    assert r["significant"] is False


def test_mwu_strong_shift_significant(spark):
    from flink_ml__spark.functions.stats import MannWhitneyUTest

    a = list(range(30))
    b = list(range(100, 130))
    r = MannWhitneyUTest().evaluate(_ts_df(spark, a, b)).first()
    assert r["u_stat"] == 0.0  # A never wins
    assert r["significant"] is True and r["z_stat"] < -1.96


def test_mwu_all_one_bin_z_null(spark):
    from flink_ml__spark.functions.stats import MannWhitneyUTest

    r = (MannWhitneyUTest()
         .evaluate(_ts_df(spark, [5, 5, 5], [5, 5])).first())
    assert r["z_stat"] is None and r["significant"] is False


def test_two_sample_empty_raises(spark):
    import pytest as _pytest

    from flink_ml__spark.functions.stats import KolmogorovSmirnovTest

    df = spark.createDataFrame([], "group string, value double")
    with _pytest.raises(ValueError):
        KolmogorovSmirnovTest().evaluate(df)


# ----------------------------------------------------------- one-way ANOVA

def test_anova_goldens(spark):
    import math

    from flink_ml__spark.functions.stats import AnovaFTest

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0),
            ("c", 7.0), ("c", 8.0), ("c", 9.0),
            (None, 100.0), ("a", None)]
    df = spark.createDataFrame(rows, "group string, value double")
    r = AnovaFTest().evaluate(df).first()
    assert r["k_groups"] == 3 and r["n"] == 9
    assert r["df_between"] == 2 and r["df_within"] == 6
    # group means 2, 5, 8; grand 5; ss_b = 3*(9+0+9)=54; ss_w = 3*2=6
    f_want = (54 / 2) / (6 / 6)
    assert math.isclose(r["f_stat"], f_want)
    assert math.isclose(r["eta_sq"], 54 / 60)


def test_anova_identical_groups_f_zero(spark):
    import math

    from flink_ml__spark.functions.stats import AnovaFTest

    rows = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "group string, value double")
    r = AnovaFTest().evaluate(df).first()
    assert math.isclose(r["f_stat"], 0.0, abs_tol=1e-12)


def test_anova_constant_within_f_null(spark):
    from flink_ml__spark.functions.stats import AnovaFTest

    # zero within-group variance → MS_within = 0 → F undefined
    rows = [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "group string, value double")
    r = AnovaFTest().evaluate(df).first()
    assert r["f_stat"] is None and r["eta_sq"] == 1.0


def test_anova_single_group_dfs(spark):
    from flink_ml__spark.functions.stats import AnovaFTest

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)],
                               "group string, value double")
    r = AnovaFTest().evaluate(df).first()
    assert r["df_between"] == 0 and r["f_stat"] is None


# ------------------------------------------------- mutual information

def test_mutual_information_known_values(spark):
    import math

    from flink_ml__spark.functions.stats import MutualInformationRanker

    # perfect predictor, independent column, and a NULL-y column
    rows = []
    for i in range(40):
        label = "pos" if i % 2 == 0 else "neg"
        rows.append((label,                       # mirror: MI = H(Y)=ln2
                     label.upper(),
                     "c%d" % (i % 4 // 2),        # independent of label
                     None if i % 2 == 0 else "z"))
    df = spark.createDataFrame(
        rows, "label string, mirror string, indep string, holey string")
    out = (MutualInformationRanker().setLabelCol("label")
           .setInputCols("mirror", "indep", "holey").transform(df))
    got = {r["feature"]: r for r in out.collect()}
    assert abs(got["mirror"]["mi"] - math.log(2)) < 1e-12
    assert abs(got["indep"]["mi"]) < 1e-12
    assert got["mirror"]["n_rows"] == 40
    # holey: only the 20 'neg' rows survive pairwise deletion; the
    # label is then constant -> MI 0
    assert got["holey"]["n_rows"] == 20
    assert abs(got["holey"]["mi"]) < 1e-12
    assert got["mirror"]["n_values"] == 2


def test_mutual_information_bad_params(spark):
    import pytest as _pt

    from flink_ml__spark.functions.stats import MutualInformationRanker

    with _pt.raises(ValueError):
        MutualInformationRanker().setInputCols([])


def test_correlation_ranker_known_values(spark):
    import math

    from flink_ml__spark.functions.stats import CorrelationRanker

    rows = []
    for i in range(30):
        y = float(i)
        rows.append((y, 2.0 * y + 1.0,            # perfect +
                     -3.0 * y,                    # perfect −
                     7.0,                         # constant
                     None if i % 2 else y))       # half NULL
    df = spark.createDataFrame(
        rows, "label double, up double, down double, const double,"
              " holey double")
    out = (CorrelationRanker().setLabelCol("label")
           .setInputCols("up", "down", "const", "holey").transform(df))
    got = {r["feature"]: r for r in out.collect()}
    assert math.isclose(got["up"]["r"], 1.0, abs_tol=1e-12)
    assert math.isclose(got["down"]["r"], -1.0, abs_tol=1e-12)
    assert got["const"]["r"] is None
    assert got["holey"]["n_rows"] == 15
    assert math.isclose(got["holey"]["r"], 1.0, abs_tol=1e-12)

    import pytest as _pt
    with _pt.raises(ValueError):
        CorrelationRanker().setInputCols([])


def test_otsu_threshold_separates_bimodal(spark):
    from flink_ml__spark.functions.stats import OtsuThreshold

    vals = [0.15 + 0.01 * (i % 10) for i in range(50)] \
        + [0.75 + 0.01 * (i % 10) for i in range(50)]
    df = spark.createDataFrame([(float(v),) for v in vals],
                               ["quality_score"])
    r = OtsuThreshold().setNumBins(64).transform(df).first()
    assert 0.24 < r["threshold"] < 0.76  # lands in the gap
    assert r["n_below"] == 50 and r["n_above"] == 50
    assert r["between_var"] > 0.08
    # constant column: no valid cut -> empty result, not a crash
    const = spark.createDataFrame([(1.0,)] * 5, ["quality_score"])
    assert OtsuThreshold().transform(const).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        OtsuThreshold().setNumBins(1)


def test_gini_concentration(spark):
    from flink_ml__spark.functions.stats import GiniConcentration

    even = spark.createDataFrame([(i, "ab"[i % 2]) for i in range(100)],
                                 ["id", "lang"])
    assert (GiniConcentration().setGroupCol("lang")
            .transform(even).first()["gini"]) == 0.0
    skew = spark.createDataFrame(
        [(i, "a" if i < 80 else "b") for i in range(100)],
        ["id", "lang"])
    r = GiniConcentration().setGroupCol("lang").transform(skew).first()
    assert r["gini"] == 0.3 and r["n_groups"] == 2
    # weighted: all weight on one group -> gini = (n-1)/n for n groups
    w = spark.createDataFrame(
        [(1, "a", 100.0), (2, "b", 0.0), (3, "c", 0.0)],
        ["id", "lang", "wt"])
    r2 = (GiniConcentration().setGroupCol("lang").setWeightCol("wt")
          .transform(w).first())
    assert abs(r2["gini"] - 2 / 3) < 1e-6


def test_spearman_correlation(spark):
    """Monotone nonlinear association scores ~1 under Spearman (where
    Pearson would not); ties get average ranks (pandas parity);
    listwise NULL deletion."""
    import numpy as np
    import pandas as pd

    from flink_ml__spark.functions.stats import SpearmanCorrelation

    rng = np.random.RandomState(7)
    x = rng.randn(100)
    y = x ** 3
    z = np.round(rng.randn(100), 1)  # ties
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    rows.append((None, 1.0, 1.0))  # listwise-dropped
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r["col_x"], r["col_y"]): r
           for r in (SpearmanCorrelation().setInputCols("x", "y", "z")
                     .transform(df).collect())}
    assert got[("x", "y")]["n"] == 100
    assert got[("x", "y")]["rho"] == 1.0  # perfect monotone
    rx = pd.Series(x).rank(method="average")
    rz = pd.Series(z).rank(method="average")
    want = round(float(np.corrcoef(rx, rz)[0, 1]), 6)
    assert abs(got[("x", "z")]["rho"] - want) < 1e-6
    import pytest as _pt
    with _pt.raises(ValueError):
        SpearmanCorrelation().setInputCols("x").transform(df)
    with _pt.raises(ValueError):
        SpearmanCorrelation().setInputCols("x", "x")


# ---------------------------------------------------------------------------
# WelchTTest
# ---------------------------------------------------------------------------

def test_welch_golden(spark):
    # A=[1,2,3,4], B=[2,4,6,8,10]: scipy ttest_ind(equal_var=False)
    # gives t=-2.251443, dof=5.520776
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
         ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0), ("b", 10.0)],
        "g string, v double")
    from flink_ml__spark.functions.stats import WelchTTest
    r = (WelchTTest().setValueCol("v").setGroupCol("g")
         .setGroups("a", "b").evaluate(df).first())
    assert r["n_a"] == 4 and r["n_b"] == 5
    assert abs(r["mean_a"] - 2.5) < 1e-12
    assert abs(r["mean_b"] - 6.0) < 1e-12
    assert abs(r["t_stat"] - (-2.2514363)) < 1e-6
    assert abs(r["dof"] - 5.5207877) < 1e-6
    assert bool(r["significant"]) is True


def test_welch_nulls_degenerate_validation(spark):
    from flink_ml__spark.functions.stats import WelchTTest
    # group with <2 rows -> NULL t, not significant
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0), ("a", None),
         ("c", 9.0)], "g string, v double")
    r = (WelchTTest().setValueCol("v").setGroupCol("g")
         .setGroups("a", "b").evaluate(df).first())
    assert r["n_a"] == 1 and r["n_b"] == 2
    assert r["t_stat"] is None and r["dof"] is None
    assert bool(r["significant"]) is False
    # zero-variance both sides -> se2 = 0 -> NULL t
    z = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)],
        "g string, v double")
    r = (WelchTTest().setValueCol("v").setGroupCol("g")
         .setGroups("a", "b").evaluate(z).first())
    assert r["t_stat"] is None
    import pytest as _pt
    with _pt.raises(ValueError, match="differ"):
        WelchTTest().setGroups("a", "a")
    with _pt.raises(ValueError, match="setGroups"):
        WelchTTest().evaluate(df)


# ---------------------------------------------------------------------------
# PoissonBootstrapper
# ---------------------------------------------------------------------------

def test_bootstrap_deterministic_and_sane(spark):
    from flink_ml__spark.functions.stats import PoissonBootstrapper
    df = spark.createDataFrame(
        [(i, float(i % 17) + 1.0) for i in range(300)],
        "id bigint, v double")
    op = (PoissonBootstrapper().setIdCol("id").setValueCol("v")
          .setNumReplicas(50).setSeed(7))
    r1 = op.evaluate(df).first()
    r2 = op.evaluate(df).first()
    assert r1 == r2  # fully deterministic
    assert r1["n"] == 300
    assert abs(r1["mean"] - sum((i % 17) + 1.0 for i in range(300))
               / 300) < 1e-9
    assert r1["b_replicas"] == 50
    assert r1["ci_lo"] < r1["mean"] < r1["ci_hi"]
    assert 0 < r1["se"] < 2.0  # SE of mean of ~uniform(1,17) over n=300
    # a different seed draws a different resample
    r3 = (PoissonBootstrapper().setIdCol("id").setValueCol("v")
          .setNumReplicas(50).setSeed(8).evaluate(df).first())
    assert r3["ci_lo"] != r1["ci_lo"] or r3["ci_hi"] != r1["ci_hi"]


def test_bootstrap_weight_ladder_and_validation(spark):
    import pytest as _pt
    from pyspark.sql import functions as F
    from flink_ml__spark.functions.stats import (POISSON1_CDF,
                                                 PoissonBootstrapper)
    us = [0.1, 0.5, 0.8, 0.95, 0.999, 0.99995]
    df = spark.createDataFrame([(u,) for u in us], "u double")
    w = [r[0] for r in df.select(
        PoissonBootstrapper.weight_expr(F.col("u"))).collect()]
    assert w == [0, 1, 2, 3, 5, 7]
    assert len(POISSON1_CDF) == 7
    with _pt.raises(ValueError, match="numReplicas"):
        PoissonBootstrapper().setNumReplicas(1)


def test_bootstrap_arrow_partials_match_fused(spark):
    """The Arrow-partials path (vectorized searchsorted ladder +
    per-batch partial sums — 2.6x faster isolated, the fused 128-agg
    plan was janino-compile-bound) must reproduce the fused plan's
    resample: identical weights per row, so every output agrees to
    summation-order noise."""
    from flink_ml__spark.functions.stats import PoissonBootstrapper

    df = spark.createDataFrame(
        [(i, float((i * 31) % 23) + 0.5) for i in range(500)],
        "id bigint, v double")

    def run(arrow):
        return (PoissonBootstrapper().setIdCol("id").setValueCol("v")
                .setNumReplicas(40).setSeed(13)
                .setArrowPartials(arrow).evaluate(df).first())

    a, f = run(True), run(False)
    assert a["n"] == f["n"] and a["b_replicas"] == f["b_replicas"]
    for k in ("mean", "se", "ci_lo", "ci_hi"):
        assert abs(a[k] - f[k]) < 1e-9, (k, a[k], f[k])


# ---------------------------------------------------------------------------
# CupedAdjuster
# ---------------------------------------------------------------------------

def test_cuped_golden_perfect_covariate(spark):
    from flink_ml__spark.functions.stats import CupedAdjuster
    # y = x + effect: theta=1, adjusted diff == raw diff (covariate
    # balanced), variance reduction = 1 - 0.3/1.1
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, 3.0), ("a", 3.0, 4.0),
         ("b", 1.0, 1.0), ("b", 2.0, 2.0), ("b", 3.0, 3.0)],
        "variant string, x double, y double")
    r = (CupedAdjuster().setMetricCol("y").setCovariateCol("x")
         .setVariants("a", "b").evaluate(df).first())
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert abs(r["theta"] - 1.0) < 1e-12
    assert abs(r["diff_raw"] - 1.0) < 1e-12
    assert abs(r["diff_adj"] - 1.0) < 1e-12
    assert abs(r["var_y"] - 1.1) < 1e-12
    assert abs(r["var_y_adj"] - 0.3) < 1e-12
    assert abs(r["var_reduction"] - (1 - 0.3 / 1.1)) < 1e-12


def test_cuped_unbalanced_covariate_corrects_bias(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import CupedAdjuster
    # same y=x relationship, but variant a got luckier units (higher
    # x): raw diff is inflated, CUPED removes exactly theta*(dx)
    df = spark.createDataFrame(
        [("a", 3.0, 3.0), ("a", 4.0, 4.0),
         ("b", 1.0, 1.0), ("b", 2.0, 2.0)],
        "variant string, x double, y double")
    r = (CupedAdjuster().setMetricCol("y").setCovariateCol("x")
         .setVariants("a", "b").evaluate(df).first())
    assert abs(r["theta"] - 1.0) < 1e-12
    assert abs(r["diff_raw"] - 2.0) < 1e-12
    assert abs(r["diff_adj"] - 0.0) < 1e-12   # no real effect
    # constant covariate -> theta NULL, adjusted stats NULL
    c = spark.createDataFrame(
        [("a", 5.0, 1.0), ("b", 5.0, 2.0), ("a", 5.0, 3.0),
         ("b", 5.0, 4.0)], "variant string, x double, y double")
    r = (CupedAdjuster().setMetricCol("y").setCovariateCol("x")
         .setVariants("a", "b").evaluate(c).first())
    assert r["theta"] is None and r["diff_adj"] is None
    assert abs(r["diff_raw"] - (-1.0)) < 1e-12
    with _pt.raises(ValueError, match="differ"):
        CupedAdjuster().setVariants("a", "a")
    with _pt.raises(ValueError, match="setVariants"):
        CupedAdjuster().evaluate(df)


# ---------------------------------------------------------------------------
# DiffInDiffAnalyzer / CovariateBalanceChecker
# ---------------------------------------------------------------------------

def test_did_golden(spark):
    from flink_ml__spark.functions.stats import DiffInDiffAnalyzer
    df = spark.createDataFrame(
        [("t", False, 1.0), ("t", False, 2.0),
         ("t", True, 4.0), ("t", True, 5.0),
         ("c", False, 1.0), ("c", False, 3.0),
         ("c", True, 2.0), ("c", True, 4.0)],
        "variant string, post boolean, y double")
    r = (DiffInDiffAnalyzer().setMetricCol("y").setGroupCol("variant")
         .setTreatedLabel("t").setPostCol("post").evaluate(df).first())
    assert (r["n_tpre"], r["n_tpost"], r["n_cpre"], r["n_cpost"]) == \
        (2, 2, 2, 2)
    assert abs(r["mean_tpre"] - 1.5) < 1e-12
    assert abs(r["did"] - 2.0) < 1e-12
    # se = sqrt(0.25 + 0.25 + 1 + 1)
    assert abs(r["se"] - 2.5 ** 0.5) < 1e-12
    assert bool(r["significant"]) is False


def test_did_degenerate_cell(spark):
    from flink_ml__spark.functions.stats import DiffInDiffAnalyzer
    # a 1-row cell -> no variance estimate -> NULL se, not significant
    df = spark.createDataFrame(
        [("t", False, 1.0), ("t", True, 9.0), ("t", True, 9.0),
         ("c", False, 1.0), ("c", False, 2.0), ("c", True, 1.5)],
        "variant string, post boolean, y double")
    r = (DiffInDiffAnalyzer().setMetricCol("y").setGroupCol("variant")
         .setTreatedLabel("t").setPostCol("post").evaluate(df).first())
    assert r["se"] is None and bool(r["significant"]) is False
    assert abs(r["did"] - (9.0 - 1.0 - (1.5 - 1.5))) < 1e-12


def test_covariate_balance_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import CovariateBalanceChecker
    df = spark.createDataFrame(
        [("t", 1.0, 7.0), ("t", 2.0, 8.0), ("t", 3.0, 9.0),
         ("c", 3.0, 7.0), ("c", 4.0, 8.0), ("c", 5.0, 9.0),
         ("x", 99.0, 99.0)],   # unrelated variant ignored
        "variant string, x double, z double")
    out = {r["covariate"]: r for r in
           (CovariateBalanceChecker().setInputCols("x", "z")
            .setVariantCol("variant").setLabels("t", "c")
            .evaluate(df).collect())}
    # x: means 2 vs 4, both variances 1 -> smd = -2
    assert abs(out["x"]["smd"] - (-2.0)) < 1e-12
    assert bool(out["x"]["imbalanced"]) is True
    # z: identical distributions -> smd = 0
    assert abs(out["z"]["smd"]) < 1e-12
    assert bool(out["z"]["imbalanced"]) is False
    assert out["z"]["n_t"] == 3 and out["z"]["n_c"] == 3
    with _pt.raises(ValueError, match="differ"):
        CovariateBalanceChecker().setLabels("a", "a")
    with _pt.raises(ValueError, match="setLabels"):
        (CovariateBalanceChecker().setInputCols("x").evaluate(df))


# ---------------------------------------------------------------------------
# FdrController
# ---------------------------------------------------------------------------

def test_bh_fdr_golden(spark):
    from flink_ml__spark.functions.stats import FdrController
    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.5),
         ("e", 0.9), ("f", None), ("g", 1.5)],
        "test string, p_value double")
    out = {r["test"]: r for r in
           (FdrController().setAlpha(0.1).setTieCols("test")
            .transform(df).collect())}
    # NULL / out-of-range p rows are not tests
    assert set(out) == set("abcde")
    # suffix-min BH: q = .05,.05,.05,.625,.9
    assert abs(out["a"]["q_value"] - 0.05) < 1e-12
    assert abs(out["b"]["q_value"] - 0.05) < 1e-12
    assert abs(out["c"]["q_value"] - 0.05) < 1e-12
    assert abs(out["d"]["q_value"] - 0.625) < 1e-12
    assert abs(out["e"]["q_value"] - 0.9) < 1e-12
    assert [out[k]["discovery"] for k in "abcde"] == \
        [True, True, True, False, False]
    assert out["a"]["p_rank"] == 1 and out["e"]["p_rank"] == 5


def test_bh_fdr_ties_share_q_and_validation(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import FdrController
    df = spark.createDataFrame(
        [("a", 0.04), ("b", 0.04)], "test string, p_value double")
    out = {r["test"]: r for r in
           (FdrController().setAlpha(0.05).setTieCols("test")
            .transform(df).collect())}
    # tied p always share the BH-adjusted q (the suffix min)
    assert abs(out["a"]["q_value"] - 0.04) < 1e-12
    assert abs(out["b"]["q_value"] - 0.04) < 1e-12
    assert out["a"]["discovery"] and out["b"]["discovery"]
    with _pt.raises(ValueError, match="alpha"):
        FdrController().setAlpha(0.0)


# ---------------------------------------------------------------------------
# SrmChecker / MdeCalculator
# ---------------------------------------------------------------------------

def test_srm_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import SrmChecker
    # 550/450 at 50/50: chi2 = 2*(50^2/500) = 10 -> NOT SRM at 0.001
    df = spark.createDataFrame(
        [("a",)] * 55 + [("b",)] * 45, "variant string")
    big = df
    r = (SrmChecker().setVariants("a", "b").setRatioA(0.5)
         .evaluate(big).first())
    assert r["n_a"] == 55 and r["n_b"] == 45
    assert abs(r["chi2"] - (25 + 25) / 50) < 1e-12  # = 1.0 at n=100
    assert bool(r["srm"]) is False
    # gross mismatch at a 90/10 config
    skew = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "variant string")
    r = (SrmChecker().setVariants("a", "b").setRatioA(0.9)
         .evaluate(skew).first())
    assert bool(r["srm"]) is True
    with _pt.raises(ValueError, match="ratioA"):
        SrmChecker().setRatioA(1.0)


def test_mde_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import MdeCalculator
    rows = [("a", float(i % 10)) for i in range(100)] + \
           [("b", float(i % 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "variant string, y double")
    op = (MdeCalculator().setMetricCol("y").setVariants("a", "b")
          .setAlpha(0.05).setPower(0.8))
    r = op.evaluate(df).first()
    assert r["n_a"] == 100 and r["n_b"] == 100
    import statistics
    vals = [float(i % 10) for i in range(200)]
    sd = statistics.stdev(vals)
    want = op.z_multiplier() * sd * (2 / 100) ** 0.5
    assert abs(r["mde_abs"] - want) < 1e-9
    assert abs(r["mde_rel"] - want / statistics.mean(vals)) < 1e-9
    # z multiplier matches the textbook 2.8016 at (0.05, 0.8)
    assert abs(op.z_multiplier() - 2.8015852) < 1e-6
    with _pt.raises(ValueError, match="power"):
        MdeCalculator().setPower(0.0)


# ---------------------------------------------------------------------------
# RatioMetricAnalyzer
# ---------------------------------------------------------------------------

def test_ratio_metric_delta_method_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import RatioMetricAnalyzer
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 4.0),
         ("b", 1.0, 5.0), ("b", 2.0, 5.0)],
        "variant string, num double, den double")
    r = (RatioMetricAnalyzer().setVariants("a", "b")
         .evaluate(df).first())
    assert r["n_a"] == 3 and r["n_b"] == 2
    assert abs(r["ratio_a"] - 0.6) < 1e-12
    assert abs(r["ratio_b"] - 0.3) < 1e-12
    # hand delta method: var_a = 0.28/(3*(10/3)^2), var_b = 0.5/50
    va = (1 - 2 * 0.6 * 1 + 0.36 * (4 / 3)) / (3 * (10 / 3) ** 2)
    vb = 0.5 / (2 * 25)
    assert abs(r["se"] - (va + vb) ** 0.5) < 1e-12
    assert abs(r["z_stat"] - 0.3 / (va + vb) ** 0.5) < 1e-12
    assert bool(r["significant"]) is True
    # single-unit side -> NULL se, never false significance
    tiny = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 1.0, 2.0), ("b", 3.0, 5.0)],
        "variant string, num double, den double")
    r = (RatioMetricAnalyzer().setVariants("a", "b")
         .evaluate(tiny).first())
    assert r["se"] is None and bool(r["significant"]) is False
    with _pt.raises(ValueError, match="differ"):
        RatioMetricAnalyzer().setVariants("a", "a")


# ---------------------------------------------------------------------------
# LorenzCurveAnalyzer
# ---------------------------------------------------------------------------

def test_lorenz_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import LorenzCurveAnalyzer
    # perfectly equal weights: the curve IS the diagonal
    eq = spark.createDataFrame([(float(5),)] * 8, "w double")
    rows = (LorenzCurveAnalyzer().setWeightCol("w").setNumBins(4)
            .evaluate(eq).collect())
    # all ties share one bucket: single row at (1, 1)
    assert len(rows) == 1
    assert abs(rows[0]["cum_pop_share"] - 1.0) < 1e-12
    assert abs(rows[0]["cum_weight_share"] - 1.0) < 1e-12
    # concentrated: 7 units of 1 + one whale of 93
    con = spark.createDataFrame(
        [(1.0,)] * 7 + [(93.0,)], "w double")
    out = (LorenzCurveAnalyzer().setWeightCol("w").setNumBins(4)
           .evaluate(con).collect())
    last = max(out, key=lambda r: r["bucket"])
    first = min(out, key=lambda r: r["bucket"])
    # the lightest bucket holds 7/8 of units but 7% of weight
    assert first["n_units"] == 7
    assert abs(first["cum_pop_share"] - 7 / 8) < 1e-12
    assert abs(first["cum_weight_share"] - 0.07) < 1e-12
    assert last["n_units"] == 1
    assert abs(last["cum_weight_share"] - 1.0) < 1e-12
    with _pt.raises(ValueError, match="numBins"):
        LorenzCurveAnalyzer().setNumBins(1)


# ---------------------------------------------------------------------------
# QuantileComparison / EmpiricalBayesRateShrinker
# ---------------------------------------------------------------------------

def test_qq_comparison_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import QuantileComparison
    # B = 2*A + 1 exactly: every quantile must satisfy q_b = 2 q_a + 1
    rows = [("a", float(i)) for i in range(1, 22)] + \
           [("b", float(2 * i + 1)) for i in range(1, 22)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = (QuantileComparison().setValueCol("v").setGroupCol("g")
           .setGroups("a", "b").setProbs(0.25, 0.5, 0.75)
           .evaluate(df).collect())
    assert len(out) == 3
    for r in out:
        assert abs(r["q_b"] - (2 * r["q_a"] + 1)) < 1e-9
        assert abs(r["diff"] - (r["q_a"] - r["q_b"])) < 1e-12
    med = [r for r in out if r["p"] == 0.5][0]
    assert abs(med["q_a"] - 11.0) < 1e-12 and abs(med["q_b"] - 23.0) < 1e-12
    with _pt.raises(ValueError, match="probs"):
        QuantileComparison().setProbs(0.0)
    with _pt.raises(ValueError, match="setGroups"):
        QuantileComparison().evaluate(df)


def test_eb_shrinkage_pulls_small_groups_to_prior(spark):
    from flink_ml__spark.functions.stats import EmpiricalBayesRateShrinker
    # many mid-size groups around rate ~0.3 plus one tiny extreme group
    rows = [(f"g{i}", 100, 25 + (i % 11)) for i in range(30)]
    rows.append(("tiny", 2, 2))      # raw rate 1.0 on 2 trials
    rows.append(("empty", 0, 0))     # no trials -> NULL rates
    df = spark.createDataFrame(rows, "g string, trials int, successes int")
    op = (EmpiricalBayesRateShrinker().setTrialsCol("trials")
          .setSuccessCol("successes"))
    pr = op.prior(df).first()
    assert pr["alpha"] is not None and pr["alpha"] > 0
    out = {r["g"]: r for r in op.transform(df).collect()}
    t = out["tiny"]
    # the extreme tiny group shrinks far toward the ~0.3 prior mean
    assert t["raw_rate"] == 1.0
    assert t["shrunk_rate"] < 0.6
    # a big group barely moves
    g0 = out["g0"]
    assert abs(g0["shrunk_rate"] - g0["raw_rate"]) < 0.05
    assert out["empty"]["raw_rate"] is None
    # exact posterior formula
    a, b = pr["alpha"], pr["beta"]
    assert abs(t["shrunk_rate"] - (2 + a) / (2 + a + b)) < 1e-12


def test_eb_shrinkage_degenerate_variance_no_false_shrink(spark):
    from flink_ml__spark.functions.stats import EmpiricalBayesRateShrinker
    # identical rates -> zero variance -> shrunk == raw
    df = spark.createDataFrame(
        [("a", 10, 5), ("b", 20, 10)], "g string, trials int, successes int")
    op = EmpiricalBayesRateShrinker().setTrialsCol("trials") \
        .setSuccessCol("successes")
    assert op.prior(df).first()["alpha"] is None
    out = {r["g"]: r for r in op.transform(df).collect()}
    assert all(out[g]["shrunk_rate"] == out[g]["raw_rate"]
               for g in ("a", "b"))


def test_holm_stepdown_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.stats import FdrController
    # classic: p = [0.01, 0.02, 0.03], n=3, alpha=0.05
    # holm adjusted: max-prefix of [0.03, 0.04, 0.03] = [.03, .04, .04]
    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03)],
        "test string, p_value double")
    out = {r["test"]: r for r in
           (FdrController().setAlpha(0.05).setMethod("holm")
            .setTieCols("test").transform(df).collect())}
    assert abs(out["a"]["q_value"] - 0.03) < 1e-12
    assert abs(out["b"]["q_value"] - 0.04) < 1e-12
    assert abs(out["c"]["q_value"] - 0.04) < 1e-12
    assert all(out[k]["discovery"] for k in "abc")
    # holm is never more liberal than bonferroni's first step and is
    # monotone non-decreasing in rank
    assert out["a"]["q_value"] <= out["b"]["q_value"] \
        <= out["c"]["q_value"]
    with _pt.raises(ValueError, match="method"):
        FdrController().setMethod("hochberg")
