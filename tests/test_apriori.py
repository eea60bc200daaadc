"""Apriori golden tests (``/root/reference/test/java/cn/swust/algorithms/
apriori/AprioriTest.java``)."""

import math

import pytest

from flink_ml__spark.operators.apriori import Apriori

# ``AprioriTest.java:36-41``
BASKETS = [("A/C/D",), ("B/C/E",), ("A/B/C/E",), ("B/E",)]

# ``AprioriTest.java:43-108`` — (itemSet, count, support, confidence, lift,
# prefix, suffix); ratios at 1e-3
GOLDEN = [
    (("E", "B", "C"), 2, 0.5, 1.0, 1.333, ("E",), ("B", "C")),
    (("B", "C", "E"), 2, 0.5, 1.0, 1.333, ("B",), ("C", "E")),
    (("C", "E", "B"), 2, 0.5, 0.667, 1.333, ("C", "E"), ("B",)),
    (("B", "C", "E"), 2, 0.5, 0.667, 1.333, ("B", "C"), ("E",)),
    (("C", "A"), 2, 0.5, 1.0, 1.333, ("C",), ("A",)),
    (("A", "C"), 2, 0.5, 0.667, 1.333, ("A",), ("C",)),
    (("E", "B"), 3, 0.75, 1.0, 1.333, ("E",), ("B",)),
    (("B", "E"), 3, 0.75, 1.0, 1.333, ("B",), ("E",)),
]


def make_op():
    # ``AprioriTest.java:156-162``
    return (Apriori().setInputCols("items").setItemSeparator("/")
            .setMinSupport(0.3).setMinConfidence(0.4).setLift(1.2))


def test_params():
    op = Apriori()
    assert op.getMinSupport() == 0.5
    assert op.getMinConfidence() == 0.5
    assert op.getLift() == 1.0
    assert op.getMaxIter() == 20
    assert op.getItemSeparator() is None
    op = make_op()
    assert (op.getMinSupport(), op.getMinConfidence(), op.getLift()) == (0.3, 0.4, 1.2)


def test_golden_rules(spark):
    df = spark.createDataFrame(BASKETS, ["items"])
    out = make_op().transform(df)
    assert out.columns == [
        "itemSet", "count", "support", "confidence", "lift", "prefix", "suffix"]
    rows = out.collect()
    got = {(tuple(r["prefix"]), tuple(r["suffix"])): r for r in rows}
    assert len(rows) == len(GOLDEN), sorted(got)
    for item_set, count, support, conf, lift, prefix, suffix in GOLDEN:
        r = got[(prefix, suffix)]
        assert tuple(r["itemSet"]) == item_set
        assert r["count"] == count
        assert math.isclose(r["support"], support, abs_tol=1e-3)
        assert math.isclose(r["confidence"], conf, abs_tol=1e-3)
        assert math.isclose(r["lift"], lift, abs_tol=1e-3)


def test_transform_leaves_no_cached_tables(spark):
    """transform() must not leak CacheManager entries: repeated calls
    previously accumulated persisted `freq` tables until LRU eviction.
    Snapshot-and-compare (entry count before vs after) instead of a
    global isEmpty() assert, so another module's legitimate long-lived
    cache can't fail this test under randomized ordering."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    before = cm.cachedData().size()
    df = spark.createDataFrame(BASKETS, ["items"])
    for _ in range(3):
        make_op().transform(df).collect()
    assert cm.cachedData().size() == before


def test_singletons_with_default_lift(spark):
    # with lift threshold 1.0 (default), frequent 1-itemsets surface with
    # confidence = support, lift = 1.0 (``Apriori.java:100-106``)
    df = spark.createDataFrame(BASKETS, ["items"])
    op = (Apriori().setInputCols("items").setItemSeparator("/")
          .setMinSupport(0.5).setMinConfidence(0.5).setLift(1.0))
    rows = op.transform(df).collect()
    singles = {tuple(r["itemSet"]): r for r in rows if len(r["itemSet"]) == 1}
    assert ("B",) in singles and ("C",) in singles and ("E",) in singles
    b = singles[("B",)]
    assert b["count"] == 3 and b["confidence"] == 0.75 and b["lift"] == 1.0
    assert list(b["prefix"]) == [] and list(b["suffix"]) == []


def test_frequent_itemsets(spark):
    df = spark.createDataFrame(BASKETS, ["items"])
    fi = make_op().frequent_itemsets(df)
    got = {tuple(r["itemSet"]): (r["count"], r["support"]) for r in fi.collect()}
    assert got[("B", "C", "E")] == (2, 0.5)
    assert got[("B", "E")] == (3, 0.75)
    assert ("A", "C", "D") not in got  # support 0.25 < 0.3


def test_validation(spark):
    df = spark.createDataFrame(BASKETS, ["items"])
    with pytest.raises(ValueError, match="itemSeparator"):
        Apriori().setInputCols("items").transform(df)
    with pytest.raises(ValueError, match="maxBasketSize"):
        (Apriori().setInputCols("items").setItemSeparator("/")
         .setMaxBasketSize(2).transform(df))


def test_save_load(spark, tmp_path):
    path = str(tmp_path / "apriori")
    make_op().save(path)
    op = Apriori.load(spark, path)
    assert op.getMinSupport() == 0.3
    assert op.getItemSeparator() == "/"
    df = spark.createDataFrame(BASKETS, ["items"])
    assert op.transform(df).count() == len(GOLDEN)
