"""HeavyHitters: exactness vs exhaustive counting, the MG
no-false-negative guarantee under adversarial tails, and the merge
helper's weighted semantics."""

import random

import pytest
from pyspark.sql import functions as F

from flink_ml__spark.functions.sketches import HeavyHitters, _mg_update


def _exact(items, min_share):
    n = len(items)
    counts = {}
    for it in items:
        counts[it] = counts.get(it, 0) + 1
    return {it: c for it, c in counts.items() if c >= min_share * n}


def test_mg_update_weighted_semantics():
    c = {}
    for it, w in [("a", 5), ("b", 3), ("c", 2)]:
        _mg_update(c, it, w, 2)
    # capacity 2: inserting c=2 decrements by min(2, min(5,3))=2
    assert c == {"a": 3, "b": 1}
    _mg_update(c, "d", 10, 2)
    # d displaces b (dec 1), remainder 9 re-inserts
    assert c == {"a": 2, "d": 9}


def test_heavy_hitters_equals_exact_on_item_column(spark):
    rng = random.Random(7)
    # heavy head + long adversarial tail of distinct singletons
    items = (["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 120
             + [f"tail{i}" for i in range(2000)])
    rng.shuffle(items)
    df = spark.createDataFrame([(i,) for i in items], "item string")
    op = (HeavyHitters().setItemCol("item").setMinShare(0.03)
          .setNumCounters(64))
    got = {r["item"]: r["count"] for r in op.transform(df).collect()}
    assert got == _exact(items, 0.03)
    assert set(got) == {"alpha", "beta", "gamma"}


def test_heavy_hitters_share_and_randomized(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(50)]
    items = [rng.choice(vocab) for _ in range(5000)]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    op = (HeavyHitters().setItemCol("item").setMinShare(0.015)
          .setNumCounters(200))
    rows = op.transform(df).collect()
    want = _exact(items, 0.015)
    assert {r["item"]: r["count"] for r in rows} == want
    for r in rows:
        assert r["share"] == pytest.approx(r["count"] / len(items))


def test_heavy_hitters_tokenizes_text_by_default(spark):
    df = spark.createDataFrame(
        [(1, "spark spark spark flink"), (2, "spark beats FLINK"),
         (3, None)],
        "doc_id long, text string")
    rows = {r["item"]: r["count"] for r in
            (HeavyHitters().setMinShare(0.25).setNumCounters(16)
             .transform(df).collect())}
    assert rows == {"spark": 4, "flink": 2}   # lowercased, NULL skipped


def test_heavy_hitters_capacity_guard_and_empty(spark):
    df = spark.createDataFrame([("x",)], "item string")
    with pytest.raises(ValueError):
        (HeavyHitters().setItemCol("item").setMinShare(0.01)
         .setNumCounters(50).transform(df))
    empty = (HeavyHitters().setItemCol("item").setMinShare(0.5)
             .setNumCounters(4).transform(df.filter(F.lit(False))))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == \
        ["item", "count", "share"]
