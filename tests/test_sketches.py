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


def test_stream_heavy_hitters_bounds_and_completeness(spark):
    import shutil
    import tempfile

    from flink_ml__spark.functions.sketches import stream_heavy_hitters

    rng = random.Random(3)
    items = (["alpha"] * 400 + ["beta"] * 250
             + [f"tail{i}" for i in range(1500)])
    rng.shuffle(items)
    df = spark.createDataFrame([(i,) for i in items], "item string")
    op = (HeavyHitters().setItemCol("item").setMinShare(0.05)
          .setNumCounters(64))

    d = tempfile.mkdtemp(prefix="stream_hh_")
    try:
        # two files -> availableNow processes them as micro-batches
        df.filter(F.crc32(F.col("item")) % 2 == 0) \
          .coalesce(1).write.mode("overwrite").parquet(d + "/p0")
        df.filter(F.crc32(F.col("item")) % 2 == 1) \
          .coalesce(1).write.parquet(d + "/p0", mode="append")
        stream = spark.readStream.schema(df.schema).parquet(d + "/p0")
        seen = []
        q = (stream.writeStream
             .foreachBatch(stream_heavy_hitters(op, lambda s, b:
                                                seen.append(s)))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert seen
        final = {item: (lo, hi) for item, lo, hi in seen[-1]}
        exact = _exact(items, 0.05)
        # completeness: every true heavy hitter is present with a
        # bracketing interval
        for item, cnt in exact.items():
            lo, hi = final[item]
            assert lo <= cnt <= hi
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_distinct_counter_exact_and_groups(spark):
    from flink_ml__spark.functions.sketches import DistinctCounter

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 3), ("b", None)],
        "g string, k int")
    op = DistinctCounter().setKeyCol("k").setGroupCols("g")
    got = {r["g"]: r["n_distinct"] for r in op.transform(df).collect()}
    assert got == {"a": 2, "b": 1}    # NULL keys ignored
    # global (no groups)
    tot = (DistinctCounter().setKeyCol("k").setGroupCols()
           .transform(df).collect())
    assert tot[0]["n_distinct"] == 3


def test_distinct_counter_approx_within_rsd(spark):
    from flink_ml__spark.functions.sketches import DistinctCounter

    df = spark.range(0, 20000).selectExpr("id % 4 AS g", "id AS k")
    rep = (DistinctCounter().setKeyCol("k").setGroupCols("g")
           .setRelativeSD(0.05).error_report(df))
    rows = rep.collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_exact"] == 5000
        assert r["rel_err"] <= 0.25   # 5x rsd, the gate's band


def test_skew_profiler_top_keys_and_share(spark):
    from flink_ml__spark.functions.sketches import SkewProfiler

    df = spark.createDataFrame(
        [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1, "k string")
    got = (SkewProfiler().setKeyCols("k").setTopN(2).transform(df)
           .orderBy(F.desc("cnt")).collect())
    assert [(r["k"], r["cnt"]) for r in got] == [("hot", 6), ("warm", 3)]
    assert got[0]["share"] == 0.6


def test_skew_profiler_summary(spark):
    from flink_ml__spark.functions.sketches import SkewProfiler

    df = spark.createDataFrame(
        [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1, "k string")
    s = SkewProfiler().setKeyCols("k").summary(df).collect()[0]
    assert s["n_rows"] == 10 and s["n_keys"] == 3
    assert s["max_cnt"] == 6 and abs(s["skew_factor"] - 1.8) < 1e-9
    assert abs(s["max_share"] - 0.6) < 1e-9


def test_count_min_never_underestimates_and_exact_when_sparse(spark):
    """Few keys vs a wide sketch: estimates equal the exact counts;
    the no-underestimate guarantee is checked for every key."""
    from flink_ml__spark.functions.sketches import CountMinSketch

    rows = [(k,) for k in
            ["a"] * 30 + ["b"] * 20 + ["c"] * 5 + ["d"] * 1]
    df = spark.createDataFrame(rows, "item string")
    cms = (CountMinSketch().setInputCol("item")
           .setDepth(4).setWidth(512).setSeed(7).build(df))
    out = {r["item"]: r["cms_est"]
           for r in cms.transform(df.distinct()).collect()}
    assert out == {"a": 30, "b": 20, "c": 5, "d": 1}
    assert cms._total == 56


def test_count_min_collisions_only_overestimate(spark):
    """A deliberately tiny sketch forces collisions: estimates may
    exceed but never undershoot the true counts."""
    from flink_ml__spark.functions.sketches import CountMinSketch

    rows = [(f"k{i}",) for i in range(200) for _ in range(i % 7 + 1)]
    df = spark.createDataFrame(rows, "item string")
    cms = (CountMinSketch().setInputCol("item")
           .setDepth(3).setWidth(16).setSeed(11).build(df))
    true = {r["item"]: r["count"] for r in
            df.groupBy("item").count().collect()}
    est = {r["item"]: r["cms_est"]
           for r in cms.transform(df.distinct()).collect()}
    assert all(est[k] >= true[k] for k in true)
    assert any(est[k] > true[k] for k in true)   # the sketch IS lossy here


def test_count_min_merge_equals_single_build(spark):
    """Linear mergeability: sketch(A) + sketch(B) == sketch(A ∪ B)."""
    from flink_ml__spark.functions.sketches import CountMinSketch

    rows = [(f"k{i % 40}",) for i in range(500)]
    df = spark.createDataFrame(rows, "item string")
    a = df.filter(F.crc32("item") % 2 == 0)
    b = df.filter(F.crc32("item") % 2 == 1)

    def mk():
        return (CountMinSketch().setInputCol("item")
                .setDepth(4).setWidth(256).setSeed(5))

    whole = mk().build(df)
    merged = mk().build(a).merge(mk().build(b))
    assert merged._matrix == whole._matrix
    assert merged._total == whole._total


def test_count_min_merge_rejects_mismatched_params(spark):
    from flink_ml__spark.functions.sketches import CountMinSketch

    df = spark.createDataFrame([("x",)], "item string")
    a = CountMinSketch().setInputCol("item").setWidth(64).build(df)
    b = CountMinSketch().setInputCol("item").setWidth(128).build(df)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="identical"):
        a.merge(b)


def test_count_min_null_items_ignored_and_null_est(spark):
    from flink_ml__spark.functions.sketches import CountMinSketch

    df = spark.createDataFrame([("a",), (None,), ("a",)], "item string")
    cms = (CountMinSketch().setInputCol("item")
           .setDepth(3).setWidth(64).setSeed(2).build(df))
    assert cms._total == 2          # NULLs don't count
    rows = {r["item"]: r["cms_est"] for r in cms.transform(df).collect()}
    assert rows["a"] == 2
    assert rows[None] is None


def test_count_min_save_load_round_trip(spark, tmp_path):
    from flink_ml__spark.functions.sketches import CountMinSketch

    df = spark.createDataFrame([(f"k{i % 9}",) for i in range(90)],
                               "item string")
    cms = (CountMinSketch().setInputCol("item")
           .setDepth(3).setWidth(128).setSeed(3).build(df))
    p = str(tmp_path / "cms")
    cms.save(p)
    back = CountMinSketch.load(spark, p)
    assert back._matrix == cms._matrix
    assert back._total == cms._total


def test_stream_count_min_matches_batch(spark):
    """Folding per-micro-batch sketches equals one batch build over
    the whole stream (linear merge), so stream estimates == batch."""
    import shutil
    import tempfile

    from flink_ml__spark.functions.sketches import (
        CountMinSketch,
        stream_count_min,
    )

    rows = [(f"u{i % 25}",) for i in range(400)]
    df = spark.createDataFrame(rows, "item string")
    op = (CountMinSketch().setInputCol("item")
          .setDepth(4).setWidth(256).setSeed(13))
    d = tempfile.mkdtemp(prefix="stream_cms_")
    try:
        df.filter(F.crc32("item") % 2 == 0) \
          .coalesce(1).write.mode("overwrite").parquet(d + "/p")
        df.filter(F.crc32("item") % 2 == 1) \
          .coalesce(1).write.parquet(d + "/p", mode="append")
        stream = spark.readStream.schema(df.schema).parquet(d + "/p")
        holder = {}
        q = (stream.writeStream
             .foreachBatch(stream_count_min(
                 op, lambda s, b: holder.__setitem__("op", s)))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        batch = (CountMinSketch().setInputCol("item")
                 .setDepth(4).setWidth(256).setSeed(13).build(df))
        # the emitted operator IS the running merge; its matrix must
        # equal one batch build over everything (linear sketch)
        assert holder["op"]._total == 400
        assert holder["op"]._matrix == batch._matrix
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cms_gate_query_empty(spark):
    from flink_ml__spark.plans.queries import q_cms_invariants_events

    df = q_cms_invariants_events(spark, "/root/testdata/sf0.001")
    assert df.columns == ["user_id", "check", "detail"]
    assert df.collect() == []


# ---------------------------------------------------------------------------
# SketchOverlapEstimator
# ---------------------------------------------------------------------------

def test_overlap_estimator_small_exact(spark):
    # HLL++ is exact in its sparse regime, so small sets pin the
    # inclusion-exclusion arithmetic precisely
    from flink_ml__spark.functions.sketches import SketchOverlapEstimator
    rows = [("a", i) for i in range(1, 101)] + \
           [("b", i) for i in range(51, 151)] + \
           [("c", 999), ("a", None)]
    df = spark.createDataFrame(rows, "lbl string, k bigint")
    op = (SketchOverlapEstimator().setKeyCol("k").setLabelCol("lbl")
          .setLabels("a", "b").setRelativeSD(0.01))
    r = op.evaluate(df).first()
    # HLL++ is near-exact here but the register estimate may be off by
    # ~1 around the sparse boundary; the exact legs pin the arithmetic
    assert abs(r["n_a"] - 100) <= 2 and abs(r["n_b"] - 100) <= 2
    assert abs(r["n_union"] - 150) <= 3
    assert abs(r["n_intersect"] - 50) <= 5
    assert abs(r["jaccard"] - 50 / 150) < 0.04
    e = op.error_report(df).first()
    assert (e["a_exact"], e["b_exact"], e["u_exact"]) == (100, 100, 150)
    assert e["i_exact"] == 50
    assert e["a_rel_err"] <= 0.02 and e["i_rel_err"] <= 0.1


def test_overlap_estimator_disjoint_and_validation(spark):
    import pytest as _pt
    from flink_ml__spark.functions.sketches import SketchOverlapEstimator
    rows = [("a", i) for i in range(10)] + \
           [("b", i) for i in range(100, 110)]
    df = spark.createDataFrame(rows, "lbl string, k bigint")
    op = (SketchOverlapEstimator().setKeyCol("k").setLabelCol("lbl")
          .setLabels("a", "b").setRelativeSD(0.01))
    r = op.evaluate(df).first()
    # inclusion-exclusion clamps at 0 for disjoint slices
    assert r["n_intersect"] == 0 and r["jaccard"] == 0.0
    with _pt.raises(ValueError, match="differ"):
        SketchOverlapEstimator().setLabels("x", "x")
    with _pt.raises(ValueError, match="setLabels"):
        SketchOverlapEstimator().evaluate(df)
