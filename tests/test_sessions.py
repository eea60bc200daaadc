"""Sessionizer: hand-computable goldens, boundary semantics, and
stream-equals-batch."""

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from flink_ml__spark.functions.sessions import Sessionizer


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, base + dt.timedelta(minutes=m), v) for u, m, v in rows],
        "user_id long, ts timestamp, value double")


def test_sessionizer_goldens(spark):
    df = _ev(spark, [
        (1, 0, 1.0), (1, 10, 2.0), (1, 25, 3.0),   # one session (gaps<30)
        (1, 60, 4.0),                              # 35-min gap -> new
        (2, 0, 5.0),                               # single event
    ])
    out = (Sessionizer().setGap("30 minutes").transform(df)
           .orderBy("user_id", "session_start").collect())
    assert len(out) == 3
    s1, s2, s3 = out
    assert s1["user_id"] == 1 and s1["n_events"] == 3
    assert s1["sum_value"] == 6.0
    assert s1["session_start"].minute == 0 and s1["session_last"].minute == 25
    assert s2["n_events"] == 1 and s2["sum_value"] == 4.0
    assert s3["user_id"] == 2 and s3["n_events"] == 1


def test_sessionizer_exact_gap_boundary_merges(spark):
    # Spark session windows are [ts, ts+gap) with touching windows
    # MERGED: an event exactly `gap` after the previous one stays in
    # the same session; one microsecond past the gap starts a new one
    df = _ev(spark, [(1, 0, 1.0), (1, 30, 1.0)])
    assert Sessionizer().setGap("30 minutes").transform(df).count() == 1
    df2 = _ev(spark, [(1, 0, 1.0), (1, 30.0001, 1.0)])
    assert Sessionizer().setGap("30 minutes").transform(df2).count() == 2


def test_sessionizer_stream_matches_batch(spark):
    from flink_ml__spark.sources import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    op = Sessionizer().setGap("30 minutes")
    batch = {(r["user_id"], r["session_start"]): (r["n_events"],
                                                  round(r["sum_value"], 6))
             for r in op.transform(ev).collect()}
    d = tempfile.mkdtemp(prefix="stream_sessions_")
    try:
        ev.coalesce(1).write.mode("overwrite").parquet(d)
        stream = (spark.readStream.schema(ev.schema).parquet(d)
                  .withWatermark("ts", "0 seconds"))
        out = op.transform(stream)
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("sessions")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["user_id"], r["session_start"]): (r["n_events"],
                                                    round(r["sum_value"], 6))
               for r in spark.sql("SELECT * FROM sessions").collect()}
        # a 0s watermark closes every session whose last event precedes
        # the max event time; the final open sessions may be withheld
        assert got
        for k, v in got.items():
            assert batch[k] == v
        assert len(got) >= len(batch) - ev.select("user_id").distinct().count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_asof_join_goldens(spark):
    from flink_ml__spark.functions.joins import AsOfJoiner

    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 1, ts(5)), (2, 1, ts(10)), (3, 1, ts(2)),
         (4, 2, ts(5)),                      # key with no right rows
         (5, 1, ts(20))],
        "id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(3), 30.0), (1, ts(10), 100.0), (1, ts(15), 150.0)],
        "user_id long, ts timestamp, value double")
    got = {r["id"]: r for r in
           AsOfJoiner().join(left, right, ["value"]).collect()}
    assert got[1]["value"] == 30.0            # latest <= t(5) is t(3)
    assert got[2]["value"] == 100.0           # exact tie matches (<=)
    assert got[2]["asof_ts"] == ts(10)
    assert got[3]["value"] is None            # nothing before t(2)
    assert got[4]["value"] is None            # key absent from right
    assert got[5]["value"] == 150.0

    # tolerance nulls out stale matches
    tol = {r["id"]: r for r in
           (AsOfJoiner().setToleranceSec(120.0)
            .join(left, right, ["value"])).collect()}
    assert tol[1]["value"] == 30.0            # 2 min old, fresh
    assert tol[5]["value"] is None            # 5 min old, stale
    assert tol[2]["value"] == 100.0           # same instant


def test_asof_join_single_shuffle(spark):
    from flink_ml__spark.functions.joins import AsOfJoiner
    from flink_ml__spark.sources import load_table
    from pyspark.sql import functions as SF

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    left = ev.filter(SF.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "ts")
    right = ev.filter(SF.col("event_id") % 2 == 0).select(
        "user_id", "ts", "value")
    plan = (AsOfJoiner().join(left, right, ["value"])
            ._jdf.queryExecution().executedPlan().toString())
    # union + one key exchange + running last — never a join node or
    # a per-key range explosion
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_goldens(spark):
    from flink_ml__spark.functions.joins import RangeJoiner

    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    points = spark.createDataFrame(
        [(1, 1, ts(5)), (2, 1, ts(30)), (3, 1, ts(65)),
         (4, 2, ts(5)), (5, 1, ts(10))],
        "event_id long, user_id long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, ts(0), ts(10), "a"),        # contains 1, 5
         (1, ts(5), ts(40), "b"),        # contains 1 (boundary), 2, 5
         (1, ts(90), ts(95), "c"),       # empty
         (2, ts(60), ts(70), "d"),       # wrong key for point 3
         (1, ts(70), ts(60), "bad")],    # end < start: never matches
        "user_id long, range_start timestamp, range_end timestamp, tag string")
    op = RangeJoiner().setBucketWidthSec(600.0)
    got = sorted((r["event_id"], r["tag"]) for r in
                 op.join(points, ivs, ["tag"]).collect())
    assert got == [(1, "a"), (1, "b"), (2, "b"), (5, "a"), (5, "b")]

    # left keeps unmatched points with NULL interval columns
    left = op.setHow("left").join(points, ivs, ["tag"])
    rows = {r["event_id"]: r for r in left.collect()}
    assert len(left.collect()) == 7
    assert rows[3]["tag"] is None and rows[3]["range_start"] is None
    assert rows[4]["tag"] is None


def test_range_join_is_equi_join_not_nested_loop(spark):
    from flink_ml__spark.functions.joins import RangeJoiner
    from flink_ml__spark.sources import load_table
    from pyspark.sql import functions as SF

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    points = ev.select("event_id", "user_id", "ts")
    ivs = (ev.filter(SF.col("event_id") % 7 == 0)
           .select("user_id", SF.col("ts").alias("range_start"),
                   (SF.col("ts") + SF.expr("INTERVAL 2 HOURS"))
                   .alias("range_end"), "value"))
    plan = (RangeJoiner().setBucketWidthSec(3600.0)
            .join(points, ivs, ["value"])
            ._jdf.queryExecution().executedPlan().toString())
    # the bin expansion turns the range predicate into a hash-keyed
    # equi-join; the quadratic fallbacks must not appear
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning" in plan or "broadcast" in plan.lower()


def test_asof_join_forward_and_nearest_goldens(spark):
    from flink_ml__spark.functions.joins import AsOfJoiner

    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 1, ts(5)), (2, 1, ts(10)), (3, 1, ts(2)),
         (4, 2, ts(5)), (5, 1, ts(20)), (6, 1, ts(6.5))],
        "id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(3), 30.0), (1, ts(10), 100.0), (1, ts(15), 150.0)],
        "user_id long, ts timestamp, value double")

    fwd = {r["id"]: r for r in
           (AsOfJoiner().setDirection("forward")
            .join(left, right, ["value"])).collect()}
    assert fwd[1]["value"] == 100.0           # earliest >= t(5) is t(10)
    assert fwd[2]["value"] == 100.0           # equal timestamp matches
    assert fwd[3]["value"] == 30.0
    assert fwd[4]["value"] is None            # key absent
    assert fwd[5]["value"] is None            # nothing after t(20)

    near = {r["id"]: r for r in
            (AsOfJoiner().setDirection("nearest")
             .join(left, right, ["value"])).collect()}
    assert near[1]["value"] == 30.0           # d=2min back vs 5min fwd
    assert near[2]["value"] == 100.0          # exact hit
    assert near[3]["value"] == 30.0           # only forward exists
    assert near[5]["value"] == 150.0          # only backward exists
    assert near[6]["value"] == 30.0           # 3.5min tie -> backward

    # forward tolerance nulls out far-future matches
    ftol = {r["id"]: r for r in
            (AsOfJoiner().setDirection("forward").setToleranceSec(120.0)
             .join(left, right, ["value"])).collect()}
    assert ftol[3]["value"] == 30.0           # 1 min ahead, fresh
    assert ftol[1]["value"] is None           # 5 min ahead, stale

    import pytest as _pytest
    with _pytest.raises(ValueError):
        AsOfJoiner().setDirection("sideways")


def test_asof_join_null_key_and_null_ts_never_match(spark):
    from flink_ml__spark.functions.joins import AsOfJoiner

    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 1, ts(5)),
         (2, None, ts(7)),        # NULL key: like a join, no match
         (3, 1, None)],           # NULL time: comparison is NULL
        "id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(3), 30.0),
         (None, ts(1), 55.0),     # NULL-key right row matches nothing
         (1, None, 99.0)],        # NULL-ts right row matches nothing
        "user_id long, ts timestamp, value double")
    for direction in ["backward", "forward", "nearest"]:
        got = {r["id"]: r for r in
               (AsOfJoiner().setDirection(direction)
                .join(left, right, ["value"])).collect()}
        assert len(got) == 3, direction
        assert got[2]["value"] is None, direction
        assert got[3]["value"] is None, direction
        assert got[1]["value"] != 99.0 and got[1]["value"] != 55.0
    # the valid backward match still works
    b = {r["id"]: r for r in AsOfJoiner().join(left, right, ["value"])
         .collect()}
    assert b[1]["value"] == 30.0


def test_salted_join_equals_plain_inner_and_left(spark):
    from flink_ml__spark.functions.joins import SaltedJoiner

    # hot key: 'a' carries 80% of the big side
    big = spark.createDataFrame(
        [(i, "a" if i % 10 < 8 else ("b" if i % 10 == 8 else "zz"),
          float(i)) for i in range(200)],
        "id long, k string, v double")
    small = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "k string, w double")
    sj = SaltedJoiner().setNumSalts(8)
    for how in ("inner", "left"):
        got = sorted(map(tuple, sj.join(big, small, ["k"], how)
                         .select("id", "k", "v", "w").collect()))
        want = sorted(map(tuple, big.join(small, ["k"], how)
                          .select("id", "k", "v", "w").collect()))
        assert got == want and len(got) > 0
    # 'zz' rows survive a left join exactly once each
    left = sj.join(big, small, ["k"], "left")
    assert left.filter("k = 'zz' AND w IS NULL").count() == 20


def test_salted_join_validation(spark):
    import pytest

    from flink_ml__spark.functions.joins import SaltedJoiner

    big = spark.createDataFrame([(1, "a", 1.0)],
                                "id long, k string, v double")
    clash = spark.createDataFrame([("a", 2.0)], "k string, v double")
    with pytest.raises(ValueError, match="numSalts"):
        SaltedJoiner().setNumSalts(1)
    with pytest.raises(ValueError, match="how"):
        SaltedJoiner().join(big, clash, ["k"], "full")
    with pytest.raises(ValueError, match="both sides"):
        SaltedJoiner().join(big, clash, ["k"])
    with pytest.raises(TypeError, match="binary"):
        SaltedJoiner().transform(big)


def test_salted_join_nondeterministic_mode_spreads_duplicates(spark):
    """deterministic=True content-hash salting maps full-duplicate rows
    to ONE salt (the documented limitation); setDeterministic(False)
    spreads them while preserving the result set."""
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.joins import SaltedJoiner

    # hot key whose rows are all IDENTICAL — the adversarial case
    big = spark.createDataFrame(
        [("hot", 1.0)] * 400 + [("b", 2.0)] * 5,
        "k string, v double").repartition(8)
    small = spark.createDataFrame(
        [("hot", 10.0), ("b", 20.0)], "k string, w double")

    det = SaltedJoiner().setNumSalts(8)
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64("k", "v"), F.lit(8)).cast("int"))
    assert salted.filter("k = 'hot'").select("__salt").distinct() \
                 .count() == 1  # the limitation, pinned

    nd = SaltedJoiner().setNumSalts(8).setDeterministic(False)
    got = sorted(map(tuple, nd.join(big, small, ["k"]).collect()))
    want = sorted(map(tuple, big.join(small, ["k"]).collect()))
    assert got == want and len(got) == 405


def test_bloom_join_filter_equals_plain_join(spark):
    """The pre-filtered inner join must return EXACTLY the plain join
    result — FPs die in the join, FNs are impossible."""
    from flink_ml__spark.functions.joins import BloomJoinFilter

    big = spark.createDataFrame(
        [(i, i % 37) for i in range(500)], ["row_id", "k"])
    small = spark.createDataFrame(
        [(k, f"d{k}") for k in (0, 5, 9, 12, 36)], ["k", "label"])
    op = (BloomJoinFilter().setKeyCols("k")
          .setNumBits(1 << 12).setNumHashes(3).fit(small))
    got = sorted(tuple(r) for r in
                 op.filtered_join(big, small, "inner").collect())
    want = sorted(tuple(r) for r in big.join(small, "k").collect())
    assert got == want


def test_bloom_join_filter_prunes_and_never_misses(spark):
    from flink_ml__spark.functions.joins import BloomJoinFilter

    big = spark.createDataFrame(
        [(i, i) for i in range(2000)], ["row_id", "k"])
    small = spark.createDataFrame([(i * 100,) for i in range(5)], ["k"])
    op = (BloomJoinFilter().setKeyCols("k")
          .setNumBits(1 << 14).setNumHashes(4).fit(small))
    kept = op.transform(big)
    keys = {r["k"] for r in kept.collect()}
    assert {0, 100, 200, 300, 400} <= keys          # no false negatives
    assert kept.count() < 2000                      # real pruning happened


def test_bloom_join_filter_null_keys_dropped_and_guards(spark):
    import pytest as _pytest

    from flink_ml__spark.functions.joins import BloomJoinFilter

    big = spark.createDataFrame([(1, None), (2, 3)],
                                "row_id int, k int")
    small = spark.createDataFrame([(3,)], ["k"])
    op = BloomJoinFilter().setKeyCols("k").setNumBits(1 << 10).fit(small)
    assert [r["row_id"] for r in op.transform(big).collect()] == [2]
    with _pytest.raises(ValueError, match="unsupported join type"):
        op.filtered_join(big, small, "left")
    with _pytest.raises(ValueError, match="fit"):
        BloomJoinFilter().setKeyCols("k").transform(big)
    with _pytest.raises(ValueError, match="no key columns"):
        BloomJoinFilter().fit(small)


def test_bloom_join_filter_save_load_round_trip(spark, tmp_path):
    from flink_ml__spark.functions.joins import BloomJoinFilter

    small = spark.createDataFrame([(i,) for i in range(20)], ["k"])
    big = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    op = (BloomJoinFilter().setKeyCols("k")
          .setNumBits(1 << 12).setNumHashes(3).fit(small))
    p = str(tmp_path / "bloom")
    op.save(p)
    back = BloomJoinFilter.load(spark, p)
    assert back._bits == op._bits
    a = sorted(r["k"] for r in op.transform(big).collect())
    b = sorted(r["k"] for r in back.transform(big).collect())
    assert a == b


def test_bloom_join_filter_multi_column_keys(spark):
    from flink_ml__spark.functions.joins import BloomJoinFilter

    big = spark.createDataFrame(
        [(i, i % 5, i % 3) for i in range(300)], ["row_id", "a", "b"])
    small = spark.createDataFrame([(1, 2, "x"), (4, 0, "y")],
                                  ["a", "b", "label"])
    op = (BloomJoinFilter().setKeyCols("a", "b")
          .setNumBits(1 << 12).fit(small))
    got = sorted(tuple(r) for r in
                 op.filtered_join(big, small, "inner").collect())
    want = sorted(tuple(r) for r in
                  big.join(small, ["a", "b"]).collect())
    assert got == want


# ------------------------------------------------------------ intervals

def test_interval_merger_basic_overlap_touch_disjoint(spark):
    from flink_ml__spark.functions.sessions import IntervalMerger

    rows = [
        ("a", 0, 10), ("a", 5, 12),      # overlap -> one span
        ("a", 12, 15),                   # touching -> still merges
        ("a", 20, 25),                   # disjoint -> new span
        ("b", 3, 4),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    m = (IntervalMerger().setKeyCol("k").setStartCol("s")
         .setEndCol("e").transform(df))
    got = sorted((r["k"], r["span_start"], r["span_end"],
                  r["n_intervals"]) for r in m.collect())
    assert got == [("a", 0, 15, 3), ("a", 20, 25, 1), ("b", 3, 4, 1)]


def test_interval_merger_contained_and_duplicate_intervals(spark):
    from flink_ml__spark.functions.sessions import IntervalMerger

    rows = [("a", 0, 100), ("a", 10, 20), ("a", 10, 20), ("a", 30, 40)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    m = (IntervalMerger().setKeyCol("k").setStartCol("s")
         .setEndCol("e").transform(df))
    got = [(r["span_start"], r["span_end"], r["n_intervals"])
           for r in m.collect()]
    assert got == [(0, 100, 4)]


def test_interval_merger_drops_null_and_inverted(spark):
    from flink_ml__spark.functions.sessions import IntervalMerger

    rows = [("a", 0, 5), ("a", 9, 2), (None, 0, 5), ("a", None, 5),
            ("a", 0, None)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    m = (IntervalMerger().setKeyCol("k").setStartCol("s")
         .setEndCol("e").transform(df))
    got = [(r["k"], r["span_start"], r["span_end"]) for r in m.collect()]
    assert got == [("a", 0, 5)]


def test_interval_merger_timestamps(spark):
    import datetime as dt

    from flink_ml__spark.functions.sessions import IntervalMerger

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [("u", ts(0), ts(30)), ("u", ts(15), ts(45)),
            ("u", ts(60), ts(70))]
    df = spark.createDataFrame(
        rows, "k string, s timestamp, e timestamp")
    m = (IntervalMerger().setKeyCol("k").setStartCol("s")
         .setEndCol("e").transform(df))
    got = sorted((r["span_start"], r["span_end"]) for r in m.collect())
    assert got == [(ts(0), ts(45)), (ts(60), ts(70))]


# ------------------------------------------------------- overlap join

def test_interval_overlap_join_plain(spark):
    from flink_ml__spark.functions.sessions import IntervalOverlapJoiner

    left = spark.createDataFrame(
        [("a", 0, 10), ("a", 20, 30), ("b", 0, 5)],
        "k string, s long, e long")
    right = spark.createDataFrame(
        [("a", 5, 15), ("a", 10, 12), ("a", 31, 40), ("b", 6, 9)],
        "k string, s long, e long")
    j = (IntervalOverlapJoiner().setKeyCol("k").setStartCol("s")
         .setEndCol("e"))
    got = sorted((r["k"], r["l_start"], r["r_start"],
                  r["overlap_start"], r["overlap_end"])
                 for r in j.join(left, right).collect())
    # (0,10) overlaps (5,15) and touches (10,12); (20,30) neither;
    # b: (0,5) vs (6,9) disjoint
    assert got == [("a", 0, 5, 5, 10), ("a", 0, 10, 10, 10)]


def test_interval_overlap_bucketized_matches_plain(spark):
    import datetime as dt

    from flink_ml__spark.functions.sessions import IntervalOverlapJoiner

    t0 = dt.datetime(2024, 3, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    import random
    rnd = random.Random(7)
    left = [("u%d" % (i % 3), ts(rnd.randint(0, 500)), 0)
            for i in range(40)]
    left = [(k, s, s + dt.timedelta(minutes=rnd.randint(0, 90)))
            for k, s, _ in left]
    right = [("u%d" % (i % 3), ts(rnd.randint(0, 500)), 0)
             for i in range(40)]
    right = [(k, s, s + dt.timedelta(minutes=rnd.randint(0, 90)))
             for k, s, _ in right]
    ldf = spark.createDataFrame(
        left, "k string, s timestamp, e timestamp")
    rdf = spark.createDataFrame(
        right, "k string, s timestamp, e timestamp")
    base = (IntervalOverlapJoiner().setKeyCol("k").setStartCol("s")
            .setEndCol("e"))
    plain = sorted(map(tuple, base.join(ldf, rdf).collect()))
    bucketized = sorted(map(tuple,
                            base.setBucketWidthSec(3600)
                            .join(ldf, rdf).collect()))
    assert plain and plain == bucketized


def test_interval_overlap_bad_param(spark):
    import pytest as _pt

    from flink_ml__spark.functions.sessions import IntervalOverlapJoiner

    with _pt.raises(ValueError):
        IntervalOverlapJoiner().setBucketWidthSec(-1)


def test_attribution_analyzer(spark):
    """First/last/linear credit: journeys segment at conversions,
    never-converting touches earn nothing, bare conversions land in
    the __unattributed__ row."""
    from datetime import datetime, timedelta

    from flink_ml__spark.functions.sessions import AttributionAnalyzer

    t0 = datetime(2024, 1, 1)
    rows = [
        ("A", 1, t0 + timedelta(minutes=1), "ad"),
        ("A", 2, t0 + timedelta(minutes=2), "email"),
        ("A", 3, t0 + timedelta(minutes=3), "purchase"),
        ("A", 4, t0 + timedelta(minutes=4), "email"),
        ("A", 5, t0 + timedelta(minutes=5), "purchase"),
        ("B", 6, t0 + timedelta(minutes=1), "purchase"),
        ("C", 7, t0 + timedelta(minutes=1), "ad"),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id long,"
                                     " ts timestamp, event_type string")
    got = {r["channel"]: (r["n_touches"], r["first_touch"],
                          r["last_touch"], r["linear_credit"])
           for r in AttributionAnalyzer().transform(df).collect()}
    assert got["ad"] == (1, 1, 0, 0.5)
    assert got["email"] == (2, 1, 2, 1.5)
    assert got["__unattributed__"] == (0, 1, 1, 0.0)
    # conservation: linear credit sums to attributed conversions
    assert abs(sum(v[3] for v in got.values()) - 2.0) < 1e-9


# ---------------------------------------------------------------------------
# SessionPathAnalyzer
# ---------------------------------------------------------------------------

def test_session_paths_golden(spark):
    import datetime as _dt
    from flink_ml__spark.functions.sessions import SessionPathAnalyzer
    base = _dt.datetime(2024, 1, 1)

    def ev(u, sec, ty, i):
        return (u, base + _dt.timedelta(seconds=sec), ty, i)

    df = spark.createDataFrame(
        [ev(1, 0, "view", 1), ev(1, 10, "click", 2),
         ev(1, 2000, "buy", 3),          # gap > 1800 -> new session
         ev(2, 0, "view", 4), ev(2, 1, "view", 5)],
        "user_id long, ts timestamp, event_type string, event_id long")
    out = {r["path"]: r for r in
           (SessionPathAnalyzer().setGapSec(1800).setPathLen(3)
            .transform(df).collect())}
    assert set(out) == {"view>click", "buy", "view>view"}
    assert all(r["n_sessions"] == 1 for r in out.values())
    assert abs(out["buy"]["share"] - 1 / 3) < 1e-12
    # rank: count ties broken by path asc
    assert out["buy"]["rank"] == 1
    assert out["view>click"]["rank"] == 2
    assert out["view>view"]["rank"] == 3


def test_session_paths_tiebreak_truncation_topn(spark):
    import datetime as _dt
    import pytest as _pt
    from flink_ml__spark.functions.sessions import SessionPathAnalyzer
    base = _dt.datetime(2024, 1, 1)
    # two events share a timestamp: id order decides the path
    df = spark.createDataFrame(
        [(1, base, "b_type", 6), (1, base, "a_type", 5),
         (1, base + _dt.timedelta(seconds=1), "c_type", 7)],
        "user_id long, ts timestamp, event_type string, event_id long")
    op = SessionPathAnalyzer().setGapSec(60).setPathLen(2)
    r = op.transform(df).first()
    assert r["path"] == "a_type>b_type"  # id 5 before id 6; c truncated
    out = (SessionPathAnalyzer().setGapSec(60).setPathLen(9)
           .setTopN(1).transform(df))
    assert out.count() == 1
    with _pt.raises(ValueError, match="pathLen"):
        SessionPathAnalyzer().setPathLen(0)
    with _pt.raises(ValueError, match="gapSec"):
        SessionPathAnalyzer().setGapSec(0)


# ---------------------------------------------------------------------------
# ConversionLagAnalyzer
# ---------------------------------------------------------------------------

def test_conversion_lag_golden(spark):
    import datetime as _dt
    import pytest as _pt
    from flink_ml__spark.functions.sessions import ConversionLagAnalyzer
    base = _dt.datetime(2024, 1, 1)

    def ev(u, sec, ty):
        return (u, base + _dt.timedelta(seconds=sec), ty)

    df = spark.createDataFrame(
        [ev(1, 0, "view"), ev(1, 100, "purchase"), ev(1, 200, "view"),
         ev(2, 0, "purchase"), ev(2, 10, "view")],
        "user_id long, ts timestamp, event_type string")
    op = (ConversionLagAnalyzer().setPattern("view", "purchase")
          .setHorizonSec(3600))
    rows = sorted(op.transform(df).collect(),
                  key=lambda r: (r["user_id"], r["ts"]))
    assert len(rows) == 3
    assert rows[0]["lag_sec"] == 100.0 and rows[0]["converted"]
    assert rows[1]["lag_sec"] is None and not rows[1]["converted"]
    # target BEFORE the anchor does not count
    assert rows[2]["lag_sec"] is None and not rows[2]["converted"]
    r = op.evaluate(df).first()
    assert r["n_anchors"] == 3 and r["n_converted"] == 1
    assert abs(r["conversion_rate"] - 1 / 3) < 1e-12
    assert r["p50_lag"] == 100.0
    # horizon cuts the conversion but keeps the observed lag
    tight = (ConversionLagAnalyzer().setPattern("view", "purchase")
             .setHorizonSec(50))
    rows = sorted(tight.transform(df).collect(),
                  key=lambda r: (r["user_id"], r["ts"]))
    assert rows[0]["lag_sec"] == 100.0 and not rows[0]["converted"]
    with _pt.raises(ValueError, match="differ"):
        ConversionLagAnalyzer().setPattern("a", "a")
    with _pt.raises(ValueError, match="setPattern"):
        ConversionLagAnalyzer().transform(df)
