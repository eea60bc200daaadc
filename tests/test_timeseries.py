"""TimeBucketRollup: gap-fill goldens for every fill policy and the
output-proportional plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_ml__spark.functions.timeseries import TimeBucketRollup


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, base + dt.timedelta(days=d), v) for u, d, v in rows],
        "user_id long, ts timestamp, value double")


@pytest.fixture(scope="module")
def gapped(spark):
    return _ev(spark, [
        (1, 0, 2.0), (1, 0.25, 4.0),     # bucket d0: n=2 sum=6 avg=3
        (1, 3, 10.0),                    # d1, d2 are gaps; d3: avg=10
        (2, 5, 1.0),                     # single-bucket key: no gaps
    ])


def _rows(df):
    return {(r["user_id"], r["bucket_start"].day): r
            for r in df.collect()}


def test_rollup_locf_goldens(spark, gapped):
    op = TimeBucketRollup().setBucketWidthSec(86400.0).setFill("locf")
    out = op.transform(gapped)
    rows = _rows(out)
    assert len(rows) == 5                      # d1..d4 for u1, d6 for u2
    assert rows[(1, 1)]["n_events"] == 2
    assert rows[(1, 1)]["sum_value"] == 6.0
    assert rows[(1, 1)]["avg_value"] == 3.0
    for day in (2, 3):                         # gap rows
        assert rows[(1, day)]["n_events"] == 0
        assert rows[(1, day)]["sum_value"] is None
        assert rows[(1, day)]["avg_value"] == 3.0   # carried forward
    assert rows[(1, 4)]["avg_value"] == 10.0
    assert rows[(2, 6)]["n_events"] == 1


def test_rollup_zero_and_null_goldens(spark, gapped):
    op = TimeBucketRollup().setBucketWidthSec(86400.0).setFill("zero")
    rows = _rows(op.transform(gapped))
    assert rows[(1, 2)]["sum_value"] == 0.0
    assert rows[(1, 2)]["avg_value"] == 0.0

    rows = _rows(TimeBucketRollup().setBucketWidthSec(86400.0)
                 .setFill("null").transform(gapped))
    assert rows[(1, 2)]["sum_value"] is None
    assert rows[(1, 2)]["avg_value"] is None


def test_rollup_interp_goldens(spark, gapped):
    op = TimeBucketRollup().setBucketWidthSec(86400.0).setFill("interp")
    rows = _rows(op.transform(gapped))
    # linear between avg(d0)=3 and avg(d3)=10
    assert rows[(1, 2)]["avg_value"] == pytest.approx(3 + 7 / 3)
    assert rows[(1, 3)]["avg_value"] == pytest.approx(3 + 14 / 3)
    assert rows[(1, 1)]["avg_value"] == 3.0
    assert rows[(1, 4)]["avg_value"] == 10.0


def test_rollup_interp_edges_fall_back_to_nearest(spark):
    # leading/trailing gap rows cannot interpolate (no neighbor on one
    # side) — they take the nearest observed value... which cannot
    # happen with span derived from observed buckets, so instead pin
    # the two-observation case: every inner gap interpolates
    df = _ev(spark, [(1, 0, 0.0), (1, 4, 8.0)])
    rows = _rows(TimeBucketRollup().setBucketWidthSec(86400.0)
                 .setFill("interp").transform(df))
    assert [rows[(1, d)]["avg_value"] for d in (1, 2, 3, 4, 5)] == \
        [0.0, 2.0, 4.0, 6.0, 8.0]


def test_rollup_fill_param_guard(spark):
    with pytest.raises(ValueError):
        TimeBucketRollup().setFill("bogus")


def test_rollup_densification_is_output_proportional(spark):
    """The dense axis derives from the AGGREGATE (keys x buckets), not
    from the raw events: the sequence explode's input must be the
    grouped span table, and raw text columns must not pass through the
    window stage."""
    from flink_ml__spark.sources import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    out = (TimeBucketRollup().setBucketWidthSec(6 * 3600.0)
           .setFill("locf").transform(ev))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly one window pass (the fill), over bucket rows
    assert plan.count("Window") == 1
    # correctness spot-check: every key's bucket axis is contiguous
    gaps = (out.groupBy("user_id")
            .agg(((F.max(F.unix_micros("bucket_start"))
                   - F.min(F.unix_micros("bucket_start")))
                  / (6 * 3600 * 1_000_000) + 1).alias("span"),
                 F.count(F.lit(1)).alias("n"))
            .filter(F.col("span") != F.col("n")))
    assert gaps.count() == 0
