"""Golden tests for AHP / OnlineAHP, mirroring
``/root/reference/test/java/cn/swust/algorithms/ahp/AHPTest.java`` and
``OnlineAHPTest.java``.
"""

import datetime
import math

import pytest

from flink_ml__spark.operators.ahp import AHP, OnlineAHP

# ``AHPTest.java:33-41``
MATRIX = [
    [1.0, 0.5, 4.0, 3.0, 3.0, 2.0],
    [2.0, 1.0, 7.0, 5.0, 5.0, 4.0],
    [0.25, 0.143, 1.0, 0.5, 0.67, 0.4],
    [0.67, 0.2, 2.0, 1.0, 1.0, 0.67],
    [0.33, 0.2, 3.0, 1.0, 1.0, 2.0],
    [0.5, 0.25, 2.5, 3.0, 0.5, 1.0],
]
TYPES = [1, 1, 1, 0, 0, 0]
COLS = ["High", "Low", "Open", "Close", "Volume", "Marketcap"]

# ``AHPTest.java:44-55`` — input rows + golden scores
DATA = [
    (55.11235847, 49.78789992, 52.67503496, 53.21924296, 553091.4598, 89128128.86084658),
    (53.40227002, 40.73457791, 53.29196931, 42.40159861, 583091.4598, 71011441.25451232),
    (42.40831364, 35.97068975, 42.39994711, 40.08397561, 682834.18632335, 67130036.89981823),
    (44.90251114, 36.69605677, 39.88526234, 43.76446306, 1658816.92260445, 220265142.10956782),
]
GOLDEN = [0.1841, 0.1189, 0.0396, 0.0218]

# ``OnlineAHPTest.java:49-71`` — 9 event-time rows + golden windowed scores
ONLINE_DATA = [
    (1601913600000, 55.11235847, 49.78789992, 52.67503496, 53.21924296, 0.0, 89128128.86084658),
    (1602000000000, 53.40227002, 40.73457791, 53.29196931, 42.40159861, 583091.4598, 71011441.25451232),
    (1602086400000, 42.40831364, 35.97068975, 42.39994711, 40.08397561, 682834.18632335, 67130036.89981823),
    (1602172800000, 44.90251114, 36.69605677, 39.88526234, 43.76446306, 1658816.92260445, 220265142.10956782),
    (1602259200000, 47.56953274, 43.2917758, 43.76446306, 46.81774415, 815537.6608, 235632208.16269898),
    (1602345600000, 51.4056548, 46.70332768, 46.81814554, 49.13371767, 1074627.02770495, 247288428.75616974),
    (1602432000000, 51.45337431, 48.71603954, 49.13312951, 49.66072573, 692150.60094118, 249940843.43242228),
    (1602518400000, 54.42141763, 48.75407708, 49.66157329, 52.23869222, 1354836.06481028, 262915666.29307267),
    (1602518400000, 57.48190422, 49.59873521, 52.23839242, 51.12431679, 1386221.2066711, 257307050.43080166),
]
ONLINE_GOLDEN = {
    (1601913600000, 89128128.86084658): 0.1342,
    (1602000000000, 71011441.25451232): 0.0931,
    (1602086400000, 67130036.89981823): 0.0337,
    (1602172800000, 220265142.10956782): 0.0366,
    (1602259200000, 235632208.16269898): 0.0970,
    (1602345600000, 247288428.75616974): 0.1235,
    (1602432000000, 249940843.43242228): 0.0543,
    (1602518400000, 262915666.29307267): 0.0215,
    (1602518400000, 257307050.43080166): 0.1326,
}


def make_op():
    return (AHP()
            .setInputCols(COLS)
            .setJudgmentMatrix(MATRIX)
            .setIndicatorType(TYPES))


def test_params():
    op = AHP()
    assert op.getOutputCol() == "output"
    op = make_op().setOutputCol("score")
    assert op.getOutputCol() == "score"
    assert op.getInputCols() == COLS
    assert op.getIndicatorType() == TYPES


def test_bad_matrix():
    import numpy as np

    # an inconsistent matrix must be rejected by the CR < 0.1 gate
    bad = [[1.0, 9.0, 0.11], [0.11, 1.0, 9.0], [9.0, 0.11, 1.0]]
    with pytest.raises(ValueError, match="CR is too large"):
        (AHP().setInputCols(["a", "b", "c"])
         .setJudgmentMatrix(bad).setIndicatorType(1, 1, 1)._prepare())


def test_golden_scores(spark):
    df = spark.createDataFrame(DATA, COLS)
    out = make_op().setOutputCol("score").transform(df)
    assert out.columns == COLS + ["score"]
    got = {round(r["High"], 6): r["score"] for r in out.collect()}
    for row, expected in zip(DATA, GOLDEN):
        assert math.isclose(got[round(row[0], 6)], expected, abs_tol=1e-4)


def test_save_load(spark, tmp_path):
    path = str(tmp_path / "ahp")
    make_op().save(path)
    op = AHP.load(spark, path)
    assert op.getJudgmentMatrix() == MATRIX
    df = spark.createDataFrame(DATA, COLS)
    got = {round(r["High"], 6): r["output"] for r in op.transform(df).collect()}
    for row, expected in zip(DATA, GOLDEN):
        assert math.isclose(got[round(row[0], 6)], expected, abs_tol=1e-4)


def _online_df(spark):
    rows = [
        r + (datetime.datetime.fromtimestamp(r[0] / 1000.0, datetime.timezone.utc)
             .replace(tzinfo=None),)
        for r in ONLINE_DATA
    ]
    return spark.createDataFrame(rows, ["id"] + COLS + ["rowtime"])


def test_online_golden_scores(spark):
    df = _online_df(spark)
    op = (OnlineAHP()
          .setInputCols(COLS)
          .setJudgmentMatrix(MATRIX)
          .setIndicatorType(TYPES)
          .setWindows("3 days")
          .setTimeCol("rowtime")
          .setOutputCol("output"))
    out = op.transform(df)
    assert out.columns == ["id"] + COLS + ["rowtime", "output"]
    rows = out.collect()
    assert len(rows) == 9
    for r in rows:
        expected = ONLINE_GOLDEN[(r["id"], r["Marketcap"])]
        assert math.isclose(r["output"], expected, abs_tol=1e-4), (
            r["id"], r["output"], expected)


def test_online_pathological_column_names_pass_through(spark):
    """User columns whose names happen to contain the operator's uid
    suffix must survive transform — helper-column dropping is by exact
    generated name, not substring match."""
    from pyspark.sql import functions as F

    df = _online_df(spark)
    op = (OnlineAHP()
          .setInputCols(COLS)
          .setJudgmentMatrix(MATRIX)
          .setIndicatorType(TYPES)
          .setWindows("3 days")
          .setTimeCol("rowtime")
          .setOutputCol("output"))
    trap = f"note_{op.uid[-6:]}"  # contains the 6-char uid suffix
    out = op.transform(df.withColumn(trap, F.lit("keep me")))
    assert trap in out.columns
    assert out.columns == ["id"] + COLS + ["rowtime", trap, "output"]
    assert out.select(trap).first()[0] == "keep me"


def _numpy_online_ahp(rows):
    """Plain-numpy replica of the per-window scoring
    (``OnlineAHP.java:94-172``) — note k = 1/ln(#cols), unlike batch AHP.
    """
    import numpy as np

    from flink_ml__spark.operators.ahp import ahp_weight_vector

    x = np.array(rows, dtype=float)
    mx, mn = x.max(axis=0), x.min(axis=0)
    norm = np.where(np.array(TYPES) == 1,
                    (x - mn) / (mx - mn), (mx - x) / (mx - mn))
    s = norm.sum(axis=0)
    p = norm / s
    e = np.where(p == 0, 0.0, p * np.log(np.where(p == 0, 1.0, p))).sum(axis=0)
    k = 1.0 / math.log(len(TYPES))
    d = 1 + k * e
    w = d / d.sum()
    ahp_w = np.array(ahp_weight_vector(MATRIX))
    return norm @ (w * ahp_w)


def test_online_global_window(spark):
    # GlobalWindows default: the whole input is one window
    df = spark.createDataFrame(DATA, COLS)
    online = (OnlineAHP()
              .setInputCols(COLS)
              .setJudgmentMatrix(MATRIX)
              .setIndicatorType(TYPES)
              .transform(df))
    expected = _numpy_online_ahp(DATA)
    got = {round(r["High"], 6): r["output"] for r in online.collect()}
    for row, exp in zip(DATA, expected):
        assert math.isclose(got[round(row[0], 6)], exp, abs_tol=1e-9)
