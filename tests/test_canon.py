"""Value-level pins for the cross-engine comparison layer: the
fixed-point quantizer `floor(x*1e6 + 0.5)/1e6` must produce
bit-identical doubles in Spark and DuckDB for identical inputs (the
r10 parity discipline), and the shared pandas canonicalizer
(`plans/canon.py`) must keep the int-vs-float distinction that
root-caused the r09/r10 driver hash failures."""

import math
import struct

import duckdb
import numpy as np
import pandas as pd
import pytest

from flink_ml__spark.plans.canon import canon_pdf, canon_val, dtype_class


def _boundary_values():
    """Doubles dense around the quantizer's decision boundaries plus
    random magnitudes inside the documented |x| <= 1e9 envelope."""
    rng = np.random.RandomState(7)
    vals = []
    # exact millionths and their halfway points, both signs — where
    # Spark's BigDecimal HALF_UP round() and DuckDB's float round()
    # historically disagreed
    ks = rng.randint(-5_000_000, 5_000_000, size=2000)
    vals.extend(k / 1e6 for k in ks)
    vals.extend((k + 0.5) / 1e6 for k in ks[:1000])
    # one-ulp perturbations of boundary values
    vals.extend(np.nextafter(k / 1e6, math.inf) for k in ks[:500])
    vals.extend(np.nextafter(k / 1e6, -math.inf) for k in ks[:500])
    # random magnitudes up to the envelope
    vals.extend(rng.uniform(-1e9, 1e9, size=1000))
    vals.extend(rng.uniform(-1e-3, 1e-3, size=500))
    vals.extend([0.0, -0.0, 1e9, -1e9])
    return [float(v) for v in vals]


def test_fixed_point_quantizer_cross_engine_bit_parity(spark):
    """floor(x*1e6 + 0.5)/1e6 computed by Spark (F.floor -> long ->
    /1e6) and DuckDB (floor -> double -> /1e6) must agree bit-for-bit
    on every boundary-adjacent input — identical inputs can NEVER
    quantize differently, which is the whole point of the discipline."""
    from pyspark.sql import functions as F

    vals = _boundary_values()
    pdf = pd.DataFrame({"i": range(len(vals)), "x": vals})
    sdf = spark.createDataFrame(pdf)
    s_out = (sdf.select("i", (F.floor(F.col("x") * 1e6 + 0.5) / 1e6)
                        .alias("q"))
             .toPandas().sort_values("i")["q"].to_numpy())
    con = duckdb.connect()
    con.register("t", pdf)
    d_out = (con.execute(
        "SELECT floor(x * 1e6 + 0.5) / 1e6 AS q FROM t ORDER BY i")
        .df()["q"].to_numpy())
    assert len(s_out) == len(d_out) == len(vals)
    s_bits = [struct.pack("<d", v) for v in s_out]
    d_bits = [struct.pack("<d", v) for v in d_out]
    diffs = [(vals[i], s_out[i], d_out[i])
             for i in range(len(vals)) if s_bits[i] != d_bits[i]]
    assert not diffs, f"first divergences: {diffs[:5]}"


def test_canon_val_keeps_int_float_distinction():
    assert canon_val(np.int64(123)) == "123"
    assert canon_val(np.float64(123)) == "123.0"
    assert canon_val(123) == "123"
    assert canon_val(123.0) == "123.0"
    # the r09/r10 failure class in one line:
    assert canon_val(np.int64(3958)) != canon_val(np.float64(3958))


def test_canon_val_normalizations():
    assert canon_val(-0.0) == "0.0"
    assert canon_val(float("nan")) == "NaN"
    assert canon_val(None) == "None"
    assert canon_val(True) == "True"
    assert canon_val(np.bool_(False)) == "False"
    assert canon_val(round(1.23456789, 9)) == str(round(1.23456789, 6))
    assert canon_val([1, 2.5, None]) == "[1, 2.5, None]"
    assert canon_val(np.array([1.0, 2.0])) == "[1.0, 2.0]"
    assert canon_val(pd.NaT) == "NaN"


def test_canon_pdf_sorts_columns_and_rows():
    pdf = pd.DataFrame({"b": [2, 1], "A": [10.0, 20.0]})
    cols, rows = canon_pdf(pdf)
    assert cols == ["a", "b"]
    assert rows == [("10.0", "2"), ("20.0", "1")]


def test_dtype_class_families():
    assert dtype_class(np.dtype("int32")) == "int"
    assert dtype_class(np.dtype("int64")) == "int"
    assert dtype_class(np.dtype("float64")) == "float"
    assert dtype_class(np.dtype("bool")) == "bool"
    assert dtype_class(np.dtype("datetime64[ns]")) == "datetime"
    assert dtype_class(np.dtype("object")) == "object"
    # HUGEINT-via-pandas lands float64 -> must NOT classify as int
    assert dtype_class(np.dtype("float64")) != dtype_class(
        np.dtype("int64"))


def test_rounding_mode_irrelevant_for_bit_identical_inputs():
    """Why the driver's unknown 6-dp rounding mode can't break parity:
    gate outputs are quantized by the SAME floor(x·10ⁿ+0.5) expression
    in both engines, so the two pandas frames hold bit-identical
    float64s — and any deterministic rounding maps equal bits to equal
    strings. The half-boundary value 0.0000005 is exactly where
    round() (half-even → '0.0') and floor-rounding ('1e-06') diverge;
    the test pins that the divergence needs DIFFERENT inputs, which
    the registry discipline forbids."""
    import math

    half = 0.0000005
    # identical bits -> identical canonical strings, whatever the mode
    assert canon_val(half) == canon_val(half)
    # the two modes DO differ on this value...
    assert round(half, 6) != math.floor(half * 1e6 + 0.5) / 1e6
    # ...but a floor-quantized gate output is a fixed point of canon's
    # round(): re-rounding an already-6dp float is the identity, so
    # canon_val can never un-do the registry quantization
    q = math.floor(half * 1e6 + 0.5) / 1e6
    assert canon_val(q) == str(q)


def test_duckdb_hugeint_lands_float64_spark_bigint_int64(spark):
    """The mechanism behind the r09/r10 hash failures, pinned: an
    uncast DuckDB integer sum() widens to HUGEINT and .df() renders it
    float64, while the equivalent Spark sum is int64 — same values,
    different canonical strings. The ::BIGINT cast restores parity."""
    from pyspark.sql import functions as F

    con = duckdb.connect()
    raw = con.execute(
        "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)").df()
    assert dtype_class(raw["s"].dtype) == "float"
    cast = con.execute(
        "SELECT sum(x)::BIGINT AS s FROM (VALUES (1), (2)) t(x)").df()
    assert dtype_class(cast["s"].dtype) == "int"
    spk = (spark.createDataFrame([(1,), (2,)], "x int")
           .agg(F.sum("x").alias("s")).toPandas())
    assert dtype_class(spk["s"].dtype) == "int"
    _, uncast_rows = canon_pdf(raw)
    _, cast_rows = canon_pdf(cast)
    _, spark_rows = canon_pdf(spk)
    assert spark_rows == cast_rows != uncast_rows
