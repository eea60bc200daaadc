"""Mirror of the driver's t2 correctness gate: run every QUERIES entry
and its DuckDB oracle side-by-side through the PANDAS-faithful
canonicalizer (`spark_df.toPandas()` vs `con.execute(sql).df()`) and
compare row count + column names + per-column dtype class +
order-insensitive stringified values. Runs at sf0.001 for speed (the
driver uses sf0.01).

The pandas path doubles as the registry-wide dtype-parity lint asked
for in VERDICT r10 #3: an uncast DuckDB integer aggregate (sum() ->
HUGEINT -> float64 "123.0") against a Spark bigint ("123") fails here
with an explicit cast-::BIGINT hint instead of surfacing as an opaque
driver hash mismatch a round later."""

import os

import duckdb
import pytest

from flink_ml__spark.plans import ORACLES, QUERIES
from flink_ml__spark.plans.canon import canon_pdf, dtype_class

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(SF_DIR, t + '.parquet')}'")
    yield con
    con.close()


def _assert_sortable_schema(name, sdf):
    """The driver's canonicalizer pandas-sorts result rows; list/map/
    struct cells are unhashable there and turn a correct query into a
    red CORRECTNESS row (seen: quantize_embeddings, round 6). Queries
    must stringify/explode complex columns before returning."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [f.name for f in sdf.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} break the driver's "
        f"pandas sort — stringify (array_join) or explode them")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    _assert_sortable_schema(name, sdf)
    s_pdf = sdf.toPandas()
    o_pdf = duck.execute(ORACLES[name]).df()

    sc, sv = canon_pdf(s_pdf)
    oc, ov = canon_pdf(o_pdf)
    assert sc == oc, f"{name}: column mismatch {sc} vs {oc}"
    assert len(sv) == len(ov), (
        f"{name}: row count {len(sv)} vs oracle {len(ov)}")

    # dtype-parity lint: int-vs-float class mismatches stringify
    # differently under the driver's pandas canonicalizer even when
    # the values are numerically identical.
    s_dt = {str(c).lower(): dtype_class(t)
            for c, t in zip(s_pdf.columns, s_pdf.dtypes)}
    o_dt = {str(c).lower(): dtype_class(t)
            for c, t in zip(o_pdf.columns, o_pdf.dtypes)}
    bad = {c: (s_dt[c], o_dt[c]) for c in s_dt if s_dt[c] != o_dt[c]}
    assert not bad, (
        f"{name}: pandas dtype-class mismatch (spark, oracle) = {bad} — "
        f"uncast DuckDB integer aggregates (sum/window-sum -> HUGEINT) "
        f"land as float64; cast ::BIGINT in the oracle SQL")

    mismatches = [(a, b) for a, b in zip(sv, ov) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries(spark, name):
    out = QUERIES[name](spark, SF_DIR)
    _assert_sortable_schema(name, out)
    assert out.count() > 0
