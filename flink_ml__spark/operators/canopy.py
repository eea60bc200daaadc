"""Canopy clustering, Spark-first.

Reimplements ``/root/reference/src/main/java/cn/swust/algorithms/canopy/
Canopy.java:48-485``: pick a center; points with dist < T1 join the canopy;
of those, points with dist < T2 leave the candidate pool (points in
[T2, T1) belong but stay, and may join later canopies too); near-duplicates
of the center (dist <= 1e-6) are skipped; next center = first remaining
pool point; terminate on empty pool or maxIter.

Determinism: the reference's "first remaining point" is partition-order
dependent (``Canopy.java:426-435``), which is why its own test cannot
assert outputs (``CanopyTest.java:151-152``). Here every point gets a
seeded hash rank once, and "first" means minimum rank — via ``min_by``
aggregation (no sort), so results are reproducible for a given seed.

Scale notes: a driver loop of at most ``maxIter`` rounds; per round one
``min_by`` aggregation + two filter scans over the persisted pool. Member
lists are assembled with ``collect_list`` per canopy at the end — the
reference materializes the same arrays in its output rows
(``Canopy.java:94-96``). For outputs too large for that, use
``assign(df)`` which returns the flat (canopy_id, centroid, point)
assignment instead.
"""

from __future__ import annotations

from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from flink_ml__spark.base import (
    AlgoOperator,
    HasDistanceMeasure,
    HasFeaturesCol,
    HasMaxIter,
    HasPredictionCol,
    HasSeed,
    as_double_array,
    array_width,
)
from flink_ml__spark.operators.fcm import _dist_expr


class CanopyParams(HasFeaturesCol, HasPredictionCol, HasMaxIter, HasSeed,
                   HasDistanceMeasure):
    """``CanopyParams.java:6-17``."""

    t1 = Param(Params._dummy(), "t1", "loose distance threshold (> t2)",
               typeConverter=TypeConverters.toFloat)
    t2 = Param(Params._dummy(), "t2", "tight distance threshold",
               typeConverter=TypeConverters.toFloat)

    def __init__(self):
        super().__init__()
        self._setDefault(t1=1.0, t2=0.5)

    def getT1(self) -> float:
        return self.getOrDefault(self.t1)

    def setT1(self, value: float):
        return self._set(t1=float(value))

    def getT2(self) -> float:
        return self.getOrDefault(self.t2)

    def setT2(self, value: float):
        return self._set(t2=float(value))


class Canopy(AlgoOperator, CanopyParams):

    def _run(self, df: DataFrame):
        """Driver loop; yields (canopy_id, centroid, members DataFrame)."""
        if self.getT1() <= self.getT2():
            raise ValueError("T1 must be greater than T2")
        t1, t2 = self.getT1(), self.getT2()
        measure = self.getDistanceMeasure()

        pool = df.select(
            as_double_array(df, self.getFeaturesCol()).alias("x"),
            F.xxhash64(as_double_array(df, self.getFeaturesCol()),
                       F.lit(self.getSeed())).alias("__rank"))
        pool.persist(StorageLevel.MEMORY_AND_DISK)
        dims = array_width(pool, "x")
        x = [F.element_at(F.col("x"), j + 1) for j in range(dims)]

        canopies = []
        pools = [pool]
        try:
            for cid in range(self.getMaxIter()):
                head = pool.agg(F.min_by("x", "__rank").alias("c")).first()
                if head is None or head["c"] is None:
                    break
                center = list(head["c"])
                d = _dist_expr(x, center, measure)
                # members: dist < T1, excluding (near-)duplicates of the
                # center (``Canopy.java:396-414``)
                members = (pool
                           .withColumn("__d", d)
                           .filter((F.col("__d") > 1e-6) & (F.col("__d") < t1))
                           .select("x"))
                canopies.append((cid, center, members))
                # pool keeps dist >= T2 (and drops center duplicates)
                new_pool = (pool
                            .withColumn("__d", d)
                            .filter((F.col("__d") > 1e-6) & (F.col("__d") >= t2))
                            .drop("__d"))
                new_pool.persist(StorageLevel.MEMORY_AND_DISK)
                pools.append(new_pool)
                pool = new_pool
                if pool.isEmpty():
                    break
        finally:
            # keep persisted pools alive until the caller materializes the
            # member DataFrames; unpersist the intermediates lazily
            for p in pools[:-1]:
                p.unpersist()
        return canopies

    def assign(self, df: DataFrame) -> DataFrame:
        """Flat assignment output: (canopy_id int, centroid, point) —
        the scale-friendly shape (one row per membership edge)."""
        spark = df.sparkSession
        parts = []
        for cid, center, members in self._run(df):
            parts.append(members.select(
                F.lit(cid).alias("canopy_id"),
                F.lit(center).cast("array<double>").alias("centroid"),
                F.col("x").alias("point")))
            parts.append(spark.createDataFrame(
                [(cid, center, center)],
                "canopy_id int, centroid array<double>, point array<double>"))
        if not parts:
            return spark.createDataFrame(
                [], "canopy_id int, centroid array<double>, point array<double>")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def transform(self, df: DataFrame) -> DataFrame:
        """Reference-shaped output: one row per canopy —
        (centroids array<double>, <predictionCol> array<array<double>>)
        with the center first in the member list (``Canopy.java:94-96``).
        """
        flat = self.assign(df)
        pred = self.getPredictionCol()
        return (flat.groupBy("canopy_id")
                .agg(F.first("centroid").alias("centroids"),
                     F.array_distinct(
                         F.concat(F.array(F.first("centroid")),
                                  F.collect_list("point"))).alias(pred))
                .orderBy("canopy_id")
                .drop("canopy_id"))
