"""Similarity search over embedding columns (BASELINE.json north-star).

* ``CosineTopK`` — exact brute-force cosine top-k: one broadcast of the
  (small) query set against the (huge) corpus, dot products via
  ``zip_with``/``aggregate`` higher-order functions (JVM codegen, no
  UDFs), per-query top-k via window ranking. The baseline and the oracle.
* ``IVFCosineTopK`` — the scale path: an IVF-style coarse quantizer
  (seeded sampled centroids, one Lloyd refinement pass) partitions the
  corpus; a query probes only its ``nProbe`` nearest cells, turning the
  all-pairs join into a cell-aligned join that touches
  ``nProbe / nList`` of the corpus.
"""

from __future__ import annotations

from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_ml__spark.base import (
    AlgoOperator,
    HasSeed,
    as_double_array,
    array_width,
)


class _SimilarityParams(HasSeed):
    embeddingCol = Param(Params._dummy(), "embeddingCol",
                         "array<float/double> embedding column",
                         TypeConverters.toString)
    idCol = Param(Params._dummy(), "idCol", "vector id column",
                  TypeConverters.toString)
    k = Param(Params._dummy(), "k", "neighbors per query",
              TypeConverters.toInt)

    def __init__(self):
        super().__init__()
        self._setDefault(embeddingCol="embedding", idCol="vec_id", k=10)

    def getEmbeddingCol(self):
        return self.getOrDefault(self.embeddingCol)

    def setEmbeddingCol(self, v):
        return self._set(embeddingCol=v)

    def getIdCol(self):
        return self.getOrDefault(self.idCol)

    def setIdCol(self, v):
        return self._set(idCol=v)

    def getK(self):
        return self.getOrDefault(self.k)

    def setK(self, v):
        return self._set(k=v)


def _cos(v1: str, n1: str, v2: str, n2: str):
    dot = F.aggregate(F.zip_with(v1, v2, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    return dot / (F.col(n1) * F.col(n2))


class CosineTopK(AlgoOperator, _SimilarityParams):
    """Exact cosine top-k. ``topk(queries, corpus)`` returns
    (query_id, neighbor_id, cosine, rank); self-neighbors excluded."""

    def topk(self, queries: DataFrame, corpus: DataFrame) -> DataFrame:
        idc = self.getIdCol()
        qa = as_double_array(queries, self.getEmbeddingCol())
        ca = as_double_array(corpus, self.getEmbeddingCol())
        q = queries.select(F.col(idc).alias("query_id"), qa.alias("__qv"),
                           F.sqrt(F.aggregate(
                               F.transform(qa, lambda x: x * x), F.lit(0.0),
                               lambda a, x: a + x)).alias("__qn"))
        c = corpus.select(F.col(idc).alias("neighbor_id"), ca.alias("__cv"),
                          F.sqrt(F.aggregate(
                              F.transform(ca, lambda x: x * x), F.lit(0.0),
                              lambda a, x: a + x)).alias("__cn"))
        joined = (c.crossJoin(F.broadcast(q))
                  .filter(F.col("query_id") != F.col("neighbor_id"))
                  .withColumn("cosine", _cos("__qv", "__qn", "__cv", "__cn")))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id"))
        return (joined
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= self.getK())
                .select("query_id", "neighbor_id", "cosine", "rank"))

    def transform(self, df: DataFrame) -> DataFrame:
        """Self top-k over one table (every row is a query)."""
        return self.topk(df, df)


class IVFCosineTopK(AlgoOperator, _SimilarityParams):
    """IVF-bucketed approximate cosine top-k.

    train(): seeded sample of ``nList`` corpus vectors + one Lloyd
    refinement pass (mean of assigned vectors) → centroid literals on the
    driver (IVF coarse quantizers are small by design: nList ≤ ~1024).
    topk(): corpus rows keyed by nearest cell; queries replicated to
    their ``nProbe`` nearest cells; cell-aligned join + window top-k.
    """

    nList = Param(Params._dummy(), "nList", "number of IVF cells",
                  TypeConverters.toInt)
    nProbe = Param(Params._dummy(), "nProbe", "cells probed per query",
                   TypeConverters.toInt)

    def __init__(self):
        super().__init__()
        self._setDefault(nList=16, nProbe=4)
        self._centroids: list[list[float]] | None = None

    def getNList(self):
        return self.getOrDefault(self.nList)

    def setNList(self, v):
        return self._set(nList=v)

    def getNProbe(self):
        return self.getOrDefault(self.nProbe)

    def setNProbe(self, v):
        return self._set(nProbe=v)

    def train(self, corpus: DataFrame) -> "IVFCosineTopK":
        arr = as_double_array(corpus, self.getEmbeddingCol())
        dims = array_width(corpus, self.getEmbeddingCol())
        pts = corpus.select(arr.alias("__v"))
        sample = pts.rdd.takeSample(False, self.getNList(), self.getSeed())
        cents = [list(r["__v"]) for r in sample]
        # one Lloyd pass: mean of assigned points per cell
        x = [F.element_at(F.col("__v"), j + 1) for j in range(dims)]
        cell = self._nearest_cell_expr(x, cents)
        refined = (pts.withColumn("__cell", cell)
                   .groupBy("__cell")
                   .agg(*[F.avg(x[j]).alias(f"m{j}") for j in range(dims)])
                   .collect())
        by_cell = {r["__cell"]: [r[f"m{j}"] for j in range(dims)]
                   for r in refined}
        self._centroids = [by_cell.get(i, cents[i]) for i in range(len(cents))]
        return self

    @staticmethod
    def _nearest_cell_expr(x, cents):
        d = F.array(*[
            sum((x[j] - F.lit(c[j])) ** 2 for j in range(len(c)))
            for c in cents
        ])
        return (F.array_position(d, F.array_min(d)) - 1).cast("int")

    def _cell_distances(self, x, cents):
        return F.array(*[
            sum((x[j] - F.lit(c[j])) ** 2 for j in range(len(c)))
            for c in cents
        ])

    def topk(self, queries: DataFrame, corpus: DataFrame) -> DataFrame:
        if self._centroids is None:
            self.train(corpus)
        cents = self._centroids
        idc = self.getIdCol()
        dims = len(cents[0])

        ca = as_double_array(corpus, self.getEmbeddingCol())
        cx = [F.element_at(ca, j + 1) for j in range(dims)]
        c = corpus.select(
            F.col(idc).alias("neighbor_id"), ca.alias("__cv"),
            F.sqrt(sum(e * e for e in cx)).alias("__cn"),
            self._nearest_cell_expr(cx, cents).alias("__cell"))

        qa = as_double_array(queries, self.getEmbeddingCol())
        qx = [F.element_at(qa, j + 1) for j in range(dims)]
        dists = self._cell_distances(qx, cents)
        probe_cells = F.slice(
            F.expr("array_sort(arrays_zip(__dists, __cells), "
                   "(l, r) -> case when l.__dists < r.__dists then -1 "
                   "when l.__dists > r.__dists then 1 else 0 end).__cells"),
            1, self.getNProbe())
        q = (queries.select(
                F.col(idc).alias("query_id"), qa.alias("__qv"),
                F.sqrt(sum(e * e for e in qx)).alias("__qn"),
                dists.alias("__dists"),
                F.sequence(F.lit(0), F.lit(len(cents) - 1)).alias("__cells"))
             .withColumn("__cell", F.explode(probe_cells))
             .drop("__dists", "__cells"))

        joined = (c.join(q, "__cell")
                  .filter(F.col("query_id") != F.col("neighbor_id"))
                  .withColumn("cosine", _cos("__qv", "__qn", "__cv", "__cn")))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id"))
        return (joined
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= self.getK())
                .select("query_id", "neighbor_id", "cosine", "rank"))

    def transform(self, df: DataFrame) -> DataFrame:
        return self.topk(df, df)
