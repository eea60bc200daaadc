"""Numeric distribution-drift monitoring between two snapshots of the
same table — the model-ops companion of the token-level
``DomainDivergence`` monitor: a feature pipeline feeding a trained
model needs to know when today's data stopped looking like the data
the model (or the curation thresholds) were fit on.

``DriftMonitor`` computes the Population Stability Index per column:
bucket edges come from the REFERENCE side's exact interpolated
quantiles (the convention every PSI implementation uses — the bins
describe where reference mass sits), both sides histogram against
those fixed edges, and PSI = Σ (p_cur − p_ref) · ln(p_cur / p_ref)
with the standard 1e-6 proportion floor so empty buckets stay finite.
Rule of thumb (Siddiqi, "Credit Risk Scorecards", 2005): PSI < 0.1
stable, 0.1–0.25 moderate shift, > 0.25 action required.

100 TB design: ONE aggregation per side per fit/apply — the quantile
fit is one pass over the reference, the edges fold to O(buckets)
literals, bucket assignment is a map-side sum of comparisons, and each
histogram is a partial+final count aggregate with O(buckets) output.
Nothing driver-side ever exceeds O(columns · buckets). The fit
defaults to exact ``percentile`` (SQL-oracle-replayable, like
``Winsorizer``); at 100 TB set ``relativeError`` (e.g. 0.001) to use
the bounded-memory ``approx_percentile`` sketch instead — exact
percentile merges a full value→count map on one final buffer and OOMs
on high-cardinality columns (see ``HasRelativeError``).
"""

from __future__ import annotations

from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ml__spark.base import AlgoOperator, HasRelativeError

_FLOOR = 1e-6


def drift_level(psi_col):
    """stable/moderate/action classification of a PSI column — the
    Siddiqi (2005) thresholds. The SINGLE definition shared by
    :class:`DriftMonitor`, :class:`CategoricalDriftMonitor` and the
    streaming twin (``streaming.online.stream_drift_monitor``) so a
    threshold change cannot desynchronize the three surfaces."""
    return (F.when(psi_col < 0.1, F.lit("stable"))
             .when(psi_col < 0.25, F.lit("moderate"))
             .otherwise(F.lit("action")))


def _psi_summary(report_df: DataFrame) -> DataFrame:
    """Fold a per-(column, bucket|category) PSI report to one row per
    column with the total ``psi`` and its ``drift_level``."""
    return (report_df.groupBy("column")
            .agg(F.sum("psi_term").alias("psi"))
            .withColumn("drift_level", drift_level(F.col("psi"))))


class DriftMonitor(AlgoOperator, HasRelativeError):
    """PSI drift report between a reference and a current DataFrame.

    ``report(reference, current)`` returns one row per (column,
    bucket)::

        column      string
        bucket      int      0-based (``numBuckets`` quantile bins)
        n_ref       bigint   reference rows in the bucket
        n_cur       bigint   current rows in the bucket
        p_ref       double   floored proportions (NULLs excluded)
        p_cur       double
        psi_term    double   (p_cur − p_ref) · ln(p_cur / p_ref)

    ``summary(reference, current)`` aggregates to one row per column
    with the total ``psi``. NULL values are excluded from both sides
    (count them with ``ExpectationValidator`` if NULL-rate drift
    matters). Edges are the reference's exact interpolated quantiles;
    degenerate (constant) columns collapse to one bucket and report
    PSI 0 against an identical current side.
    """

    inputCols = Param(Params._dummy(), "inputCols",
                      "numeric columns to monitor",
                      TypeConverters.toListString)
    numBuckets = Param(Params._dummy(), "numBuckets",
                       "quantile buckets per column",
                       TypeConverters.toInt)

    def __init__(self):
        super().__init__()
        self._setDefault(inputCols=[], numBuckets=10)

    def setInputCols(self, *v):
        if len(v) == 1 and isinstance(v[0], (list, tuple)):
            v = tuple(v[0])
        return self._set(inputCols=list(v))

    def setNumBuckets(self, v):
        v = int(v)
        if v < 2:
            raise ValueError(f"numBuckets must be >= 2, got {v}")
        return self._set(numBuckets=v)

    def _all_edges(self, reference: DataFrame,
                   cols: list[str]) -> dict[str, list[float]]:
        """ONE aggregation computes every column's k−1 exact
        interpolated percentiles (N sequential per-column jobs would
        scan the reference N times)."""
        k = self.getOrDefault(self.numBuckets)
        pcts = [i / k for i in range(1, k)]
        # one percentile/approx_percentile aggregate per column (the
        # list form shares a single sketch across all k-1 cut points)
        row = reference.agg(*[
            F.expr(self._percentile_sql(c, pcts)).alias(f"e_{ci}")
            for ci, c in enumerate(cols)]).first()
        out: dict[str, list[float]] = {}
        for ci, c in enumerate(cols):
            edges = list(row[f"e_{ci}"]) if row[f"e_{ci}"] is not None \
                else [None]
            if edges and edges[0] is None:
                raise ValueError(f"no non-null values in reference.{c}")
            # constant stretches produce duplicate edges — keep them;
            # duplicate edges simply leave their buckets empty on both
            # sides identically (floored proportions, zero psi term)
            out[c] = [float(e) for e in edges]
        return out

    @staticmethod
    def _bucket(col, edges: list[float]):
        b = F.lit(0)
        for e in edges:
            b = b + (F.col(col) >= F.lit(e)).cast("int")
        return b

    def _hist(self, df: DataFrame, edges: dict[str, list[float]],
              tag: str) -> DataFrame:
        """ONE pass histograms every column: each row explodes into
        its per-column (column, bucket) cells (NULLs dropped per
        column), then one partial+final count aggregate."""
        cells = F.explode(F.filter(F.array(*[
            F.when(F.col(c).isNotNull(),
                   F.struct(F.lit(c).alias("column"),
                            self._bucket(c, e).alias("bucket")))
            for c, e in edges.items()]), lambda x: x.isNotNull()))
        return (df.select(cells.alias("__cell"))
                  .groupBy(F.col("__cell.column").alias("column"),
                           F.col("__cell.bucket").alias("bucket"))
                  .agg(F.count(F.lit(1)).alias(f"n_{tag}")))

    def report(self, reference: DataFrame, current: DataFrame
               ) -> DataFrame:
        cols = self.getOrDefault(self.inputCols)
        if not cols:
            raise ValueError("no columns set — call setInputCols(...)")
        k = self.getOrDefault(self.numBuckets)
        spark = reference.sparkSession
        edges = self._all_edges(reference, cols)

        grid = spark.createDataFrame(
            [(c, b) for c in cols for b in range(k)],
            "column string, bucket int")
        out = (grid
               .join(self._hist(reference, edges, "ref"),
                     ["column", "bucket"], "left")
               .join(self._hist(current, edges, "cur"),
                     ["column", "bucket"], "left")
               .select("column", "bucket",
                       F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                       F.coalesce("n_cur", F.lit(0)).alias("n_cur")))

        from pyspark.sql import Window

        # O(columns · buckets) rows — the window runs on the tiny
        # histogram table, never the data
        w = Window.partitionBy("column")
        p_ref = F.greatest(F.col("n_ref")
                           / F.sum("n_ref").over(w), F.lit(_FLOOR))
        p_cur = F.greatest(F.col("n_cur")
                           / F.sum("n_cur").over(w), F.lit(_FLOOR))
        return (out.withColumn("p_ref", p_ref)
                   .withColumn("p_cur", p_cur)
                   .withColumn("psi_term",
                               (F.col("p_cur") - F.col("p_ref"))
                               * F.log(F.col("p_cur") / F.col("p_ref"))))

    def summary(self, reference: DataFrame, current: DataFrame
                ) -> DataFrame:
        return _psi_summary(self.report(reference, current))

    def transform(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise TypeError("DriftMonitor is binary — call "
                        "report(reference, current)")


class CategoricalDriftMonitor(AlgoOperator):
    """PSI drift for categorical columns — the complement of
    :class:`DriftMonitor`'s quantile buckets: category frequencies
    compared directly (event types, languages, source domains,
    enum-ish string columns).

    ``report(reference, current)`` returns one row per (column,
    category)::

        column, category   category '__null__' for NULL values,
                           '__other__' for values outside the
                           reference's top ``maxCategories``
        n_ref, n_cur       counts
        p_ref, p_cur       floored proportions
        psi_term           (p_cur − p_ref) · ln(p_cur / p_ref)

    ``summary(reference, current)`` totals PSI per column with the
    same stable/moderate/action thresholds. The category vocabulary
    comes from the REFERENCE side (top ``maxCategories`` by count,
    ties lexicographic) — a brand-new category in the current
    snapshot lands in ``__other__``, which is exactly the signal a
    schema-drift alert wants.

    100 TB design: ONE exploded count pass over each table — the
    reference is scanned once (its mapped side derives from the
    already-aggregated counts, O(distinct categories) extra work) —
    an O(cols · maxCategories) vocabulary from a keyed window top-k
    (no global sort), O(cols · categories) output. A data value
    literally equal to a sentinel raises at execution time rather
    than silently merging populations.
    """

    inputCols = Param(Params._dummy(), "inputCols",
                      "categorical columns to monitor",
                      TypeConverters.toListString)
    maxCategories = Param(Params._dummy(), "maxCategories",
                          "reference vocabulary cap per column",
                          TypeConverters.toInt)

    NULL_CAT = "__null__"
    OTHER_CAT = "__other__"

    def __init__(self):
        super().__init__()
        self._setDefault(inputCols=[], maxCategories=100)

    def setInputCols(self, *v):
        if len(v) == 1 and isinstance(v[0], (list, tuple)):
            v = tuple(v[0])
        return self._set(inputCols=list(v))

    def setMaxCategories(self, v):
        v = int(v)
        if v < 1:
            raise ValueError(f"maxCategories must be >= 1, got {v}")
        return self._set(maxCategories=v)

    def _cells(self, df: DataFrame, cols: list[str]) -> DataFrame:
        """One (column, value) cell per monitored column per row.
        NULLs map to the ``__null__`` sentinel; a DATA value that is
        literally equal to either sentinel string would silently merge
        with the sentinel's population (e.g. nulls pre-stringified by
        an upstream ETL stage), so it fails LOUDLY at execution time
        via ``raise_error`` instead of producing merged counts."""
        def value(c):
            v = F.col(c).cast("string")
            return F.coalesce(
                F.when(v.isin(self.NULL_CAT, self.OTHER_CAT),
                       F.raise_error(F.concat(
                           F.lit("CategoricalDriftMonitor: column '"
                                 f"{c}' contains the literal sentinel "
                                 "value "), v,
                           F.lit(" — rename it upstream; sentinel "
                                 "categories must not occur as data"))))
                 .otherwise(v),
                F.lit(self.NULL_CAT))

        cells = F.explode(F.array(*[
            F.struct(F.lit(c).alias("column"), value(c).alias("value"))
            for c in cols]))
        return (df.select(cells.alias("__cell"))
                  .select(F.col("__cell.column").alias("column"),
                          F.col("__cell.value").alias("value")))

    def report(self, reference: DataFrame, current: DataFrame
               ) -> DataFrame:
        from pyspark.sql import Window

        cols = self.getOrDefault(self.inputCols)
        if not cols:
            raise ValueError("no columns set — call setInputCols(...)")
        mx = self.getOrDefault(self.maxCategories)

        ref_counts = (self._cells(reference, cols)
                      .groupBy("column", "value")
                      .agg(F.count(F.lit(1)).alias("n")))
        # reference vocabulary: top-N per column, keyed window top-k
        # (WindowGroupLimit — no global sort)
        w = Window.partitionBy("column").orderBy(
            F.desc("n"), F.asc("value"))
        vocab = (ref_counts.withColumn("__r", F.row_number().over(w))
                 .filter(F.col("__r") <= mx)
                 .select("column", "value"))

        in_vocab = vocab.withColumn("__in", F.lit(True))
        category = (F.when(F.col("__in").isNotNull(), F.col("value"))
                     .otherwise(F.lit(self.OTHER_CAT))
                     .alias("category"))

        # reference side derives from the ALREADY-AGGREGATED
        # ref_counts (O(distinct categories) rows) — re-exploding the
        # reference table would be a second full scan + shuffle
        ref_side = (ref_counts.join(in_vocab, ["column", "value"],
                                    "left")
                    .groupBy("column", category)
                    .agg(F.sum("n").alias("n_ref")))
        cur_side = (self._cells(current, cols)
                    .join(in_vocab, ["column", "value"], "left")
                    .select("column", category)
                    .groupBy("column", "category")
                    .agg(F.count(F.lit(1)).alias("n_cur")))

        out = (ref_side
               .join(cur_side, ["column", "category"], "full_outer")
               .select("column", "category",
                       F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                       F.coalesce("n_cur", F.lit(0)).alias("n_cur")))

        w2 = Window.partitionBy("column")
        p_ref = F.greatest(F.col("n_ref")
                           / F.sum("n_ref").over(w2), F.lit(_FLOOR))
        p_cur = F.greatest(F.col("n_cur")
                           / F.sum("n_cur").over(w2), F.lit(_FLOOR))
        return (out.withColumn("p_ref", p_ref)
                   .withColumn("p_cur", p_cur)
                   .withColumn("psi_term",
                               (F.col("p_cur") - F.col("p_ref"))
                               * F.log(F.col("p_cur") / F.col("p_ref"))))

    def summary(self, reference: DataFrame, current: DataFrame
                ) -> DataFrame:
        return _psi_summary(self.report(reference, current))

    def transform(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise TypeError("CategoricalDriftMonitor is binary — call "
                        "report(reference, current)")
