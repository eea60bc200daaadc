"""Temporal joins Spark's built-in operators don't express directly.

``AsOfJoiner`` — the backward as-of join (for each left row, the
LATEST right row with ``right.ts <= left.ts`` per key): feature lookup
at event time, quote-at-trade-time, config-active-at-timestamp. Spark
has no asof relation operator (pandas-on-Spark's ``merge_asof``
delegates to a union+window plan much like this one); a naive
range-join formulation explodes to O(|L|·|R|) per key before
aggregation, which is why the union trick below is the standard
scale-safe shape.
"""

from __future__ import annotations

from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_ml__spark.base import AlgoOperator


class AsOfJoiner(AlgoOperator):
    """Backward as-of join.

    ``join(left, right, value_cols)`` returns ``left`` with, per row,
    the ``value_cols`` of the latest ``right`` row at-or-before its
    event time for the same key (NULLs when none exists, like a left
    join), plus ``asof_ts`` — the matched right row's time. Rows of
    ``right`` sharing the left row's exact timestamp DO match
    (``<=`` semantics). With ``tolerance`` (interval seconds > 0),
    matches older than ``tolerance`` are nulled out — the staleness
    bound every feature-lookup pipeline wants.

    100 TB design: tag and UNION both sides, ONE shuffle on the key,
    and a running ``last(..., ignorenulls)`` over the per-key
    time-sorted stream carries each right payload forward to the left
    rows that follow it — O(|L| + |R|) rows through one exchange, no
    per-key loop, no range-join explosion. Within one timestamp the
    right row sorts first, which is exactly the ``<=`` contract.
    """

    keyCol = Param(Params._dummy(), "keyCol", "join key column",
                   TypeConverters.toString)
    timeCol = Param(Params._dummy(), "timeCol", "event-time column",
                    TypeConverters.toString)
    toleranceSec = Param(Params._dummy(), "toleranceSec",
                         "max staleness in seconds (0 = unbounded)",
                         TypeConverters.toFloat)

    def __init__(self):
        super().__init__()
        self._setDefault(keyCol="user_id", timeCol="ts", toleranceSec=0.0)

    def getKeyCol(self):
        return self.getOrDefault(self.keyCol)

    def setKeyCol(self, v):
        return self._set(keyCol=v)

    def getTimeCol(self):
        return self.getOrDefault(self.timeCol)

    def setTimeCol(self, v):
        return self._set(timeCol=v)

    def getToleranceSec(self):
        return self.getOrDefault(self.toleranceSec)

    def setToleranceSec(self, v):
        return self._set(toleranceSec=float(v))

    def join(self, left: DataFrame, right: DataFrame,
             value_cols: list[str]) -> DataFrame:
        k, t = self.getKeyCol(), self.getTimeCol()
        payload = F.struct(F.col(t).alias("__rt"),
                           *[F.col(c) for c in value_cols])
        r = right.select(F.col(k), F.col(t), payload.alias("__rv"),
                         F.lit(0).alias("__side"))
        l = left.withColumn("__rv", F.lit(None).cast(
            r.schema["__rv"].dataType)).withColumn(
                "__side", F.lit(1))
        u = l.unionByName(r, allowMissingColumns=True)
        w = (Window.partitionBy(k).orderBy(F.col(t).asc(),
                                           F.col("__side").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        carried = F.last("__rv", ignorenulls=True).over(w)
        out = (u.withColumn("__c", carried)
               .filter(F.col("__side") == 1))
        if self.getToleranceSec() > 0:
            fresh = (F.col(t).cast("double")
                     - F.col("__c.__rt").cast("double")
                     <= F.lit(self.getToleranceSec()))
            out = out.withColumn(
                "__c", F.when(fresh, F.col("__c")))
        out = out.withColumn("asof_ts", F.col("__c.__rt"))
        for c in value_cols:
            out = out.withColumn(c, F.col(f"__c.{c}"))
        return out.drop("__rv", "__side", "__c")
