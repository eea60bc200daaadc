"""Gap-based sessionization over an event stream.

The reference's online operators cover fixed tumbling windows
(`OnlineAHP.java:61-73` windowAll shapes); sessionization — grouping a
key's events into maximal runs separated by less than a gap — is the
other fundamental event-time windowing a telemetry/clickstream pipeline
needs, and Spark expresses it natively with ``F.session_window``
(dynamic, per-key merging windows; the same call works on batch frames
and Structured Streams with a watermark).
"""

from __future__ import annotations

from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ml__spark.base import AlgoOperator


class Sessionizer(AlgoOperator):
    """Per-key session aggregation: events of one ``keyCol`` value whose
    inter-event gap is under ``gap`` merge into one session row::

        <keyCol>       the key
        session_start  first event time (== session window start)
        session_last   last event time
        n_events       events in the session
        sum_value      sum of ``valueCol`` (omitted when valueCol="")

    100 TB design: ``session_window`` is a native Catalyst aggregation
    — one shuffle on (key, merged-window), partial merge map-side, and
    per-key state bounded by OPEN sessions only. Under Structured
    Streaming add ``withWatermark`` upstream and the same plan runs
    incrementally with watermark-scoped state eviction — no
    ``applyInPandasWithState`` custom code needed. An analytic
    lag/cumsum formulation (the SQL-oracle form) would instead sort
    every key's full history inside one window task.
    """

    timeCol = Param(Params._dummy(), "timeCol", "event-time column",
                    TypeConverters.toString)
    keyCol = Param(Params._dummy(), "keyCol", "session key column",
                   TypeConverters.toString)
    gap = Param(Params._dummy(), "gap",
                "max inactivity inside a session (interval string)",
                TypeConverters.toString)
    valueCol = Param(Params._dummy(), "valueCol",
                     "numeric column summed per session ('' disables)",
                     TypeConverters.toString)

    def __init__(self):
        super().__init__()
        self._setDefault(timeCol="ts", keyCol="user_id",
                         gap="30 minutes", valueCol="value")

    def getTimeCol(self):
        return self.getOrDefault(self.timeCol)

    def setTimeCol(self, v):
        return self._set(timeCol=v)

    def getKeyCol(self):
        return self.getOrDefault(self.keyCol)

    def setKeyCol(self, v):
        return self._set(keyCol=v)

    def getGap(self):
        return self.getOrDefault(self.gap)

    def setGap(self, v):
        return self._set(gap=v)

    def getValueCol(self):
        return self.getOrDefault(self.valueCol)

    def setValueCol(self, v):
        return self._set(valueCol=v)

    def transform(self, df: DataFrame) -> DataFrame:
        t, k = self.getTimeCol(), self.getKeyCol()
        aggs = [F.min(t).alias("session_start"),
                F.max(t).alias("session_last"),
                F.count(F.lit(1)).alias("n_events")]
        if self.getValueCol():
            aggs.append(F.sum(self.getValueCol()).alias("sum_value"))
        return (df
                .groupBy(k, F.session_window(F.col(t), self.getGap()))
                .agg(*aggs)
                .drop("session_window"))
