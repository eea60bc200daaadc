"""Windowed AHP over the event stream (mirrors OnlineAHPExample.java:
per tumbling event-time window, window-local entropy weights)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.operators import OnlineAHP
    from flink_ml__spark.sources import load_table

    spark = get_session("online-ahp-example")
    ev = load_table(spark, "events", SF_DIR).withColumn(
        "props_len", F.length("props").cast("double"))
    op = (OnlineAHP().setInputCols(["value", "props_len"])
          .setJudgmentMatrix([[1.0, 2.0], [0.5, 1.0]])
          .setIndicatorType([1, 0])
          .setWindows("1 day").setTimeCol("ts").setOutputCol("score"))
    op.transform(ev).select("event_id", "ts", "score").show(5)


if __name__ == "__main__":
    main()
