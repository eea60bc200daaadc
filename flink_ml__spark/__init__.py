"""flink_ml__spark — a PySpark-native analytics/ML engine.

A from-scratch reimplementation of the capabilities of the reference
Flink-ML algorithm library (``cn.swust:algorithm-implement``, studied at
/root/reference) re-expressed Spark-first:

* relational substrate (scan/filter/agg/join/window) = DataFrame/Catalyst
* algorithm operators  = ``pyspark.ml``-idiom Estimators/Transformers
* iterative algorithms = driver loops over persisted DataFrames
* streaming variants   = event-time window aggregation (batch + Structured
  Streaming)

Package layout::

    operators/   algorithm operators (AHP, TOPSIS, FCM, Canopy, Apriori, ...)
    functions/   feature-generation + text/dedup/similarity functions
    sources/     table registry / readers for the test datasets
    plans/       headline analytic queries (bench + entry points)
    streaming/   Structured Streaming wrappers of the online operators
"""

from flink_ml__spark.pipeline import Pipeline, PipelineModel
from flink_ml__spark.version import __version__

__all__ = ["Pipeline", "PipelineModel", "__version__"]
