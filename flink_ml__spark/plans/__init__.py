from flink_ml__spark.plans.queries import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
