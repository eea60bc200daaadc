from flink_ml__spark.operators.ahp import AHP, OnlineAHP
from flink_ml__spark.operators.topsis import Topsis

__all__ = ["AHP", "OnlineAHP", "Topsis"]
