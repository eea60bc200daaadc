from flink_ml__spark.operators.ahp import AHP, OnlineAHP
from flink_ml__spark.operators.apriori import Apriori
from flink_ml__spark.operators.canopy import Canopy
from flink_ml__spark.operators.fcm import FCM, FCMModel
from flink_ml__spark.operators.kmeans import KMeans, KMeansModel
from flink_ml__spark.operators.online_topsis import OnlineTopsis, OnlineTopsisModel
from flink_ml__spark.operators.topsis import Topsis

__all__ = [
    "AHP", "OnlineAHP", "Apriori", "Canopy", "FCM", "FCMModel",
    "KMeans", "KMeansModel", "OnlineTopsis", "OnlineTopsisModel", "Topsis",
]
