from flink_ml__spark.functions.feature_gen import (
    AutoFeatureTransformer,
    MeanImputer,
    MeanImputerModel,
    StandardScaler,
    StandardScalerModel,
    TimeFeatureExtractor,
)

__all__ = [
    "AutoFeatureTransformer",
    "MeanImputer",
    "MeanImputerModel",
    "StandardScaler",
    "StandardScalerModel",
    "TimeFeatureExtractor",
]
