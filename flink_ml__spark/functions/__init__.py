from flink_ml__spark.functions.curation import (
    ContaminationChecker,
    DeterministicSplitter,
    DomainBalancer,
    DuplicateClusterer,
    RepetitionScorer,
    SequencePacker,
    TfIdfKeywords,
)
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
    "ContaminationChecker",
    "DeterministicSplitter",
    "DomainBalancer",
    "DuplicateClusterer",
    "MeanImputer",
    "MeanImputerModel",
    "RepetitionScorer",
    "SequencePacker",
    "StandardScaler",
    "StandardScalerModel",
    "TfIdfKeywords",
    "TimeFeatureExtractor",
]
