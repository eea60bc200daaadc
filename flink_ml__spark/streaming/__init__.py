from flink_ml__spark.streaming.online import (
    stream_cardinality_monitor,
    stream_corpus_monitor,
    stream_dedup_against_corpus,
    stream_correlation_monitor,
    stream_drift_monitor,
    stream_exact_dedup,
    stream_expectation_monitor,
    stream_minhash_dedup_against_corpus,
    stream_online_ahp,
    stream_online_topsis_apply,
    stream_online_topsis_apply_streams,
    stream_online_topsis_fit,
)

__all__ = [
    "stream_cardinality_monitor",
    "stream_corpus_monitor",
    "stream_dedup_against_corpus",
    "stream_correlation_monitor",
    "stream_drift_monitor",
    "stream_exact_dedup",
    "stream_expectation_monitor",
    "stream_minhash_dedup_against_corpus",
    "stream_online_ahp",
    "stream_online_topsis_apply",
    "stream_online_topsis_apply_streams",
    "stream_online_topsis_fit",
]
