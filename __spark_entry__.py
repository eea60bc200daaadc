"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (AHP entropy-weight scoring over
lineitem) at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2 plus
the north-star pipeline operators (dedup / similarity / text analysis /
multimodal).
``oracle_sql()`` — matching DuckDB SQL for EVERY query: since round 9
there are no rows-only entries. Seeded-iterative operators (FCM,
Canopy, KMeans, SemDeDup) are gated by pairs of complementary
expected-empty invariant projections (WHERE-false oracles); the ANN
gates are violations-only recall-floor checks; the stub-codec
image/audio/resize/frame/dhash gates are oracle-checked via the
hex-domain keystream replayed in SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flink_ml__spark.plans import QUERIES

    return QUERIES["ahp_score_lineitem"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flink_ml__spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from flink_ml__spark.plans import ORACLES

    return dict(ORACLES)
