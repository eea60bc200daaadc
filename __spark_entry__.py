"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (AHP entropy-weight scoring over
lineitem) at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2 plus
the north-star pipeline operators (dedup / similarity / text analysis /
multimodal).
``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible query;
rows-only by design: FCM, Canopy, KMeans and SemDeDup cluster outputs
(iterative + seeded — each is paired with an oracle-checked
expected-empty invariants gate). The ANN gates are violations-only
recall-floor checks (expected empty, WHERE-false oracle); the
stub-codec image/audio/resize/frame/dhash gates ARE oracle-checked
(hex-domain keystream replayed in SQL).
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
