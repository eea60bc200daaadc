"""Shared example bootstrap."""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# python workers resolve the package via PYTHONPATH (cwd may be examples/)
os.environ["PYTHONPATH"] = (_REPO + os.pathsep +
                            os.environ.get("PYTHONPATH", ""))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def get_session(name: str):
    from flink_ml__spark.session import get_spark

    return get_spark(name, shuffle_partitions=8)
