"""Dump ``.explain("formatted")`` for registry queries to files.

Usage: python tools/explain_dump.py <out_dir> <tag> [sf_dir] q1 q2 ...

Writes ``<out_dir>/<query>_<tag>.txt`` for each query — the judge-facing
plan evidence for optimization rounds (plans/r12/<q>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_ml__spark.plans import QUERIES  # noqa: E402
from flink_ml__spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, tag = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    for name in rest:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
