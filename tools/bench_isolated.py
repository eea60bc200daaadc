"""Isolated per-query bench: one fresh Spark session per query, so a
timing reflects the query alone — no cross-query GC/spill/JIT pressure
from the 157-query shared-session sweep in bench.py.

Usage: python tools/bench_isolated.py [sf_dir] q1 q2 ...
Prints one JSON line {name: best_of_3_sec} and appends nothing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import bench
from flink_ml__spark.plans import QUERIES
from flink_ml__spark.session import get_spark
import pandas as pd
from pyspark.sql import functions as F

name, sf_dir = {name!r}, {sf_dir!r}
spark = get_spark("bench-isolated")

@F.pandas_udf("long")
def _warm(s: pd.Series) -> pd.Series:
    return s

spark.range(1000).select(F.sum(_warm("id"))).collect()

assert name in bench.HEADLINE or name in QUERIES, name
fn = QUERIES[name]
best = None
for _ in range(3):
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
    spark.catalog.clearCache()
print("ISOLATED_RESULT " + json.dumps({{name: round(best, 3)}}))
"""


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    out: dict[str, float] = {}
    for name in args:
        code = _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir)
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, cwd=REPO)
        for line in r.stdout.splitlines():
            if line.startswith("ISOLATED_RESULT "):
                out.update(json.loads(line[len("ISOLATED_RESULT "):]))
                break
        else:
            out[name] = -1.0
            sys.stderr.write(r.stderr[-2000:] + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
