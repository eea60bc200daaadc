"""Per-job/stage profile of one registry query in a fresh session.

Runs the query through the noop sink (after the same pandas-UDF warmup
bench.py uses), then dumps every Spark job with wall duration and stage
shuffle metrics from the AppStatusStore — the local[N] stand-in for the
Spark UI's Jobs/Stages pages (guide §7.1; the UI is disabled in this
sandbox).

Usage: python tools/profile_query.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_ml__spark.plans import QUERIES  # noqa: E402
from flink_ml__spark.session import get_spark  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = get_spark("profile")

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(F.sum(_warm("id"))).collect()

    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark._jvm.java.util.ArrayList()  # all statuses
    t_first = None
    for rep in range(reps):  # rep 2 is the bench-comparable (warm) one
        mark = [j.jobId() for j in _as_list(store.jobsList(empty))]
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        if t_first is None:
            t_first = t_total
        spark.catalog.clearCache()
        if rep < reps - 1:
            continue
        jobs = [j for j in _as_list(store.jobsList(empty))
                if j.jobId() not in set(mark)]
        jobs.sort(key=lambda j: j.jobId())
        print(f"\n=== {name}  total={t_total:.3f}s "
              f"(build={t_build * 1000:.0f}ms, first_rep={t_first:.3f}s, "
              f"jobs={len(jobs)}) ===")
        for j in jobs:
            sub = j.submissionTime().get().getTime()
            dur = ((j.completionTime().get().getTime() - sub) / 1000.0
                   if j.completionTime().isDefined() else -1)
            desc = (j.description().get()
                    if j.description().isDefined() else j.name())
            print(f"job {j.jobId():>4}  {dur:7.3f}s  tasks={j.numTasks():>4}"
                  f"  {str(desc)[:90]}")
    return 0


def _as_list(seq):
    it = seq.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


if __name__ == "__main__":
    raise SystemExit(main())
