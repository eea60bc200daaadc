"""Local replica of the driver's t2 correctness gate at an arbitrary SF.

Runs every QUERIES entry and its DuckDB oracle side-by-side and reports
row count / column-name / canonical value-hash matches, mimicking the
driver's PANDAS-based canonicalizer: `spark_df.toPandas()` vs
`con.execute(sql).df()`, columns sorted by name, rows sorted by
stringified values, floats rounded to 6 places.

The pandas path is load-bearing: DuckDB HUGEINT (uncast sum()) lands as
float64 in `.df()` and stringifies as "123.0", while Spark bigint lands
as int64 "123" — a mismatch the driver sees but a `fetchall()`-based
replica (which converts HUGEINT to Python int) can never see. That
blind spot cost rounds 9-10; do not revert to collect()/fetchall().

Usage: python tools/check_correctness.py [--first N] [sf_dir] [query ...]
  --first N  also check the first N registry keys (the driver's gate
             window) in addition to any names given explicitly.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from flink_ml__spark.plans import ORACLES, QUERIES  # noqa: E402
from flink_ml__spark.plans.canon import canon_pdf as _canon_pdf  # noqa: E402
from flink_ml__spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    args = sys.argv[1:]
    first_n = 0
    if "--first" in args:  # check the driver's window: first N
        i = args.index("--first")  # registry keys, in registry order
        first_n = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if first_n:
        only |= set(list(QUERIES)[:first_n])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(sf_dir, t + '.parquet')}'")
    results = {}
    fails = []
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        try:
            sdf = QUERIES[name](spark, sf_dir)
            s_pdf = sdf.toPandas()
            if name not in ORACLES:
                results[name] = {"rows": len(s_pdf), "oracle": None}
                continue
            o_pdf = con.execute(ORACLES[name]).df()
            s_cols, sv = _canon_pdf(s_pdf)
            o_cols, ov = _canon_pdf(o_pdf)
            rec = {
                "rows_match": len(s_pdf) == len(o_pdf),
                "schema_match": s_cols == o_cols,
                "hash_match": sv == ov,
                "spark_rows": len(s_pdf),
                "oracle_rows": len(o_pdf),
            }
            if not rec["hash_match"]:
                diff = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
                rec["first_diffs"] = diff
                fails.append(name)
            results[name] = rec
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": f"{type(exc).__name__}: {exc}"}
            fails.append(name)
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{'FAIL: ' + ', '.join(fails) if fails else 'ALL GREEN'}",
          file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
