"""Local replica of the driver's t2 correctness gate at an arbitrary SF.

Runs every QUERIES entry and its DuckDB oracle side-by-side and reports
row count / column-name / canonical value-hash matches, mimicking the
driver's pandas-based canonicalizer (columns sorted by name, rows sorted
by stringified values, floats rounded).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from flink_ml__spark.plans import ORACLES, QUERIES  # noqa: E402
from flink_ml__spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
            vals.append(v)
        out.append(tuple(str(x) for x in vals))
    out.sort()
    return [cols[i] for i in idx], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
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
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in ORACLES:
                results[name] = {"rows": len(s_rows), "oracle": None}
                continue
            o = con.execute(ORACLES[name])
            o_cols = [d[0].lower() for d in o.description]
            o_rows = o.fetchall()
            _, sv = _canon(s_rows, s_cols)
            _, ov = _canon(o_rows, o_cols)
            rec = {
                "rows_match": len(s_rows) == len(o_rows),
                "schema_match": sorted(s_cols) == sorted(o_cols),
                "hash_match": sv == ov,
                "spark_rows": len(s_rows),
                "oracle_rows": len(o_rows),
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
