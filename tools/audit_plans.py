"""Physical-plan hygiene audit over every registered query.

Builds each ``QUERIES`` entry at a small SF and scans the executed plan
string for the scale anti-patterns the engine bans:

* ``CartesianProduct``      — an unconstrained cross join (the broadcast
                              nested-loop join of the exact ANN baseline
                              is deliberate and does NOT flag);
* ``BatchEvalPython``       — a row-at-a-time Python UDF in the plan
                              (all Python here must be Arrow-batched:
                              ``ArrowEvalPython`` / ``mapInPandas``);
* ``Window [...], []``      — a window with an empty partition spec,
                              which funnels its whole input through one
                              task.

Exit code 1 if anything flags, so the audit can gate CI.

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_ml__spark.plans import QUERIES  # noqa: E402
from flink_ml__spark.session import get_spark  # noqa: E402


def audit(sf_dir: str) -> dict[str, list[str]]:
    spark = get_spark("plan-audit", shuffle_partitions=8)
    flagged: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        try:
            plan = (fn(spark, sf_dir)._jdf.queryExecution()
                    .executedPlan().toString())
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            flagged[name] = [f"error: {str(e)[:120]}"]
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian-product")
        if "BatchEvalPython" in plan:
            flags.append("row-wise-python-udf")
        if re.search(r"Window \[[^\]]*\], \[\]", plan):
            flags.append("unpartitioned-window")
        if flags:
            flagged[name] = flags
    return flagged


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    flagged = audit(sf)
    for name, flags in flagged.items():
        print(f"{name}: {', '.join(flags)}")
    print(f"audited {len(QUERIES)} queries, flagged {len(flagged)}")
    sys.exit(1 if flagged else 0)
