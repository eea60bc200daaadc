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
        dups = dup_arrow_evals(plan)
        if name in DUP_EVAL_BENIGN:
            dups = []  # hand-audited against-style gates, see below
        flags += dups
        if flags:
            flagged[name] = flags
    return flagged


def dup_arrow_evals(plan: str) -> list[str]:
    """Detect the r12 anti-pattern: the SAME Arrow UDF call evaluated
    by MULTIPLE ArrowEvalPython nodes (Catalyst performs no Python-UDF
    CSE across plan branches or explode's size filter — each extra
    node is a full re-run of the pass; boilerplate paid it 3×).

    Mechanism: every ArrowEvalPython line lists its UDF expressions as
    ``name(args#12)#345`` — the trailing ``#345`` is the node's OUTPUT
    expression id, the ids inside the parens identify the exact input
    attributes. A genuine duplicate evaluation re-runs the UDF on the
    SAME input attributes under a new output id (the explode-size-
    filter / cross-branch CSE gap), so the signature-with-input-ids
    repeats with distinct output ids. Benign look-alikes:
    InMemoryRelation cache-build reprints repeat the SAME output id
    (never flag); self-joins re-alias one side's attributes (never
    flag); but two FILTERS of one scan keep the base attribute ids,
    so an against-style gate that hashes the even-id corpus half and
    the odd-id crawl half separately DOES flag even though the two
    passes cover disjoint rows and nothing is recomputed. Those four
    known-benign gates are listed in ``DUP_EVAL_BENIGN`` — a NEW
    flagged query is a real double pass until shown otherwise (that
    is how the boilerplate 3× and coverage 2× passes were found).
    """
    sigs: dict[str, set[str]] = {}
    for m in re.finditer(r"ArrowEvalPython \[([^\]]*)\]", plan):
        for entry in m.group(1).split(", "):
            mm = re.match(r"(.*\))#(\d+)$", entry.strip())
            if not mm:
                continue
            sigs.setdefault(mm.group(1), set()).add(mm.group(2))
    return [f"duplicate-arrow-eval: {s} x{len(v)}"
            for s, v in sigs.items() if len(v) > 1]


# against-style gates: one scan, two disjoint filter halves, each
# hashed once — the duplicate-eval heuristic cannot see the disjoint
# filters from the flat plan string (audited by hand, r12)
DUP_EVAL_BENIGN = {
    "dedup_minhash_against_documents",
    "minhash_recall_documents",
    "minhash_topk_documents",
    "substring_decontaminate_documents",
}


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    flagged = audit(sf)
    for name, flags in flagged.items():
        print(f"{name}: {', '.join(flags)}")
    print(f"audited {len(QUERIES)} queries, flagged {len(flagged)}")
    sys.exit(1 if flagged else 0)
