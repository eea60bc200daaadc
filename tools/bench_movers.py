"""Classify per-query bench movers between two bench maps.

Implements the r12 bench-variance protocol: before committing a
refreshed ``BENCH_full_queries.json``, diff it against the last
committed map, list every query that moved more than THRESH in either
direction, and print the load context of both maps so a mover can be
classified environmental vs real (isolated A/B via
``tools/bench_isolated.py`` is the tie-breaker).

Usage::

    python tools/bench_movers.py            # committed vs working tree
    python tools/bench_movers.py old.json new.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESH = 1.2


def load(path_or_ref: str) -> dict:
    if path_or_ref.startswith("HEAD"):
        out = subprocess.run(
            ["git", "-C", REPO, "show",
             f"{path_or_ref}:BENCH_full_queries.json"],
            capture_output=True, text=True, check=True)
        return json.loads(out.stdout)
    with open(path_or_ref) as f:
        return json.load(f)


def main() -> int:
    if len(sys.argv) == 3:
        old, new = load(sys.argv[1]), load(sys.argv[2])
        old_name, new_name = sys.argv[1], sys.argv[2]
    else:
        old = load("HEAD")
        new = load(os.path.join(REPO, "BENCH_full_queries.json"))
        old_name, new_name = "HEAD", "working tree"

    for label, m in (("old", old), ("new", new)):
        ctx = m.get("context", {})
        print(f"{label}: total={m.get('value')}s "
              f"n={len(m.get('queries', {}))} "
              f"load={ctx.get('loadavg_start')}→{ctx.get('loadavg_end')} "
              f"at {ctx.get('timestamp', '?')}")

    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    print(f"common queries: {len(common)}; "
          f"added: {sorted(set(nq) - set(oq))}; "
          f"removed: {sorted(set(oq) - set(nq))}")
    print(f"common total: {sum(oq[q] for q in common):.1f}s -> "
          f"{sum(nq[q] for q in common):.1f}s")

    movers = []
    for q in common:
        a, b = oq[q], nq[q]
        if a > 0 and (b / a >= THRESH or a / b >= THRESH) \
                and abs(b - a) >= 0.3:  # ignore sub-300ms jitter
            movers.append((b / a, q, a, b))
    movers.sort(reverse=True)
    if not movers:
        print(f"no >={THRESH}x movers ({old_name} -> {new_name})")
        return 0
    print(f">={THRESH}x movers (ratio, query, old_s, new_s) — "
          f"isolated-A/B before classifying as real:")
    for r, q, a, b in movers:
        print(f"  {r:5.2f}x  {q}  {a:.2f} -> {b:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
