"""One-shot codemod: convert paired value-rounding sites in
plans/queries.py from round() to the cross-engine-stable floor
fixed-point form.

Why: Spark's round (exact-decimal BigDecimal HALF_UP) and DuckDB's
round (float-math) diverge on boundary values even for bit-identical
inputs — the class behind the round-9 hash mismatches
(partition_health_orders, temperature_mix_documents).
floor(x * 10^n + 0.5) / 10^n is IEEE-exact arithmetic on both engines
(the + 0.5 is load-bearing: bare floor truncates and flips on
exact-decimal boundary noise — see the _fq docstring in queries.py), so
bit-identical inputs can never diverge, and ulp-close inputs carry the
same (tiny) boundary risk they always had.

Transformations (queries.py only; operator-internal rounding is
converted by hand where the oracle check flags a pairing):
  SQL   round(EXPR, {R})  ->  floor((EXPR) * 1e{R} + 0.5) / 1e{R}
  SQL   round(EXPR, N)    ->  floor((EXPR) * 1eN + 0.5) / 1eN
  Spark F.round(EXPR, R)  ->  _fq(EXPR)
  Spark F.round(EXPR, N)  ->  _fq(EXPR, N)

Balanced-paren scanning; idempotent (no round( sites remain after).
"""

from __future__ import annotations

import os
import re
import sys

QPATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "flink_ml__spark", "plans", "queries.py")

HELPER = '''

def _fq(c, nd=R):
    """Cross-engine-stable fixed-point quantizer: floor(x*10^nd + 0.5)/10^nd.
    The SQL twin is floor((x) * 1e{nd} + 0.5) / 1e{nd}. Unlike round(),
    whose implementations (BigDecimal HALF_UP vs float-math) diverge
    on boundary values even for bit-identical inputs, every operation
    here is IEEE-exact, so identical inputs quantize identically in
    any engine."""
    c = F.col(c) if isinstance(c, str) else c
    s = float(10 ** nd)
    return F.floor(c * s + 0.5) / s
'''


def _scan_arg(src: str, start: int) -> tuple[str, str, int]:
    """From index just past 'round(', return (arg, nd_token, end_idx)
    where end_idx is past the closing paren; nd_token is '{R}', 'R' or
    digits. Returns None-tuple if the tail isn't a simple nd."""
    depth = 1
    i = start
    top_comma = -1
    while i < len(src):
        ch = src[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        elif ch == "," and depth == 1:
            top_comma = i  # keep LAST top-level comma
        i += 1
    if depth != 0 or top_comma < 0:
        return None, None, -1
    arg = src[start:top_comma]
    nd = src[top_comma + 1:i].strip()
    return arg, nd, i + 1


def main() -> int:
    src = open(QPATH).read()
    n_sql = n_spark = 0

    # --- Spark side: F.round(EXPR, nd) -> _fq(EXPR[, nd])
    out = []
    i = 0
    while True:
        j = src.find("F.round(", i)
        if j < 0:
            out.append(src[i:])
            break
        arg, nd, end = _scan_arg(src, j + len("F.round("))
        if nd is None or not (nd == "R" or nd.isdigit()):
            out.append(src[i:j + len("F.round(")])
            i = j + len("F.round(")
            continue
        out.append(src[i:j])
        if nd == "R":
            out.append(f"_fq({arg})")
        else:
            out.append(f"_fq({arg}, {nd})")
        n_spark += 1
        i = end
    src = "".join(out)

    # --- SQL side: round(EXPR, {R}) / round(EXPR, N) -> floor form.
    # Skip F.round / _fq leftovers by requiring the char before 'round('
    # to be a non-identifier, non-dot char.
    out = []
    i = 0
    while True:
        j = src.find("round(", i)
        if j < 0:
            out.append(src[i:])
            break
        prev = src[j - 1] if j > 0 else " "
        if prev.isalnum() or prev in "._":
            out.append(src[i:j + len("round(")])
            i = j + len("round(")
            continue
        arg, nd, end = _scan_arg(src, j + len("round("))
        if nd is None or not (nd == "{R}" or nd.isdigit()):
            out.append(src[i:j + len("round(")])
            i = j + len("round(")
            continue
        out.append(src[i:j])
        p = "{R}" if nd == "{R}" else nd
        out.append(f"floor(({arg}) * 1e{p} + 0.5) / 1e{p}")
        n_sql += 1
        i = end
    src = "".join(out)

    # install the helper right after the R constant
    anchor = re.search(r"^R = 6 .*$", src, re.M)
    if "_fq(" in src and "def _fq(" not in src:
        src = (src[:anchor.end()] + HELPER + src[anchor.end():])

    open(QPATH, "w").write(src)
    print(f"converted {n_spark} Spark sites, {n_sql} SQL sites")
    return 0


if __name__ == "__main__":
    sys.exit(main())
