"""Driver-faithful result canonicalizer, shared by the local replica
(`tools/check_correctness.py`) and the full-registry oracle tests
(`tests/test_oracles.py`).

The driver's t2 correctness gate compares `spark_df.toPandas()` against
`duckdb.execute(sql).df()` — columns sorted by name, rows sorted by
stringified values, floats rounded to 6 places. Canonicalizing from
PANDAS frames (not collect()/fetchall() rows) is load-bearing: DuckDB
HUGEINT (any uncast integer `sum()`) lands as float64 in `.df()` and
stringifies as "123.0", while Spark bigint lands as int64 "123". A
fetchall()-based comparator converts HUGEINT to Python int and can
never see that mismatch — the blind spot that kept 4 gates red through
rounds 9-10. Oracle authors: cast integer aggregates `::BIGINT`.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["canon_val", "canon_pdf", "dtype_class"]


def canon_val(v):
    """Stringify one pandas cell, keeping the int-vs-float distinction
    the driver's canonicalizer keeps (int64 "123" vs float64 "123.0").

    Rounding-mode note: ``round(f, 6)`` here is half-to-even while the
    registry's cross-engine discipline is floor(x·10ⁿ+0.5). The driver's
    own 6-dp rounding mode is unobserved — the replica does NOT rely on
    matching it. The invariant that makes the mode irrelevant is
    upstream: every gate emits floats already quantized identically in
    BOTH engines (the floor discipline at n ≤ 6 dp), so the two frames
    hold bit-identical float64s and ANY deterministic rounding maps
    them to equal strings. A divergence could only matter for a gate
    emitting unrounded floats that agree at 6 dp but differ in low
    bits — which the registry discipline forbids (see
    ``tests/test_canon.py`` for the half-boundary pin)."""
    if v is None:
        return "None"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        f = round(f, 6)
        if f == 0.0:  # normalize -0.0
            f = 0.0
        return str(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ", ".join(canon_val(x) for x in v) + "]"
    try:  # pd.NaT / pd.NA
        if v != v:
            return "NaN"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_pdf(pdf):
    """Canonicalize a pandas DataFrame: lowercase column names sorted
    alphabetically, each row a tuple of canonical strings, rows sorted.
    Returns (columns, rows)."""
    cols = [str(c).lower() for c in pdf.columns]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(tuple(canon_val(row[i]) for i in idx))
    out.sort()
    return [cols[i] for i in idx], out


def dtype_class(dtype) -> str:
    """Coarse dtype family used for the oracle dtype-parity lint: the
    classes whose string forms differ under the driver's canonicalizer."""
    if np.issubdtype(dtype, np.bool_):
        return "bool"
    if np.issubdtype(dtype, np.integer):
        return "int"
    if np.issubdtype(dtype, np.floating):
        return "float"
    if np.issubdtype(dtype, np.datetime64):
        return "datetime"
    return "object"
