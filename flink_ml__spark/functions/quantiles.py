"""Bit-identical driver-side replacement for exact ``F.percentile`` fits.

Several fitted operators (RankGauss, Lorenz deciles, uplift/qini score
bins, padding-waste buckets, quantile matching) end their fit with::

    df.agg(F.percentile(x, F.array(<k-1 probs>))).first()

``Percentile`` is a ``TypedImperativeAggregate``: every partial buffers
an OpenHashMap of (value, count), the partials serialize to the single
final reducer, and the whole evaluation is interpreted (no codegen).
At sf0.1 that one aggregate measures 4-5 s on a 600 k-row column —
~80 % of the whole rank_gauss_lineitem query (guide §1.1: find the one
thing; §4.2: hand bulk work to vectorized native code).

:func:`exact_percentiles` computes the same edges in ONE single-
partition Arrow pass: ship the filtered column (only that column —
guide §4.1) to one Python task, ``np.sort`` it, and replay Spark's own
interpolation arithmetic bit-for-bit:

* position ``pos = p * (n - 1)`` (double),
* ``lower = floor(pos)``, ``higher = ceil(pos)``,
* equal keys (including integer ``pos``) short-circuit to the exact
  value with NO interpolation — ``Percentile.getPercentile`` returns
  ``toDoubleValue(lowerKey)`` when ``lower == higher`` or the two keys
  compare equal,
* otherwise ``(higher - pos) * s[lower] + (pos - lower) * s[higher]``
  — Spark's operand order, which differs from ``np.quantile``'s
  ``_lerp`` by 1 ulp on half-boundary fractions (np switches to
  ``b - (b-a)*(1-t)`` for t >= 0.5).

Verified bit-identical against ``F.percentile`` across 7 columns x 6
grid sizes at sf0.1 (see OPTIMIZATION_r12.md).

Scale contract: identical to the exact aggregate it replaces — exact
percentiles fundamentally gather the column to ONE node either way
(Spark's implementation ships every partial's value map to a single
reducer; this ships the raw column once, with no per-value hashmap or
java serialization round trip). Callers that need bounded memory at
100 TB keep their ``approx_percentile`` path (``exactEdges=False`` /
``relativeError > 0``), which is mergeable and unaffected here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def exact_percentiles(df: DataFrame, col: Column | str,
                      probs: list[float]) -> list[float] | None:
    """Exact percentiles of ``col`` over ``df`` at ``probs``.

    Returns driver-side floats, bit-identical to
    ``df.agg(F.percentile(col, F.array(*probs))).first()`` on
    NaN-free data (nulls are ignored, as ``percentile`` does).
    Returns ``None`` when no non-null values exist (where the
    aggregate yields SQL NULL).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    ps = [float(p) for p in probs]

    def qt(batches):
        chunks = [b["__x"].to_numpy() for b in batches if len(b)]
        if not chunks:
            return
        s = np.sort(np.concatenate(chunks))
        n = len(s)
        pos = np.asarray(ps, dtype=np.float64) * (n - 1)
        lo = np.floor(pos)
        hi = np.ceil(pos)
        sl = s[lo.astype(np.int64)]
        sh = s[hi.astype(np.int64)]
        vals = np.where(sl == sh, sl, (hi - pos) * sl + (pos - lo) * sh)
        yield pd.DataFrame({"es": [vals.tolist()]})

    # collect(), not first(): first()/take(1) runs the incremental
    # take path (a 1-partition probe job, then a widening job) — two
    # jobs for a frame that is 1 row by construction
    rows = (df.select(c.cast("double").alias("__x"))
            .filter(F.col("__x").isNotNull())
            .coalesce(1)
            .mapInPandas(qt, "es array<double>")
            .collect())
    return None if not rows else list(rows[0]["es"])
