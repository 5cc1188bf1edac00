"""Distributed per-group 2D skyline (Pareto frontier, minimize both).

The data-curation sibling of the convex hull: "which candidates are not
beaten on BOTH axes" (cost vs quality, length vs perplexity, distance vs
resistance).  A point p is dominated iff some q has q.x <= p.x and
q.y <= p.y with at least one strict; the skyline is the dominance-free
set — unique, so the operator is deterministic and oracle-checkable by
the NOT EXISTS dominance test.

Same two-level reduction shape as ``operators/hull.py`` (the skyline
REDUCTION identity: skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))):

1. every physical partition computes, per group it holds, the skyline of
   its slice (``mapInPandas`` — zero shuffle; a sort + running-min scan,
   O(n log n), no pairwise work);
2. one final scan per group over the partial skylines (the only shuffle
   carries skyline candidates, ~O(partitions · log n) rows per group for
   uniform data, never point clouds).

A globally non-dominated point is non-dominated in every subset, and a
dominated point stays dominated once its dominator is present — so the
final set is invariant under partitioning (pytest-pinned).

All comparisons are exact int64; ties and duplicates are handled by the
strict-dominance definition (exact duplicates collapse to one row).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def skyline_scan(xs, ys):
    """Exact 2D minimize-skyline of int arrays -> sorted unique list of
    (x, y) skyline points: lexsort by (x, y), keep strictly-improving y."""
    import numpy as np
    order = np.lexsort((ys, xs))
    out = []
    best = None
    for i in order:
        y = int(ys[i])
        if best is None or y < best:
            out.append((int(xs[i]), y))
            best = y
    return out


_SKY_SCHEMA = T.StructType([
    T.StructField("g", T.LongType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
])


def _partial(batches):
    import pandas as pd
    for pdf in batches:
        rows = []
        for g, sub in pdf.groupby("g", sort=False):
            rows.extend((int(g), x, y) for x, y in
                        skyline_scan(sub["x"].to_numpy(),
                                     sub["y"].to_numpy()))
        yield pd.DataFrame(rows, columns=["g", "x", "y"])


def _final(pdf):
    import pandas as pd
    g = int(pdf["g"].iloc[0])
    pts = skyline_scan(pdf["x"].to_numpy(), pdf["y"].to_numpy())
    return pd.DataFrame([(g, x, y) for x, y in pts],
                        columns=["g", "x", "y"])


def skyline_2d(df: DataFrame, group_col: str = "g",
               x: str = "x", y: str = "y") -> DataFrame:
    """-> (g, x, y): each group's exact strict-dominance skyline
    (minimize both axes), partitioning-invariant."""
    pts = df.select(F.col(group_col).cast("long").alias("g"),
                    F.col(x).cast("long").alias("x"),
                    F.col(y).cast("long").alias("y"))
    partial = pts.mapInPandas(_partial, schema=_SKY_SCHEMA)
    return partial.groupBy("g").applyInPandas(
        lambda pdf: _final(pdf), schema=_SKY_SCHEMA)
