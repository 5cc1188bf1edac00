"""Distributed per-group convex hull (extreme-point set + CCW ring).

The reference's geometry layer stops at faces/rings; a polygon analytics
engine also needs the classic "outline of a point cloud" reduction —
per-entity convex hulls (coverage footprints, cluster outlines, bbox
upgrades).  Pairwise/gift-wrap approaches are O(n^2) and undistributable;
this operator uses the hull REDUCTION identity

    hull(P1 ∪ P2) = hull(hull(P1) ∪ hull(P2))

so it runs as a two-level Spark aggregation, exactly like a partial +
final agg:

1. level 1 — every physical partition computes, per group it happens to
   hold, its own extreme points with an integer monotone chain
   (``mapInPandas`` — NO shuffle; this is the map-side combine).  A
   hull of n uniform points has ~O(log n) vertices, so the one shuffle
   in the whole plan carries hull vertices, never point clouds.
2. level 2 — one final chain per group over the union of partial hull
   vertices (group payload ~= partitions × hull size, bounded).

The partial split uses ``spark_partition_id()`` — safe because the
FINAL extreme-point set is invariant under any partitioning of P (a
globally extreme point is extreme in every subset containing it, and a
non-extreme point can never become extreme later), so the output is
deterministic even though the intermediate slices aren't.

All arithmetic is exact Python/NumPy int64 over the repo's integer
micro-coordinates (cross products bounded by ~2·(2^21)^2 « 2^63), and
"hull vertex" means STRICT extreme point: collinear edge-interior points
are dropped (strict-turn chain), duplicates are pre-deduped — giving the
unique minimal vertex set, reproducible as the convex-combination
exclusion test the DuckDB oracle runs (catalog `convex_hull`).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def chain_hull(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Andrew monotone chain over integer points -> CCW extreme points,
    starting at the lexicographically-smallest vertex.  Strict turns:
    collinear edge-interior points are excluded."""
    ps = sorted(set(pts))
    if len(ps) <= 2:
        return ps

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[tuple[int, int]] = []
    for p in ps:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[int, int]] = []
    for p in reversed(ps):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


_HULL_SCHEMA = T.StructType([
    T.StructField("g", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("px", T.LongType()),
    T.StructField("py", T.LongType()),
])


def _hull_udf(pdf):
    import pandas as pd
    g = int(pdf["g"].iloc[0])
    ring = chain_hull(list(zip(pdf["px"].astype(int), pdf["py"].astype(int))))
    return pd.DataFrame(
        [(g, i, x, y) for i, (x, y) in enumerate(ring)],
        columns=["g", "seq", "px", "py"])


def _partial_hulls(batches):
    """mapInPandas kernel: per Arrow batch, per group present in it, emit
    that slice's extreme points only (the map-side combine)."""
    import pandas as pd
    for pdf in batches:
        out = []
        for g, sub in pdf.groupby("g", sort=False):
            ring = chain_hull(
                list(zip(sub["px"].astype(int), sub["py"].astype(int))))
            out.extend((int(g), i, x, y) for i, (x, y) in enumerate(ring))
        yield pd.DataFrame(out, columns=["g", "seq", "px", "py"])


def convex_hull(df: DataFrame, group_col: str = "g",
                x: str = "px", y: str = "py") -> DataFrame:
    """-> (g, seq, px, py): each group's extreme points in CCW ring
    order (seq 0 = lexicographically-smallest vertex)."""
    pts = df.select(F.col(group_col).cast("long").alias("g"),
                    F.col(x).cast("long").alias("px"),
                    F.col(y).cast("long").alias("py"))
    # level 1: per-partition per-group partial hulls — zero shuffle
    partial = pts.mapInPandas(_partial_hulls, schema=_HULL_SCHEMA)
    # level 2: the only shuffle — final hull per group over the partial
    # hull VERTICES (group payload ~= partitions x O(log n) rows)
    return (partial.select("g", "px", "py")
            .groupBy("g")
            .applyInPandas(lambda pdf: _hull_udf(pdf), schema=_HULL_SCHEMA))
