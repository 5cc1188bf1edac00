"""Distributed DBSCAN over the integer micro-coordinate point space.

Density clustering is the classic "spatial analytics at scale" operator
the reference's cell-grid machinery makes easy and an R-tree makes hard
to distribute: the reference snaps/queries via per-tile indexes
(Geo/RTree.cs:84-89, Tiles/TileStatic.cs:57-73); here the same
grid-blocking idea IS the epsilon-neighbor join, so the whole algorithm
is three shuffle-bounded stages:

1. **epsilon-neighbor join** — grid cells of side ``eps``: a point's
   neighbors within ``eps`` can only live in the 3x3 cell halo, so the
   probe side explodes to 9 candidate cells and equi-joins the plain
   cell key (each ordered pair found exactly once: the probe visits the
   neighbor's single home cell).  Exact integer squared-distance refine
   in the join condition.  One shuffle on the cell key; at 100 TB the
   cell population is bounded by density x eps^2, never by corpus size.
2. **core detection** — neighbor counts per point (partial-aggregable);
   core iff |N_eps(p)| >= min_pts counting the point itself (Ester et
   al., KDD'96 definition).
3. **clusters** — connected components over the CORE-CORE epsilon
   edges (``near_dup_components`` — min-label propagation + pointer
   jumping, the machinery the dedup/merge phases already use).  A core
   with no core neighbor is its own singleton cluster.  Border points
   (non-core with a core neighbor) join the MIN cluster label among
   their core neighbors — the deterministic version of DBSCAN's
   order-dependent border tie-break.  Everything else is noise.

Output: one row per point — ``(point_id, role, cluster)`` with role in
{'core','border','noise'} and cluster = the smallest core point_id of
the cluster (NULL for noise).  Deterministic: a pure function of the
point multiset, independent of partitioning.

The neighbor-pair frame feeds three consumers (counts, core edges,
border assignment), so it is localCheckpointed once instead of replayed
per consumer (repo rule: self-join/multi-consumer subtrees recompute).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import near_dup_components


def eps_neighbor_pairs(pts: DataFrame, eps: int,
                       id_col: str = "point_id",
                       x_col: str = "px", y_col: str = "py") -> DataFrame:
    """Ordered pairs (pa, pb), pa != pb, within euclidean ``eps`` —
    grid-blocked 3x3 halo equi-join, exact integer refine."""
    base = pts.select(F.col(id_col).alias("pid"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"))
    home = base.select(
        F.col("pid").alias("pb"), F.col("x").alias("bx"),
        F.col("y").alias("by"),
        (F.expr(f"x DIV {int(eps)}") * F.lit(1 << 21)
         + F.expr(f"y DIV {int(eps)}")).alias("cell"))
    # probe side: 9 candidate cells per point (halo), built from
    # materialized integer columns (never a lambda over an expression)
    probe = (base
             .withColumn("gx", F.expr(f"x DIV {int(eps)}"))
             .withColumn("gy", F.expr(f"y DIV {int(eps)}"))
             .select(
                 F.col("pid").alias("pa"), F.col("x").alias("ax"),
                 F.col("y").alias("ay"),
                 F.explode_outer(F.flatten(F.transform(
                     F.sequence(F.col("gx") - 1, F.col("gx") + 1),
                     lambda cx: F.transform(
                         F.sequence(F.col("gy") - 1, F.col("gy") + 1),
                         lambda cy: cx * F.lit(1 << 21) + cy))))
                 .alias("cell")))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    return (probe.join(home, "cell")
            .where((F.col("pa") != F.col("pb"))
                   & (d2 <= F.lit(int(eps) * int(eps))))
            .select("pa", "pb"))


def dbscan(pts: DataFrame, eps: int, min_pts: int,
           id_col: str = "point_id",
           x_col: str = "px", y_col: str = "py") -> DataFrame:
    """-> (point_id, role, cluster): deterministic distributed DBSCAN.

    role: 'core' | 'border' | 'noise'; cluster = min core point_id of
    the density-connected component (NULL for noise)."""
    ids = pts.select(F.col(id_col).cast("long").alias("point_id"))
    pairs = (eps_neighbor_pairs(pts, eps, id_col, x_col, y_col)
             .localCheckpoint(eager=True))  # 3 consumers below

    deg = pairs.groupBy(F.col("pa").alias("point_id")).agg(
        F.count("*").alias("n_nb"))
    core = (deg.filter(F.col("n_nb") + 1 >= F.lit(int(min_pts)))
            .select("point_id")
            .localCheckpoint(eager=True))   # edge filter + border + role

    # core-core edges -> components; singleton cores label themselves
    ce = (pairs
          .join(core.select(F.col("point_id").alias("pa")), "pa")
          .join(core.select(F.col("point_id").alias("pb")), "pb")
          .where(F.col("pa") < F.col("pb")))
    comp = near_dup_components(ce, id_a="pa", id_b="pb").select(
        F.col("doc_id").alias("point_id"), F.col("component").alias("cluster"))
    core_lab = (core.join(comp, "point_id", "left")
                .select("point_id",
                        F.coalesce("cluster", "point_id").alias("cluster"))
                .localCheckpoint(eager=True))  # border join + core output

    # border: non-core point with >= 1 core neighbor takes the MIN
    # neighbor cluster label (deterministic tie-break)
    border = (pairs
              .join(core_lab.select(F.col("point_id").alias("pb"),
                                    F.col("cluster")), "pb")
              .join(core.select(F.col("point_id").alias("pa")), "pa",
                    "left_anti")
              .groupBy(F.col("pa").alias("point_id"))
              .agg(F.min("cluster").alias("cluster")))

    labeled = (core_lab.select("point_id", F.lit("core").alias("role"),
                               "cluster")
               .unionByName(border.select(
                   "point_id", F.lit("border").alias("role"), "cluster")))
    noise = (ids.join(labeled.select("point_id"), "point_id", "left_anti")
             .select("point_id", F.lit("noise").alias("role"),
                     F.lit(None).cast("long").alias("cluster")))
    return labeled.unionByName(noise)


def cluster_stats(assign: DataFrame) -> DataFrame:
    """Per-cluster rollup of a :func:`dbscan` result: sizes by role —
    one partial-aggregable groupBy, safe at any cluster count."""
    return (assign.where(F.col("cluster").isNotNull())
            .groupBy("cluster")
            .agg(F.count("*").alias("n_points"),
                 F.sum(F.when(F.col("role") == "core", 1).otherwise(0))
                 .cast("long").alias("n_core"),
                 F.sum(F.when(F.col("role") == "border", 1).otherwise(0))
                 .cast("long").alias("n_border")))
