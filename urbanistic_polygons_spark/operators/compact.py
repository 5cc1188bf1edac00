"""Cell-cover compaction: minimal mixed-resolution covers (H3 ``compact``
analog over the engine's quadtree cell grid).

The reference serves every geometry from fixed-zoom tile sets
(Tiles/TileStatic.cs SubTilesFor descent, used by the z<14 serve path);
production cell engines (H3 ``compact_cells``, S2 ``S2CellUnion.Normalize``)
store large covers in the MINIMAL mixed-resolution form instead: wherever
all four children of a parent cell are present, the parent replaces them,
recursively.  A country-sized polygon's cover shrinks ~100x, every
downstream cell equi-join probes the compacted set per level, and
containment tests stay exact.

Semantics (bottom-up, per group):
  level z:   children whose parent has all 4 present are CONSUMED;
             the parent joins the level z-1 frontier; every other cell
             is FINAL at z.
  repeat until ``zoom_to``; the remaining frontier is final there.

The output is the unique minimal cover: expanding every output cell back
to ``zoom_from`` reproduces the input set exactly (asserted by the pytest
roundtrip), and no four siblings coexist at any level above ``zoom_to``
(minimality — also asserted).

Scale shape (100 TB): one partially-aggregable groupBy per level (bounded
unrolled loop, zoom_from - zoom_to levels); the reduce key space shrinks
4x per level, no joins, no driver data, and the per-group state is never
collected.  The group key rides every shuffle, so covers of distinct
polygons never meet.  collect_list is bounded by 4 (the quad fan-in) by
construction.

Cell ids are the engine's ``cell = y * 2^z + x`` (functions/cells.py:5);
the parent of (x, y) at z is (x DIV 2, y DIV 2) at z-1.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_cover(cover: DataFrame, id_col: str, cell_col: str,
                  zoom_from: int, zoom_to: int) -> DataFrame:
    """-> (id_col, zoom, cell): the minimal mixed-resolution cover of
    each group's cell set.  ``cover`` holds distinct cells at
    ``zoom_from``; ``zoom_to`` bounds the promotion (parents stop being
    considered above it)."""
    if zoom_to >= zoom_from:
        raise ValueError("zoom_to must be < zoom_from")
    cur = cover.select(F.col(id_col).alias("gid"),
                       F.col(cell_col).cast("long").alias("cell"))
    finals: list[DataFrame] = []
    for z in range(zoom_from, zoom_to, -1):
        n = 1 << z
        parent = (F.expr(f"(cell DIV {n}) DIV 2") * F.lit(n // 2)
                  + F.expr(f"(cell % {n}) DIV 2"))
        # eager lineage cut per level (repo iterative-loop rule): the agg
        # feeds BOTH the finals branch and the next level's frontier —
        # without it each consumer recomputes the whole level chain
        # (measured: 14 exchanges for 4 levels; 4 with the cut)
        agg = (cur.groupBy("gid", parent.alias("parent"))
               .agg(F.count("*").alias("k"),
                    F.collect_list("cell").alias("cs"))
               .localCheckpoint(eager=True))
        # explode_outer, not explode: cs is never empty (k >= 1), and
        # plain explode lets InferFiltersFromGenerate inline the
        # generator into an interpreted pushed-down Filter (repo rule)
        finals.append(
            agg.filter(F.col("k") < 4)
            .select("gid", F.lit(z).cast("long").alias("zoom"),
                    F.explode_outer("cs").alias("cell")))
        cur = (agg.filter(F.col("k") == 4)
               .select("gid", F.col("parent").alias("cell")))
    finals.append(cur.select(
        "gid", F.lit(zoom_to).cast("long").alias("zoom"), "cell"))
    out = reduce(DataFrame.unionByName, finals)
    return out.select(F.col("gid").alias(id_col), "zoom", "cell")


def uncompact_cover(compacted: DataFrame, id_col: str,
                    zoom_to: int) -> DataFrame:
    """Inverse: expand every (zoom, cell) back to its descendant set at
    ``zoom_to`` -> (id_col, cell).  Map-side only (one bounded
    sequence-cross per row, no shuffle): a cell at zoom z expands to the
    4^(zoom_to - z) block [x*2^d, (x+1)*2^d) x [y*2^d, (y+1)*2^d)."""
    c = (compacted
         .withColumn("d", (F.lit(zoom_to) - F.col("zoom")).cast("int"))
         .withColumn("n", F.expr("shiftleft(1L, cast(zoom as int))"))
         .withColumn("x0", F.expr("(cell % n) * shiftleft(1L, d)"))
         .withColumn("y0", F.expr("(cell DIV n) * shiftleft(1L, d)"))
         .withColumn("side", F.expr("shiftleft(1L, d)")))
    nz = 1 << zoom_to
    expanded = (c.select(
        F.col(id_col).alias("gid"), "x0", "y0", "side",
        F.explode_outer(F.expr("sequence(0L, side - 1)")).alias("dy"))
        .select("gid", "x0", "y0", "dy",
                F.explode_outer(F.expr("sequence(0L, side - 1)"))
                .alias("dx")))
    return expanded.select(
        F.col("gid").alias(id_col),
        ((F.col("y0") + F.col("dy")) * F.lit(nz)
         + F.col("x0") + F.col("dx")).cast("long").alias("cell"))
