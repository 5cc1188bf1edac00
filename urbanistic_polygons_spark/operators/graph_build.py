"""Graph construction: OSM-like (nodes, ways) -> standardized barrier edges,
cell-bucketed with halos, ready for per-cell face extraction.

Everything here is declarative DataFrame ops (Catalyst-optimized), mapping
the reference's imperative builder:

- J1 node-resolve:      posexplode(ways.nodes) hash equi-join against nodes
                        (reference TiledBarrierGraphBuilder.cs:139-195)
- G1 vertex detection:  a way-node is a vertex iff first/last in a way or
                        shared by >=2 ways (TiledBarrierGraphBuilder.cs:139-169)
- G2 way->edge split:   window running-sum of is_vertex defines segments
                        (TiledBarrierGraphBuilder.cs:197-259)
- G5 standardize:       orient every edge west->east, reversing the shape —
                        load-order independence (TiledBarrierGraphExtensions
                        .cs:299-318)
- S3 cell bucketing:    edges replicated to every halo cell of the anchor
                        cells their bbox covers (tools/.../Program.cs:43-147
                        pass-1/pass-2 ingest, but as one shuffle)

Pruning (G3/G4) happens inside the per-cell kernel (operators/faces.py)
because it is tile-local and must respect halo suppression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cells as C


def classify_barriers(ways: DataFrame, barrier_keys=("highway", "waterway",
                                                     "railway", "barrier")) -> DataFrame:
    """F1 isBarrier predicate: keep ways whose tags contain a barrier key
    (reference BarrierInfo.cs:45-73 + DefaultMergeFactorCalculator.cs:14-32;
    the full 17-row weight dim lives in operators/classify.py)."""
    cond = None
    for k in barrier_keys:
        c = F.map_contains_key(F.col("tags"), F.lit(k))
        cond = c if cond is None else (cond | c)
    return ways.filter(cond)


def resolve_way_nodes(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """J1: (way_id, pos, node_id, lon, lat, n_nodes) — the hash equi-join.
    At scale: nodes side is large -> sort-merge with AQE; per-cell ingest
    keeps both sides co-partitioned on cell."""
    exploded = ways.select(
        "way_id", F.size("nodes").alias("n_nodes"),
        F.posexplode("nodes").alias("pos", "node_id"))
    return exploded.join(nodes.select("node_id", "lon", "lat"), "node_id")


def detect_vertices(way_nodes: DataFrame) -> DataFrame:
    """G1: node_id -> is_vertex.  First/last of a way, or used by >=2 ways
    (or >=2 times in one way, e.g. ring closure) => vertex."""
    stats = way_nodes.groupBy("node_id").agg(
        F.count("*").alias("n_uses"),
        F.count_distinct("way_id").alias("n_ways"),
        F.max(F.when((F.col("pos") == 0)
                     | (F.col("pos") == F.col("n_nodes") - 1), 1)
              .otherwise(0)).alias("is_end"),
    )
    return stats.select(
        "node_id",
        ((F.col("n_ways") >= 2) | (F.col("is_end") == 1)
         | (F.col("n_uses") >= 2)).alias("is_vertex"))


def split_ways_to_edges(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """G2 + G5: barrier ways -> standardized edges.

    Output: (edge_id string, v1_lon, v1_lat, v2_lon, v2_lat,
             shape_pts string 'lon lat;...', tags, min_lon..max_lat bbox).
    """
    wn = resolve_way_nodes(nodes, ways)
    verts = detect_vertices(wn)
    wn = wn.join(verts, "node_id")

    # segment numbering: with vseq = running count of vertices up to and
    # including this pos, a vertex OPENS segment vseq-1 and CLOSES segment
    # vseq-2; a shape point belongs to segment vseq-1.  Vertices are emitted
    # twice (head + tail) so both neighboring segments get the boundary node.
    w = Window.partitionBy("way_id").orderBy("pos")
    wn = wn.withColumn(
        "vseq", F.sum(F.col("is_vertex").cast("int")).over(w))
    head = wn.withColumn("seg", F.col("vseq") - 1)
    tail = wn.filter(F.col("is_vertex")).withColumn("seg", F.col("vseq") - 2)
    both = head.unionByName(tail).filter(F.col("seg") >= 0)

    seg_pts = (
        both.groupBy("way_id", "seg")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("pts"))
        .filter(F.size("pts") >= 2)
    )
    first = F.element_at("pts", 1)
    last = F.element_at("pts", -1)
    mids = F.slice(F.col("pts"), 2, F.greatest(F.size("pts") - 2, F.lit(0)))
    edges = seg_pts.select(
        "way_id", "seg",
        first["lon"].alias("a_lon"), first["lat"].alias("a_lat"),
        last["lon"].alias("b_lon"), last["lat"].alias("b_lat"),
        F.concat_ws(";", F.transform(
            mids, lambda p: F.format_string("%.9f %.9f", p["lon"], p["lat"]))).alias("mid_str"),
        F.transform("pts", lambda p: p["lon"]).alias("all_lons"),
        F.transform("pts", lambda p: p["lat"]).alias("all_lats"),
    )
    # G5 standardize: v1 = western endpoint; reverse shape when swapping
    fwd = F.col("a_lon") < F.col("b_lon")
    rev_mid = F.concat_ws(";", F.reverse(F.split(F.col("mid_str"), ";")))
    edges = edges.select(
        "way_id", "seg",
        F.when(fwd, F.col("a_lon")).otherwise(F.col("b_lon")).alias("v1_lon"),
        F.when(fwd, F.col("a_lat")).otherwise(F.col("b_lat")).alias("v1_lat"),
        F.when(fwd, F.col("b_lon")).otherwise(F.col("a_lon")).alias("v2_lon"),
        F.when(fwd, F.col("b_lat")).otherwise(F.col("a_lat")).alias("v2_lat"),
        F.when(F.col("mid_str") == "", F.lit(None)).otherwise(
            F.when(fwd, F.col("mid_str")).otherwise(rev_mid)).alias("shape_pts"),
        F.array_min("all_lons").alias("min_lon"),
        F.array_min("all_lats").alias("min_lat"),
        F.array_max("all_lons").alias("max_lon"),
        F.array_max("all_lats").alias("max_lat"),
    )
    return edges


def bucket_edges_by_cell(edges: DataFrame, halo_ring: int = 1) -> DataFrame:
    """S3 ingest: replicate each edge to the halo of every anchor cell its
    bbox overlaps; ``in_anchor`` marks rows whose edge bbox overlaps the
    anchor cell's box (only those seed face walks — reference Faces.cs:35-48).

    The shuffle key is ``anchor_cell`` — downstream applyInPandas groups on
    it.  Heavy cells are later salted by the caller if needed.
    """
    # anchor cells covered by the edge bbox (cells the edge itself touches)
    covered = edges.withColumn(
        "own_cell",
        F.explode(F.flatten(F.transform(
            F.sequence(C.tile_y(F.col("max_lat")), C.tile_y(F.col("min_lat"))),
            lambda cy: F.transform(
                F.sequence(C.tile_x(F.col("min_lon")), C.tile_x(F.col("max_lon"))),
                lambda cx: cy * F.lit(1 << 14) + cx)))))
    # each covering cell's halo becomes an anchor that sees this edge
    with_anchor = covered.withColumn(
        "anchor_cell", F.explode(C.neighbor_cells(F.col("own_cell"), ring=halo_ring)))
    out = (
        with_anchor
        .withColumn("in_anchor", F.col("own_cell") == F.col("anchor_cell"))
        .groupBy("anchor_cell", "way_id", "seg", "v1_lon", "v1_lat",
                 "v2_lon", "v2_lat", "shape_pts")
        .agg(F.max("in_anchor").alias("in_anchor"))
        .withColumn("halo_ring", F.lit(halo_ring))
    )
    return out


def build_faces_from_ways(nodes: DataFrame, ways: DataFrame,
                          max_ring: int = 4) -> DataFrame:
    """End-to-end: barrier ways -> planar edges -> per-cell face polygons
    with content-addressed GUIDs, cross-cell dedup'd.

    G6 missing-tile expansion, batched: anchors whose face walks leave their
    halo (sentinel rows from the kernel) are retried with a 1-bigger halo —
    the Spark analog of the reference's load-missing-tiles-and-retry loop
    (TiledBarrierGraphBuilder.cs:53-61), but as one extra shuffle per round
    over only the failed anchors instead of per-tile lazy I/O.
    """
    from .faces import extract_faces

    barriers = classify_barriers(ways)
    edges = split_ways_to_edges(nodes, barriers).cache()

    results = []
    retry_anchors = None  # None = all anchors (round 1)
    for ring in range(1, max_ring + 1):
        bucketed = bucket_edges_by_cell(edges, ring)
        if retry_anchors is not None:
            bucketed = bucketed.join(F.broadcast(retry_anchors),
                                     "anchor_cell", "left_semi")
        out = extract_faces(bucketed).cache()
        results.append(out.filter(F.col("face_guid").isNotNull()))
        retry_anchors = (out.filter(F.col("face_guid").isNull())
                         .select("anchor_cell").distinct())
        if ring == max_ring or retry_anchors.isEmpty():
            break

    faces = results[0]
    for r in results[1:]:
        faces = faces.unionByName(r)
    return faces.dropDuplicates(["face_guid"])
