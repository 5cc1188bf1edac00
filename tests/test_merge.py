"""Merge-by-similarity phase (operators/merge.py) — the README step-3
phase the reference specifies but never implements (weights table only,
DefaultMergeFactorCalculator.cs:14-32)."""

import pyspark.sql.functions as F
import pytest

from urbanistic_polygons_spark import datagen
from urbanistic_polygons_spark.operators.classify import classify_barrier_ways
from urbanistic_polygons_spark.operators.graph_build import (
    build_faces_from_ways, classify_barriers, split_ways_to_edges)
from urbanistic_polygons_spark.operators.merge import (
    face_boundary_segments, interior_faces, merge_faces, mergeable_pairs,
    segment_resistance)


@pytest.fixture(scope="module")
def lattice(spark):
    """k=4 jitter-free lattice: 9 interior unit faces + outer face."""
    nodes_pdf, ways_pdf = datagen.gen_ways_grid(k=4, seed=44, jitter=0.0)
    nodes = spark.createDataFrame(
        nodes_pdf, schema="node_id long, lon double, lat double")
    ways = spark.createDataFrame(
        ways_pdf, schema="way_id long, nodes array<long>, tags map<string,string>")
    faces = build_faces_from_ways(nodes, ways).localCheckpoint(eager=True)
    return nodes, ways, faces


def test_interior_faces_drops_outer(lattice):
    _, _, faces = lattice
    inter = interior_faces(faces)
    assert faces.count() == 10          # 3x3 cells + outer
    assert inter.count() == 9
    # the dropped face is the big one (12 boundary edges)
    assert inter.filter(F.col("n_edges") > 4).count() == 0


def test_boundary_segments_pair_up(lattice):
    """Every INTERIOR boundary segment is shared by exactly two faces and
    matches a barrier-edge unit segment bit-for-bit."""
    nodes, ways, faces = lattice
    segs = face_boundary_segments(interior_faces(faces))
    per_seg = segs.groupBy("seg_key").agg(F.count("*").alias("nf"))
    counts = {r.nf: 1 for r in per_seg.select("nf").distinct().collect()}
    assert set(counts) == {1, 2}        # perimeter=1, interior=2
    # interior 3x3 lattice: 12 shared segments (2 per row/col boundary * 6)
    assert per_seg.filter("nf = 2").count() == 12
    # every face boundary segment exists in the barrier edge segment set
    edges = split_ways_to_edges(nodes, classify_barriers(ways))
    res = segment_resistance(edges, classify_barrier_ways(
        faces.sparkSession, ways))
    unmatched = segs.join(res, "seg_key", "left_anti")
    assert unmatched.count() == 0


def test_merge_all_residential_single_region(lattice):
    """Uniform residential lattice (res 2), threshold 3, no landuse gate:
    all 9 interior faces merge into one region."""
    nodes, ways, faces = lattice
    edges = split_ways_to_edges(nodes, classify_barriers(ways))
    seg_res = segment_resistance(
        edges, classify_barrier_ways(faces.sparkSession, ways))
    merged = merge_faces(faces, seg_res, threshold=3)
    assert merged.count() == 9
    assert merged.select("region").distinct().count() == 1


def test_merge_blocked_by_strong_barrier(lattice):
    """Promote the middle vertical street (x=1) to motorway: the 3x3
    lattice splits into a 3-face west column and a 6-face east block."""
    nodes, ways, faces = lattice
    # vertical streets are way_ids k..2k-1 (k=4): x=1 -> way_id 5
    ways2 = ways.withColumn(
        "tags", F.when(F.col("way_id") == 5,
                       F.create_map(F.lit("highway"), F.lit("motorway")))
        .otherwise(F.col("tags")))
    edges = split_ways_to_edges(nodes, classify_barriers(ways2))
    seg_res = segment_resistance(
        edges, classify_barrier_ways(faces.sparkSession, ways2))
    merged = merge_faces(faces, seg_res, threshold=3)
    sizes = sorted(r.n for r in merged.groupBy("region")
                   .agg(F.count("*").alias("n")).collect())
    assert sizes == [3, 6]


def test_threshold_zero_no_merges(lattice):
    nodes, ways, faces = lattice
    edges = split_ways_to_edges(nodes, classify_barriers(ways))
    seg_res = segment_resistance(
        edges, classify_barrier_ways(faces.sparkSession, ways))
    assert mergeable_pairs(interior_faces(faces), seg_res, 1).count() == 0
    merged = merge_faces(faces, seg_res, threshold=1)
    # every face is its own region
    assert merged.select("region").distinct().count() == 9


def test_merge_multi_cell_lattice(spark):
    """Cross-cell merge: a k=12 lattice spans ~41 z14 anchor cells, so
    face extraction, GUID dedup and boundary-segment adjacency all cross
    cell boundaries; a motorway on the x=6 vertical street must split the
    11x11 interior into exactly a 66-face west and a 55-face east region.
    (max_ring=1 drops only the oversized outer face — logged, and
    irrelevant to interior merging.)"""
    nodes_pdf, ways_pdf = datagen.gen_ways_grid(k=12, seed=44, jitter=0.0)
    nodes = spark.createDataFrame(
        nodes_pdf, schema="node_id long, lon double, lat double")
    ways = spark.createDataFrame(
        ways_pdf, schema="way_id long, nodes array<long>, tags map<string,string>")
    ways = ways.withColumn(
        "tags", F.when(F.col("way_id") == 18,   # vertical street x=6
                       F.create_map(F.lit("highway"), F.lit("motorway")))
        .otherwise(F.col("tags")))
    faces = build_faces_from_ways(nodes, ways, max_ring=1)
    faces = faces.localCheckpoint(eager=True)
    assert faces.count() == 121                 # 11x11; outer face dropped
    assert faces.select("anchor_cell").distinct().count() > 30
    edges = split_ways_to_edges(nodes, classify_barriers(ways))
    seg_res = segment_resistance(edges, classify_barrier_ways(spark, ways))
    merged = merge_faces(faces, seg_res, threshold=3)
    sizes = sorted(r.n for r in merged.groupBy("region")
                   .agg(F.count("*").alias("n")).collect())
    assert sizes == [55, 66]


def test_dominance_gate_splits_regions(lattice):
    """With a synthetic dominance table marking the west column a
    different class, the uniform lattice merges into column vs rest."""
    nodes, ways, faces = lattice
    edges = split_ways_to_edges(nodes, classify_barriers(ways))
    seg_res = segment_resistance(
        edges, classify_barrier_ways(faces.sparkSession, ways))
    inter = interior_faces(faces)
    west_lon = 4.70 + 1 * 0.01
    dom = inter.select(
        "face_guid",
        F.when(F.col("max_lon") <= F.lit(west_lon), "water")
        .otherwise("residential").alias("dominant_cls"))
    merged = merge_faces(faces, seg_res, threshold=3, dominant=dom)
    sizes = sorted(r.n for r in merged.groupBy("region")
                   .agg(F.count("*").alias("n")).collect())
    assert sizes == [3, 6]


def test_graph_pipeline_stages_and_resume(spark, tmp_path):
    """E2 bulk-build analog: the 5-stage graph pipeline (entity tables ->
    faces -> landuse -> merge -> tiles) commits LineageStore snapshots;
    a re-run with the same workdir skips every committed partition (adds
    0 rows) and reproduces identical stage counters."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import run_graph_pipeline as P

    wd = str(tmp_path / "graph_wd")
    r1 = P.run(spark, wd, k=4)
    assert set(r1["stages"]) == {"graph_vertices", "graph_edges", "faces",
                                 "landuse", "merge", "tiles"}
    assert r1["stages"]["faces"]["rows"] == 10     # 3x3 + outer
    assert r1["stages"]["merge"]["rows"] == 9      # interior only
    assert r1["stages"]["tiles"]["rows"] >= 1
    r2 = P.run(spark, wd, k=4)
    # resume: no stage adds rows, counters identical
    for name, s1 in r1["stages"].items():
        assert r2["stages"][name]["rows"] == s1["rows"], name
        assert r2["stages"][name]["partitions"] == s1["partitions"], name


def test_crossing_ways_boundary_segments_match(spark):
    """TRUE crossing without a shared node (ADVICE r3): faces are built
    with planarize_crossings=True, so their boundary segments split at
    the intersection point.  segment_resistance fed UNPLANARIZED edges
    leaves those keys unmatched (merge fails safe = blocked); fed
    PLANARIZED edges (the pipeline's stage-4 form) every boundary
    segment matches and the residential triangles merge."""
    from urbanistic_polygons_spark.operators.graph_build import planarize_edges

    b_lon, b_lat, s = 4.78, 51.26, 0.004
    nodes = spark.createDataFrame(
        [(1, b_lon, b_lat), (2, b_lon + s, b_lat),
         (3, b_lon + s, b_lat + s), (4, b_lon, b_lat + s)],
        schema="node_id long, lon double, lat double")
    tags = {"highway": "residential"}
    ways = spark.createDataFrame(
        [(10, [1, 2, 3, 4, 1], tags),   # square ring
         (11, [1, 3], tags),            # diagonal
         (12, [2, 4], tags)],           # crossing diagonal, NOT noded
        schema="way_id long, nodes array<long>, tags map<string,string>")

    faces = build_faces_from_ways(nodes, ways).localCheckpoint(eager=True)
    inter = interior_faces(faces)
    assert inter.count() == 4           # 4 triangles
    segs = face_boundary_segments(inter)
    way_res = classify_barrier_ways(spark, ways)

    edges_raw = split_ways_to_edges(nodes, classify_barriers(ways))
    res_raw = segment_resistance(edges_raw, way_res)
    # the divergence is real: half-diagonal boundary keys never match
    assert segs.join(res_raw, "seg_key", "left_anti").count() > 0
    # fail-safe check: with unplanarized resistance nothing merges
    raw_merged = merge_faces(faces, res_raw, threshold=3)
    assert raw_merged.select("region").distinct().count() == 4

    res_pl = segment_resistance(planarize_edges(edges_raw), way_res)
    assert segs.join(res_pl, "seg_key", "left_anti").count() == 0
    merged = merge_faces(faces, res_pl, threshold=3)
    assert merged.select("region").distinct().count() == 1
