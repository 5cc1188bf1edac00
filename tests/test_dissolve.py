"""Region dissolve (operators/dissolve.py): segment-parity stats and the
outline ring walk, including a donut region with a hole.  The catalog
entry ``region_dissolve`` is additionally hash-compared against the
closed-form lattice oracle by test_catalog_oracle.py."""

import pandas as pd

from urbanistic_polygons_spark.operators.dissolve import (
    dissolve_rings, dissolve_stats)


def _cell_ring(i, j):
    pts = [(i, j), (i + 1, j), (i + 1, j + 1), (i, j + 1), (i, j)]
    return ";".join(f"{x} {y}" for x, y in pts)


def _donut(spark):
    """3x3 grid of unit-cell faces: the 8 outer cells form region 'R'
    (a donut around the center), the center cell is its own region 'C'."""
    rows = []
    for i in range(3):
        for j in range(3):
            region = "C" if (i, j) == (1, 1) else "R"
            rows.append((f"f{i}{j}", _cell_ring(i, j), region))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["face_guid", "ring", "region"]))


def test_dissolve_stats_donut(spark):
    st = {r["region"]: r for r in dissolve_stats(_donut(spark)).collect()}
    # donut: outer perimeter 12 + hole perimeter 4 = 16 outline segments;
    # the 8 member cells touch pairwise along 8 dissolved segments
    assert (st["R"]["n_faces"], st["R"]["n_boundary_segs"],
            st["R"]["n_internal_segs"]) == (8, 16, 8)
    # the lone center cell: its own 4 segments, nothing dissolved
    assert (st["C"]["n_faces"], st["C"]["n_boundary_segs"],
            st["C"]["n_internal_segs"]) == (1, 4, 0)


def test_dissolve_rings_donut_hole(spark):
    rings = dissolve_rings(_donut(spark)).collect()
    by_region = {}
    for r in rings:
        by_region.setdefault(r["region"], []).append(r)
    r_rings = sorted(by_region["R"], key=lambda r: r["ring_idx"])
    assert [r["n_segments"] for r in r_rings] == [12, 4]
    assert [r["is_outer"] for r in r_rings] == [True, False]
    # both rings are CLOSED (first token == last token) and the hole is
    # exactly the center cell's boundary
    for r in r_rings:
        toks = r["ring"].split(";")
        assert toks[0] == toks[-1]
        assert len(toks) == r["n_segments"] + 1
    hole_pts = set(r_rings[1]["ring"].split(";"))
    assert hole_pts == {"1 1", "2 1", "2 2", "1 2"}
    # outer ring visits every hull point, no hole point
    outer_pts = set(r_rings[0]["ring"].split(";"))
    assert "0 0" in outer_pts and "3 3" in outer_pts
    assert outer_pts.isdisjoint(hole_pts)
    # the singleton region yields one 4-segment ring
    c_rings = by_region["C"]
    assert len(c_rings) == 1 and c_rings[0]["n_segments"] == 4


def test_dissolve_rings_deterministic(spark):
    a = sorted(map(tuple, dissolve_rings(_donut(spark)).collect()))
    b = sorted(map(tuple, dissolve_rings(_donut(spark)).collect()))
    assert a == b
