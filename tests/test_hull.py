"""Convex hull: chain kernel vs brute-force extreme-point oracle, and the
distributed two-level operator vs the single-shot kernel."""
import itertools
import random

import pytest

from urbanistic_polygons_spark.operators.hull import chain_hull, convex_hull


def brute_extreme_points(pts):
    """p is a hull vertex iff p is NOT a convex combination of the other
    points: excluded iff strictly inside a triangle OR strictly interior
    to a segment of the rest (the oracle SQL runs this same test)."""
    ps = sorted(set(pts))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    out = []
    for p in ps:
        others = [q for q in ps if q != p]
        excluded = False
        for a, b in itertools.permutations(others, 2):
            if (cross(a, b, p) == 0
                    and (p[0] - a[0]) * (b[0] - a[0])
                    + (p[1] - a[1]) * (b[1] - a[1]) > 0
                    and (p[0] - b[0]) * (a[0] - b[0])
                    + (p[1] - b[1]) * (a[1] - b[1]) > 0):
                excluded = True
                break
        if not excluded:
            for a, b, c in itertools.permutations(others, 3):
                if (cross(a, b, p) > 0 and cross(b, c, p) > 0
                        and cross(c, a, p) > 0):
                    excluded = True
                    break
        if not excluded:
            out.append(p)
    return out


def shoelace2(ring):
    return sum(x0 * y1 - x1 * y0 for (x0, y0), (x1, y1)
               in zip(ring, ring[1:] + ring[:1]))


def test_chain_matches_brute_force_random():
    rng = random.Random(7)
    for trial in range(40):
        n = rng.randrange(1, 40)
        pts = [(rng.randrange(0, 30), rng.randrange(0, 30))
               for _ in range(n)]
        ring = chain_hull(pts)
        assert sorted(ring) == brute_extreme_points(pts), pts
        if len(ring) >= 3:
            assert shoelace2(ring) > 0  # CCW
            assert ring[0] == min(ring)  # deterministic start


def test_chain_degenerate():
    assert chain_hull([(5, 5)]) == [(5, 5)]
    assert chain_hull([(5, 5), (5, 5)]) == [(5, 5)]
    # fully collinear: endpoints only
    assert chain_hull([(0, 0), (1, 1), (2, 2), (3, 3)]) == [(0, 0), (3, 3)]
    # square with collinear edge-interior + interior points dropped
    sq = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 0), (2, 2), (1, 3)]
    assert chain_hull(sq) == [(0, 0), (4, 0), (4, 4), (0, 4)]


def test_distributed_hull_matches_kernel(spark):
    rng = random.Random(11)
    rows = [(g, rng.randrange(0, 1000), rng.randrange(0, 1000))
            for g in range(6) for _ in range(200)]
    # degenerate groups: singleton + collinear
    rows += [(100, 7, 7)]
    rows += [(101, i, 2 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "g long, px long, py long")
    got = {(r["g"], r["seq"]): (r["px"], r["py"])
           for r in convex_hull(df.repartition(8), "g").collect()}
    for g in set(r[0] for r in rows):
        pts = [(x, y) for gg, x, y in rows if gg == g]
        ring = chain_hull(pts)
        mine = [got[(g, i)] for i in range(len(ring))]
        assert mine == ring, g
    # no stray rows
    assert len(got) == sum(
        len(chain_hull([(x, y) for gg, x, y in rows if gg == g]))
        for g in set(r[0] for r in rows))
