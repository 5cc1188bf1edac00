"""Closed-form DBSCAN semantics: roles, cluster labels, and the
deterministic border tie-break, on hand-built point sets where the
answer is checkable by eye.  (The catalog oracle gate cross-checks the
full pipeline against the DuckDB recursive-CTE closure at sf0.001/0.01;
these pin the SEMANTICS on adversarial micro-cases.)"""
import pytest
from pyspark.sql import functions as F

from urbanistic_polygons_spark.operators.dbscan import (
    cluster_stats, dbscan, eps_neighbor_pairs)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id long, px long, py long")


def _result(spark, rows, eps=10, min_pts=3):
    out = dbscan(_pts(spark, rows), eps=eps, min_pts=min_pts).collect()
    return {r["point_id"]: (r["role"], r["cluster"]) for r in out}


def test_blob_border_noise(spark):
    # 3 mutual cores at distance <= 10, one border at distance 10 of a
    # single core, one far-away noise point
    rows = [(1, 0, 0), (2, 6, 0), (3, 0, 6),   # pairwise <= ~8.5 -> cores
            (4, 16, 0),                         # within 10 only of #2
            (5, 1000, 1000)]                    # noise
    got = _result(spark, rows)
    assert got == {1: ("core", 1), 2: ("core", 1), 3: ("core", 1),
                   4: ("border", 1), 5: ("noise", None)}


def test_core_chain_merges_through_bridge(spark):
    # a core bridge (7) density-connects two triangles into ONE cluster
    rows = [(1, 0, 0), (2, 8, 0), (3, 0, 8),
            (10, 24, 0), (11, 32, 0), (12, 24, 8),
            (7, 16, 0)]
    # eps=10, min_pts=3 (a core needs 2 neighbors): 1:{2,3}, 2:{1,7},
    # 7:{2,10}, 10:{7,11,12} are cores; 3:{1}, 11:{10}, 12:{10} borders
    got = _result(spark, rows, eps=10, min_pts=3)
    assert {p: got[p] for p in (1, 2, 7, 10)} == {
        1: ("core", 1), 2: ("core", 1), 7: ("core", 1), 10: ("core", 1)}
    assert {p: got[p] for p in (3, 11, 12)} == {
        3: ("border", 1), 11: ("border", 1), 12: ("border", 1)}


def test_border_between_two_clusters_takes_min_label(spark):
    # two 4-point cliques (every member has 3 neighbors -> core at
    # min_pts=4); the bridge (7) is within eps of exactly one core of
    # EACH clique (2 neighbors -> border) and must take the MIN label
    rows = [(1, 0, 0), (2, 6, 0), (3, 3, 5), (4, 3, -5),
            (10, 22, 0), (11, 28, 0), (12, 25, 5), (13, 25, -5),
            (7, 14, 0)]
    got = _result(spark, rows, eps=10, min_pts=4)
    assert {p: got[p] for p in (1, 2, 3, 4)} == {
        p: ("core", 1) for p in (1, 2, 3, 4)}
    assert {p: got[p] for p in (10, 11, 12, 13)} == {
        p: ("core", 10) for p in (10, 11, 12, 13)}
    assert got[7] == ("border", 1)


def test_singleton_core_cluster(spark):
    # a core whose neighbors are all non-core: still its own cluster
    rows = [(5, 0, 0), (6, 4, 0), (7, 0, 4)]  # 6<->7 are ~5.7 apart
    got = _result(spark, rows, eps=6, min_pts=3)
    # 5 sees {6,7} -> core; 6 sees {5,7} -> core; 7 sees {5,6} -> core
    assert got == {5: ("core", 5), 6: ("core", 5), 7: ("core", 5)}
    # shrink eps so only 5 is core (6 and 7 no longer see each other)
    rows2 = [(5, 0, 0), (6, 4, 0), (7, 0, 4), (8, 100, 100)]
    got2 = _result(spark, rows2, eps=4, min_pts=3)
    assert got2[5] == ("core", 5)
    assert got2[6] == ("border", 5)
    assert got2[7] == ("border", 5)
    assert got2[8] == ("noise", None)


def test_eps_pairs_cross_cell_and_exact_boundary(spark):
    # eps=10: points straddling a grid-cell boundary at exact distance 10
    rows = [(1, 9, 0), (2, 19, 0),    # d=10, cells 0 and 1 -> pair kept
            (3, 9, 50), (4, 20, 50)]  # d=11 -> dropped
    pairs = {(r["pa"], r["pb"]) for r in
             eps_neighbor_pairs(_pts(spark, rows), eps=10).collect()}
    assert (1, 2) in pairs and (2, 1) in pairs
    assert (3, 4) not in pairs and (4, 3) not in pairs


def test_empty_and_all_noise(spark):
    got = _result(spark, [(1, 0, 0), (2, 100, 100)], eps=5, min_pts=2)
    assert got == {1: ("noise", None), 2: ("noise", None)}
    empty = dbscan(_pts(spark, []), eps=5, min_pts=2)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "point_id", "role", "cluster"]


def test_cluster_stats(spark):
    rows = [(1, 0, 0), (2, 6, 0), (3, 0, 6), (4, 16, 0), (5, 999, 999)]
    stats = cluster_stats(dbscan(_pts(spark, rows), eps=10, min_pts=3))
    got = {r["cluster"]: (r["n_points"], r["n_core"], r["n_border"])
           for r in stats.collect()}
    assert got == {1: (4, 3, 1)}
