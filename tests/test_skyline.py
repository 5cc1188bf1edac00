"""2D skyline: brute-force dominance oracle on random clouds, strict-tie
semantics, duplicate collapse, and partitioning invariance."""
import numpy as np
import pytest

from urbanistic_polygons_spark.operators.skyline import skyline_scan


def _brute(pts):
    uniq = sorted(set(pts))
    out = []
    for p in uniq:
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in uniq if q != p)
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("seed", range(12))
def test_scan_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 120))
    pts = [(int(a), int(b))
           for a, b in rng.integers(0, 40, size=(n, 2))]
    assert sorted(skyline_scan(np.array([p[0] for p in pts]),
                               np.array([p[1] for p in pts]))) == _brute(pts)


def test_ties_and_duplicates():
    pts = [(1, 5), (1, 3), (2, 3), (1, 3), (0, 9), (3, 1), (3, 1)]
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    # (1,5) dominated by (1,3); (2,3) dominated by (1,3); duplicates
    # collapse; (0,9), (1,3), (3,1) form the frontier
    assert sorted(skyline_scan(xs, ys)) == [(0, 9), (1, 3), (3, 1)]


def test_distributed_matches_and_partition_invariant(spark):
    from urbanistic_polygons_spark.operators.skyline import skyline_2d
    rng = np.random.default_rng(7)
    rows = [(int(g), int(x), int(y))
            for g in range(5)
            for x, y in rng.integers(0, 10_000, size=(400, 2))]
    df = spark.createDataFrame(rows, "g long, x long, y long")
    want = {}
    for g in range(5):
        want[g] = _brute([(x, y) for gg, x, y in rows if gg == g])
    outs = []
    for parts in (1, 13):
        got = {}
        for r in skyline_2d(df.repartition(parts), "g").collect():
            got.setdefault(r["g"], []).append((r["x"], r["y"]))
        outs.append({g: sorted(v) for g, v in got.items()})
    assert outs[0] == outs[1] == want
