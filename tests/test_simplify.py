"""Douglas-Peucker simplification: kernel vs an independent recursive
reference, the tolerance-deviation invariant, idempotence, and the Spark
mapInPandas operator's closed-ring collapse contract."""

import numpy as np
import pandas as pd

from urbanistic_polygons_spark.kernels import dp_keep_mask
from urbanistic_polygons_spark.operators.simplify import (
    simplification_stats, simplify_rings)


def _dp_reference(x, y, tol):
    """Straightforward recursive DP with the same float64 arithmetic."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j - i < 2:
            return
        ax, ay, bx, by = x[i], y[i], x[j], y[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best, best_d2, thresh = -1, -1.0, tol * tol * (seg2 if seg2 else 1.0)
        for m in range(i + 1, j):
            if seg2 == 0.0:
                d2 = (x[m] - ax) ** 2 + (y[m] - ay) ** 2
            else:
                c = dx * (y[m] - ay) - dy * (x[m] - ax)
                d2 = c * c
            if d2 > best_d2:
                best, best_d2 = m, d2
        if best_d2 > thresh:
            keep[best] = True
            rec(i, best)
            rec(best, j)

    rec(0, n - 1)
    return keep


def test_matches_recursive_reference_random():
    rng = np.random.default_rng(7)
    for _ in range(60):
        n = int(rng.integers(2, 120))
        x = rng.integers(0, 1000, n).astype(float)
        y = rng.integers(0, 1000, n).astype(float)
        tol = float(rng.integers(1, 200))
        got = dp_keep_mask(x, y, tol)
        exp = _dp_reference(x, y, tol)
        assert np.array_equal(got, exp)


def test_deviation_bound_and_idempotence():
    rng = np.random.default_rng(11)
    x = np.cumsum(rng.integers(-5, 6, 200)).astype(float)
    y = np.cumsum(rng.integers(-5, 6, 200)).astype(float)
    tol = 4.0
    mask = dp_keep_mask(x, y, tol)
    kept = np.flatnonzero(mask)
    # every dropped point lies within tol of the segment between its
    # enclosing kept anchors (the DP guarantee)
    for a, b in zip(kept[:-1], kept[1:]):
        ax, ay, bx, by = x[a], y[a], x[b], y[b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        for m in range(a + 1, b):
            if seg2 == 0.0:
                d2 = (x[m] - ax) ** 2 + (y[m] - ay) ** 2
                assert d2 <= tol * tol + 1e-9
            else:
                c = dx * (y[m] - ay) - dy * (x[m] - ax)
                assert c * c <= tol * tol * seg2 + 1e-9
    # idempotence: simplifying the simplified line keeps everything
    mask2 = dp_keep_mask(x[mask], y[mask], tol)
    assert mask2.all()


def test_collinear_square_keeps_corners():
    # square with redundant midpoints on every edge
    xs = [0, 5, 10, 10, 10, 5, 0, 0, 0]
    ys = [0, 0, 0, 5, 10, 10, 10, 5, 0]
    mask = dp_keep_mask(np.array(xs, float), np.array(ys, float), 0.5)
    assert [(xs[i], ys[i]) for i in np.flatnonzero(mask)] == [
        (0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]


def test_spark_operator_and_collapse(spark):
    square_x = [0.0, 5.0, 10.0, 10.0, 10.0, 5.0, 0.0, 0.0, 0.0]
    square_y = [0.0, 0.0, 0.0, 5.0, 10.0, 10.0, 10.0, 5.0, 0.0]
    sliver_x = [0.0, 4.0, 8.0, 0.0]   # closed triangle, 1-unit tall
    sliver_y = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame(pd.DataFrame({
        "ring_id": ["square", "sliver"],
        "xs": [square_x, sliver_x],
        "ys": [square_y, sliver_y],
    }))
    out = {r["ring_id"]: r for r in
           simplify_rings(df, tol=2.0).collect()}
    sq = out["square"]
    assert sq["collapsed"] is False
    assert (sq["n_before"], sq["n_after"]) == (9, 5)
    assert sq["xs"] == [0.0, 10.0, 10.0, 0.0, 0.0]
    # the sliver's apex is within tol of its base: DP collapses it below
    # 4 points -> flagged, original coords preserved
    sl = out["sliver"]
    assert sl["collapsed"] is True
    assert sl["xs"] == sliver_x and sl["n_after"] == sl["n_before"]
    stats = simplification_stats(simplify_rings(df, tol=2.0)).collect()[0]
    assert (stats["n_rings"], stats["n_collapsed"]) == (2, 1)
    assert stats["vertices_after"] < stats["vertices_before"]
