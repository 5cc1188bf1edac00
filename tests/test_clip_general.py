"""General (concave x concave) polygon intersection: exact hand-computable
cases, symmetry, convex regression, and a rasterized-area property check.

Covers reference Landuse/TiledBarrierGraphExtensions.cs:58-72 (NTS
Intersection().Area) semantics for the J2 area-overlap join."""

import numpy as np
import pytest

from urbanistic_polygons_spark import kernels

# L-shape: unit notch cut from the top-right of a 2x2 square (concave)
L_X = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0])
L_Y = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0])

SQ_X = np.array([0.5, 1.5, 1.5, 0.5])
SQ_Y = np.array([0.5, 0.5, 1.5, 1.5])


def raster_area(ax, ay, bx, by, n=500):
    """Grid-sampled |A ∩ B| over the union bbox (reference estimate)."""
    x0 = min(ax.min(), bx.min())
    x1 = max(ax.max(), bx.max())
    y0 = min(ay.min(), by.min())
    y1 = max(ay.max(), by.max())
    gx, gy = np.meshgrid(np.linspace(x0, x1, n), np.linspace(y0, y1, n))
    px, py = gx.ravel(), gy.ravel()
    inside = (kernels.points_in_polygon(px, py, ax, ay)
              & kernels.points_in_polygon(px, py, bx, by))
    cell = ((x1 - x0) / (n - 1)) * ((y1 - y0) / (n - 1))
    return inside.sum() * cell


def test_l_shape_clip_square_exact():
    # square [0.5,1.5]^2 ∩ L-shape = 1.0 - 0.25 (the notch corner)
    a = kernels.polygon_intersection_area(SQ_X, SQ_Y, L_X, L_Y)
    assert a == pytest.approx(0.75, abs=1e-12)


def test_symmetry_concave_clip_and_subject():
    # swapping subject/clip roles must give the identical area even though
    # the triangulation happens on different rings
    a = kernels.polygon_intersection_area(SQ_X, SQ_Y, L_X, L_Y)
    b = kernels.polygon_intersection_area(L_X, L_Y, SQ_X, SQ_Y)
    assert a == pytest.approx(b, abs=1e-12)


def test_concave_concave_exact():
    # two interlocking L-shapes: second = first mirrored through (1,1)
    mx, my = 2.0 - L_X, 2.0 - L_Y
    a = kernels.polygon_intersection_area(L_X, L_Y, mx, my)
    # overlap = 2x2 square minus both unit notches = 4 - 1 - 1 = 2
    assert a == pytest.approx(2.0, abs=1e-12)


def test_cw_rings_accepted():
    a = kernels.polygon_intersection_area(
        SQ_X[::-1], SQ_Y[::-1], L_X[::-1], L_Y[::-1])
    assert a == pytest.approx(0.75, abs=1e-12)


def test_convex_regression():
    # convex clip must agree with the direct Sutherland-Hodgman path
    hex_x = np.array([2.0, 1.0, -1.0, -2.0, -1.0, 1.0])
    hex_y = np.array([0.0, 1.7, 1.7, 0.0, -1.7, -1.7])
    sub_x = np.array([-3.0, 3.0, 3.0, -3.0])
    sub_y = np.array([-0.5, -0.5, 0.5, 0.5])
    ix, iy = kernels.clip_polygon_convex(sub_x, sub_y, hex_x, hex_y)
    direct = kernels.polygon_area(ix, iy)
    general = kernels.polygon_intersection_area(sub_x, sub_y, hex_x, hex_y)
    assert general == pytest.approx(direct, rel=1e-12)


def test_disjoint_and_contained():
    far_x, far_y = SQ_X + 10.0, SQ_Y + 10.0
    assert kernels.polygon_intersection_area(far_x, far_y, L_X, L_Y) == 0.0
    tiny_x = np.array([0.2, 0.4, 0.4, 0.2])
    tiny_y = np.array([0.2, 0.2, 0.4, 0.4])
    a = kernels.polygon_intersection_area(tiny_x, tiny_y, L_X, L_Y)
    assert a == pytest.approx(0.04, abs=1e-12)


def test_degenerate_rings_never_throw():
    """Invalid-geometry tolerance (reference catch at
    Landuse/TiledBarrierGraphExtensions.cs:74-83): collinear or
    under-sized rings contribute zero area, no exception."""
    line_x = np.array([0.0, 1.0, 2.0])   # collinear "ring"
    line_y = np.array([0.0, 0.0, 0.0])
    assert kernels.polygon_intersection_area(SQ_X, SQ_Y, line_x, line_y) == 0.0
    assert kernels.polygon_intersection_area(line_x, line_y, L_X, L_Y) == 0.0
    two_x, two_y = np.array([0.0, 1.0]), np.array([0.0, 1.0])
    assert kernels.polygon_intersection_area(SQ_X, SQ_Y, two_x, two_y) == 0.0
    # duplicated-vertex ring still yields the true area
    dup_x = np.array([0.5, 0.5, 1.5, 1.5, 0.5])
    dup_y = np.array([0.5, 0.5, 0.5, 1.5, 1.5])
    a = kernels.polygon_intersection_area(dup_x, dup_y, L_X, L_Y)
    assert a == pytest.approx(0.75, abs=1e-12)


def test_assign_landuse_concave_fixture(spark):
    """J2 end-to-end with a CONCAVE landuse ring: a unit face overlapped by
    an L-shaped landuse polygon must get pct = 0.75 (the convex-only
    clipper silently got this wrong)."""
    from urbanistic_polygons_spark.operators.landuse_join import assign_landuse

    def ring_str(xs, ys, lon0=2.3800, lat0=51.4300, s=1e-4):
        pts = [(lon0 + x * s, lat0 + y * s) for x, y in zip(xs, ys)]
        pts.append(pts[0])
        return ";".join(f"{x:.9f} {y:.9f}" for x, y in pts)

    def bbox(xs, ys, lon0=2.3800, lat0=51.4300, s=1e-4):
        return (float(lon0 + min(xs) * s), float(lat0 + min(ys) * s),
                float(lon0 + max(xs) * s), float(lat0 + max(ys) * s))

    fx, fy = list(SQ_X), list(SQ_Y)
    fb = bbox(fx, fy)
    faces = spark.createDataFrame(
        [("face-1", ring_str(fx, fy), fb[0], fb[1], fb[2], fb[3])],
        "face_guid string, ring string, min_lon double, min_lat double, "
        "max_lon double, max_lat double")
    lx, ly = list(L_X), list(L_Y)
    lb = bbox(lx, ly)
    landuse = spark.createDataFrame(
        [(1, "residential", ring_str(lx, ly), lb[0], lb[1], lb[2], lb[3])],
        "lu_id long, cls string, ring string, min_lon double, "
        "min_lat double, max_lon double, max_lat double")
    got = assign_landuse(faces, landuse).toPandas()
    assert len(got) == 1
    assert got.iloc[0].cls == "residential"
    # 1e-5 tolerance: the ring string carries 9 decimals at 1e-4 degree
    # scale (format quantization); a convex-only clip is off at the 1e-1
    # level here
    assert got.iloc[0].pct == pytest.approx(0.75, abs=1e-5)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_star_polygons_vs_raster(seed):
    """Star-shaped random polygons (angle-sorted radii — simple by
    construction, generally concave) against the rasterized estimate."""
    rng = np.random.default_rng(seed)

    def star(cx, cy, n):
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(0.5, 2.0, n)
        return cx + rad * np.cos(ang), cy + rad * np.sin(ang)

    ax, ay = star(0.0, 0.0, 12)
    bx, by = star(0.6, 0.3, 10)
    got = kernels.polygon_intersection_area(ax, ay, bx, by)
    swapped = kernels.polygon_intersection_area(bx, by, ax, ay)
    assert got == pytest.approx(swapped, rel=1e-9, abs=1e-9)
    ref = raster_area(ax, ay, bx, by)
    assert got == pytest.approx(ref, abs=0.08)


def test_triangulate_fallback_counter_surfaces():
    """The no-ear degenerate fallback must not be silent: the per-process
    counter increments (and a warning logs once) when a fully collinear
    ring blocks every ear."""
    before = kernels.TRIANGULATE_FALLBACKS
    tris = kernels.triangulate_ear(
        np.array([0.0, 1.0, 2.0, 3.0]), np.array([0.0, 0.0, 0.0, 0.0]))
    assert kernels.TRIANGULATE_FALLBACKS > before
    # a collinear "ring" has no area: any emitted triangles are degenerate
    for (i, j, k) in tris:
        assert abs((2.0 - 0.0) * 0.0) == 0.0


def test_triangulate_grid_ring_no_fallback():
    """Grid-aligned rings with repeated/collinear boundary points must NOT
    trip the fallback (the coincident-corner fix, ADVICE r2)."""
    before = kernels.TRIANGULATE_FALLBACKS
    # unit square subdivided: collinear midpoints on every edge
    x = np.array([0.0, 0.5, 1.0, 1.0, 1.0, 0.5, 0.0, 0.0])
    y = np.array([0.0, 0.0, 0.0, 0.5, 1.0, 1.0, 1.0, 0.5])
    tris = kernels.triangulate_ear(x, y)
    area = sum(abs((x[j] - x[i]) * (y[k] - y[i])
                   - (x[k] - x[i]) * (y[j] - y[i])) / 2
               for i, j, k in tris)
    assert area == pytest.approx(1.0, abs=1e-12)
    assert kernels.TRIANGULATE_FALLBACKS == before
