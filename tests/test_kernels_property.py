"""Property-based tests (hypothesis) for the pure-NumPy kernels — no Spark
session needed, so these run in milliseconds and sweep the input space."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from urbanistic_polygons_spark import kernels as K

lon_s = st.floats(min_value=-179.9, max_value=179.9,
                  allow_nan=False, allow_infinity=False)
lat_s = st.floats(min_value=-84.9, max_value=84.9,
                  allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(lon_s, lat_s), min_size=1, max_size=40))
def test_quantize_dequantize_roundtrip_within_grid_step(pts):
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    tx, ty = K.world_to_tile(lon, lat)
    qx, qy = K.quantize(lon, lat, tx, ty)
    assert ((qx >= 0) & (qx <= K.QUANT)).all()
    assert ((qy >= 0) & (qy <= K.QUANT)).all()
    lon2, lat2 = K.dequantize(qx, qy, tx, ty)
    # a tile is 360/2^14 deg wide, quantized to 16384 steps
    step_lon = 360.0 / (1 << 14) / K.QUANT
    assert np.abs(lon2 - lon).max() <= step_lon * 1.01
    # Mercator lat step varies; bound by tile height at that latitude
    tx2, ty2 = K.world_to_tile(lon2, np.clip(lat2, -85.0, 85.0))
    assert (ty2 == ty).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 28) - 1))
def test_tile_id_roundtrip(tid):
    arr = np.array([tid], dtype=np.uint32)
    x, y = K.tile_from_local_id(arr)
    back = K.tile_local_id(x, y)
    assert back[0] == tid


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(0, 1000, allow_nan=False),
                          st.floats(0, 1000, allow_nan=False)),
                min_size=1, max_size=200),
       st.integers(min_value=3, max_value=12))
def test_blocked_pip_matches_matrix_pip(pts, nv):
    """The cache-blocked PIP kernel must agree with the matrix kernel
    everywhere (they are different float expression orders; agreement on
    random inputs guards the scaling-bench kernel's correctness)."""
    rng = np.random.default_rng(nv)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    ring_x = 500 + 300 * np.cos(ang)
    ring_y = 500 + 300 * np.sin(ang)
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    a = K.points_in_polygon(px, py, ring_x, ring_y)
    b = K.points_in_polygon_blocked(px, py, ring_x, ring_y, block=7)
    assert (a == b).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lon_s, lat_s), min_size=3, max_size=20))
def test_signed_area_flips_with_orientation(pts):
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    a = K.signed_area(lon, lat)
    b = K.signed_area(lon[::-1], lat[::-1])
    assert np.isclose(a, -b, rtol=1e-9, atol=1e-12)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(lon_s, lat_s), min_size=4, max_size=10,
                unique_by=lambda p: p))
def test_face_guid_rotation_invariant(pts):
    """Content-addressed face GUIDs must not depend on which vertex the
    ring starts at (reference FaceGuidGenerator.cs:48-57 rotation).

    Holds only for rings whose quantized vertices are distinct — the
    reference's first-occurrence CompareTopLeft tie-break is itself
    rotation-sensitive when the minimal vertex repeats (degenerate rings;
    real face walks never produce them)."""
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    tx, ty = K.world_to_tile(lon, lat)
    qx, qy = K.quantize(lon, lat, tx, ty)
    tid = K.tile_local_id(tx, ty)
    ring = np.stack([qx, qy, tid], axis=1)
    if len(np.unique(ring, axis=0)) != len(ring):
        return  # quantization collapsed two inputs -> degenerate
    g0 = K.face_guid(ring)
    g1 = K.face_guid(np.roll(ring, 3, axis=0))
    assert g0 == g1


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 22) - 1))
def test_sub_tiles_children_map_back_to_parent(tid):
    """Every z14 descendant of a z11 tile has that tile as its ancestor."""
    children = K.sub_tiles(np.array([tid]), 11, 14)[0]
    assert len(children) == 64
    cx, cy = K.tile_from_local_id(children.astype(np.uint32), 14)
    px, py = K.tile_from_local_id(np.array([tid], np.uint32), 11)
    assert ((cx >> 3) == px[0]).all() and ((cy >> 3) == py[0]).all()
    assert len(np.unique(children)) == 64
