"""Unit tests for the pure-NumPy kernels, anchored to values derivable from
the reference's own tests (Belgian coordinates from FacesTests.cs:44-56)."""

import numpy as np
import pytest

from urbanistic_polygons_spark import kernels as K


def test_world_to_tile_belgium():
    # lon 4.788, lat 51.266 sits in the Belgian z14 range used by the
    # reference preprocessor (x 8300-8488, y 5447-5598, Program.cs:36-48).
    x, y = K.world_to_tile(np.array([4.788075685501099]), np.array([51.26676188180721]))
    assert 8300 <= x[0] <= 8488
    assert 5447 <= y[0] <= 5598


def test_tile_roundtrip():
    x = np.array([8408, 8300, 8488])
    y = np.array([5481, 5447, 5598])
    tid = K.tile_local_id(x, y)
    x2, y2 = K.tile_from_local_id(tid)
    assert (x2 == x).all() and (y2 == y).all()


def test_tile_box_contains_point():
    lon, lat = np.array([4.788]), np.array([51.266])
    x, y = K.world_to_tile(lon, lat)
    minlon, minlat, maxlon, maxlat = K.tile_box(x, y)
    assert minlon[0] <= lon[0] <= maxlon[0]
    assert minlat[0] <= lat[0] <= maxlat[0]


def test_quantize_roundtrip_within_grid_resolution():
    lon = np.array([4.788075685501099, 4.786123037338257])
    lat = np.array([51.26676188180721, 51.26496276736555])
    tx, ty = K.world_to_tile(lon, lat)
    qx, qy = K.quantize(lon, lat, tx, ty)
    assert ((qx >= 0) & (qx < K.QUANT)).all()
    lon2, lat2 = K.dequantize(qx, qy, tx, ty)
    # grid step at z14 ~ 360/(2^14*16384) deg ~ 1.3e-6
    assert np.abs(lon2 - lon).max() < 3e-6
    assert np.abs(lat2 - lat).max() < 3e-6


def test_quantize_deterministic_int():
    lon = np.array([4.7881234])
    lat = np.array([51.2661234])
    tx, ty = K.world_to_tile(lon, lat)
    q1 = K.quantize(lon, lat, tx, ty)
    q2 = K.quantize(lon.copy(), lat.copy(), tx, ty)
    assert q1[0][0] == q2[0][0] and q1[1][0] == q2[1][0]


def test_neighbor_cells_ring1():
    tid = K.tile_local_id(np.array([100]), np.array([200]))
    halo = K.neighbor_cells(tid, ring=1)
    assert halo.shape == (1, 9)
    assert tid[0] in halo[0]
    assert len(set(halo[0].tolist())) == 9


def test_vertex_guid_stable_and_distinct():
    g1 = K.vertex_guid(5, 7, 123456)
    g2 = K.vertex_guid(5, 7, 123456)
    g3 = K.vertex_guid(5, 8, 123456)
    assert g1 == g2 and g1 != g3
    # a valid v5 uuid
    assert g1[14] == "5"


def test_face_guid_rotation_invariant_winding_sensitive():
    # rotation-invariant (ring rotated to top-left before hashing) but
    # winding-sensitive (interior vs exterior face hash differently,
    # reference FaceGuidGenerator.cs:44-77 does not re-orient)
    ring = np.array([[10, 10, 7], [20, 10, 7], [20, 20, 7], [10, 20, 7]])
    g1 = K.face_guid(ring)
    g2 = K.face_guid(np.roll(ring, 1, axis=0))
    g3 = K.face_guid(ring[::-1])
    assert g1 == g2
    assert g1 != g3


def test_edge_guid_direction_sensitive():
    shape = np.array([[1, 2, 9], [3, 4, 9]])
    assert K.edge_guid(shape) != K.edge_guid(shape[::-1])


def test_distance_equirectangular():
    # ~1 deg lat = ~111.2 km at R=6371000
    d = K.distance_m(4.0, 50.0, 4.0, 51.0)
    assert abs(d - 6371000.0 * np.pi / 180.0) < 1.0


def test_points_in_polygon_square():
    rx = np.array([0.0, 2.0, 2.0, 0.0])
    ry = np.array([0.0, 0.0, 2.0, 2.0])
    px = np.array([1.0, 3.0, -1.0, 1.0])
    py = np.array([1.0, 1.0, 1.0, 5.0])
    inside = K.points_in_polygon(px, py, rx, ry)
    assert inside.tolist() == [True, False, False, False]


def test_signed_area_orientation():
    # counter-clockwise square -> positive area
    lon = np.array([0.0, 1.0, 1.0, 0.0])
    lat = np.array([0.0, 0.0, 1.0, 1.0])
    assert K.signed_area(lon, lat) == pytest.approx(1.0)
    assert not K.is_clockwise(lon, lat)
    assert K.is_clockwise(lon[::-1], lat[::-1])


def test_bbox_overlaps_eps():
    assert K.bbox_overlaps(0, 0, 1, 1, 1 + 5e-9, 0, 2, 1)
    assert not K.bbox_overlaps(0, 0, 1, 1, 1.1, 0, 2, 1)


def test_offset_with_distance_x():
    # round-trip: offsetting east by D meters must land ~D meters away
    # (equirectangular metric), latitude unchanged; west for negative D
    # (reference GeoExtensions.cs:224-239)
    lon, lat = 4.71, 51.22
    for d in (10.0, 250.0, -80.0):
        new_lon = float(K.offset_with_distance_x(lon, lat, d))
        got = float(K.distance_m(lon, lat, new_lon, lat))
        assert got == pytest.approx(abs(d), rel=1e-6)
        assert (new_lon > lon) == (d > 0)
