"""Spherical measures vs analytic identities (canonical s2measures
semantics; the reference's measures tests are should_panic stubs, so the
oracles here are mathematical: known areas, Gauss-Bonnet, symmetry)."""

import math

import numpy as np
import pytest

from s2_geometry_rust_ray.geometry import measures as M
from s2_geometry_rust_ray.geometry.loop import Loop, Polygon, latlng_deg_to_unit_xyz

E1 = np.array([1.0, 0.0, 0.0])
E2 = np.array([0.0, 1.0, 0.0])
E3 = np.array([0.0, 0.0, 1.0])


def geodesic_square(lat0, lng0, half_deg):
    lats = [lat0 - half_deg, lat0 - half_deg, lat0 + half_deg, lat0 + half_deg]
    lngs = [lng0 - half_deg, lng0 + half_deg, lng0 + half_deg, lng0 - half_deg]
    return latlng_deg_to_unit_xyz(np.array(lats), np.array(lngs))


def test_octant_area():
    v = np.stack([E1, E2, E3])
    assert abs(M.loop_area(v) - math.pi / 2) < 1e-14
    assert abs(M.triangle_area(E1, E2, E3)[0] - math.pi / 2) < 1e-14
    # reversed orientation: interior is the rest of the sphere
    assert abs(M.loop_area(v[::-1]) - (4 * math.pi - math.pi / 2)) < 1e-13


def test_hemisphere_area():
    # CCW around the northern hemisphere (equator, viewed from N pole)
    v = latlng_deg_to_unit_xyz(
        np.array([0.0, 0.0, 0.0, 0.0]), np.array([0.0, 90.0, 180.0, -90.0])
    )
    assert abs(M.loop_area(v) - 2 * math.pi) < 1e-12


def test_small_square_area_matches_flat():
    # 1-degree x 1-degree geodesic square at the equator: the reference's
    # own (stubbed) expectation — approximately (pi/180)^2 steradians
    v = geodesic_square(0.0, 0.0, 0.5)
    expected = (math.pi / 180.0) ** 2
    assert abs(M.loop_area(v) - expected) < 1e-8


def test_gauss_bonnet_curvature():
    rng = np.random.default_rng(3)
    for _ in range(10):
        lat0 = rng.uniform(-60, 60)
        lng0 = rng.uniform(-180, 180)
        half = rng.uniform(0.5, 15.0)
        v = geodesic_square(lat0, lng0, half)
        area = M.loop_area(v)
        curv = M.loop_curvature(v)
        assert abs(curv - (2 * math.pi - area)) < 1e-9


def test_polygon_area_with_hole():
    shell = geodesic_square(10.0, 20.0, 10.0)
    hole = geodesic_square(10.0, 20.0, 4.0)
    poly = Polygon([Loop(shell), Loop(hole)])
    want = M.loop_area(shell) - M.loop_area(hole)
    assert abs(M.polygon_area(poly) - want) < 1e-12
    # centroid of the ring still points at the center
    c = M.polygon_centroid(poly)
    c = c / np.linalg.norm(c)
    center = latlng_deg_to_unit_xyz(np.array([10.0]), np.array([20.0]))[0]
    assert np.dot(c, center) > 1 - 1e-6


def test_centroid_direction_symmetric_loop():
    v = geodesic_square(35.0, -100.0, 5.0)
    c = M.loop_centroid(v)
    assert np.linalg.norm(c) > 0
    cn = c / np.linalg.norm(c)
    center = latlng_deg_to_unit_xyz(np.array([35.0]), np.array([-100.0]))[0]
    assert np.dot(cn, center) > 1 - 1e-7
    # centroid magnitude scales with area (area-weighted, like C++)
    v_big = geodesic_square(35.0, -100.0, 10.0)
    assert np.linalg.norm(M.loop_centroid(v_big)) > np.linalg.norm(c)


def test_tan_half_fold_matches_signed_area():
    for half in [0.5, 3.0, 20.0]:
        v = geodesic_square(15.0, 40.0, half)
        t = M.tan_half_area_fold(v)
        signed = M.loop_signed_area(v)
        assert abs(2 * math.atan(t) - signed) < 1e-12
    # reversed loop: negative fold
    v = geodesic_square(15.0, 40.0, 3.0)[::-1]
    assert M.tan_half_area_fold(v) < 0


def test_skinny_triangle_girard_fallback():
    # long skinny triangle: two nearly-antipodal base points
    a = latlng_deg_to_unit_xyz(np.array([0.0]), np.array([0.0]))[0]
    b = latlng_deg_to_unit_xyz(np.array([0.0]), np.array([179.0]))[0]
    c = latlng_deg_to_unit_xyz(np.array([1e-7]), np.array([90.0]))[0]
    area = M.triangle_area(a, b, c)[0]
    assert 0.0 <= area < 1e-6


def test_signed_area_orientation():
    assert M.signed_triangle_area(E1, E2, E3)[0] > 0
    assert M.signed_triangle_area(E1, E3, E2)[0] < 0
