"""Exact boolean ops vs area identities + membership sampling
(tests/test_s2boolean_operation_port.rs:24-299 scenarios)."""

import math

import numpy as np
import pytest

from s2_geometry_rust_ray.geometry import boolean as B
from s2_geometry_rust_ray.geometry import measures as M
from s2_geometry_rust_ray.geometry.loop import Loop, Polygon, latlng_deg_to_unit_xyz

DEG2 = (math.pi / 180.0) ** 2


def square_poly(lat1, lng1, lat2, lng2):
    lats = np.array([lat1, lat1, lat2, lat2], float)
    lngs = np.array([lng1, lng2, lng2, lng1], float)
    return Polygon([Loop(latlng_deg_to_unit_xyz(lats, lngs))])


def sample_pts(n=4000, lo=(-1.0, -1.0), hi=(4.0, 4.0), seed=11):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(lo[0], hi[0], n)
    lng = rng.uniform(lo[1], hi[1], n)
    return latlng_deg_to_unit_xyz(lat, lng)


A = square_poly(0.0, 0.0, 2.0, 2.0)
Bp = square_poly(1.0, 1.0, 3.0, 3.0)


def test_union_membership_and_area():
    u = B.boolean_op(A, Bp, "union")
    pts = sample_pts()
    want = A.contains_points(pts) | Bp.contains_points(pts)
    got = u.contains_points(pts)
    assert (got == want).all()
    # flat-approx expectation from the reference test (2x2 + 2x2 - 1x1)
    assert M.polygon_area(u) == pytest.approx(7.0 * DEG2, rel=2e-3)


def test_intersection_membership_and_area():
    inter = B.boolean_op(A, Bp, "intersection")
    pts = sample_pts(seed=12)
    want = A.contains_points(pts) & Bp.contains_points(pts)
    assert (inter.contains_points(pts) == want).all()
    assert M.polygon_area(inter) == pytest.approx(1.0 * DEG2, rel=2e-3)
    # inclusion-exclusion identity, exact to float tolerance
    u = B.boolean_op(A, Bp, "union")
    assert M.polygon_area(u) == pytest.approx(
        M.polygon_area(A) + M.polygon_area(Bp) - M.polygon_area(inter), abs=1e-12
    )


def test_difference_hole():
    big = square_poly(0.0, 0.0, 3.0, 3.0)
    small = square_poly(1.0, 1.0, 2.0, 2.0)
    diff = B.boolean_op(big, small, "difference")
    pts = sample_pts(seed=13)
    want = big.contains_points(pts) & ~small.contains_points(pts)
    assert (diff.contains_points(pts) == want).all()
    assert len(diff.loops) == 2  # shell + hole
    assert M.polygon_area(diff) == pytest.approx(
        M.polygon_area(big) - M.polygon_area(small), abs=1e-12
    )
    # reverse difference of nested squares is empty
    assert B.boolean_op(small, big, "difference") is None


def test_symmetric_difference():
    sd = B.boolean_op(A, Bp, "symmetric_difference")
    pts = sample_pts(seed=14)
    want = A.contains_points(pts) ^ Bp.contains_points(pts)
    assert (sd.contains_points(pts) == want).all()
    inter = B.boolean_op(A, Bp, "intersection")
    assert M.polygon_area(sd) == pytest.approx(
        M.polygon_area(A) + M.polygon_area(Bp) - 2 * M.polygon_area(inter),
        abs=1e-12,
    )


def test_disjoint_cases():
    far = square_poly(10.0, 10.0, 12.0, 12.0)
    assert B.boolean_op(A, far, "intersection") is None
    u = B.boolean_op(A, far, "union")
    assert len(u.loops) == 2
    d = B.boolean_op(A, far, "difference")
    pts = sample_pts(seed=15)
    assert (d.contains_points(pts) == A.contains_points(pts)).all()


def test_polygon_relations():
    big = square_poly(0.0, 0.0, 3.0, 3.0)
    small = square_poly(1.0, 1.0, 2.0, 2.0)
    far = square_poly(10.0, 10.0, 12.0, 12.0)
    assert B.polygon_contains_polygon(big, small)
    assert not B.polygon_contains_polygon(small, big)
    assert B.polygon_intersects_polygon(big, small)
    assert B.polygon_intersects_polygon(A, Bp)
    assert not B.polygon_contains_polygon(A, Bp)
    assert not B.polygon_intersects_polygon(A, far)
    assert B.loop_contains_loop(big.loops[0], small.loops[0])
    assert not B.loop_intersects_loop(A.loops[0], far.loops[0])
