"""H3-parity index self-consistency (see functions/h3.py docstring for the
documented deviations from Uber's bit layout)."""

import numpy as np
import pytest

from s2_geometry_rust_ray.functions import h3

U = np.uint64


def test_icosahedron_geometry():
    assert h3.FACE_CENTERS.shape == (20, 3)
    assert np.allclose(np.linalg.norm(h3.FACE_CENTERS, axis=1), 1.0)
    # frames orthonormal
    assert np.allclose((h3.FACE_U * h3.FACE_V).sum(1), 0, atol=1e-12)
    assert np.allclose((h3.FACE_U * h3.FACE_CENTERS).sum(1), 0, atol=1e-12)


def test_encode_deterministic_and_res_field():
    rng = np.random.default_rng(2)
    lat = rng.uniform(-89, 89, 1000)
    lng = rng.uniform(-180, 180, 1000)
    for res in [0, 3, 7, 12, 15]:
        c1 = h3.latlng_to_h3(lat, lng, res)
        c2 = h3.latlng_to_h3(lat, lng, res)
        assert np.array_equal(c1, c2)
        assert np.all(h3.h3_res(c1) == res)
        assert np.all(h3.h3_face(c1) < 20)


def test_center_reencodes_to_itself():
    """Round-trip: the center of a cell encodes back to the same cell."""
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89, 89, 500)
    lng = rng.uniform(-180, 180, 500)
    for res in [2, 6, 10]:
        cells = h3.latlng_to_h3(lat, lng, res)
        back = h3.xyz_to_h3(h3.h3_to_xyz(cells), res)
        assert np.array_equal(back, cells)


def test_cell_size_shrinks_with_res():
    """Distance from point to its cell center shrinks ~sqrt(7) per res."""
    rng = np.random.default_rng(4)
    lat = rng.uniform(-60, 60, 300)
    lng = rng.uniform(-180, 180, 300)
    from s2_geometry_rust_ray.geometry.loop import latlng_deg_to_unit_xyz

    pts = latlng_deg_to_unit_xyz(lat, lng)
    prev = None
    for res in [2, 4, 6, 8]:
        cells = h3.xyz_to_h3(pts, res)
        centers = h3.h3_to_xyz(cells)
        d = np.linalg.norm(pts - centers, axis=1).max()
        if prev is not None:
            assert d < prev / 3.0  # ~1/7 area per 2 res steps
        prev = d


def test_parent_hierarchy():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-80, 80, 400)
    lng = rng.uniform(-180, 180, 400)
    fine = h3.latlng_to_h3(lat, lng, 9)
    for pres in [8, 6, 3]:
        par = h3.h3_parent(fine, pres)
        assert np.all(h3.h3_res(par) == pres)
        # parent is stable: parent of parent == direct coarse parent
        assert np.array_equal(h3.h3_parent(par, 3), h3.h3_parent(fine, 3))
        # a cell's parent center is close (within ~1 coarse cell radius)
        pc = h3.h3_to_xyz(par)
        fc = h3.h3_to_xyz(fine)
        s, _, _ = h3._res_frame(pres)
        assert np.all(np.linalg.norm(pc - fc, axis=1) < 3 * s)


def test_children_partition():
    cell = int(h3.latlng_to_h3(np.array([40.0]), np.array([-70.0]), 5)[0])
    kids = h3.h3_children(cell)
    assert len(kids) == 7  # aperture 7
    assert np.all(h3.h3_parent(kids, 5) == U(cell))
    # children are distinct and at res 6
    assert len(np.unique(kids)) == 7
    assert np.all(h3.h3_res(kids) == 6)


def test_k_ring_counts_interior():
    cell = int(h3.latlng_to_h3(np.array([10.0]), np.array([20.0]), 6)[0])
    for k in [1, 2, 3]:
        ring = h3.k_ring(cell, k)
        # hexagon: 1 + 3k(k+1) cells (exact away from face seams)
        assert len(ring) == 1 + 3 * k * (k + 1)
        assert U(cell) in ring


def test_polyfill_cap():
    from s2_geometry_rust_ray.geometry.cap import Cap
    from s2_geometry_rust_ray.geometry.coverer import CapRegion

    region = CapRegion(Cap.from_latlng_deg(47.6, -122.3, 2.0))
    cells = h3.polyfill(region, 4)
    assert len(cells) > 0
    centers = h3.h3_to_xyz(cells)
    for c in centers:
        assert region.contains_point(c)
    # the cap center's own cell is present
    own = h3.latlng_to_h3(np.array([47.6]), np.array([-122.3]), 4)[0]
    assert own in cells
