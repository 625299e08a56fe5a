"""Raster <-> vector roundtrip invariants (FIXTURES.md; north_rule op)."""

import numpy as np
import pytest

from s2_geometry_rust_ray.functions import cellid
from s2_geometry_rust_ray.geometry import cell_union, raster
from s2_geometry_rust_ray.geometry.cap import Cap
from s2_geometry_rust_ray.geometry.coverer import CapRegion, PolygonRegion
from s2_geometry_rust_ray.geometry import fixtures
from s2_geometry_rust_ray.geometry.loop import latlng_deg_to_unit_xyz

U = np.uint64


def test_rasterize_levels_and_coverage():
    region = CapRegion(Cap.from_latlng_deg(40.0, 10.0, 3.0))
    cells = raster.rasterize(region, level=7)
    assert cells.size > 0
    assert np.all(cellid.level(cells) == 7)
    # all region points covered
    rng = np.random.default_rng(1)
    lat = rng.uniform(37, 43, 500)
    lng = rng.uniform(6, 14, 500)
    pts = latlng_deg_to_unit_xyz(lat, lng)
    inside = np.array([region.contains_point(p) for p in pts])
    leaves = cellid.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
    covered = cell_union.contains_ids(cell_union.normalize(cells), leaves)
    assert np.all(~inside | covered)


def test_rasterize_centers_subset():
    region = CapRegion(Cap.from_latlng_deg(40.0, 10.0, 3.0))
    inter = raster.rasterize(region, level=7, mode="intersects")
    cent = raster.rasterize(region, level=7, mode="centers")
    assert set(cent.tolist()) <= set(inter.tolist())
    assert 0 < cent.size < inter.size


def test_vectorize_roundtrip_cap():
    """rasterize -> vectorize -> polygon approximates the raster exactly:
    cell centers of raster cells are inside, far cells outside."""
    region = CapRegion(Cap.from_latlng_deg(-20.0, 100.0, 2.5))
    cells = raster.rasterize(region, level=8)
    poly = raster.vectorize_to_polygon(cells)
    # raster cell centers are inside the traced polygon
    x, y, z = cellid.to_xyz(cells)
    n = np.sqrt(x * x + y * y + z * z)
    centers = np.stack([x / n, y / n, z / n], axis=-1)
    assert poly.contains_points(centers).all()
    # far-away points are outside
    far = latlng_deg_to_unit_xyz(
        np.array([40.0, -80.0, 0.0]), np.array([0.0, 30.0, -100.0])
    )
    assert not poly.contains_points(far).any()


def test_vectorize_hole():
    """Annulus raster (outer minus inner) vectorizes to loops whose even-odd
    polygon excludes the hole."""
    outer = raster.rasterize(CapRegion(Cap.from_latlng_deg(0.0, 0.0, 4.0)), 7)
    inner = raster.rasterize(CapRegion(Cap.from_latlng_deg(0.0, 0.0, 1.2)), 7)
    ring = np.array(sorted(set(outer.tolist()) - set(inner.tolist())), dtype=U)
    poly = raster.vectorize_to_polygon(ring)
    center = latlng_deg_to_unit_xyz(np.array([0.0]), np.array([0.0]))
    assert not poly.contains_points(center)[0]  # hole
    mid = latlng_deg_to_unit_xyz(np.array([0.0]), np.array([2.8]))
    assert poly.contains_points(mid)[0]  # in the ring
    assert len(poly.loops) >= 2


def test_vectorize_polygon_region_roundtrip():
    region = PolygonRegion(fixtures.make_loop("arctic_80"))
    cells = raster.rasterize(region, level=6)
    poly = raster.vectorize_to_polygon(cells)
    # north pole is deep inside
    np_pole = latlng_deg_to_unit_xyz(np.array([90.0]), np.array([0.0]))
    assert poly.contains_points(np_pole)[0]
    equator = latlng_deg_to_unit_xyz(np.array([0.0]), np.array([0.0]))
    assert not poly.contains_points(equator)[0]
