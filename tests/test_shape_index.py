"""MutableShapeIndex / shape-protocol tests (geometry/shape_index.py) —
canonical index semantics vs the port's flat-level-15-no-clip placeholder
(/root/reference/src/mutable_shape_index.rs:143-193)."""

import numpy as np

from s2_geometry_rust_ray.functions import cellid
from s2_geometry_rust_ray.geometry.loop import Loop, Polygon
from s2_geometry_rust_ray.geometry import shape_index as si


def _xyz(lat_deg, lng_deg):
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lng = np.radians(np.asarray(lng_deg, np.float64))
    return np.stack(
        [np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)], axis=-1
    )


def _square(lat0, lng0, half):
    lats = np.array([lat0 - half, lat0 - half, lat0 + half, lat0 + half])
    lngs = np.array([lng0 - half, lng0 + half, lng0 + half, lng0 - half])
    return Polygon([Loop(_xyz(lats, lngs))])


def _build_index():
    idx = si.MutableShapeIndex(max_cells_per_shape=12, max_level=10)
    pa_id = idx.add_shape(si.PolygonShape(_square(10, 20, 3)))
    pb_id = idx.add_shape(si.PolygonShape(_square(12, 22, 2)))  # overlaps A
    line = si.PolylineShape(_xyz(np.array([0, 5, 10]), np.array([0, 5, 10])))
    pl_id = idx.add_shape(line)
    pts = si.PointShape(_xyz(np.array([45.0, -30.0]), np.array([60.0, 100.0])))
    pt_id = idx.add_shape(pts)
    return idx, pa_id, pb_id, pl_id, pt_id


def test_build_and_iterator_order():
    idx, *_ = _build_index()
    rows = idx.build()
    assert rows, "index not empty"
    keys = [
        int(cellid.to_sort_key(np.array([cid], dtype=np.uint64))[0])
        for cid, *_ in rows
    ]
    assert keys == sorted(keys)
    # iterator groups by cell
    cells = [cid for cid, _ in idx.iterator()]
    assert len(cells) == len(set(cells))


def test_posting_table_schema():
    idx, *_ = _build_index()
    t = idx.to_table()
    assert t.column_names == ["cell_key", "shape_id", "edge_id", "contains_center"]
    assert t.num_rows >= len(idx.build())


def test_contains_point_matches_direct():
    idx, pa_id, pb_id, _, _ = _build_index()
    shapes = {pa_id: _square(10, 20, 3), pb_id: _square(12, 22, 2)}
    rng = np.random.default_rng(4)
    lats = rng.uniform(5, 17, 60)
    lngs = rng.uniform(14, 27, 60)
    pts = _xyz(lats, lngs)
    for p in pts:
        got = idx.contains_point(p)
        want = {sid for sid, poly in shapes.items()
                if bool(poly.contains_points(p[None, :])[0])}
        assert got == want, (p, got, want)


def test_shape_protocol_surface():
    idx, pa_id, pb_id, pl_id, pt_id = _build_index()
    sh = idx.shapes
    assert sh[pa_id].dimension == 2 and sh[pa_id].num_edges() == 4
    assert sh[pl_id].dimension == 1 and sh[pl_id].num_edges() == 2
    assert sh[pt_id].dimension == 0 and sh[pt_id].num_edges() == 2
    a, b = sh[pt_id].edge(0)
    assert np.array_equal(a, b)  # degenerate point edge
    assert sh[pa_id].chains() == [(0, 4)]
    assert sh[pl_id].chains() == [(0, 2)]


def test_contains_points_batch_matches_scalar():
    """The vectorized contains_points must reproduce the scalar
    contains_point exactly — including boundary-grid points that force
    the exact-predicate fallback."""
    idx, pa_id, pb_id, _, _ = _build_index()
    rng = np.random.default_rng(42)
    lats = rng.uniform(0, 25, 400)
    lngs = rng.uniform(10, 35, 400)
    # add points ON the square edges (lat/lng grid lines) to hit ties
    edge_lats = np.array([7.0, 13.0, 10.0, 12.0, 14.0, 10.0])
    edge_lngs = np.array([20.0, 22.0, 17.0, 20.0, 22.0, 23.0])
    lats = np.concatenate([lats, edge_lats])
    lngs = np.concatenate([lngs, edge_lngs])
    pts = _xyz(lats, lngs)
    pt_idx, sids = idx.contains_points(pts)
    got = {}
    for i, s in zip(pt_idx.tolist(), sids.tolist()):
        got.setdefault(i, set()).add(s)
    for i in range(len(pts)):
        assert got.get(i, set()) == idx.contains_point(pts[i]), f"point {i}"


def test_contains_points_batch_empty_and_miss():
    idx, *_ = _build_index()
    p, s = idx.contains_points(np.zeros((0, 3)))
    assert len(p) == 0 and len(s) == 0
    # a point far from every shape
    p, s = idx.contains_points(_xyz(np.array([-80.0]), np.array([170.0])))
    assert len(p) == 0
