"""S2Builder-style edge-soup assembly (reference src/builder/)."""

import numpy as np
import pytest

from s2_geometry_rust_ray.geometry import fixtures
from s2_geometry_rust_ray.geometry.builder import Builder
from s2_geometry_rust_ray.geometry.loop import latlng_deg_to_unit_xyz


def test_rebuild_loop_from_shuffled_edges():
    coords = fixtures.LOOP_COORDS_DEG["candy_cane"]
    edges = [(coords[i], coords[(i + 1) % len(coords)]) for i in range(len(coords))]
    rng = np.random.default_rng(3)
    rng.shuffle(edges)
    b = Builder()
    for a, c in edges:
        b.add_edge_latlng(a, c)
    poly = b.build_polygon()
    assert len(poly.loops) == 1
    assert poly.loops[0].num_vertices() == len(coords)
    # semantics preserved: same containment as the original loop
    orig = fixtures.make_loop("candy_cane")
    pts = latlng_deg_to_unit_xyz(
        rng.uniform(-60, 60, 200), rng.uniform(-180, 180, 200)
    )
    assert np.array_equal(poly.contains_points(pts), orig.contains_points(pts))


def test_two_loops_assembled():
    b = Builder()
    b.add_loop_latlng(fixtures.LOOP_COORDS_DEG["arctic_80"])
    b.add_loop_latlng(fixtures.LOOP_COORDS_DEG["antarctic_80"])
    loops = b.build_loops()
    assert len(loops) == 2


def test_degenerate_and_duplicate_edges_removed():
    b = Builder()
    b.add_edge_latlng((10, 10), (10, 10))  # degenerate -> dropped
    b.add_edge_latlng((0, 0), (0, 10))
    b.add_edge_latlng((0, 0), (0, 10))  # duplicate -> dropped
    b.add_edge_latlng((0, 10), (10, 5))
    b.add_edge_latlng((10, 5), (0, 0))
    loops = b.build_loops()
    assert len(loops) == 1 and len(loops[0]) == 3


def test_sibling_pairs_cancel():
    b = Builder()
    b.add_loop_latlng([(0, 0), (0, 10), (10, 5)])
    # an edge and its reverse (a degenerate "spike") cancel out
    b.add_edge_latlng((0, 0), (5, 5))
    b.add_edge_latlng((5, 5), (0, 0))
    loops = b.build_loops()
    assert len(loops) == 1 and len(loops[0]) == 3


def test_e7_snapping_merges_near_vertices():
    b = Builder(snap=("e7", 5))  # 1e-5 degree grid
    eps = 1e-7
    b.add_edge_latlng((0, 0), (0, 10))
    b.add_edge_latlng((0 + eps, 10 + eps), (10, 5))  # snaps onto (0,10)
    b.add_edge_latlng((10, 5), (0 - eps, 0 + eps))  # snaps onto (0,0)
    loops = b.build_loops()
    assert len(loops) == 1 and len(loops[0]) == 3


def test_cell_snap():
    b = Builder(snap=("cell", 16))
    b.add_loop_latlng([(0, 0), (0, 10), (10, 5)])
    poly = b.build_polygon()
    assert len(poly.loops) == 1


def test_open_chain_raises():
    b = Builder()
    b.add_edge_latlng((0, 0), (0, 10))
    b.add_edge_latlng((0, 10), (10, 5))
    with pytest.raises(ValueError):
        b.build_loops()


def test_polyline_layer():
    b = Builder()
    b.add_edge_latlng((0, 0), (0, 10))
    b.add_edge_latlng((0, 10), (10, 5))
    lines = b.build_polylines()
    assert len(lines) == 1 and len(lines[0]) == 3


def test_loops_sharing_a_vertex_assemble():
    """Two triangles touching at (0,0): a greedy walk can dead-end at the
    branch vertex; Hierholzer assembly must split them into two loops
    regardless of edge insertion order."""
    import itertools

    tri1 = [(0.0, 0.0), (0.0, 5.0), (5.0, 2.0)]
    tri2 = [(0.0, 0.0), (-5.0, -2.0), (0.0, -5.0)]
    edges = [(tri1[i], tri1[(i + 1) % 3]) for i in range(3)] + [
        (tri2[i], tri2[(i + 1) % 3]) for i in range(3)
    ]
    for perm in itertools.islice(itertools.permutations(range(6)), 0, 720, 37):
        b = Builder()
        for e in perm:
            b.add_edge_latlng(*edges[e])
        loops = b.build_loops()
        assert sorted(len(l) for l in loops) == [3, 3]
        vertex_sets = sorted(sorted(map(tuple, l)) for l in loops)
        want = sorted([sorted(tri1), sorted(tri2)])
        assert vertex_sets == want
