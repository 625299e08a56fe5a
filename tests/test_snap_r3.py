"""Round-3 parity additions: SnapFunction objects (incl. the reference's
MinEdgeLengthSnapFunction, snap_functions.rs:294-343), get_fast_covering
alias (region_coverer.rs:499-503), and per-shell boolean probes."""

import numpy as np

from s2_geometry_rust_ray.functions import snap
from s2_geometry_rust_ray.geometry.coverer import CapRegion, RegionCoverer
from s2_geometry_rust_ray.geometry.cap import Cap
from s2_geometry_rust_ray.geometry.loop import Loop, Polygon
from s2_geometry_rust_ray.geometry import boolean as bo


def _xyz(lat_deg, lng_deg):
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lng = np.radians(np.asarray(lng_deg, np.float64))
    return np.stack(
        [np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)], axis=-1
    )


def _loop(coords):
    lats = np.array([c[0] for c in coords], np.float64)
    lngs = np.array([c[1] for c in coords], np.float64)
    return Loop(_xyz(lats, lngs))


class TestSnapFunctions:
    def test_identity(self):
        f = snap.IdentitySnapFunction()
        lat, lng = f.snap_point(np.array([1.23]), np.array([4.56]))
        assert lat[0] == 1.23 and lng[0] == 4.56
        assert f.snap_radius() == 0.0
        assert f.min_vertex_separation() == 0.0

    def test_intlatlng_matches_e7(self):
        f = snap.IntLatLngSnapFunction(7)
        lat = np.array([12.34567891, -33.3])
        lng = np.array([56.78912345, 151.2])
        got = f.snap_point(lat, lng)
        want = snap.snap_e7(lat, lng, 7)
        assert np.array_equal(got[0], want[0]) and np.array_equal(got[1], want[1])
        # snapping never moves farther than snap_radius
        step = np.radians(1e-7)
        assert abs(f.snap_radius() - step * np.sqrt(2) / 2) < 1e-18

    def test_cellid_snap(self):
        f = snap.S2CellIdSnapFunction(10)
        lat = np.array([37.7749])
        lng = np.array([-122.4194])
        got_lat, got_lng = f.snap_point(lat, lng)
        want_lat, want_lng, _ = snap.snap_to_cell_center(lat, lng, 10)
        assert np.array_equal(got_lat, want_lat)
        assert np.array_equal(got_lng, want_lng)
        # reference radii formulas (snap_functions.rs:253-266)
        from s2_geometry_rust_ray.functions import metrics

        cell = float(metrics.length_value(metrics.AVG_EDGE, 10))
        assert abs(f.snap_radius() - cell * np.sqrt(2) / 2) < 1e-18
        assert abs(f.min_vertex_separation() - (np.pi / (1 << 10)) * 0.8) < 1e-18

    def test_min_edge_length_wrapper(self):
        base = snap.S2CellIdSnapFunction(12)
        f = snap.MinEdgeLengthSnapFunction(base, 1e-3)
        lat = np.array([48.8566])
        lng = np.array([2.3522])
        # snap_point delegates to base (reference behavior, :316-319)
        assert np.array_equal(f.snap_point(lat, lng)[0], base.snap_point(lat, lng)[0])
        assert f.snap_radius() == base.snap_radius() + 1e-3
        assert f.min_vertex_separation() == max(base.min_vertex_separation(), 1e-3)
        # large min edge dominates the separation
        g = snap.MinEdgeLengthSnapFunction(snap.IdentitySnapFunction(), 0.5)
        assert g.min_vertex_separation() == 0.5


def test_get_fast_covering_alias():
    rc = RegionCoverer(max_cells=8)
    region = CapRegion(Cap.from_latlng_deg(10.0, 20.0, 3.0))
    assert np.array_equal(rc.get_fast_covering(region), rc.get_covering(region))


class TestShellProbes:
    def test_disconnected_b_not_contained(self):
        # A covers only one of B's two shells: contains must be False
        a = Polygon([_loop([(-5, -5), (-5, 5), (5, 5), (5, -5)])])
        b = Polygon(
            [
                _loop([(-1, -1), (-1, 1), (1, 1), (1, -1)]),  # inside A
                _loop([(39, 39), (39, 41), (41, 41), (41, 39)]),  # outside A
            ]
        )
        assert not bo.polygon_contains_polygon(a, b)
        assert bo.polygon_intersects_polygon(a, b)

    def test_disconnected_b_contained(self):
        a = Polygon([_loop([(-20, -20), (-20, 20), (20, 20), (20, -20)])])
        b = Polygon(
            [
                _loop([(-1, -1), (-1, 1), (1, 1), (1, -1)]),
                _loop([(9, 9), (9, 11), (11, 11), (11, 9)]),
            ]
        )
        assert bo.polygon_contains_polygon(a, b)

    def test_hole_probe_not_required_inside(self):
        # B = annulus (shell + hole); A contains the shell -> contains B,
        # the hole loop (depth 1) must NOT be probed as a shell
        shell = _loop([(-10, -10), (-10, 10), (10, 10), (10, -10)])
        hole = _loop([(-2, -2), (-2, 2), (2, 2), (2, -2)])
        b = Polygon([shell, hole])
        a = Polygon([_loop([(-15, -15), (-15, 15), (15, 15), (15, -15)])])
        assert bo.polygon_contains_polygon(a, b)
        # an A that fits inside B's hole intersects neither shell region
        a_in_hole = Polygon([_loop([(-1, -1), (-1, 1), (1, 1), (1, -1)])])
        assert not bo.polygon_contains_polygon(a_in_hole, b)
        assert not bo.polygon_intersects_polygon(a_in_hole, b)

    def test_candidate_pair_prune_matches_bruteforce(self):
        rng = np.random.default_rng(7)
        lat_a = rng.uniform(-30, 30, 12)
        lng_a = rng.uniform(-30, 30, 12)
        a1 = _xyz(lat_a, lng_a)
        a2 = _xyz(np.roll(lat_a, -1), np.roll(lng_a, -1))
        lat_b = rng.uniform(-30, 30, 10)
        lng_b = rng.uniform(-30, 30, 10)
        b1 = _xyz(lat_b, lng_b)
        b2 = _xyz(np.roll(lat_b, -1), np.roll(lng_b, -1))
        from s2_geometry_rust_ray.functions import predicates as pred

        ii, jj = bo._candidate_pairs(a1, a2, b1, b2)
        cand = set(zip(ii.tolist(), jj.tolist()))
        for i in range(len(a1)):
            for j in range(len(b1)):
                if pred.crossing_sign(a1[i], a2[i], b1[j], b2[j]) > 0:
                    assert (i, j) in cand  # prune is conservative
