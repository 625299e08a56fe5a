"""Canonical loop fixture menagerie — the C++ test loops as ported at
/root/reference/tests/test_s2loop_port.rs:44-141.  Used by the test suite
and as the polygon layer of the synthetic tables."""

from __future__ import annotations

import numpy as np

from .loop import Loop, Polygon

LOOP_COORDS_DEG: dict[str, list[tuple[float, float]]] = {
    # hemispheres (antipodal vertex pairs)
    "north_hemi": [(0, -180), (0, -90), (0, 0), (0, 90)],
    "south_hemi": [(0, 90), (0, 0), (0, -90), (0, -180)],
    "west_hemi": [(0, -180), (-90, 0), (0, 0), (90, 0)],
    "east_hemi": [(90, 0), (0, 0), (-90, 0), (0, -180)],
    "near_hemi": [(0, -90), (-90, 0), (0, 90), (90, 0)],
    "far_hemi": [(90, 0), (0, 90), (-90, 0), (0, -90)],
    # spiral stripe that slightly over-wraps the equator
    "candy_cane": [(-20, 150), (-20, -70), (0, 70), (10, -150), (10, 70), (-10, -70)],
    # small CW loop in NE hemispheres (interior is the big complement!)
    "small_ne_cw": [(35, 20), (45, 20), (40, 25)],
    "arctic_80": [(80, -150), (80, -30), (80, 90)],
    "antarctic_80": [(-80, 120), (-80, 0), (-80, -120)],
    "line_triangle": [(0, 1), (0, 2), (0, 3)],
    "skinny_chevron": [(0, 0), (-1e-15, 80), (0, 1e-15), (1e-15, 80)],
    # diamonds around (0, 180)
    "loop_a": [(0, 178), (-1, 180), (0, -179), (1, -180)],
    "loop_b": [(0, 179), (-1, 180), (0, -178), (1, -180)],
    "a_intersect_b": [(0, 179), (-1, 180), (0, -179), (1, -180)],
    "a_union_b": [(0, 178), (-1, 180), (0, -178), (1, -180)],
    "a_minus_b": [(0, 178), (-1, 180), (0, 179), (1, -180)],
    "b_minus_a": [(0, -179), (-1, 180), (0, -178), (1, -180)],
}


def make_loop(name: str) -> Loop:
    coords = LOOP_COORDS_DEG[name]
    lat = np.array([c[0] for c in coords], dtype=np.float64)
    lng = np.array([c[1] for c in coords], dtype=np.float64)
    return Loop.from_latlng_deg(lat, lng)


def regular_loop_deg(center_lat, center_lng, radius_deg, n_vertices=16) -> Loop:
    """Regular n-gon around a center (src/loop.rs:580-613 make_regular_loop
    semantics, built directly in lat/lng tangent approximation for small
    radii — used for urban hot-spot polygons)."""
    ang = np.linspace(0.0, 2 * np.pi, n_vertices, endpoint=False)
    coslat = np.cos(np.deg2rad(center_lat))
    lat = center_lat + radius_deg * np.sin(ang)
    lng = center_lng + radius_deg * np.cos(ang) / max(coslat, 1e-6)
    lng = ((lng + 180.0) % 360.0) - 180.0
    return Loop.from_latlng_deg(lat, lng)


def polygon_layer() -> dict[str, Polygon]:
    """The engine's standard polygon layer: fixture loops as polygons, plus
    regular polygons over the synthetic hot spots (functions/geo.py centers)
    and one shell+hole polygon."""
    from ..functions.geo import CLUSTER_LAT, CLUSTER_LNG

    layer: dict[str, Polygon] = {}
    for name in [
        "north_hemi", "south_hemi", "east_hemi", "west_hemi", "candy_cane",
        "arctic_80", "antarctic_80", "loop_a", "loop_b", "a_union_b",
    ]:
        layer[name] = Polygon([make_loop(name)])
    for i, (clat, clng) in enumerate(zip(CLUSTER_LAT, CLUSTER_LNG)):
        layer[f"urban_{i}"] = Polygon(
            [regular_loop_deg(float(clat), float(clng), 1.5, 24)]
        )
    # shell with a hole around hot spot 0
    shell = regular_loop_deg(float(CLUSTER_LAT[0]), float(CLUSTER_LNG[0]), 3.0, 24)
    hole = regular_loop_deg(float(CLUSTER_LAT[0]), float(CLUSTER_LNG[0]), 0.5, 12)
    layer["urban_0_ring"] = Polygon([shell, hole])
    return layer
