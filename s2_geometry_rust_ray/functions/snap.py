"""Snap functions — coordinate quantization kernels per the reference's
S2Builder snap functions (/root/reference/src/builder/snap_functions.rs:
Identity, IntLatLng E5-E7 :78-216, S2CellId cell-center snapping :217-290).

Engine use: near-duplicate geotag dedup (snap all geotags to E7 or to
level-K cell centers, then exact dedup) and geometry-ingest normalization.
All vectorized."""

from __future__ import annotations

import numpy as np

from . import cellid


def snap_e7(lat_deg, lng_deg, exponent: int = 7):
    """IntLatLng snap: round to 10^-exponent degrees (E5/E6/E7)."""
    scale = 10.0**exponent
    lat = np.round(np.asarray(lat_deg, np.float64) * scale) / scale
    lng = np.round(np.asarray(lng_deg, np.float64) * scale) / scale
    return lat, lng


def snap_e7_int(lat_deg, lng_deg, exponent: int = 7):
    """Integer E7 representation (int64) — exact dedup keys."""
    scale = 10.0**exponent
    return (
        np.round(np.asarray(lat_deg, np.float64) * scale).astype(np.int64),
        np.round(np.asarray(lng_deg, np.float64) * scale).astype(np.int64),
    )


def snap_to_cell_center(lat_deg, lng_deg, level: int):
    """S2CellIdSnapFunction: snap each point to the center of its level-K
    cell; returns (snapped_lat, snapped_lng, cell_id_at_level)."""
    leaf = cellid.from_latlng_deg(lat_deg, lng_deg)
    cell = cellid.parent(leaf, level)
    clat, clng = cellid.to_latlng_deg(cell)
    return clat, clng, cell


def snap_dedup_keys(lat_deg, lng_deg, level: int = 20):
    """Near-duplicate geotag dedup key: the level-K cell id (two points
    snap-equal iff they share the level-K cell)."""
    return cellid.parent(cellid.from_latlng_deg(lat_deg, lng_deg), level)


# ---------------------------------------------------------------------------
# SnapFunction objects — the reference's SnapFunction enum surface
# (/root/reference/src/builder/snap_functions.rs: Identity :78-120,
# IntLatLng :121-216, S2CellId :217-290, MinEdgeLength :294-343).  All
# snap_point paths vectorized over (lat, lng) arrays.
# ---------------------------------------------------------------------------


class IdentitySnapFunction:
    """No snapping (snap_functions.rs:78-120)."""

    def snap_point(self, lat_deg, lng_deg):
        return np.asarray(lat_deg, np.float64), np.asarray(lng_deg, np.float64)

    def snap_radius(self) -> float:
        return 0.0

    def min_vertex_separation(self) -> float:
        return 0.0


class IntLatLngSnapFunction:
    """E5/E6/E7 integer lat/lng snapping (snap_functions.rs:121-216)."""

    def __init__(self, exponent: int = 7):
        if not 0 <= exponent <= 10:
            raise ValueError("exponent out of range")
        self.exponent = exponent
        # snapping moves a point at most half a grid step in each of lat &
        # lng: radius bound = (sqrt(2)/2) * 1e-exponent degrees in radians
        step = np.radians(10.0 ** (-exponent))
        self._snap_radius = step * np.sqrt(2.0) / 2.0
        self._min_sep = step * 0.5

    def snap_point(self, lat_deg, lng_deg):
        return snap_e7(lat_deg, lng_deg, self.exponent)

    def snap_radius(self) -> float:
        return float(self._snap_radius)

    def min_vertex_separation(self) -> float:
        return float(self._min_sep)


class S2CellIdSnapFunction:
    """Cell-center snapping at a level (snap_functions.rs:217-290): snap
    radius = avg_edge(level) * sqrt(2)/2 (half the diagonal bound the
    reference uses), min separation = (pi / 2^level) * 0.8."""

    def __init__(self, level: int = 30):
        if not 0 <= level <= 30:
            raise ValueError("S2CellId level must be in range [0, 30]")
        self.level = level
        from . import metrics

        cell_size = float(metrics.length_value(metrics.AVG_EDGE, level))
        self._snap_radius = cell_size * np.sqrt(2.0) / 2.0
        self._min_sep = (np.pi / float(1 << level)) * 0.8

    def snap_point(self, lat_deg, lng_deg):
        lat, lng, _ = snap_to_cell_center(lat_deg, lng_deg, self.level)
        return lat, lng

    def snap_radius(self) -> float:
        return float(self._snap_radius)

    def min_vertex_separation(self) -> float:
        return float(self._min_sep)


class MinEdgeLengthSnapFunction:
    """Minimum-edge-length wrapper (snap_functions.rs:294-343): applies the
    base snap and widens the radii bookkeeping — snap_radius = base +
    min_edge_length (conservative upper bound), min_vertex_separation =
    max(base, min_edge_length).  Point snapping itself delegates to the
    base (the reference's edge-length enforcement inside S2Builder is an
    explicit TODO there, :320-322; the engine's Builder drops duplicate /
    zero-length edges after snapping, which is the piece that matters for
    downstream numerical robustness)."""

    def __init__(self, base, min_edge_length: float):
        if min_edge_length < 0.0:
            raise ValueError("min_edge_length must be >= 0")
        self.base = base
        self.min_edge_length = float(min_edge_length)

    def snap_point(self, lat_deg, lng_deg):
        return self.base.snap_point(lat_deg, lng_deg)

    def snap_radius(self) -> float:
        return self.base.snap_radius() + self.min_edge_length

    def min_vertex_separation(self) -> float:
        return max(self.base.min_vertex_separation(), self.min_edge_length)
