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
