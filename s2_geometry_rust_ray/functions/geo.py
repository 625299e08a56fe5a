"""Deterministic synthetic geotag derivation — NumPy and SQL twins.

The engine's primary table (BASELINE.json input_hint) is a geotagged
image+caption table.  The sandbox's driver tables (TESTDATA.md) carry no
geotags, so every pipeline derives them *deterministically* from an integer
row key with IEEE-exact arithmetic (integer mixing + * / only, no trig), so
the DuckDB oracle reproduces the exact same float64 lat/lng bit-for-bit.

The mixture intentionally creates hot-cell skew (north_rule: "dense urban
tiles"): CLUSTER_FRAC of rows concentrate in 5 city-sized spots.
"""

from __future__ import annotations

import numpy as np

U = np.uint64

M32 = 4294967296  # 2^32
MUL1 = 2654435761  # Knuth multiplicative hash
MUL2 = 2246822519  # xxhash prime
ADD2 = 3266489917
ADD3 = 374761393

# (lat, lng) of 5 synthetic "urban" hot spots; exactly-representable-ish
# literals shared verbatim with the SQL twin.
CLUSTER_LAT = np.array([40.75, 51.5, 35.625, -23.5, 6.5])
CLUSTER_LNG = np.array([-74.0, -0.125, 139.75, -46.625, 3.375])
CLUSTER_SPREAD = 0.5  # degrees of jitter box around each hot spot
CLUSTER_MOD = 10
CLUSTER_LT = 3  # h1 % 10 < 3  => 30% of rows are clustered


def mix(key):
    """key (any int array) -> (h1, h2, h3) uint64 arrays, each < 2^32.

    Products stay < 1.16e19 so the identical SQL (UBIGINT) never overflows.
    """
    k = np.asarray(key).astype(U) % U(M32)
    h1 = (k * U(MUL1)) % U(M32)
    h2 = (h1 * U(MUL2) + U(ADD2)) % U(M32)
    h3 = (h2 * U(MUL1) + U(ADD3)) % U(M32)
    return h1, h2, h3


def derive_latlng(key):
    """Integer key -> (lat_deg, lng_deg) float64; 30% clustered in hot spots.

    Hot path: uniform branch computed for all rows in place, the clustered
    ~30% overwritten via masked assignment (identical per-row formulas to
    the SQL twin — only the evaluation strategy differs)."""
    h1, h2, h3 = mix(key)
    u1 = h2.astype(np.float64)
    u1 /= np.float64(M32)
    u2 = h3.astype(np.float64)
    u2 /= np.float64(M32)
    lat = 176.0 * u1
    lat += -88.0
    lng = 360.0 * u2
    lng += -180.0
    clustered = (h1 % U(CLUSTER_MOD)) < U(CLUSTER_LT)
    if clustered.any():
        m = clustered
        c = (h1[m] % U(5)).astype(np.int64)
        lat[m] = CLUSTER_LAT[c] + (u1[m] - 0.5) * CLUSTER_SPREAD
        lng[m] = CLUSTER_LNG[c] + (u2[m] - 0.5) * CLUSTER_SPREAD
    return lat, lng


def sql_latlng_cte(src_sql: str, key_expr: str, keep_cols: str = "") -> str:
    """SQL producing (key, lat, lng [, keep_cols]) bit-identical to
    derive_latlng over the rows of ``src_sql``.

    ``key_expr`` must be a non-negative integer expression < 2^32.
    """
    keep = f", {keep_cols}" if keep_cols else ""
    clat = "CASE h1 % 5 WHEN 0 THEN 40.75 WHEN 1 THEN 51.5 WHEN 2 THEN 35.625 WHEN 3 THEN -23.5 ELSE 6.5 END"
    clng = "CASE h1 % 5 WHEN 0 THEN -74.0 WHEN 1 THEN -0.125 WHEN 2 THEN 139.75 WHEN 3 THEN -46.625 ELSE 3.375 END"
    return f"""
  __src AS ({src_sql}),
  __mix AS (
    SELECT ((({key_expr})::UBIGINT % 4294967296) * 2654435761) % 4294967296 AS h1,
           ({key_expr})::BIGINT AS key{keep}
    FROM __src
  ),
  __mix2 AS (
    SELECT key, h1, (h1 * 2246822519 + 3266489917) % 4294967296 AS h2{keep}
    FROM __mix
  ),
  __mix3 AS (
    SELECT key, h1, h2, (h2 * 2654435761 + 374761393) % 4294967296 AS h3{keep}
    FROM __mix2
  ),
  __geo AS (
    SELECT key,
           CASE WHEN h1 % {CLUSTER_MOD} < {CLUSTER_LT}
                THEN ({clat}) + (h2::DOUBLE / 4294967296.0 - 0.5) * {CLUSTER_SPREAD}
                ELSE -88.0 + 176.0 * (h2::DOUBLE / 4294967296.0) END AS lat,
           CASE WHEN h1 % {CLUSTER_MOD} < {CLUSTER_LT}
                THEN ({clng}) + (h3::DOUBLE / 4294967296.0 - 0.5) * {CLUSTER_SPREAD}
                ELSE -180.0 + 360.0 * (h3::DOUBLE / 4294967296.0) END AS lng{keep}
    FROM __mix3
  )"""
