"""Spherical measures: triangle/loop/polygon area, curvature, centroid.

Canonical C++ semantics (s2measures.cc / s2loop_measures.cc /
s2centroids.cc) — NOT the reference port's simplified `get_area`
(/root/reference/src/loop.rs:322-341, which mixes Girard terms with an
abs() normalization and is one of the port's documented broken spots; the
reference's own measures tests, tests/test_s2measures_port.rs:32-355, are
all `should_panic` stubs).  Semantics implemented here:

  * triangle area: l'Huilier's theorem with the Girard-formula fallback
    for long skinny triangles (s2measures.cc S2::Area).
  * loop area: surface integral of signed triangle areas over the fan
    (v0, v_i, v_i+1), normalized to [0, 4pi] (s2loop_measures.cc).
  * curvature: sum of turn angles; Gauss-Bonnet gives
    curvature == 2*pi - area for simple loops (exact on the unit sphere).
  * centroid: surface integral of the triangle TRUE centroid
    (s2centroids.cc TrueCentroid) — returns the area-weighted
    (non-unit-normalized) centroid vector like C++.
  * polygon area/centroid: even-odd nesting parity — a loop nested inside
    an odd number of other loops subtracts (matches Polygon.contains_points
    XOR semantics).

For the DRIVER ORACLE the module also provides `tan_half_area_fold`: the
tangent half-angle of the fan sum computed with ONLY +-*/ (each triangle's
tan(E/2) = triple(a,b,c) / (1 + a.b + b.c + c.a) is rational in the
coordinates, and tangent addition t <- (t+ti)/(1-t*ti) stays rational), so
a DuckDB recursive CTE reproduces it bit-exactly — raw spherical excess
needs atan/tan whose libm results differ between numpy and DuckDB by 1 ulp
(measured), so the oracle ships the rational fold instead.
"""

from __future__ import annotations

import math

import numpy as np

FULL_AREA = 4.0 * math.pi


def angle(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Angle between unit vectors, rows of (n,3): atan2(|u x v|, u.v)."""
    cr = np.cross(u, v)
    return np.arctan2(np.linalg.norm(cr, axis=-1), np.sum(u * v, axis=-1))


def turn_angle(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exterior angle at b for the chain a->b->c, positive for a left
    (CCW) turn (s2measures.cc S2::TurnAngle)."""
    ab = np.cross(a, b)
    bc = np.cross(b, c)
    ang = angle(ab, bc)
    # sign = Sign(a, b, c): use the determinant's sign (measures are
    # numeric, not exactness-critical; see predicates for exact variants)
    det = np.sum(np.cross(a, b) * c, axis=-1)
    return np.where(det > 0, ang, -ang)


def girard_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Girard's formula via edge-normal angles (s2measures.cc GirardArea);
    accurate for long skinny triangles where l'Huilier loses precision."""
    ab = np.cross(a, b)
    bc = np.cross(b, c)
    ac = np.cross(a, c)
    out = angle(ab, ac) - angle(ab, bc) + angle(bc, ac)
    return np.maximum(0.0, out)


def triangle_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Unsigned spherical triangle area, l'Huilier with Girard fallback
    (s2measures.cc S2::Area — same branch thresholds)."""
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    c = np.atleast_2d(c)
    sa = angle(b, c)
    sb = angle(c, a)
    sc = angle(a, b)
    s = 0.5 * (sa + sb + sc)
    area = 4.0 * np.arctan(
        np.sqrt(
            np.maximum(
                0.0,
                np.tan(0.5 * s)
                * np.tan(0.5 * (s - sa))
                * np.tan(0.5 * (s - sb))
                * np.tan(0.5 * (s - sc)),
            )
        )
    )
    # Girard fallback band (C++: s >= 3e-4 and dmin < 1e-2 * s^5)
    dmin = s - np.maximum(sa, np.maximum(sb, sc))
    s2 = s * s
    consider = (s >= 3e-4) & (dmin < 1e-2 * s * s2 * s2)
    if consider.any():
        g = girard_area(a[consider], b[consider], c[consider])
        use_g = dmin[consider] < s[consider] * (0.1 * g)
        ga = area[consider]
        ga[use_g] = g[use_g]
        area[consider] = ga
    return area


def signed_triangle_area(a, b, c) -> np.ndarray:
    """Positive iff (a,b,c) is CCW (s2measures.cc S2::SignedArea)."""
    det = np.sum(np.cross(np.atleast_2d(a), np.atleast_2d(b)) * np.atleast_2d(c), axis=-1)
    return np.sign(det) * triangle_area(a, b, c)


def true_centroid_triangle(a, b, c) -> np.ndarray:
    """(n,3) surface integral of position over each spherical triangle
    (s2centroids.cc S2::TrueCentroid): solves the 3x3 system via cross
    products; result is area-weighted, NOT unit length."""
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    c = np.atleast_2d(c)
    angle_a = angle(b, c)
    angle_b = angle(c, a)
    angle_c = angle(a, b)
    with np.errstate(invalid="ignore", divide="ignore"):
        ra = np.where(angle_a == 0.0, 1.0, angle_a / np.sin(angle_a))
        rb = np.where(angle_b == 0.0, 1.0, angle_b / np.sin(angle_b))
        rc = np.where(angle_c == 0.0, 1.0, angle_c / np.sin(angle_c))
    # rows of the system: x = (a.x, b.x, c.x) etc.; solution via cofactors
    x = np.stack([a[:, 0], b[:, 0], c[:, 0]], axis=-1)
    y = np.stack([a[:, 1], b[:, 1], c[:, 1]], axis=-1)
    z = np.stack([a[:, 2], b[:, 2], c[:, 2]], axis=-1)
    r = np.stack([ra, rb, rc], axis=-1)
    out = 0.5 * np.stack(
        [
            np.sum(np.cross(y, z) * r, axis=-1),
            np.sum(np.cross(z, x) * r, axis=-1),
            np.sum(np.cross(x, y) * r, axis=-1),
        ],
        axis=-1,
    )
    # sign follows triangle orientation
    det = np.sum(np.cross(a, b) * c, axis=-1)
    return out * np.where(det >= 0, 1.0, -1.0)[:, None]


def _fan(vertices: np.ndarray):
    v = np.asarray(vertices, dtype=np.float64)
    a = np.broadcast_to(v[0], (len(v) - 2, 3))
    return a, v[1:-1], v[2:]


def loop_signed_area(vertices: np.ndarray) -> float:
    """Signed fan-sum area in (-2pi, 2pi]; positive for CCW loops with
    area < 2pi (s2loop_measures.cc GetSignedArea's integral)."""
    v = np.asarray(vertices, dtype=np.float64)
    if len(v) < 3:
        return 0.0
    a, b, c = _fan(v)
    return float(math.fsum(signed_triangle_area(a, b, c)))


def loop_area(vertices: np.ndarray) -> float:
    """Area of the loop interior (left of the edges), in [0, 4pi].

    Hybrid estimator in the spirit of s2loop_measures.cc GetArea: the fan
    surface integral is the precision path (relative error stays tiny for
    small loops), but it degenerates when fan chords are colinear or
    antipodal (e.g. a loop along a great circle integrates to 0); the
    Gauss-Bonnet value 2*pi - curvature is immune to fan geometry but has
    ~1e-15 ABSOLUTE error (catastrophic for tiny loops).  Use the integral
    when the two agree, Gauss-Bonnet when the fan degenerated."""
    gb = 2.0 * math.pi - loop_curvature(vertices)
    gb = min(FULL_AREA, max(0.0, gb))
    area = loop_signed_area(vertices)
    if area < 0.0:
        area += FULL_AREA
    area = min(FULL_AREA, max(0.0, area))
    return area if abs(area - gb) < 1e-8 else gb


def loop_curvature(vertices: np.ndarray) -> float:
    """Sum of turn angles (s2loop_measures.cc GetCurvature); equals
    2*pi - area by Gauss-Bonnet for simple loops."""
    v = np.asarray(vertices, dtype=np.float64)
    n = len(v)
    if n < 3:
        return 2.0 * math.pi
    prev_ = np.roll(v, 1, axis=0)
    next_ = np.roll(v, -1, axis=0)
    return float(math.fsum(turn_angle(prev_, v, next_)))


def loop_centroid(vertices: np.ndarray) -> np.ndarray:
    """Area-weighted (non-normalized) centroid of the loop interior,
    fan surface integral of TrueCentroid (s2loop_measures.cc
    GetCentroid)."""
    v = np.asarray(vertices, dtype=np.float64)
    if len(v) < 3:
        return np.zeros(3)
    a, b, c = _fan(v)
    return true_centroid_triangle(a, b, c).sum(axis=0)


def _nesting_sign(loops) -> list[int]:
    """+1 for loops nested inside an even number of the polygon's OTHER
    loops, -1 for odd (holes) — matches even-odd contains_points XOR."""
    signs = []
    for i, lp in enumerate(loops):
        depth = 0
        probe = lp.v[0][None, :]
        for j, other in enumerate(loops):
            if j != i and bool(other.contains_points(probe)[0]):
                depth += 1
        signs.append(1 if depth % 2 == 0 else -1)
    return signs


def polygon_area(polygon) -> float:
    """Even-odd polygon area: shells add, odd-nested loops (holes)
    subtract."""
    total = 0.0
    for sgn, lp in zip(_nesting_sign(polygon.loops), polygon.loops):
        total += sgn * loop_area(lp.v)
    return min(FULL_AREA, max(0.0, total))


def polygon_centroid(polygon) -> np.ndarray:
    """Even-odd area-weighted centroid (holes subtract)."""
    total = np.zeros(3)
    for sgn, lp in zip(_nesting_sign(polygon.loops), polygon.loops):
        total += sgn * loop_centroid(lp.v)
    return total


# ---------------------------------------------------------------------------
# Oracle-reproducible rational fold
# ---------------------------------------------------------------------------

def tan_half_area_fold(vertices: np.ndarray) -> float:
    """tan(fan_area / 2) via per-triangle rational tangent terms and the
    tangent-addition fold — ONLY +-*/ in a FIXED evaluation order, so a
    DuckDB recursive CTE over the same vertex literals reproduces every
    float bit (oracle/sql.q_loop_measures).  Per triangle (v0, vi, vi+1):
    tan(E/2) = a.(b x c) / (1 + a.b + b.c + c.a)  [signed by orientation];
    fold: t <- (t + ti) / (1 - t*ti).  Breaks down when the cumulative
    area crosses pi (tan pole) — fine for the layer polygons it oracles."""
    v = np.asarray(vertices, dtype=np.float64)
    t = 0.0
    ax, ay, az = float(v[0, 0]), float(v[0, 1]), float(v[0, 2])
    for i in range(1, len(v) - 1):
        bx, by, bz = float(v[i, 0]), float(v[i, 1]), float(v[i, 2])
        cx, cy, cz = float(v[i + 1, 0]), float(v[i + 1, 1]), float(v[i + 1, 2])
        num = ax * (by * cz - bz * cy) + ay * (bz * cx - bx * cz) + az * (bx * cy - by * cx)
        d_ab = ax * bx + ay * by + az * bz
        d_bc = bx * cx + by * cy + bz * cz
        d_ca = cx * ax + cy * ay + cz * az
        den = (1.0 + d_ab) + (d_bc + d_ca)
        ti = num / den
        t = (t + ti) / (1.0 - t * ti)
    return t
