"""S2Cap — spherical cap region (center + chord-angle radius).

Per /root/reference/src/cap.rs:58-123 and src/chord_angle.rs:34-81: the
radius is stored as SQUARED CHORD LENGTH in [0,4] (monotone in angle =>
comparisons without trig; 0=point cap, 4=full sphere, negative=empty).

contains() is a pure-arithmetic kernel ((dx*dx+dy*dy)+dz*dz <= r2) and is
bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import math

import numpy as np

from .interval import PI, R1Interval, S1Interval


def chord2_from_radians(rad: float) -> float:
    """angle -> squared chord length: (2*sin(a/2))^2 (src/chord_angle.rs:102-120)."""
    if rad >= PI:
        return 4.0
    if rad < 0:
        return -1.0
    s = math.sin(0.5 * rad)
    return 4.0 * s * s


def radians_from_chord2(c2: float) -> float:
    if c2 < 0:
        return -1.0
    return 2.0 * math.asin(math.sqrt(0.25 * min(c2, 4.0)))


class Cap:
    def __init__(self, center_xyz, radius_chord2: float):
        self.center = np.asarray(center_xyz, dtype=np.float64)
        self.r2 = float(radius_chord2)

    @classmethod
    def from_latlng_deg(cls, lat_deg: float, lng_deg: float, radius_deg: float):
        from .loop import latlng_deg_to_unit_xyz

        c = latlng_deg_to_unit_xyz(np.array([lat_deg]), np.array([lng_deg]))[0]
        return cls(c, chord2_from_radians(math.radians(radius_deg)))

    def is_empty(self):
        return self.r2 < 0

    def is_full(self):
        return self.r2 >= 4.0

    def chord2_to(self, x, y, z):
        """Squared chord distance from the center — explicit left-assoc float
        ops shared verbatim with the SQL oracle."""
        cx, cy, cz = self.center
        dx = x - cx
        dy = y - cy
        dz = z - cz
        return (dx * dx + dy * dy) + dz * dz

    def contains_xyz(self, x, y, z):
        """Vectorized radius filter (src/cap.rs:227-237)."""
        return self.chord2_to(x, y, z) <= self.r2

    def contains_cap(self, other: "Cap"):
        """Triangle inequality on angles (src/cap.rs:250-260)."""
        if self.is_full() or other.is_empty():
            return True
        a = radians_from_chord2(self.r2)
        b = radians_from_chord2(other.r2)
        d = math.acos(max(-1.0, min(1.0, float(self.center @ other.center))))
        return a >= d + b

    def intersects_cap(self, other: "Cap"):
        if self.is_empty() or other.is_empty():
            return False
        a = radians_from_chord2(self.r2)
        b = radians_from_chord2(other.r2)
        d = math.acos(max(-1.0, min(1.0, float(self.center @ other.center))))
        return a + b >= d

    def expanded(self, extra_radians: float):
        if self.is_empty():
            return Cap(self.center, -1.0)
        return Cap(
            self.center,
            chord2_from_radians(radians_from_chord2(self.r2) + extra_radians),
        )

    def add_point(self, point_xyz) -> "Cap":
        """Smallest enlargement containing `point` (src/cap.rs:285-295):
        empty caps re-center on the point; otherwise the radius grows to
        the chord distance.  Returns a new Cap (caps here are immutable).
        Note the result depends on insertion order, exactly like C++ —
        deterministic aggregates should anchor the center first (see
        pipelines/tiling.cap_bounds)."""
        p = np.asarray(point_xyz, dtype=np.float64)
        if self.is_empty():
            return Cap(p, 0.0)
        return Cap(self.center, max(self.r2, float(self.chord2_to(*p))))

    def add_cap(self, other: "Cap") -> "Cap":
        """src/cap.rs:300-310: empty absorbs, otherwise union."""
        if self.is_empty():
            return Cap(other.center, other.r2)
        if other.is_empty():
            return Cap(self.center, self.r2)
        return self.union(other)

    def union(self, other: "Cap") -> "Cap":
        """Smallest cap containing both (canonical s2cap.cc Union; port
        src/cap.rs:325-345): containment shortcuts, else the midpoint cap
        along the center great circle."""
        if self.r2 < other.r2:
            return other.union(self)
        if self.is_full() or other.is_empty():
            return Cap(self.center, self.r2)
        a = radians_from_chord2(self.r2)
        b = radians_from_chord2(other.r2)
        d = math.acos(max(-1.0, min(1.0, float(self.center @ other.center))))
        if a >= d + b:
            return Cap(self.center, self.r2)
        r = 0.5 * (d + a + b)
        if r >= PI:
            return Cap(self.center, 4.0)
        # walk from self.center toward other.center by (d - a + b)/2
        t = 0.5 * (d - a + b)
        u = other.center - float(self.center @ other.center) * self.center
        un = np.linalg.norm(u)
        if un == 0.0:
            return Cap(self.center, chord2_from_radians(r))
        u = u / un
        center = math.cos(t) * self.center + math.sin(t) * u
        center = center / np.linalg.norm(center)
        return Cap(center, chord2_from_radians(r))

    def get_rect_bound(self):
        """Cap -> lat/lng rect (src/cap.rs:422-495 semantics, conservative)."""
        if self.is_empty():
            return R1Interval.empty(), S1Interval.empty()
        cx, cy, cz = self.center
        clat = math.atan2(cz, math.hypot(cx, cy))
        clng = math.atan2(cy, cx)
        r = radians_from_chord2(self.r2)
        lat_lo = clat - r
        lat_hi = clat + r
        if lat_lo <= -PI / 2 or lat_hi >= PI / 2 or self.is_full():
            # pole inside => full longitude range
            return (
                R1Interval(max(lat_lo, -PI / 2), min(lat_hi, PI / 2)),
                S1Interval.full(),
            )
        # sin(half_width) = sin(r) / cos(lat)
        sin_a = math.sin(r)
        cos_l = math.cos(clat)
        if sin_a >= cos_l:
            lng = S1Interval.full()
        else:
            half = math.asin(sin_a / cos_l)
            lng = S1Interval.from_point(clng).expanded(half + 1e-15)
        return R1Interval(lat_lo, lat_hi), lng
