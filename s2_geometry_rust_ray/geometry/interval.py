"""R1Interval (closed real) and S1Interval (circular longitude) — scalar
interval algebra per /root/reference/src/interval.rs (621-865 for R1, 62-560
for S1; both are ports of Google C++ r1interval.h / s1interval.h).

Used inside rect/bound kernels only (scalars, not columns)."""

from __future__ import annotations

import math
from dataclasses import dataclass

PI = math.pi


@dataclass
class R1Interval:
    lo: float = 1.0
    hi: float = 0.0  # lo > hi => empty

    @classmethod
    def empty(cls):
        return cls(1.0, 0.0)

    @classmethod
    def from_point_pair(cls, a, b):
        return cls(min(a, b), max(a, b))

    def is_empty(self):
        return self.lo > self.hi

    def contains(self, p):
        return self.lo <= p <= self.hi

    def contains_interval(self, o: "R1Interval"):
        if o.is_empty():
            return True
        return self.lo <= o.lo and o.hi <= self.hi

    def intersects(self, o: "R1Interval"):
        if self.lo <= o.lo:
            return o.lo <= self.hi and o.lo <= o.hi
        return self.lo <= o.hi and self.lo <= self.hi

    def interior_intersects(self, o: "R1Interval"):
        return max(self.lo, o.lo) < min(self.hi, o.hi)

    def union(self, o: "R1Interval"):
        if self.is_empty():
            return R1Interval(o.lo, o.hi)
        if o.is_empty():
            return R1Interval(self.lo, self.hi)
        return R1Interval(min(self.lo, o.lo), max(self.hi, o.hi))

    def intersection(self, o: "R1Interval"):
        return R1Interval(max(self.lo, o.lo), min(self.hi, o.hi))

    def add_point(self, p):
        if self.is_empty():
            return R1Interval(p, p)
        return R1Interval(min(self.lo, p), max(self.hi, p))

    def expanded(self, margin):
        if self.is_empty():
            return R1Interval(self.lo, self.hi)
        return R1Interval(self.lo - margin, self.hi + margin)

    def get_length(self):
        return self.hi - self.lo

    def project(self, p):
        """Closest interval point to p (r1interval.rs Project)."""
        return max(self.lo, min(self.hi, p))

    def directed_hausdorff(self, o: "R1Interval") -> float:
        """max over points of self of distance to o (r1interval.h
        GetDirectedHausdorffDistance)."""
        if self.is_empty():
            return 0.0
        if o.is_empty():
            return float("inf")
        return max(0.0, max(self.hi - o.hi, o.lo - self.lo))


def _pos_angle(p):
    """Normalize to (-pi, pi], mapping -pi -> pi (S1 canonical form)."""
    r = math.remainder(p, 2 * PI)
    if r <= -PI:
        r = PI
    return r


@dataclass
class S1Interval:
    """Circular interval [lo, hi] on (-pi, pi]; inverted (lo > hi) wraps
    through pi.  Empty = [pi, -pi]; Full = [-pi, pi]."""

    lo: float = PI
    hi: float = -PI

    @classmethod
    def empty(cls):
        return cls(PI, -PI)

    @classmethod
    def full(cls):
        return cls(-PI, PI)

    @classmethod
    def from_point(cls, p):
        p = _pos_angle(p)
        return cls(p, p)

    @classmethod
    def from_point_pair(cls, p1, p2):
        """Minimal interval containing both points (span <= pi)."""
        p1, p2 = _pos_angle(p1), _pos_angle(p2)
        if _positive_distance(p1, p2) <= PI:
            return cls(p1, p2)
        return cls(p2, p1)

    def is_empty(self):
        return self.lo == PI and self.hi == -PI

    def is_full(self):
        return self.lo == -PI and self.hi == PI

    def is_inverted(self):
        return self.lo > self.hi

    def contains(self, p):
        p = _pos_angle(p)
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def project(self, p):
        """Closest interval angle to p (s1interval.rs Project): p itself if
        contained, else the circularly-nearer endpoint."""
        if self.contains(p):
            return p
        p = _pos_angle(p)
        return self.lo if _circular_gap(p, self.lo) <= _circular_gap(p, self.hi) else self.hi

    def get_center(self) -> float:
        """Midpoint angle (s1interval.h GetCenter; inverted intervals wrap)."""
        center = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return center
        return center + PI if center <= 0 else center - PI

    def complement_center(self) -> float:
        """Center of the complement interval (s1interval.h
        GetComplementCenter)."""
        if self.lo != self.hi:
            return S1Interval(self.hi, self.lo).get_center()
        return self.hi + PI if self.hi <= 0 else self.hi - PI

    def directed_hausdorff(self, o: "S1Interval") -> float:
        """max over points of self of circular distance to o
        (s1interval.cc GetDirectedHausdorffDistance)."""
        if o.contains_interval(self):
            return 0.0
        if o.is_empty():
            return PI
        yc = o.complement_center()
        if self.contains(yc):
            return _positive_distance(o.hi, yc)
        hi_hi = (
            _positive_distance(o.hi, self.hi)
            if S1Interval(o.hi, yc).contains(self.hi)
            else 0.0
        )
        lo_lo = (
            _positive_distance(self.lo, o.lo)
            if S1Interval(yc, o.lo).contains(self.lo)
            else 0.0
        )
        return max(hi_hi, lo_lo)

    def fast_contains(self, p):
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains_interval(self, o: "S1Interval"):
        if self.is_inverted():
            if o.is_inverted():
                return o.lo >= self.lo and o.hi <= self.hi
            return (o.lo >= self.lo or o.hi <= self.hi) and not self.is_empty()
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return o.lo >= self.lo and o.hi <= self.hi

    def intersects(self, o: "S1Interval"):
        if self.is_empty() or o.is_empty():
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo <= self.hi or o.hi >= self.lo
        if o.is_inverted():
            return o.lo <= self.hi or o.hi >= self.lo
        return o.lo <= self.hi and o.hi >= self.lo

    def union(self, o: "S1Interval"):
        if o.is_empty():
            return S1Interval(self.lo, self.hi)
        if self.is_empty():
            return S1Interval(o.lo, o.hi)
        if self.fast_contains(o.lo):
            if self.fast_contains(o.hi):
                if self.contains_interval(o):
                    return S1Interval(self.lo, self.hi)
                return S1Interval.full()
            return S1Interval(self.lo, o.hi)
        if self.fast_contains(o.hi):
            return S1Interval(o.lo, self.hi)
        if self.is_empty() or o.fast_contains(self.lo):
            return S1Interval(o.lo, o.hi)
        # disjoint: pick the direction of smaller merge
        if _positive_distance(o.hi, self.lo) < _positive_distance(self.hi, o.lo):
            return S1Interval(o.lo, self.hi)
        return S1Interval(self.lo, o.hi)

    def add_point(self, p):
        return self.union(S1Interval.from_point(p))

    def expanded(self, margin):
        if margin >= 0:
            if self.is_empty():
                return S1Interval(self.lo, self.hi)
            if self.get_length() + 2 * margin + 2e-15 >= 2 * PI:
                return S1Interval.full()
        lo = _pos_angle(self.lo - margin)
        hi = _pos_angle(self.hi + margin)
        if lo <= -PI:
            lo = PI
        return S1Interval(lo, hi)

    def get_length(self):
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * PI
        return length if length > 0 else -1.0


def _circular_gap(a, b):
    """Circular distance from angle a to angle b in [0, 2*pi)."""
    d = abs(a - b)
    return min(d, 2 * PI - d)


def _positive_distance(a, b):
    d = b - a
    if d >= 0:
        return d
    return (b + PI) - (a - PI)
