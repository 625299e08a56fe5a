"""S2LatLngRect — lat interval x circular lng interval.

Per /root/reference/src/latlng_rect.rs:52-560 (38-method surface; the subset
the engine needs: contains/intersects/union/expanded + the vectorized
degree-space point filter used as the PIP pre-filter and as a region join).
"""

from __future__ import annotations

import numpy as np

from .interval import PI, R1Interval, S1Interval


class LatLngRect:
    """Bounds held in RADIANS internally; degree-space constructors/filters
    use pure comparisons so the SQL oracle reproduces them exactly."""

    def __init__(self, lat: R1Interval, lng: S1Interval):
        self.lat = lat
        self.lng = lng

    @classmethod
    def from_degrees(cls, lat_lo, lng_lo, lat_hi, lng_hi):
        """Degree corners; lng interval may be inverted (crosses antimeridian)."""
        rect = cls(
            R1Interval(np.deg2rad(lat_lo), np.deg2rad(lat_hi)),
            S1Interval(np.deg2rad(lng_lo), np.deg2rad(lng_hi)),
        )
        rect.deg = (float(lat_lo), float(lng_lo), float(lat_hi), float(lng_hi))
        return rect

    def is_empty(self):
        return self.lat.is_empty()

    def contains_latlng_deg(self, lat_deg, lng_deg):
        """Vectorized degree-space contains — bit-exact twin of the SQL
        (lat BETWEEN lo AND hi AND (lng wrap logic))."""
        lat_lo, lng_lo, lat_hi, lng_hi = self.deg
        lat_ok = (lat_deg >= lat_lo) & (lat_deg <= lat_hi)
        if lng_lo <= lng_hi:
            lng_ok = (lng_deg >= lng_lo) & (lng_deg <= lng_hi)
        else:  # crosses the antimeridian
            lng_ok = (lng_deg >= lng_lo) | (lng_deg <= lng_hi)
        return lat_ok & lng_ok

    def sql_predicate(self, lat_expr: str, lng_expr: str) -> str:
        lat_lo, lng_lo, lat_hi, lng_hi = self.deg
        from ..oracle.sql import flit

        lat_sql = f"({lat_expr} >= {flit(lat_lo)} AND {lat_expr} <= {flit(lat_hi)})"
        if lng_lo <= lng_hi:
            lng_sql = f"({lng_expr} >= {flit(lng_lo)} AND {lng_expr} <= {flit(lng_hi)})"
        else:
            lng_sql = f"({lng_expr} >= {flit(lng_lo)} OR {lng_expr} <= {flit(lng_hi)})"
        return f"({lat_sql} AND {lng_sql})"

    def union(self, other: "LatLngRect"):
        return LatLngRect(self.lat.union(other.lat), self.lng.union(other.lng))

    def distance_to_latlng_rad(self, lat_rad: float, lng_rad: float) -> float:
        """EXACT min distance (radians) from a point to the rect boundary
        region (canonical s2latlngrect.cc GetDistance(S2LatLng) structure,
        NOT the port's lat/lng-space projection at
        src/latlng_rect.rs:486-500 which overestimates near meridian
        edges): 0 inside; if the point's longitude is within the lng span
        the nearest boundary point lies straight along the meridian
        (distance = delta lat); otherwise the nearest point is on one of
        the two MERIDIAN edges — a great-circle arc, measured with the
        exact point-to-arc distance (the geodesic foot generally sits at a
        different latitude than the query point)."""
        import math

        if self.is_empty():
            return math.pi
        if self.lat.contains(lat_rad) and self.lng.contains(lng_rad):
            return 0.0
        best = math.inf
        if self.lng.contains(lng_rad):
            if lat_rad > self.lat.hi:
                best = lat_rad - self.lat.hi
            elif lat_rad < self.lat.lo:
                best = self.lat.lo - lat_rad
        if not self.lng.is_full():
            import numpy as np

            from .cap import radians_from_chord2
            from .coverer import _point_to_arc_chord2

            def xyz(la, ln):
                return np.array(
                    [math.cos(la) * math.cos(ln),
                     math.cos(la) * math.sin(ln),
                     math.sin(la)]
                )

            p = xyz(lat_rad, lng_rad)
            for lng_e in (self.lng.lo, self.lng.hi):
                a = xyz(self.lat.lo, lng_e)
                b = xyz(self.lat.hi, lng_e)
                d2 = _point_to_arc_chord2(p, a, b, np.cross(a, b))
                best = min(best, radians_from_chord2(d2))
        return best

    def distance_to_rect_rad(self, other: "LatLngRect") -> float:
        """Min distance between two rects: 0 when intersecting, else min
        over corner-to-rect projections (src/latlng_rect.rs:462-485)."""
        if self.intersects(other):
            return 0.0
        best = float("inf")
        for rect_a, rect_b in ((self, other), (other, self)):
            la = (rect_a.lat.lo, rect_a.lat.lo, rect_a.lat.hi, rect_a.lat.hi)
            ln = (rect_a.lng.lo, rect_a.lng.hi, rect_a.lng.lo, rect_a.lng.hi)
            for lat, lng in zip(la, ln):
                best = min(best, rect_b.distance_to_latlng_rad(lat, lng))
        return best

    def intersects(self, other: "LatLngRect"):
        return self.lat.intersects(other.lat) and self.lng.intersects(other.lng)

    def contains_rect(self, other: "LatLngRect"):
        return self.lat.contains_interval(other.lat) and self.lng.contains_interval(
            other.lng
        )

    def expanded(self, lat_margin, lng_margin):
        lat = self.lat.expanded(lat_margin)
        return LatLngRect(
            R1Interval(max(lat.lo, -PI / 2), min(lat.hi, PI / 2)),
            self.lng.expanded(lng_margin),
        )
