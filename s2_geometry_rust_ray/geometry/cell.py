"""S2Cell — scalar cell geometry for the coverer and cell-region tests.

Canonical semantics per C++ s2cell.cc (the Rust port's compute_uv_bounds is
wrong for non-face cells and its orientation is hard-coded 0 —
src/cell.rs:350-372, SURVEY.md §0): uv bounds derive from the decoded (i,j)
range via ij_to_st/st_to_uv; vertices are the 4 corners in CCW order.
"""

from __future__ import annotations

import math

import numpy as np

from ..functions import cellid, coords
from .interval import PI, R1Interval, S1Interval


class Cell:
    def __init__(self, cid: int):
        self.id = int(cid)
        arr = np.array([self.id], dtype=np.uint64)
        face, i, j, orientation = cellid.to_face_ij_orientation(arr)
        self.face = int(face[0])
        self.level = int(cellid.level(arr)[0])
        self.orientation = int(orientation[0])
        size = 1 << (coords.MAX_LEVEL - self.level)
        i_lo = int(i[0]) & -size
        j_lo = int(j[0]) & -size
        # uv bounds: exact st bounds of the ij range (C++ S2Cell::BoundUV)
        self.u_lo = float(coords.st_to_uv(coords.ij_to_st_min(i_lo)))
        self.u_hi = float(coords.st_to_uv(coords.ij_to_st_min(i_lo + size)))
        self.v_lo = float(coords.st_to_uv(coords.ij_to_st_min(j_lo)))
        self.v_hi = float(coords.st_to_uv(coords.ij_to_st_min(j_lo + size)))

    def vertices(self) -> np.ndarray:
        """4 corners, CCW (lower-left first in (u,v) orientation), unit
        length, shape (4,3)."""
        us = [self.u_lo, self.u_hi, self.u_hi, self.u_lo]
        vs = [self.v_lo, self.v_lo, self.v_hi, self.v_hi]
        x, y, z = coords.face_uv_to_xyz(
            np.full(4, self.face), np.array(us), np.array(vs)
        )
        v = np.stack([x, y, z], axis=-1)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    def center(self) -> np.ndarray:
        x, y, z = cellid.to_xyz(np.array([self.id], dtype=np.uint64))
        v = np.array([float(x[0]), float(y[0]), float(z[0])])
        return v / np.linalg.norm(v)

    def contains_point(self, p) -> bool:
        """Point in cell (closed): project to this face's uv, compare bounds
        (C++ S2Cell::Contains)."""
        p = np.asarray(p, dtype=np.float64)
        uv = coords.face_xyz_to_uv_scalar(self.face, p)
        if uv is None:
            return False
        u, v = uv
        return self.u_lo <= u <= self.u_hi and self.v_lo <= v <= self.v_hi

    def get_rect_bound(self):
        """Conservative lat/lng bound via vertices + edge latitude extrema
        (cells at level>=1 span < 90 deg of longitude except polar faces)."""
        verts = self.vertices()
        x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
        lats = np.arctan2(z, np.sqrt(x * x + y * y))
        lat = R1Interval(float(lats.min()), float(lats.max()))
        # polar faces (2 = +z, 5 = -z) contain a pole when the cell touches
        # the face center (u=v=0)
        has_np = self.face == 2 and self.u_lo <= 0 <= self.u_hi and self.v_lo <= 0 <= self.v_hi
        has_sp = self.face == 5 and self.u_lo <= 0 <= self.u_hi and self.v_lo <= 0 <= self.v_hi
        if has_np:
            return R1Interval(lat.lo, PI / 2), S1Interval.full()
        if has_sp:
            return R1Interval(-PI / 2, lat.hi), S1Interval.full()
        lngs = np.arctan2(y, x)
        lng = S1Interval.empty()
        for k in range(4):
            lng = lng.union(
                S1Interval.from_point_pair(float(lngs[k]), float(lngs[(k + 1) % 4]))
            )
        # edge latitude extrema (same construction as Loop bound)
        nxt = np.roll(verts, -1, axis=0)
        normals = np.cross(verts, nxt)
        for e in range(4):
            n = normals[e]
            nn = float(n @ n)
            if nn == 0.0:
                continue
            for sgn in (1.0, -1.0):
                m = sgn * (np.array([0.0, 0.0, 1.0]) * nn - n * float(n[2]))
                norm = np.linalg.norm(m)
                if norm == 0.0:
                    continue
                m = m / norm
                a, b = verts[e], nxt[e]
                if float(np.dot(np.cross(a, m), n)) >= 0.0 and float(
                    np.dot(np.cross(m, b), n)
                ) >= 0.0:
                    lat = lat.add_point(math.atan2(m[2], math.hypot(m[0], m[1])))
        lat = R1Interval(max(lat.lo - 1e-13, -PI / 2), min(lat.hi + 1e-13, PI / 2))
        return lat, lng.expanded(1e-13)

    def get_cap_bound(self):
        """Bounding cap: center + max chord to vertices (conservative)."""
        from .cap import Cap

        c = self.center()
        verts = self.vertices()
        d = verts - c[None, :]
        r2 = float(((d * d).sum(axis=1)).max())
        return Cap(c, r2 * (1 + 1e-12) + 1e-15)


