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
        face, i, j, orientation = cellid.decode_scalar(self.id)
        self.face = face
        lsb = self.id & -self.id
        self.level = coords.MAX_LEVEL - (lsb.bit_length() - 1) // 2
        self.orientation = orientation
        size = 1 << (coords.MAX_LEVEL - self.level)
        i_lo = i & -size
        j_lo = j & -size
        # uv bounds: exact st bounds of the ij range (C++ S2Cell::BoundUV)
        self.u_lo = float(coords.st_to_uv(coords.ij_to_st_min(i_lo)))
        self.u_hi = float(coords.st_to_uv(coords.ij_to_st_min(i_lo + size)))
        self.v_lo = float(coords.st_to_uv(coords.ij_to_st_min(j_lo)))
        self.v_hi = float(coords.st_to_uv(coords.ij_to_st_min(j_lo + size)))

    def vertices(self) -> np.ndarray:
        """4 corners, CCW (lower-left first in (u,v) orientation), unit
        length, shape (4,3).  Cached; built from the face frame identity
        xyz = N_f + u*U_f + v*V_f (bit-identical to face_uv_to_xyz since
        every component has exactly one nonzero contribution)."""
        if getattr(self, "_verts", None) is None:
            ax = coords.FACE_UVW_AXES[self.face]  # [u_axis, v_axis, norm]
            us = np.array([self.u_lo, self.u_hi, self.u_hi, self.u_lo])
            vs = np.array([self.v_lo, self.v_lo, self.v_hi, self.v_hi])
            v = ax[2][None, :] + us[:, None] * ax[0][None, :] + vs[:, None] * ax[1][None, :]
            self._verts = v / np.sqrt((v * v).sum(axis=1))[:, None]
        return self._verts

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
        (cells at level>=1 span < 90 deg of longitude except polar faces).

        Pure scalar math: at n=4 points, Python-float arithmetic is ~10x
        faster than numpy-array calls, and this runs per candidate in the
        coverer's inner loop."""
        if getattr(self, "_bound", None) is not None:
            return self._bound
        verts = self.vertices()
        vt = [(float(p[0]), float(p[1]), float(p[2])) for p in verts]
        lats = [math.atan2(p[2], math.hypot(p[0], p[1])) for p in vt]
        lat = R1Interval(min(lats), max(lats))
        # polar faces (2 = +z, 5 = -z) contain a pole when the cell touches
        # the face center (u=v=0)
        touches_center = self.u_lo <= 0 <= self.u_hi and self.v_lo <= 0 <= self.v_hi
        if self.face == 2 and touches_center:
            self._bound = (R1Interval(lat.lo, PI / 2), S1Interval.full())
            return self._bound
        if self.face == 5 and touches_center:
            self._bound = (R1Interval(-PI / 2, lat.hi), S1Interval.full())
            return self._bound
        lngs = [math.atan2(p[1], p[0]) for p in vt]
        lng = S1Interval.empty()
        for k in range(4):
            lng = lng.union(S1Interval.from_point_pair(lngs[k], lngs[(k + 1) % 4]))
        for e in range(4):
            ax, ay, az = vt[e]
            bx, by, bz = vt[(e + 1) % 4]
            nx = ay * bz - az * by
            ny = az * bx - ax * bz
            nz = ax * by - ay * bx
            nn = nx * nx + ny * ny + nz * nz
            if nn == 0.0:
                continue
            for sgn in (1.0, -1.0):
                # z-extremum direction of the edge's great circle
                mx = sgn * (-nx * nz)
                my = sgn * (-ny * nz)
                mz = sgn * (nn - nz * nz)
                norm = math.sqrt(mx * mx + my * my + mz * mz)
                if norm == 0.0:
                    continue
                mx, my, mz = mx / norm, my / norm, mz / norm
                # on the (minor) arc iff cross(a,m).n >= 0 and cross(m,b).n >= 0
                c1 = ((ay * mz - az * my) * nx + (az * mx - ax * mz) * ny
                      + (ax * my - ay * mx) * nz)
                c2 = ((my * bz - mz * by) * nx + (mz * bx - mx * bz) * ny
                      + (mx * by - my * bx) * nz)
                if c1 >= 0.0 and c2 >= 0.0:
                    lat = lat.add_point(math.atan2(mz, math.hypot(mx, my)))
        lat = R1Interval(max(lat.lo - 1e-13, -PI / 2), min(lat.hi + 1e-13, PI / 2))
        self._bound = (lat, lng.expanded(1e-13))
        return self._bound

    def get_cap_bound(self):
        """Bounding cap: center + max chord to vertices (conservative)."""
        from .cap import Cap

        c = self.center()
        verts = self.vertices()
        d = verts - c[None, :]
        r2 = float(((d * d).sum(axis=1)).max())
        return Cap(c, r2 * (1 + 1e-12) + 1e-15)


