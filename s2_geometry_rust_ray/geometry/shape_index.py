"""S2Shape protocol + MutableShapeIndex — the uniform multi-shape layer.

Covers the reference's shape surface (S2Shape trait /root/reference/src/
shape.rs:132-235; point/polyline/polygon shapes point_shape.rs:12-123,
polyline_shape.rs:13-205, polygon_shape.rs:13-313; S2ClippedShape /
S2ShapeIndexCell / iterator shape_index.rs:17-299; MutableS2ShapeIndex
mutable_shape_index.rs:63-304).  The port indexes every shape at a flat
level 15 with NO edge clipping (mutable_shape_index.rs:143-193, a
documented TODO — SURVEY §0/§2.7); this implementation follows canonical
C++ mutable_s2shape_index.cc semantics instead: adaptive per-shape
coverings (RegionCoverer), per-cell edge postings (conservative bounding-
ball clip), and contains_center seeds for interior point location.

Engine mapping (SURVEY §2.7 table): the index IS the broadcast/shuffle
join state — `to_table()` exports the posting list as an Arrow table
(cell_id, shape_id, edge_id, contains_center) keyed by int64 cell sort
keys, exactly the shuffle-PIP exchange schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import cellid
from ..functions import predicates as pred
from .cell import Cell
from .loop import Loop, Polygon


class PointShape:
    """Dim-0 shape: a point cloud (point_shape.rs:12-123 scope — the three
    reference variants Point/MultiPoint/PointCloud collapse to one array
    form here).  Edges are degenerate (p, p) per canonical S2."""

    dimension = 0

    def __init__(self, pts: np.ndarray):
        self.pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))

    def num_edges(self) -> int:
        return len(self.pts)

    def edge(self, i: int):
        return self.pts[i], self.pts[i]

    def edges(self):
        return self.pts, self.pts

    def chains(self):
        return [(i, 1) for i in range(len(self.pts))]


class PolylineShape:
    """Dim-1 shape: open vertex chain (polyline_shape.rs:13-205 scope)."""

    dimension = 1

    def __init__(self, verts: np.ndarray):
        self.v = np.atleast_2d(np.asarray(verts, dtype=np.float64))

    def num_edges(self) -> int:
        return max(0, len(self.v) - 1)

    def edge(self, i: int):
        return self.v[i], self.v[i + 1]

    def edges(self):
        return self.v[:-1], self.v[1:]

    def chains(self):
        return [(0, self.num_edges())]


class PolygonShape:
    """Dim-2 shape: shell+holes with even-odd interior
    (polygon_shape.rs:13-313 scope)."""

    dimension = 2

    def __init__(self, poly: Polygon | Loop):
        self.poly = poly if isinstance(poly, Polygon) else Polygon([poly])
        self._a = np.concatenate([lp.v for lp in self.poly.loops])
        self._b = np.concatenate([lp.vnext for lp in self.poly.loops])

    def num_edges(self) -> int:
        return len(self._a)

    def edge(self, i: int):
        return self._a[i], self._b[i]

    def edges(self):
        return self._a, self._b

    def chains(self):
        out, start = [], 0
        for lp in self.poly.loops:
            out.append((start, len(lp.v)))
            start += len(lp.v)
        return out

    def contains(self, pts: np.ndarray) -> np.ndarray:
        return self.poly.contains_points(np.atleast_2d(pts))


def _cell_ball(cid: int):
    """Bounding ball of a cell: (center_xyz, chord radius to the farthest
    corner).  Conservative edge-clip primitive."""
    cell = Cell(int(cid))
    c = cell.center()
    r = float(np.sqrt(((cell.vertices() - c) ** 2).sum(axis=1).max()))
    return c, r


from .boolean import _edge_balls  # shared conservative-prune primitive


class MutableShapeIndex:
    """add(shape) -> shape_id; build() -> per-cell postings.

    Canonical construction: RegionCoverer covering per shape (adaptive
    levels, not the port's flat 15), then for each covering cell a
    CONSERVATIVE edge posting (edge bounding ball overlaps cell bounding
    ball — a superset of the exact clip, which point-location parity
    tolerates: non-intersecting posted edges contribute zero crossings)
    and, for dim-2 shapes, whether the cell center is interior
    (contains_center, the parity seed)."""

    def __init__(self, max_cells_per_shape: int = 16, max_level: int = 14):
        self.shapes: list = []
        self.max_cells = max_cells_per_shape
        self.max_level = max_level
        self._built = None

    def add_shape(self, shape) -> int:
        self.shapes.append(shape)
        self._built = None
        return len(self.shapes) - 1

    def _shape_covering(self, shape) -> np.ndarray:
        from .coverer import PolygonRegion, PolylineRegion, RegionCoverer

        rc = RegionCoverer(max_cells=self.max_cells, max_level=self.max_level)
        if shape.dimension == 2:
            return rc.get_covering(PolygonRegion(shape.poly))
        if shape.dimension == 1:

            class _Line:
                v = shape.v

            return rc.get_covering(PolylineRegion(_Line()))
        # dim 0: leaf parents at max_level per point, deduped
        x, y, z = shape.pts[:, 0], shape.pts[:, 1], shape.pts[:, 2]
        leaf = cellid.from_xyz(x, y, z)
        return np.unique(cellid.parent(leaf, self.max_level))

    def build(self):
        """-> list of (cell_id, shape_id, edge_ids ndarray, contains_center)
        sorted by (cell_id, shape_id) — the S2ShapeIndexCell stream."""
        if self._built is not None:
            return self._built
        rows = []
        for sid, shape in enumerate(self.shapes):
            cover = self._shape_covering(shape)
            a, b = shape.edges()
            if len(a):
                em, er = _edge_balls(a, b)
            for cid in cover.tolist():
                cc, cr = _cell_ball(cid)
                if len(a):
                    d2 = ((em - cc[None, :]) ** 2).sum(axis=1)
                    eids = np.nonzero(d2 <= (er + cr + 1e-12) ** 2)[0]
                else:
                    eids = np.array([], dtype=np.int64)
                contains_center = bool(
                    shape.dimension == 2 and shape.contains(cc[None, :])[0]
                )
                rows.append((int(cid), sid, eids.astype(np.int64), contains_center))
        rows.sort(key=lambda r: (cellid.to_sort_key(
            np.array([r[0]], dtype=np.uint64))[0], r[1]))
        self._built = rows
        # point-location structure: cell_id -> grouped postings, plus the
        # set of levels present — contains_point then does one ancestor
        # lookup per level instead of scanning the whole index
        by_cell: dict[int, list] = {}
        for cid, sid, eids, cc in rows:
            by_cell.setdefault(int(cid), []).append((sid, eids, cc))
        self._by_cell = by_cell
        if rows:
            cids = np.array([r[0] for r in rows], dtype=np.uint64)
            self._levels = sorted(set(cellid.level(cids).tolist()))
        else:
            self._levels = []
        # batch point-location structure: per level, the distinct index
        # cells at that level sorted by int64 sort key (searchsorted
        # membership — O(log cells) per point per level, fully vectorized)
        self._level_keys = {}
        self._level_cells = {}
        if rows:
            lvls = cellid.level(np.unique(cids))
            ucells = np.unique(cids)
            for lvl in self._levels:
                cells = ucells[lvls == lvl]
                keys = cellid.to_sort_key(cells)
                order = np.argsort(keys)
                self._level_keys[int(lvl)] = keys[order]
                self._level_cells[int(lvl)] = cells[order]
        return rows

    def iterator(self):
        """Cell-ordered traversal (shape_index.rs:216-299): yields
        (cell_id, [(shape_id, edge_ids, contains_center), ...]) grouped per
        cell, ascending cell order."""
        rows = self.build()
        i = 0
        while i < len(rows):
            j = i
            cid = rows[i][0]
            group = []
            while j < len(rows) and rows[j][0] == cid:
                group.append(rows[j][1:])
                j += 1
            yield cid, group
            i = j

    def to_table(self) -> pa.Table:
        """Posting list as an Arrow table (cell_key int64 sort key,
        shape_id, edge_id, contains_center) — one row per (cell, shape,
        edge); shapes with no edges in a cell emit edge_id = -1.  This is
        the shuffle-join index schema (SURVEY §2.7)."""
        cell_k, sids, eids, centers = [], [], [], []
        for cid, sid, edge_ids, cc in self.build():
            k = int(cellid.to_sort_key(np.array([cid], dtype=np.uint64))[0])
            n = max(1, len(edge_ids))
            cell_k.extend([k] * n)
            sids.extend([sid] * n)
            eids.extend(edge_ids.tolist() if len(edge_ids) else [-1])
            centers.extend([cc] * n)
        return pa.table(
            {
                "cell_key": pa.array(cell_k, pa.int64()),
                "shape_id": pa.array(sids, pa.int64()),
                "edge_id": pa.array(eids, pa.int64()),
                "contains_center": pa.array(centers, pa.bool_()),
            }
        )

    def _locate_cell(self, p: np.ndarray):
        """Index cells containing point p: one ancestor hash lookup per
        level present in the index (O(levels), not O(index cells))."""
        self.build()
        leaf = cellid.from_xyz(
            np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
        )
        hits = []
        for lvl in self._levels:
            anc = int(cellid.parent(leaf, int(lvl))[0])
            group = self._by_cell.get(anc)
            if group is not None:
                hits.append((anc, group))
        return hits

    def contains_points(self, pts: np.ndarray):
        """Batch point location: (m,3) unit points -> (pt_idx, shape_id)
        int64 arrays of containment pairs, sorted by (pt_idx, shape_id).

        Vectorized form of `contains_point` (same robust semantics, same
        outputs): leaf cell ids for the whole batch, one searchsorted
        ancestor probe per index level, then per located (cell, shape)
        group a triaged crossing-parity kernel of segments
        (cell_center -> p_i) against the cell's posted edges — the same
        explicit mul/add determinant form as Loop.contains_points, with
        the scalar exact predicates as the fallback for (point, edge)
        pairs whose float triage is inconclusive."""
        self.build()
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        m = len(pts)
        nsh = len(self.shapes)
        if m == 0 or not self._levels:
            z = np.array([], dtype=np.int64)
            return z, z.copy()
        leaf = cellid.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
        evaluated = np.zeros((m, nsh), dtype=bool)
        out_pt: list[np.ndarray] = []
        out_sid: list[np.ndarray] = []
        for lvl in self._levels:  # ascending: first located cell wins
            keys = self._level_keys[int(lvl)]
            anc_k = cellid.to_sort_key(cellid.parent(leaf, int(lvl)))
            pos = np.searchsorted(keys, anc_k)
            pos_c = np.minimum(pos, len(keys) - 1)
            hit = keys[pos_c] == anc_k
            if not hit.any():
                continue
            hit_idx = np.nonzero(hit)[0]
            hit_pos = pos_c[hit_idx]
            order = np.argsort(hit_pos, kind="stable")
            hit_idx, hit_pos = hit_idx[order], hit_pos[order]
            starts = np.nonzero(
                np.r_[True, hit_pos[1:] != hit_pos[:-1]]
            )[0]
            bounds = np.r_[starts, len(hit_pos)]
            cells = self._level_cells[int(lvl)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                cid = int(cells[hit_pos[s]])
                pidx = hit_idx[s:e]
                center = Cell(cid).center()
                for sid, edge_ids, contains_center in self._by_cell[cid]:
                    if self.shapes[sid].dimension != 2:
                        continue
                    sel = pidx[~evaluated[pidx, sid]]
                    if not len(sel):
                        continue
                    evaluated[sel, sid] = True
                    inside = self._parity_batch(
                        center, pts[sel], self.shapes[sid],
                        edge_ids, contains_center,
                    )
                    if inside.any():
                        out_pt.append(sel[inside])
                        out_sid.append(np.full(int(inside.sum()), sid,
                                               dtype=np.int64))
        if not out_pt:
            z = np.array([], dtype=np.int64)
            return z, z.copy()
        pt = np.concatenate(out_pt).astype(np.int64)
        sd = np.concatenate(out_sid)
        order = np.lexsort((sd, pt))
        return pt[order], sd[order]

    def _parity_batch(self, center, P, shape, edge_ids, contains_center):
        """Crossing parity of segments (center -> P_i) against the posted
        edges `edge_ids` of `shape`: bool (m,).  Triage-certain crossings
        are summed vectorized; inconclusive (point, edge) pairs re-run
        through the scalar robust predicate (exact Fraction + SoS tiers),
        exactly as Loop.contains_points does."""
        k = len(edge_ids)
        parity = np.zeros(len(P), dtype=np.int64)
        if k:
            ea, eb = shape.edges()
            a = ea[edge_ids]
            b = eb[edge_ids]
            n_e = np.cross(a, b)  # (k,3) un-normalized edge normals
            # dac[e] = Sign(a_e, b_e, center), robust (never 0)
            dac = pred.triage_sign(
                n_e[:, 0] * center[0] + n_e[:, 1] * center[1]
                + n_e[:, 2] * center[2]
            )
            for e in np.nonzero(dac == 0)[0]:
                dac[e] = pred.sign(a[e], b[e], center)
            cp = np.cross(np.broadcast_to(center, P.shape), P)  # (m,3)
            # explicit left-associated mul/adds (not BLAS matmul) — the
            # TRIAGE_ERROR bound is derived for this evaluation order
            A1 = (
                cp[:, 0, None] * a[None, :, 0]
                + cp[:, 1, None] * a[None, :, 1]
                + cp[:, 2, None] * a[None, :, 2]
            )
            A2 = (
                cp[:, 0, None] * b[None, :, 0]
                + cp[:, 1, None] * b[None, :, 1]
                + cp[:, 2, None] * b[None, :, 2]
            )
            B = (
                P[:, 0, None] * n_e[None, :, 0]
                + P[:, 1, None] * n_e[None, :, 1]
                + P[:, 2, None] * n_e[None, :, 2]
            )
            sA1, sA2, sB = (pred.triage_sign(A1), pred.triage_sign(A2),
                            pred.triage_sign(B))
            acb, bda, cbd = -sA1, sA2, -sB
            crossing = (
                (acb == bda) & (acb == cbd) & (acb == dac[None, :])
                & (acb != 0)
            )
            uncertain = (sA1 == 0) | (sA2 == 0) | (sB == 0)
            parity = (crossing & ~uncertain).sum(axis=1) & 1
            if uncertain.any():
                rows, cols = np.nonzero(uncertain)
                for i, e in zip(rows.tolist(), cols.tolist()):
                    if np.array_equal(P[i], center):
                        continue  # degenerate query segment: contributes 0
                    if pred.edge_or_vertex_crossing(
                        center, P[i], a[e], b[e]
                    ):
                        parity[i] ^= 1
        return (parity == 1) != contains_center

    def contains_point(self, p: np.ndarray) -> set[int]:
        """Shape ids of dim-2 shapes containing p — canonical index point
        location: start at the containing index cell's center with the
        contains_center seed, toggle parity per posted edge crossing the
        segment center->p (edge_or_vertex_crossing, robust tiers)."""
        p = np.asarray(p, dtype=np.float64)
        out: set[int] = set()
        seen: set[int] = set()
        for cid, group in self._locate_cell(p):
            center = Cell(int(cid)).center()
            for sid, edge_ids, contains_center in group:
                if self.shapes[sid].dimension != 2 or sid in seen:
                    continue
                seen.add(sid)
                inside = contains_center
                shape = self.shapes[sid]
                for e in edge_ids.tolist():
                    a, b = shape.edge(int(e))
                    if pred.edge_or_vertex_crossing(center, p, a, b):
                        inside = not inside
                if inside:
                    out.add(sid)
        return out
