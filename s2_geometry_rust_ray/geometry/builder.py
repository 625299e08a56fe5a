"""S2Builder-style geometry construction: snap-round an edge soup into
loops/polygons.

Per the reference's builder (/root/reference/src/builder/mod.rs:140-297:
add_edge/add_loop -> snap each vertex -> dedupe into a Graph -> Layer
assembles output; snap policies at src/builder/snap_functions.rs; graph
cleanup options at src/builder/graph.rs:47-573 — remove degenerate edges,
duplicate edges, sibling pairs).  This is the geometry-INGEST normalization
stage: per-geometry and in-memory, run inside a small map_batches over the
polygon-layer table, never over the point table.
"""

from __future__ import annotations

import numpy as np

from ..functions import snap as snapfn
from .loop import Loop, Polygon, validate_loop


class Builder:
    """Collect edges, snap vertices, assemble loops.

    snap: None (identity) | ('e7', exponent) | ('cell', level) —
    the reference's IntLatLngSnapFunction / S2CellIdSnapFunction."""

    def __init__(self, snap=None, remove_duplicate_edges=True,
                 remove_sibling_pairs=True):
        self.snap = snap
        self.remove_duplicate_edges = remove_duplicate_edges
        self.remove_sibling_pairs = remove_sibling_pairs
        self._edges: list[tuple[tuple, tuple]] = []

    # -- input ---------------------------------------------------------------

    def _snap_point(self, lat: float, lng: float):
        if self.snap is None:
            return lat, lng
        kind, param = self.snap
        if kind == "e7":
            la, ln = snapfn.snap_e7(np.array([lat]), np.array([lng]), param)
            return float(la[0]), float(ln[0])
        if kind == "cell":
            la, ln, _ = snapfn.snap_to_cell_center(
                np.array([lat]), np.array([lng]), param
            )
            return float(la[0]), float(ln[0])
        raise ValueError(self.snap)

    def add_edge_latlng(self, a, b):
        """a, b: (lat_deg, lng_deg) tuples."""
        sa = self._snap_point(*a)
        sb = self._snap_point(*b)
        if sa == sb:
            return  # degenerate after snapping (graph option DISCARD)
        self._edges.append((sa, sb))

    def add_loop_latlng(self, coords):
        for i in range(len(coords)):
            self.add_edge_latlng(coords[i], coords[(i + 1) % len(coords)])

    # -- build ---------------------------------------------------------------

    def _cleaned_edges(self):
        edges = self._edges
        if self.remove_duplicate_edges:
            seen = set()
            uniq = []
            for e in edges:
                if e not in seen:
                    seen.add(e)
                    uniq.append(e)
            edges = uniq
        if self.remove_sibling_pairs:
            # cancel a->b against b->a (reference GraphOptions::SiblingPairs
            # DISCARD; src/builder/graph.rs)
            from collections import Counter

            count = Counter(edges)
            out = []
            for e in edges:
                r = (e[1], e[0])
                if count[r] > 0 and count[e] > 0:
                    count[e] -= 1
                    count[r] -= 1
                    continue
                if count[e] > 0:
                    count[e] -= 1
                    out.append(e)
            edges = out
        return edges

    def build_loops(self) -> list[np.ndarray]:
        """Chain directed edges into closed loops; returns lat/lng vertex
        arrays (m, 2).  Raises if edges don't form closed chains."""
        edges = self._cleaned_edges()
        if not edges:
            return []
        out_map: dict[tuple, list[tuple]] = {}
        for a, b in edges:
            out_map.setdefault(a, []).append(b)
        used = set()
        loops = []
        for k in range(len(edges)):
            a, b = edges[k]
            if (a, b) in used:
                continue
            used.add((a, b))
            chain = [a]
            cur = b
            guard = 0
            while cur != a and guard <= len(edges):
                chain.append(cur)
                nxts = [n for n in out_map.get(cur, []) if (cur, n) not in used]
                if not nxts:
                    raise ValueError(f"open chain at vertex {cur}")
                nxt = nxts[0]
                used.add((cur, nxt))
                cur = nxt
                guard += 1
            if cur != a:
                raise ValueError("unclosed loop")
            if len(chain) >= 3:
                loops.append(np.array(chain))
        return loops

    def build_polygon(self, validate: bool = True) -> Polygon:
        """Assemble an even-odd Polygon (S2PolygonLayer semantics,
        src/builder/layers.rs:149-357)."""
        loops = []
        for chain in self.build_loops():
            lp = Loop.from_latlng_deg(chain[:, 0], chain[:, 1])
            if validate:
                err = validate_loop(lp.v)
                if err:
                    raise ValueError(f"invalid loop: {err}")
            loops.append(lp)
        if not loops:
            raise ValueError("no loops assembled")
        return Polygon(loops)

    def build_polylines(self) -> list[np.ndarray]:
        """S2PolylineLayer: chain edges into maximal open polylines
        (consumes closed loops too, as cycles)."""
        edges = self._cleaned_edges()
        out_map: dict[tuple, list[tuple]] = {}
        in_deg: dict[tuple, int] = {}
        for a, b in edges:
            out_map.setdefault(a, []).append(b)
            in_deg[b] = in_deg.get(b, 0) + 1
        used = set()
        lines = []
        # start at vertices with out-degree > in-degree (chain heads)
        starts = [a for a in out_map if len(out_map[a]) > in_deg.get(a, 0)]
        for start_list in (starts, list(out_map)):
            for s in start_list:
                while any((s, n) not in used for n in out_map.get(s, [])):
                    chain = [s]
                    cur = s
                    while True:
                        nxts = [n for n in out_map.get(cur, []) if (cur, n) not in used]
                        if not nxts:
                            break
                        used.add((cur, nxts[0]))
                        cur = nxts[0]
                        chain.append(cur)
                    if len(chain) >= 2:
                        lines.append(np.array(chain))
        return lines
