"""Exact polygon boolean operations by spherical edge clipping.

Union / intersection / difference / symmetric difference of S2 polygons,
matching the semantics specified by the reference's (stubbed) tests at
/root/reference/tests/test_s2boolean_operation_port.rs:24-299 and canonical
C++ s2boolean_operation.cc.  Unlike geometry/raster.py (level-quantized
approximation, fine for tile products), this is true geometry clipping:

  1. find all edge crossings between A and B (robust crossing_sign, exact
     tiers included) and the great-circle intersection points;
  2. split every edge at its crossing points (ordered along the arc);
  3. classify each sub-edge by its midpoint against the OTHER polygon
     (crossing-parity contains with exact fallback);
  4. select: union = A-edges outside B + B-edges outside A;
     intersection = A-edges inside B + B-edges inside A;
     difference A-B = A-edges outside B + REVERSED B-edges inside A;
     symmetric difference = (A-B) edges + (B-A) edges;
  5. assemble loops with the S2Builder Hierholzer assembly
     (geometry/builder.py) and return an even-odd Polygon.

The edge-selection rule subsumes all no-crossing cases (containment,
disjointness, holes) with no special-casing.  Degenerate inputs with
collinear overlapping boundary segments are NOT handled (canonical S2
resolves those by snap rounding first — run inputs through Builder with an
E7 snap if needed); this matches the scope of the reference tests.
"""

from __future__ import annotations

import math

import numpy as np

from ..functions import predicates as pred
from .builder import Builder
from .loop import Loop, Polygon


def edge_intersection(a, b, c, d) -> np.ndarray:
    """Intersection point of great-circle arcs (a,b) and (c,d) that is
    known to exist (crossing_sign > 0) — cross of the edge normals,
    oriented onto the arcs (C++ S2::GetIntersection, simple method)."""
    n1 = np.cross(a, b)
    n2 = np.cross(c, d)
    p = np.cross(n1, n2)
    norm = np.linalg.norm(p)
    if norm == 0.0:
        raise ValueError("collinear edges (degenerate overlay input)")
    p = p / norm
    if float(np.dot(p, a + b + c + d)) < 0.0:
        p = -p
    return p


def _polygon_edges(poly: Polygon):
    a = np.concatenate([lp.v for lp in poly.loops])
    b = np.concatenate([lp.vnext for lp in poly.loops])
    return a, b


def _split_classified(poly: Polygon, other: Polygon, crossings: dict):
    """Split poly's edges at their crossing points; return two lists of
    directed sub-edges (as xyz pairs): [inside other], [outside other]."""
    a, b = _polygon_edges(poly)
    inside_edges, outside_edges = [], []
    subs = []
    for e in range(len(a)):
        pts = crossings.get(e, [])
        if pts:
            # order crossing points along the arc by chord distance from a
            d2 = [float(((p - a[e]) ** 2).sum()) for p in pts]
            chain = [a[e]] + [p for _, p in sorted(zip(d2, pts), key=lambda t: t[0])] + [b[e]]
        else:
            chain = [a[e], b[e]]
        for i in range(len(chain) - 1):
            u, v = chain[i], chain[i + 1]
            if np.array_equal(u, v):
                continue
            subs.append((u, v))
    if not subs:
        return [], []
    mids = np.array([(u + v) for u, v in subs])
    mids = mids / np.linalg.norm(mids, axis=1, keepdims=True)
    ins = other.contains_points(mids)
    for (u, v), flag in zip(subs, ins):
        (inside_edges if flag else outside_edges).append((u, v))
    return inside_edges, outside_edges


def _edge_balls(a: np.ndarray, b: np.ndarray):
    """Bounding ball per arc: center = normalized midpoint, radius = chord
    distance to an endpoint.  For arcs < pi every arc point lies within the
    ball (chord distance from the arc midpoint peaks at the endpoints), so
    two arcs can only cross if their balls overlap — an exact-conservative
    prune.  Near-antipodal endpoints (midpoint ~ 0) get radius 2 (no prune)."""
    m = a + b
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    ok = norm[:, 0] > 1e-9
    m = np.where(ok[:, None], m / np.where(norm == 0.0, 1.0, norm), 0.0)
    r = np.where(ok, np.linalg.norm(a - m, axis=1), 2.0)
    return m, r


def _candidate_pairs(a1, a2, b1, b2):
    """(i, j) index arrays of edge pairs whose bounding balls overlap —
    the vectorized prune in front of the robust crossing predicate (cuts
    the O(E_A * E_B) scalar crossing_sign loop to near-output size)."""
    ma, ra = _edge_balls(a1, a2)
    mb, rb = _edge_balls(b1, b2)
    # (E_A, E_B) squared midpoint distances via the dot-product identity
    d2 = (
        (ma * ma).sum(axis=1)[:, None]
        + (mb * mb).sum(axis=1)[None, :]
        - 2.0 * (ma @ mb.T)
    )
    lim = (ra[:, None] + rb[None, :] + 1e-12) ** 2
    return np.nonzero(d2 <= lim)


def _find_crossings(pa: Polygon, pb: Polygon):
    """All proper crossings between edge sets: returns (by_a_edge,
    by_b_edge) dicts of intersection points, the SAME point object for
    both sides so the assembled graph vertices match exactly."""
    a1, a2 = _polygon_edges(pa)
    b1, b2 = _polygon_edges(pb)
    by_a: dict[int, list] = {}
    by_b: dict[int, list] = {}
    ii, jj = _candidate_pairs(a1, a2, b1, b2)
    for i, j in zip(ii, jj):
        if pred.crossing_sign(a1[i], a2[i], b1[j], b2[j]) > 0:
            p = edge_intersection(a1[i], a2[i], b1[j], b2[j])
            by_a.setdefault(int(i), []).append(p)
            by_b.setdefault(int(j), []).append(p)
    return by_a, by_b


def _assemble(edges) -> Polygon | None:
    """Directed xyz sub-edges -> even-odd Polygon via Builder loops."""
    if not edges:
        return None
    bld = Builder()
    for u, v in edges:
        lat_u = float(np.degrees(np.arctan2(u[2], np.hypot(u[0], u[1]))))
        lng_u = float(np.degrees(np.arctan2(u[1], u[0])))
        lat_v = float(np.degrees(np.arctan2(v[2], np.hypot(v[0], v[1]))))
        lng_v = float(np.degrees(np.arctan2(v[1], v[0])))
        bld.add_edge_latlng((lat_u, lng_u), (lat_v, lng_v))
    chains = bld.build_loops()
    if not chains:
        return None
    from .measures import loop_area

    loops = []
    for c in chains:
        lp = Loop.from_latlng_deg(c[:, 0], c[:, 1])
        # normalize to the smaller side (C++ S2Loop::Normalize): the
        # even-odd Polygon containment XOR requires hole loops CCW too —
        # nesting parity, not orientation, encodes hole-ness
        if loop_area(lp.v) > 2.0 * math.pi:
            lp = Loop(lp.v[::-1].copy())
        loops.append(lp)
    return Polygon(loops)


def boolean_op(pa: Polygon, pb: Polygon, op: str) -> Polygon | None:
    """op in {'union','intersection','difference','symmetric_difference'};
    returns None for an empty result."""
    by_a, by_b = _find_crossings(pa, pb)
    a_in_b, a_out_b = _split_classified(pa, pb, by_a)
    b_in_a, b_out_a = _split_classified(pb, pa, by_b)
    rev = lambda es: [(v, u) for u, v in es]
    if op == "union":
        edges = a_out_b + b_out_a
    elif op == "intersection":
        edges = a_in_b + b_in_a
    elif op == "difference":
        edges = a_out_b + rev(b_in_a)
    elif op == "symmetric_difference":
        edges = a_out_b + rev(b_in_a) + b_out_a + rev(a_in_b)
    else:
        raise ValueError(op)
    return _assemble(edges)


# ---------------------------------------------------------------------------
# loop-vs-loop / polygon-vs-polygon relations (src/loop.rs:397-471 scope,
# canonical crossing-aware semantics instead of the port's vertex-only test)
# ---------------------------------------------------------------------------

def _boundaries_cross(pa: Polygon, pb: Polygon) -> bool:
    a1, a2 = _polygon_edges(pa)
    b1, b2 = _polygon_edges(pb)
    ii, jj = _candidate_pairs(a1, a2, b1, b2)
    for i, j in zip(ii, jj):
        if pred.crossing_sign(a1[i], a2[i], b1[j], b2[j]) > 0:
            return True
    return False


def _shell_probes(poly: Polygon) -> np.ndarray:
    """One probe vertex per SHELL (loop at even nesting depth) of an
    even-odd polygon.  Depth of a loop = number of other loops containing
    its first vertex (valid because a polygon's own loops never cross).
    A disconnected region (2+ shells) needs every shell probed — a single
    loops[0] probe says nothing about the other components."""
    loops = poly.loops
    if len(loops) == 1:
        return loops[0].v[:1]
    probes = []
    for i, lp in enumerate(loops):
        v0 = lp.v[:1]
        depth = sum(
            bool(other.contains_points(v0)[0])
            for j, other in enumerate(loops)
            if j != i
        )
        if depth % 2 == 0:
            probes.append(v0)
    if not probes:  # defensive: inconsistent nesting, probe everything
        probes = [lp.v[:1] for lp in loops]
    return np.concatenate(probes)


def polygon_contains_polygon(pa: Polygon, pb: Polygon) -> bool:
    """A contains B: boundaries don't cross and EVERY shell of B has a
    vertex inside A (one probe per even-depth loop — a disconnected B is
    only contained if all its components are).  Boundaries that merely
    touch at a vertex are outside this function's scope (canonical S2
    resolves those by snap rounding first; see module docstring)."""
    if _boundaries_cross(pa, pb):
        return False
    probes_b = _shell_probes(pb)
    if not bool(pa.contains_points(probes_b).all()):
        return False
    # if B also contains all of A's shell probes, the smaller-area one is
    # inside (identical/nested-equal case)
    probes_a = _shell_probes(pa)
    if bool(pb.contains_points(probes_a).all()):
        from .measures import polygon_area

        return polygon_area(pa) >= polygon_area(pb)
    return True


def polygon_intersects_polygon(pa: Polygon, pb: Polygon) -> bool:
    """A intersects B: boundaries cross, or some shell of one has a vertex
    inside the other."""
    if _boundaries_cross(pa, pb):
        return True
    return bool(pa.contains_points(_shell_probes(pb)).any()) or bool(
        pb.contains_points(_shell_probes(pa)).any()
    )


def loop_contains_loop(a: Loop, b: Loop) -> bool:
    return polygon_contains_polygon(Polygon([a]), Polygon([b]))


def loop_intersects_loop(a: Loop, b: Loop) -> bool:
    return polygon_intersects_polygon(Polygon([a]), Polygon([b]))
