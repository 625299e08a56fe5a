"""Robust geometric predicates: vectorized triage + exact fallback.

Canonical semantics from the vendored C++ (the Rust port's stable_sign is a
stub and its symbolic perturbation a non-canonical hash tie-break, see
SURVEY.md §0):

- Sign(a,b,c) three-tier strategy (/root/reference/src/predicates.rs:99-135;
  C++ s2geometry-cpp/src/s2/s2predicates.cc): vectorized float triage with
  threshold 3.6548*eps, exact fraction determinant for the uncertain band,
  Simulation-of-Simplicity perturbation for exact zeros
  (s2predicates.cc:130-225 SymbolicallyPerturbedSign — the exact case
  sequence is reproduced here).
- CrossingSign / VertexCrossing / EdgeOrVertexCrossing
  (s2edge_crossings.cc, s2edge_crosser.cc:41-97).
- OrderedCCW (s2predicates.cc), Ortho/RefDir/Origin (s2pointutil.h:98-121).

The vectorized layer (sign matrices from matmuls) lives with the loop kernel
in geometry/loop.py; this module provides the scalar exact machinery routed
to the <1%-of-rows uncertain band (src/lib.rs:71).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

# 3.6548 * DBL_EPSILON — C++ kMaxDetError (src/math.rs:433-476 mirrors it)
TRIAGE_ERROR = 3.6548 * np.finfo(np.float64).eps

# S2::Origin() (s2pointutil.h:98-115): ~66km from the north pole, chosen to
# avoid degenerate configurations with common test data.
ORIGIN = np.array(
    [-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195]
)


def triage_sign(det):
    """Float determinant -> {-1, 0, +1}; 0 means 'uncertain, go exact'."""
    det = np.asarray(det)
    return np.where(det > TRIAGE_ERROR, 1, np.where(det < -TRIAGE_ERROR, -1, 0))


def _fvec(p):
    return (Fraction(float(p[0])), Fraction(float(p[1])), Fraction(float(p[2])))


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sgn(x):
    return (x > 0) - (x < 0)


def _symbolically_perturbed_sign(a, b, c, b_cross_c):
    """Exact SoS tie-break; requires det==0 and a < b < c lexicographically
    (s2predicates.cc:130-225, Edelsbrunner & Muecke Table 4-ii)."""
    s = _sgn(b_cross_c[2])  # da[2]
    if s:
        return s
    s = _sgn(b_cross_c[1])  # da[1]
    if s:
        return s
    s = _sgn(b_cross_c[0])  # da[0]
    if s:
        return s
    s = _sgn(c[0] * a[1] - c[1] * a[0])  # db[2]
    if s:
        return s
    s = _sgn(c[0])  # db[2] * da[1]
    if s:
        return s
    s = -_sgn(c[1])  # db[2] * da[0]
    if s:
        return s
    s = _sgn(c[2] * a[0] - c[0] * a[2])  # db[1]
    if s:
        return s
    s = _sgn(c[2])  # db[1] * da[0]
    if s:
        return s
    s = _sgn(a[0] * b[1] - a[1] * b[0])  # dc[2]
    if s:
        return s
    s = -_sgn(b[0])  # dc[2] * da[1]
    if s:
        return s
    s = _sgn(b[1])  # dc[2] * da[0]
    if s:
        return s
    s = _sgn(a[0])  # dc[2] * db[1]
    if s:
        return s
    return 1  # dc[2] * db[1] * da[0]


def exact_sign(a, b, c, perturb=True):
    """Exact-arithmetic Sign for distinct points (s2predicates.cc ExactSign):
    sort lexicographically (tracking permutation parity), exact determinant,
    SoS on exact zero."""
    pa, pb, pc = tuple(map(float, a)), tuple(map(float, b)), tuple(map(float, c))
    perm = 1
    if pa > pb:
        pa, pb = pb, pa
        perm = -perm
    if pb > pc:
        pb, pc = pc, pb
        perm = -perm
    if pa > pb:
        pa, pb = pb, pa
        perm = -perm
    fa, fb, fc = _fvec(pa), _fvec(pb), _fvec(pc)
    bxc = _cross(fb, fc)
    det = _dot(fa, bxc)
    s = _sgn(det)
    if s == 0 and perturb:
        s = _symbolically_perturbed_sign(fa, fb, fc, bxc)
    return perm * s


# s2predicates.cc kDetErrorMultiplier: max rounding error per unit of the
# edge-product magnitude in the StableSign determinant
_DET_ERROR_MULTIPLIER = 3.2321 * np.finfo(np.float64).eps


def stable_sign(a, b, c) -> int:
    """Middle predicate tier (s2predicates.cc StableSign): recompute the
    determinant from EDGE DIFFERENCE vectors — for nearly-degenerate
    triangles the differences are small and nearly exact, so the result is
    certain far more often than the raw triple product.  Returns 0 when
    still uncertain (caller falls through to exact arithmetic)."""
    ab = b - a
    bc = c - b
    ca = a - c
    ab2 = float(ab @ ab)
    bc2 = float(bc @ bc)
    ca2 = float(ca @ ca)
    # use the two shortest edges (drop the longest from the product);
    # det[a b c] = (A-C)x(B-C).C = -(CA x BC).C etc.
    if ab2 >= bc2 and ab2 >= ca2:
        det = -float(np.dot(np.cross(ca, bc), c))
        max_error = _DET_ERROR_MULTIPLIER * math.sqrt(ca2 * bc2)
    elif bc2 >= ca2:
        det = -float(np.dot(np.cross(ab, ca), a))
        max_error = _DET_ERROR_MULTIPLIER * math.sqrt(ab2 * ca2)
    else:
        det = -float(np.dot(np.cross(bc, ab), b))
        max_error = _DET_ERROR_MULTIPLIER * math.sqrt(bc2 * ab2)
    if det > max_error:
        return 1
    if det < -max_error:
        return -1
    return 0


def sign(a, b, c):
    """Robust Sign(a,b,c) = sign of det[a b c]; never 0 for distinct
    points.  Full canonical three-tier cascade: float triage -> StableSign
    (edge-difference recompute) -> exact rational + SoS."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    if np.array_equal(a, b) or np.array_equal(b, c) or np.array_equal(a, c):
        return 0
    det = float(np.dot(np.cross(a, b), c))
    s = int(triage_sign(det))
    if s != 0:
        return s
    s = stable_sign(a, b, c)
    if s != 0:
        return s
    return exact_sign(a, b, c)


def ortho(a):
    """S2::Ortho (s2pointutil.cc:48-59): unit vector orthogonal to a, biased
    off the coordinate planes."""
    a = np.asarray(a, dtype=np.float64)
    k = int(np.argmax(np.abs(a))) - 1
    if k < 0:
        k = 2
    temp = np.array([0.012, 0.0053, 0.00457])
    temp[k] = 1.0
    v = np.cross(a, temp)
    return v / np.linalg.norm(v)


ref_dir = ortho  # S2::RefDir == S2::Ortho (s2pointutil.h:119-121)


def ordered_ccw(a, b, c, o):
    """True if edges OA, OB, OC are encountered in CCW order
    (s2predicates.cc OrderedCCW; src/predicates.rs:419-496)."""
    total = 0
    if sign(b, o, a) >= 0:
        total += 1
    if sign(c, o, b) >= 0:
        total += 1
    if sign(a, o, c) > 0:
        total += 1
    return total >= 2


def vertex_crossing(a, b, c, d):
    """Shared-vertex crossing parity (s2edge_crossings.cc VertexCrossing;
    src/predicates.rs:570-660)."""
    a, b, c, d = (np.asarray(p, dtype=np.float64) for p in (a, b, c, d))
    if np.array_equal(a, b) or np.array_equal(c, d):
        return False
    if np.array_equal(a, c):
        return np.array_equal(b, d) or ordered_ccw(ref_dir(a), d, b, a)
    if np.array_equal(b, d):
        return ordered_ccw(ref_dir(b), c, a, b)
    if np.array_equal(a, d):
        return np.array_equal(b, c) or ordered_ccw(ref_dir(a), c, b, a)
    if np.array_equal(b, c):
        return ordered_ccw(ref_dir(b), d, a, b)
    return False


def angle_contains_vertex(a, b, c):
    """True iff wedge ABC contains vertex B (s2edge_crossings.h:239-251)."""
    return not ordered_ccw(ref_dir(b), c, a, b)


def crossing_sign(a, b, c, d):
    """+1 interior crossing / 0 shared vertex / -1 no crossing
    (s2edge_crosser.cc:41-97 CrossingSignInternal2, without the tangent
    pruning fast path — the vectorized layer does its own pruning)."""
    a, b, c, d = (np.asarray(p, dtype=np.float64) for p in (a, b, c, d))
    if (
        np.array_equal(a, c)
        or np.array_equal(a, d)
        or np.array_equal(b, c)
        or np.array_equal(b, d)
    ):
        return 0
    if np.array_equal(a, b) or np.array_equal(c, d):
        return -1
    acb = -sign(a, b, c)
    bda = sign(a, b, d)
    if bda != acb:
        return -1
    cbd = -sign(c, d, b)
    if cbd != acb:
        return -1
    dac = sign(c, d, a)
    return 1 if dac == acb else -1


class EdgeCrosser:
    """S2EdgeCrosser with chain amortization — canonical C++
    s2edge_crosser.h semantics (the reference's crossing_sign_chain,
    edge_crosser.rs:126-170, is a documented float-product approximation
    with 1e-15 vertex heuristics — SURVEY §0 — so the robust sign stack is
    used instead).  For a fixed edge AB tested against a vertex chain
    c0,c1,c2,..., sign(A,B,c_i) is computed ONCE per chain vertex and
    carried over as `acb` for the next edge — half the robust-sign work of
    pairwise crossing_sign calls, identical results."""

    def __init__(self, a, b):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self._degenerate = bool(np.array_equal(self.a, self.b))
        self.c = None
        self.acb = 0

    def restart_at(self, c):
        self.c = np.asarray(c, dtype=np.float64)
        self.acb = -sign(self.a, self.b, self.c)

    def crossing_sign(self, c, d):
        """Pairwise entry point: restarts the chain if `c` is not the
        cached chain vertex, then steps to `d`."""
        c = np.asarray(c, dtype=np.float64)
        if self.c is None or not np.array_equal(self.c, c):
            self.restart_at(c)
        return self.crossing_sign_chain(d)

    def crossing_sign_chain(self, d):
        """Step the chain from the cached vertex C to D; returns the same
        +1/0/-1 as crossing_sign(a, b, C, D).  State always advances so the
        next call tests edge (D, next)."""
        d = np.asarray(d, dtype=np.float64)
        c, acb = self.c, self.acb
        a, b = self.a, self.b
        bda = sign(a, b, d)
        # advance chain state regardless of the outcome below
        self.c = d
        self.acb = -bda
        if (
            np.array_equal(a, c)
            or np.array_equal(a, d)
            or np.array_equal(b, c)
            or np.array_equal(b, d)
        ):
            return 0
        if self._degenerate or np.array_equal(c, d):
            return -1
        if bda != acb:
            return -1
        cbd = -sign(c, d, b)
        if cbd != acb:
            return -1
        dac = sign(c, d, a)
        return 1 if dac == acb else -1


def edge_or_vertex_crossing(a, b, c, d):
    """The PIP parity workhorse (src/predicates.rs:687-700)."""
    cs = crossing_sign(a, b, c, d)
    if cs < 0:
        return False
    if cs > 0:
        return True
    return vertex_crossing(a, b, c, d)


def compare_distances(x, a, b) -> int:
    """sign(d(x,a) - d(x,b)) via chord^2 with a triage band and an exact
    rational fallback (src/predicates.rs:321-409 structure; chord^2 is
    monotone in angle so no trig is needed)."""
    import math

    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    da = float(((x - a) ** 2).sum())
    db = float(((x - b) ** 2).sum())
    diff = da - db
    err = 4.0 * np.finfo(np.float64).eps * (da + db)
    if diff > err:
        return 1
    if diff < -err:
        return -1
    # exact tier: Fraction arithmetic over the float coordinates
    from fractions import Fraction as F

    fx = [F(v) for v in x]
    fa = [F(v) for v in a]
    fb = [F(v) for v in b]
    ea = sum((fx[i] - fa[i]) ** 2 for i in range(3))
    eb = sum((fx[i] - fb[i]) ** 2 for i in range(3))
    return (ea > eb) - (ea < eb)


def compare_distance(x, p, r2: float) -> int:
    """sign(chord^2(x, p) - r2), exact tier on tie (r2 is an exact float
    threshold, e.g. from chord2_from_radians)."""
    x = np.asarray(x, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    d2 = float(((x - p) ** 2).sum())
    err = 4.0 * np.finfo(np.float64).eps * (d2 + r2)
    if d2 - r2 > err:
        return 1
    if d2 - r2 < -err:
        return -1
    from fractions import Fraction as F

    e = sum((F(a) - F(b)) ** 2 for a, b in zip(x, p))
    fr = F(r2)
    return (e > fr) - (e < fr)


def compare_edge_distance(x, a0, a1, r2: float) -> int:
    """sign(min-distance(x, arc a0a1)^2_chord - r2) — the predicate behind
    the distance-r join refine (src/predicates.rs:503-562; the vectorized
    batch kernel lives in stages/distance.py)."""
    import math

    x = np.asarray(x, dtype=np.float64)
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    eps = np.finfo(np.float64).eps
    n = np.cross(a0, a1)
    nn = float(n @ n)
    wedge0 = float(np.dot(np.cross(a0, x), n))
    wedge1 = float(np.dot(np.cross(x, a1), n))
    # wedge sign tests are floats; treat near-zero dots as uncertain and
    # combine both branches conservatively (the interior perpendicular
    # distance never exceeds the endpoint distances, so when the branches
    # agree the answer is safe either way)
    wedge_tol = 16.0 * eps * math.sqrt(max(nn, eps))
    in_wedge = nn > 0.0 and wedge0 >= 0.0 and wedge1 >= 0.0
    # certainty is asymmetric: INSIDE needs both dots decisively positive,
    # but OUTSIDE needs only ONE dot decisively negative (one certain
    # negative proves the perpendicular foot is off the arc, regardless of
    # how close the other dot is to zero)
    inside_certain = nn > 0.0 and wedge0 > wedge_tol and wedge1 > wedge_tol
    outside_certain = nn > 0.0 and (wedge0 < -wedge_tol or wedge1 < -wedge_tol)

    def interior_sign() -> int:
        w = float(x @ n) / math.sqrt(nn)
        w = max(-1.0, min(1.0, w))
        one_minus_w2 = max(0.0, 1.0 - w * w)
        d2 = 2.0 - 2.0 * math.sqrt(one_minus_w2)
        # d2 carries ~sqrt(eps) absolute error as |w| -> 1 (near-antipodal
        # x vs the great circle): scale the band with the conditioning
        # instead of a fixed 8*eps absolute bound
        err = 8.0 * eps * (1.0 + 1.0 / math.sqrt(max(one_minus_w2, eps)))
        if d2 - r2 > err:
            return 1
        if d2 - r2 < -err:
            return -1
        return 0  # within float tolerance of the threshold: reported as tie

    def endpoint_sign() -> int:
        return min(compare_distance(x, a0, r2), compare_distance(x, a1, r2))

    if outside_certain or nn <= 0.0:
        return endpoint_sign()
    if in_wedge and inside_certain:
        return interior_sign()
    # ambiguous wedge membership: the interior perpendicular distance is a
    # lower bound and the endpoint distance an upper bound on the true
    # distance — when both give the same sign vs r2 that sign is safe
    si = interior_sign()
    se = endpoint_sign()
    return si if si == se else 0
