"""S2CellUnion — set algebra over sorted uint64 cell-id arrays.

Per /root/reference/src/cell_union.rs (normalize :600-629, contains
:262-319, intersection :632-666, expand :427-467).  All operations are
NumPy-vectorized over the (typically small) union arrays; the distributed
variant for giant unions is a groupby over cell-id prefixes (SURVEY.md
§2.3).
"""

from __future__ import annotations

import numpy as np

from ..functions import cellid

U = np.uint64


def normalize(ids: np.ndarray, min_level: int = 0, level_mod: int = 1) -> np.ndarray:
    """Sort, dedup, drop contained cells, merge 4 siblings -> parent
    (src/cell_union.rs:600-629).  With level constraints (used by
    canonicalize_covering), sibling quadruples are merged ONLY when the
    parent level stays >= min_level and on the level_mod grid — otherwise
    the merge would re-violate the coverer's constraints."""
    ids = np.unique(np.asarray(ids, dtype=U))  # sorts
    if ids.size == 0:
        return ids
    # drop contained cells IN BOTH DIRECTIONS (canonical Normalize drops
    # "id contained by output.back()" AND pops "output.back() contained by
    # id" — an ancestor's id sorts BETWEEN its descendants, so id-order
    # running-max alone misses descendant-before-ancestor overlaps).
    # Leaf ranges are nested-or-disjoint, so sorting by (range_min asc,
    # range_max desc) puts every container before its contents and one
    # running-max sweep removes all contained cells.
    while True:
        rmin = cellid.range_min(ids)
        rmax = cellid.range_max(ids)
        order = np.lexsort((~rmax, rmin))
        rmax_o = rmax[order]
        run = np.maximum.accumulate(rmax_o)
        keep = np.ones(ids.size, dtype=bool)
        keep[1:] = rmax_o[1:] > run[:-1]
        ids = np.sort(ids[order[keep]])
        # merge complete sibling quadruples
        if ids.size < 4:
            return ids
        a, b, c, d = ids[:-3], ids[1:-2], ids[2:-1], ids[3:]
        # siblings iff (a XOR b XOR c) == d and identical bits outside the
        # last-level digit: mask = ~(6 * lsb) keeps the level bit and all
        # bits above the digit (C++ AreSiblings; src/cell_union.rs:582-597)
        lsb_ = cellid.lsb(a)
        mask = ~((lsb_ << U(1)) + (lsb_ << U(2)))
        cand = (
            ((a ^ b ^ c) == d)
            & ((a & mask) == (b & mask))
            & ((a & mask) == (c & mask))
            & ((a & mask) == (d & mask))
            & (~cellid.is_face(a))
            & (cellid.level(a) == cellid.level(b))
            & (cellid.level(a) == cellid.level(c))
            & (cellid.level(a) == cellid.level(d))
        )
        if min_level > 0 or level_mod > 1:
            plv = cellid.level(a).astype(np.int64) - 1
            cand &= (plv >= min_level) & ((plv - min_level) % level_mod == 0)
        first = np.nonzero(cand)[0]
        if first.size == 0:
            return ids
        # replace each first quadruple with the parent, then re-loop
        i = int(first[0])
        parent = cellid.immediate_parent(ids[i : i + 1])
        ids = np.concatenate([ids[:i], parent, ids[i + 4 :]])


def contains_ids(union: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Vectorized membership: union (normalized, sorted) contains each of
    `cells` (src/cell_union.rs:262-282 binary search on range_max).

    This is THE PIP pre-filter: leaf ids vs a polygon covering."""
    union = np.asarray(union, dtype=U)
    cells = np.asarray(cells, dtype=U)
    if union.size == 0:
        return np.zeros(cells.shape, dtype=bool)
    rmin = cellid.range_min(union)
    rmax = cellid.range_max(union)
    qmin = cellid.range_min(cells)
    qmax = cellid.range_max(cells)
    idx = np.searchsorted(rmax, qmax, side="left")
    idx = np.clip(idx, 0, union.size - 1)
    return (rmin[idx] <= qmin) & (qmax <= rmax[idx])


def intersects_ids(union: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Vectorized intersection test against each query cell."""
    union = np.asarray(union, dtype=U)
    cells = np.asarray(cells, dtype=U)
    if union.size == 0:
        return np.zeros(cells.shape, dtype=bool)
    rmin = cellid.range_min(union)
    rmax = cellid.range_max(union)
    qmin = cellid.range_min(cells)
    qmax = cellid.range_max(cells)
    # some union cell overlaps [qmin, qmax] iff the first cell with
    # rmax >= qmin has rmin <= qmax
    idx = np.searchsorted(rmax, qmin, side="left")
    ok = idx < union.size
    idx = np.clip(idx, 0, union.size - 1)
    return ok & (rmin[idx] <= qmax)


def union_of(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return normalize(np.concatenate([np.asarray(a, U), np.asarray(b, U)]))


def intersection(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sorted-merge keep-smaller (src/cell_union.rs:632-666)."""
    a = normalize(a)
    b = normalize(b)
    out = []
    # keep cells of a contained in b, cells of b contained in a
    out.append(a[contains_ids(b, a)])
    out.append(b[contains_ids(a, b)])
    res = np.unique(np.concatenate(out)) if out else np.array([], dtype=U)
    return normalize(res)


def difference(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a \\ b via recursive child subtraction (src/cell_union.rs:669-678)."""
    a = normalize(a)
    b = normalize(b)
    out: list[int] = []

    def subtract(cell: int):
        arr = np.array([cell], dtype=U)
        if contains_ids(b, arr)[0]:
            return
        if not intersects_ids(b, arr)[0]:
            out.append(cell)
            return
        for ch in cellid.children(arr)[0]:
            subtract(int(ch))

    for cell in a:
        subtract(int(cell))
    return normalize(np.array(out, dtype=U))


def expand_level(union: np.ndarray, level: int) -> np.ndarray:
    """Buffer by one ring of `level`-cells (canonical C++
    S2CellUnion::Expand(int); port src/cell_union.rs:427-447): cells finer
    than `level` are REPLACED by their level-`level` parent (so the whole
    parent is in the output — a finer cell's buffer zone inside its parent
    must be covered), then every output cell contributes its full ring of
    level-`level` neighbors."""
    union = normalize(union)
    out = []
    for cell in union:
        lv = int(cellid.level(np.array([cell], U))[0])
        cid = int(cell)
        if lv > level:
            cid = int(cellid.parent(np.array([cell], U), level)[0])
        out.append(np.array([cid], dtype=U))
        out.append(cellid.all_neighbors(cid, level))
    return normalize(np.concatenate(out))


def expand_with_radius(union: np.ndarray, radius_rad: float,
                       max_level_diff: int = 8) -> np.ndarray:
    """Buffer the union by at least `radius_rad` (canonical C++
    S2CellUnion::Expand(S1Angle, max_level_diff); the port's variant is
    src/cell_union.rs:427-467): pick the largest level whose MIN_WIDTH
    still exceeds the radius (so one ring of neighbors is a sufficient
    buffer), capped at min_level + max_level_diff to bound blowup, then
    add all neighbors at that level."""
    from ..functions import metrics

    union = normalize(np.asarray(union, dtype=U))
    if union.size == 0 or radius_rad <= 0:
        return union
    min_level = int(cellid.level(union).min())
    radius_level = metrics.level_for_min_width(radius_rad)
    if radius_level == 0 and radius_rad > metrics.min_width_at_level(0):
        union = expand_level(union, 0)
    return expand_level(union, min(min_level + max_level_diff, radius_level))


def leaf_cells_covered(union: np.ndarray) -> int:
    union = np.asarray(union, dtype=U)
    lv = cellid.level(union)
    return int((np.uint64(1) << (U(2) * (U(30) - lv.astype(U)))).sum())


def encode_varint(union: np.ndarray) -> bytes:
    """Delta-varint codec for sorted cell-id arrays (the S2CellUnion
    Encoder/Decoder pairing, compact form): little-endian base-128 varints
    of consecutive deltas.  ~2-5 bytes/cell for typical coverings vs 8 raw."""
    union = np.asarray(union, dtype=U)
    out = bytearray()
    prev = 0
    for cid in union.tolist():
        d = int(cid) - prev
        prev = int(cid)
        while True:
            b = d & 0x7F
            d >>= 7
            if d:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def decode_varint(data: bytes) -> np.ndarray:
    """Inverse of encode_varint."""
    out = []
    acc = 0
    val = 0
    shift = 0
    for byte in data:
        val |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            acc += val
            out.append(acc)
            val = 0
            shift = 0
    return np.array(out, dtype=U)
