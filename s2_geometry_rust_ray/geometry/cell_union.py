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


def normalize(ids: np.ndarray) -> np.ndarray:
    """Sort, dedup, drop contained cells, merge 4 siblings -> parent
    (src/cell_union.rs:600-629)."""
    ids = np.unique(np.asarray(ids, dtype=U))  # sorts
    if ids.size == 0:
        return ids
    # drop cells contained by a predecessor: after sorting, a cell is
    # redundant iff its range_max <= running max of previous range_max
    while True:
        rmax = cellid.range_max(ids)
        run = np.maximum.accumulate(rmax)
        keep = np.ones(ids.size, dtype=bool)
        keep[1:] = rmax[1:] > run[:-1]
        ids = ids[keep]
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
    """Buffer by adding all neighbors at `level` (src/cell_union.rs:427-447)."""
    union = normalize(union)
    extra = []
    for cell in union:
        lv = int(cellid.level(np.array([cell], U))[0])
        if lv > level:
            cell = int(cellid.parent(np.array([cell], U), level)[0])
        extra.append(cellid.all_neighbors(int(cell), max(level, lv if lv < level else level)))
    if extra:
        return normalize(np.concatenate([union] + extra))
    return union


def leaf_cells_covered(union: np.ndarray) -> int:
    union = np.asarray(union, dtype=U)
    lv = cellid.level(union)
    return int((np.uint64(1) << (U(2) * (U(30) - lv.astype(U)))).sum())
