"""kNN over geotagged points — S2ClosestPointQuery semantics
(/root/reference/tests/test_s2query_system_port.rs:105-125 specifies the
surface; the reference implementation is absent, canonical API in
s2geometry-cpp/src/s2/s2closest_point_query.h:37-189).

Distances are SQUARED CHORD lengths (src/chord_angle.rs:12-26 — monotone in
angle, no trig), computed with pure arithmetic so the DuckDB brute-force
oracle reproduces every candidate distance bit-exactly; ties broken by
ascending target key (deterministic total order).

Two paths:
- brute: every partition scans all its points for all queries (vectorized,
  O(Q*N/P) per partition), then a tiny per-query merge.  The correctness
  baseline, and optimal when Q*N is small.
- cell-pruned (pipelines/knn.py): partitions hold their points sorted by
  cell_id; each query examines only candidate cell ranges from a growing cap
  covering, doubling the radius until the k-th distance is <= the covered
  radius.  The 10^12-row path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.coords import latlng_deg_to_xyz


def chord2_point_to_points(qx, qy, qz, x, y, z):
    """Squared chord distances; explicit left-assoc ops (oracle twin)."""
    dx = x - qx
    dy = y - qy
    dz = z - qz
    return (dx * dx + dy * dy) + dz * dz


class BruteKnn:
    """Actor stage: local top-k per query within each batch.

    queries: dict with arrays query_id(int64), x, y, z; broadcast once per
    actor via fn_constructor_kwargs (ObjectRef or plain dict).
    """

    def __init__(self, queries, k: int, key_col: str = "k"):
        import ray

        if isinstance(queries, ray.ObjectRef):
            queries = ray.get(queries)
        self.qid = np.asarray(queries["query_id"], dtype=np.int64)
        self.qx = np.asarray(queries["x"], dtype=np.float64)
        self.qy = np.asarray(queries["y"], dtype=np.float64)
        self.qz = np.asarray(queries["z"], dtype=np.float64)
        self.k = int(k)
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        out_q, out_key, out_d2 = [], [], []
        for qi in range(len(self.qid)):
            d2 = chord2_point_to_points(self.qx[qi], self.qy[qi], self.qz[qi], x, y, z)
            sel = local_topk(d2, keys, self.k)
            out_q.append(np.full(sel.size, self.qid[qi], dtype=np.int64))
            out_key.append(keys[sel])
            out_d2.append(d2[sel])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "neighbor": np.concatenate(out_key),
                "d2": np.concatenate(out_d2),
            }
        )


def local_topk(d2: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k smallest by (d2, key) — tie-safe: selects by d2
    threshold first, then lexsorts the candidate set."""
    n = d2.shape[0]
    if n <= k:
        return np.lexsort((keys, d2))
    part = np.argpartition(d2, k - 1)[:k]
    thresh = d2[part].max()
    cand = np.nonzero(d2 <= thresh)[0]
    order = np.lexsort((keys[cand], d2[cand]))[:k]
    return cand[order]


def merge_topk(batch: pa.Table, k: int) -> pa.Table:
    """Reduce partial top-k rows (query_id, neighbor, d2) -> final top-k per
    query with rank.  Used per-block after sorting by query_id; tie order is
    (d2, neighbor)."""
    qid = batch["query_id"].to_numpy(zero_copy_only=False)
    nb = batch["neighbor"].to_numpy(zero_copy_only=False)
    d2 = batch["d2"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nb, d2, qid))
    qid, nb, d2 = qid[order], nb[order], d2[order]
    # rank within query
    uq, starts = np.unique(qid, return_index=True)
    rank = np.arange(len(qid)) - np.repeat(starts, np.diff(np.append(starts, len(qid))))
    keep = rank < k
    return pa.table(
        {
            "query_id": qid[keep],
            "neighbor": nb[keep],
            "d2": d2[keep],
            "rank": (rank[keep] + 1).astype(np.int64),
        }
    )
