"""Point-in-polygon / region JOIN stages (the north-star operator).

Broadcast path (this module): the polygon layer is tiny relative to the
point table (10^1..10^5 polygons vs 10^12 points), so it is broadcast ONCE
per actor — `ray.put(layer_spec)` on the driver, `ray.get` + Loop/Polygon
construction in the actor pool's `__init__`, then every batch is a
vectorized (points x edges) crossing-parity evaluation with a bbox
pre-filter.  No shuffle at all.  (SURVEY.md §2.10 "Joins/lookups".)

Shuffle path (pipelines/pip.py builds it from the coverer): explode polygon
coverings at level K -> equi-join on cell_lK -> exact refine — for layers
too large to broadcast.

Modes: inner (emit (key, polygon_id) match rows), semi (keep matching
points), anti (keep non-matching points).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.coords import latlng_deg_to_xyz
from ..geometry.loop import Polygon


class PIPJoin:
    """Actor-pool stage: callable class for ds.map_batches(PIPJoin, ...,
    concurrency=N).  fn_constructor_kwargs carries the broadcast layer
    (either an ObjectRef to put()-data or a plain dict of
    {polygon_id: [ [(lat,lng),...] loop, ... ]})."""

    def __init__(self, layer, key_col: str = "k", mode: str = "inner"):
        import ray

        if isinstance(layer, ray.ObjectRef):
            layer = ray.get(layer)
        # build geometry state ONCE per actor
        self.polys: dict[str, Polygon] = {}
        for pid, loops in layer.items():
            if isinstance(loops, Polygon):
                self.polys[pid] = loops
            else:
                self.polys[pid] = Polygon.from_loops_latlng_deg(loops)
        self.key_col = key_col
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        pts = np.stack([x, y, z], axis=-1)  # NOT normalized: signs are
        # scale-invariant and the raw values are the oracle's bit-exact twins
        lat_rad = np.deg2rad(lat)
        lng_rad = np.deg2rad(lng)
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)

        out_keys = []
        out_pids = []
        any_match = np.zeros(len(keys), dtype=bool)
        for pid, poly in self.polys.items():
            # conservative bbox pre-filter (cheap comparisons) before the
            # exact (points x edges) kernel
            cand = np.zeros(len(keys), dtype=bool)
            for lp in poly.loops:
                cand |= lp.bound_contains_latlng_rad(lat_rad, lng_rad)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            inside_idx = poly.contains_points(pts[idx])
            hit = idx[inside_idx]
            if self.mode == "inner" and hit.size:
                out_keys.append(keys[hit])
                out_pids.append(np.full(hit.size, pid, dtype=object))
            any_match[hit] = True

        if self.mode == "inner":
            if out_keys:
                k = np.concatenate(out_keys)
                p = np.concatenate(out_pids)
                order = np.argsort(k, kind="stable")
                return pa.table(
                    {self.key_col: k[order], "polygon_id": pa.array(p[order], type=pa.string())}
                )
            return pa.table(
                {
                    self.key_col: pa.array([], type=batch[self.key_col].type),
                    "polygon_id": pa.array([], type=pa.string()),
                }
            )
        if self.mode == "semi":
            return batch.filter(pa.array(any_match))
        if self.mode == "anti":
            return batch.filter(pa.array(~any_match))
        raise ValueError(f"unknown mode {self.mode}")


def cap_join(batch: pa.Table, caps: dict[str, "object"], key_col: str = "k") -> pa.Table:
    """Stateless region join vs a dict of Caps: emits (key, region_id)."""
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    out_k, out_r = [], []
    for rid, cap in caps.items():
        m = cap.contains_xyz(x, y, z)
        if m.any():
            out_k.append(keys[m])
            out_r.append(np.full(int(m.sum()), rid, dtype=object))
    if out_k:
        k = np.concatenate(out_k)
        r = np.concatenate(out_r)
        return pa.table({key_col: k, "region_id": pa.array(r, type=pa.string())})
    return pa.table(
        {key_col: pa.array([], type=batch[key_col].type),
         "region_id": pa.array([], type=pa.string())}
    )


def rect_join(batch: pa.Table, rects: dict[str, "object"], key_col: str = "k") -> pa.Table:
    """Stateless region join vs LatLngRects (degree-space comparisons)."""
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    out_k, out_r = [], []
    for rid, rect in rects.items():
        m = rect.contains_latlng_deg(lat, lng)
        if m.any():
            out_k.append(keys[m])
            out_r.append(np.full(int(m.sum()), rid, dtype=object))
    if out_k:
        k = np.concatenate(out_k)
        r = np.concatenate(out_r)
        return pa.table({key_col: k, "region_id": pa.array(r, type=pa.string())})
    return pa.table(
        {key_col: pa.array([], type=batch[key_col].type),
         "region_id": pa.array([], type=pa.string())}
    )
