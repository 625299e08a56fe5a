"""Shuffle-path PIP join: covering-explode equi-join + exact refine.

The broadcast join (pipelines/pip.py) ships the whole polygon layer to
every actor — right for small layers.  This path handles layers too large
to broadcast: polygons are EXPLODED into their level-K covering tiles and
hash-partition-joined against the points' cell_lK column; only then does
the exact crossing-parity refine run, on (candidate point, polygon) pairs
co-located by the join.  Skew note: a hot tile (dense city) explodes one
level deeper before the join when its candidate count dominates
(stages/exchange.salted_key is the generic mechanism; here fan-out is
bounded by the covering granularity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import cellid
from ..geometry.coverer import PolygonRegion, RegionCoverer
from ..stages import exchange
from ..stages.encode import geotag_and_encode

U = np.uint64


def covering_tiles(layer: dict, level: int, max_cells: int = 128) -> pa.Table:
    """Per polygon: the set of level-K tiles overlapping it, from an S2
    covering (coarser covering cells are expanded to their K-descendants,
    finer ones mapped to their K-ancestor)."""
    rows_tile, rows_pid = [], []
    cov_opts = RegionCoverer(max_cells=max_cells, max_level=min(30, level + 3))
    for pid, poly in layer.items():
        cov = cov_opts.get_covering(PolygonRegion(poly))
        tiles: set[int] = set()
        for c in cov:
            lv = int(cellid.level(np.array([c], U))[0])
            if lv >= level:
                tiles.add(int(cellid.parent(np.array([c], U), level)[0]))
            else:
                ids = [int(c)]
                for _ in range(level - lv):
                    ids = [
                        int(ch)
                        for cid_ in ids
                        for ch in cellid.children(np.array([cid_], U))[0]
                    ]
                    if len(ids) > 65536:
                        raise ValueError(
                            f"covering explosion for {pid}; raise max_cells or level"
                        )
                tiles.update(ids)
        for t in sorted(tiles):
            rows_tile.append(np.int64(cellid.to_sort_key(np.array([t], U))[0]))
            rows_pid.append(pid)
    return pa.table(
        {"tile": np.array(rows_tile, dtype=np.int64),
         "polygon_id": pa.array(rows_pid, type=pa.string())}
    )


def shuffle_pip_join(ds, key_col: str, layer, level: int = 8, num_parts: int = 16):
    """Equi-join points.cell_lK == covering tile (hash exchange), then exact
    PIP refine per (point, polygon) candidate pair.  Output (key, polygon_id)
    identical to the broadcast join."""
    import ray.data

    def encode_points(batch: pa.Table) -> pa.Table:
        batch = geotag_and_encode(key_col)(batch)
        tiles = cellid.to_sort_key(
            cellid.parent(batch["cell_id"].to_numpy(zero_copy_only=False), level)
        )
        return pa.table(
            {
                key_col: batch[key_col],
                "lat": batch["lat"],
                "lng": batch["lng"],
                "tile": tiles,
            }
        )

    points = ds.map_batches(encode_points, batch_format="pyarrow")
    right = ray.data.from_arrow(covering_tiles(layer, level))
    joined = exchange.hash_join(points, right, "tile", num_parts=num_parts)

    # exact refine: vectorized PIP per polygon over its candidate points
    from ..functions.coords import latlng_deg_to_xyz
    from ..geometry.loop import Polygon

    polys = {
        pid: (p if isinstance(p, Polygon) else Polygon.from_loops_latlng_deg(p))
        for pid, p in layer.items()
    }

    def refine(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        pts = np.stack([x, y, z], axis=-1)
        pids = np.asarray(batch["polygon_id"].to_pylist(), dtype=object)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(keys), dtype=bool)
        for pid in np.unique(pids):
            m = pids == pid
            keep[m] = polys[pid].contains_points(pts[m])
        return pa.table(
            {key_col: keys[keep], "polygon_id": pa.array(pids[keep], type=pa.string())}
        )

    return joined.map_batches(refine, batch_format="pyarrow")
