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


def covering_tiles(layer: dict, level: int, max_cells: int = 128,
                   with_geometry: bool = False) -> pa.Table:
    """Per polygon: the set of level-K tiles overlapping it, from an S2
    covering (coarser covering cells are expanded to their K-descendants,
    finer ones mapped to their K-ancestor).  With `with_geometry`, each
    tile row also carries the polygon's pickled geometry so the exchange
    delivers vertices to exactly the partitions that need them (replication
    bounded by covering size — never a full-layer broadcast)."""
    import pickle

    from ..geometry.loop import Polygon

    rows_tile, rows_pid, rows_geom = [], [], []
    cov_opts = RegionCoverer(max_cells=max_cells, max_level=min(30, level + 3))
    for pid, poly in layer.items():
        geom = (
            pickle.dumps(
                poly if isinstance(poly, Polygon)
                else Polygon.from_loops_latlng_deg(poly)
            )
            if with_geometry
            else None
        )
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
            rows_geom.append(geom)
    cols = {"tile": np.array(rows_tile, dtype=np.int64),
            "polygon_id": pa.array(rows_pid, type=pa.string())}
    if with_geometry:
        cols["geom"] = pa.array(rows_geom, type=pa.binary())
    return pa.table(cols)


def shuffle_pip_join(ds, key_col: str, layer, level: int = 8,
                     num_parts: int | None = None):
    """Equi-join points.cell_lK == covering tile (hash exchange), then exact
    PIP refine per (point, polygon) candidate pair.  Output (key, polygon_id)
    identical to the broadcast join.

    The polygon layer is NEVER broadcast or closure-captured: each covering
    tile row carries its polygon's pickled vertices through the exchange, so
    a partition receives only the polygons whose tiles hash to it (geometry
    replication bounded by covering size, independent of cluster width)."""

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

    import pickle

    import ray.data

    from ..functions.coords import latlng_deg_to_xyz

    points = ds.map_batches(encode_points, batch_format="pyarrow")
    right = ray.data.from_arrow(covering_tiles(layer, level, with_geometry=True))
    if num_parts is None:
        num_parts = exchange.default_num_parts()
    point_parts = exchange.hash_exchange(points, "tile", num_parts)
    tile_parts = exchange.hash_exchange(right, "tile", num_parts)

    def refine_part(pt: pa.Table, tt: pa.Table) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], pt.schema.field(key_col).type),
             "polygon_id": pa.array([], pa.string())}
        )
        if pt.num_rows == 0 or tt.num_rows == 0:
            return empty
        # geometry arrives with the tile rows; deserialize once per polygon
        pids_t = tt["polygon_id"].to_pylist()
        geoms = tt["geom"].to_pylist()
        polys = {}
        for pid, g in zip(pids_t, geoms):
            if pid not in polys:
                polys[pid] = pickle.loads(g)
        cand = pt.join(tt.select(["tile", "polygon_id"]), keys="tile",
                       join_type="inner")
        if cand.num_rows == 0:
            return empty
        lat = cand["lat"].to_numpy(zero_copy_only=False)
        lng = cand["lng"].to_numpy(zero_copy_only=False)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        pts = np.stack([x, y, z], axis=-1)
        pids = np.asarray(cand["polygon_id"].to_pylist(), dtype=object)
        keys = cand[key_col].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(keys), dtype=bool)
        for pid in np.unique(pids):
            m = pids == pid
            keep[m] = polys[pid].contains_points(pts[m])
        return pa.table(
            {key_col: keys[keep],
             "polygon_id": pa.array(pids[keep], type=pa.string())}
        )

    return exchange.zip_partitions_to_dataset(point_parts, tile_parts, refine_part)
