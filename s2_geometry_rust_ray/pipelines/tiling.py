"""Tile-assignment pipelines: encode points -> groupby S2 cell -> tile stats.

The first shuffle of the engine (SURVEY.md §7.3): groupby key is the parent
cell `cell_l{K}`.  At 100 TB the groupby is preceded by a *partial* per-batch
combine (one row per tile per batch) so the all-to-all exchange moves tile
partials, not raw rows — between 100x and 10^5x less data depending on K.
Hot tiles (urban clusters) are handled by the partial combine itself: a batch
contributes at most one row per tile regardless of skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import cellid
from ..stages import agg
from ..stages.encode import geotag_and_encode


def tile_partial_counts(level: int):
    """Per-batch combiner: cell_id column -> one (tile, partial n) row per
    distinct tile in the batch.  This is the map-side combine that makes the
    global groupby small."""

    def fn(batch: pa.Table) -> pa.Table:
        cid = batch["cell_id"].to_numpy(zero_copy_only=False)
        tiles = cellid.to_sort_key(cellid.parent(cid, level))
        uniq, counts = np.unique(tiles, return_counts=True)
        return pa.table({"tile": uniq, "n_partial": counts.astype(np.int64)})

    return fn


def tile_counts(
    ds: "ray.data.Dataset",
    key_col: str,
    level: int,
    batch_size: int = 32768,
    final: str = "single",
) -> "ray.data.Dataset":
    """key -> geotag -> leaf cell -> tile counts at `level`.

    Returns a Dataset with columns (tile_token:str, n:int64).  The groupby is
    the sort-exchange aggregate from stages/agg.py (map-side partial combine
    first); pass final='sorted' for high tile levels whose cardinality should
    stay distributed.
    """
    # encode + map-side combine FUSED into one wrapper: each extra
    # map_batches layer re-slices and re-wraps every batch (~10-20% of the
    # headline encode job; Ray fuses the operators either way)
    enc = geotag_and_encode(key_col)
    tp = tile_partial_counts(level)
    partials = ds.map_batches(
        lambda b: tp(enc(b)), batch_format="pyarrow", batch_size=batch_size
    )
    if final == "single" and level <= 10:
        # bounded cardinality (<= 6*4^level keys): sort-free tree merge
        summed = agg.tree_reduce_by_key(partials, "tile", ["n_partial"])
    else:
        summed = agg.sum_by_key(partials, "tile", ["n_partial"], final=final)

    def tokenize(batch: pa.Table) -> pa.Table:
        toks = cellid.to_hex(
            cellid.from_sort_key(batch["tile"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {"tile_token": toks, "n": batch["n_partial"].to_numpy(zero_copy_only=False)}
        )

    return summed.map_batches(tokenize, batch_format="pyarrow")


def face_histogram(ds: "ray.data.Dataset", key_col: str) -> "ray.data.Dataset":
    """Rows per cube face — minimal smoke aggregate over the encode kernel."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = geotag_and_encode(key_col, with_face=True)(batch)
        face = batch["face"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(face, return_counts=True)
        return pa.table({"face": uniq, "n": counts.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return agg.sum_by_key(partials, "face", ["n"], final="single")


def tile_counts_salted(
    ds: "ray.data.Dataset", key_col: str, level: int, salt: int = 8,
    hot_top_n: int = 32, sample_frac: float = 0.05,
) -> "ray.data.Dataset":
    """Tile counts with explicit hot-key salting (north_rule skew handling):
    a cheap histogram over a RANDOM SAMPLE finds the hottest tiles, the
    partial-count key becomes tile | hash(row)%salt (low bits) for those,
    the aggregate runs on the salted keys, and a second (tiny) reduce
    un-salts.  Identical output to tile_counts — the hot-set only changes
    the physical partitioning, never the result, so a sampled histogram is
    exact.  Nothing is materialized: the sample pass re-derives the cheap
    encode, and the main pass streams."""
    from ..stages import exchange

    def tiles_of(batch: pa.Table) -> pa.Table:
        batch = geotag_and_encode(key_col)(batch)
        cid = batch["cell_id"].to_numpy(zero_copy_only=False)
        return pa.table({"tile": cellid.to_sort_key(cellid.parent(cid, level))})

    sample = ds.random_sample(sample_frac, seed=17) if sample_frac < 1.0 else ds
    hot = set(exchange.hot_key_histogram(
        sample.map_batches(tiles_of, batch_format="pyarrow"), "tile",
        top_n=hot_top_n,
    ))

    def salted_partials(batch: pa.Table) -> pa.Table:
        batch = geotag_and_encode(key_col)(batch)
        cid = batch["cell_id"].to_numpy(zero_copy_only=False)
        tiles = cellid.to_sort_key(cellid.parent(cid, level))
        skey = exchange.salted_cell_key(tiles, cid, hot, salt)
        uniq, counts = np.unique(skey, return_counts=True)
        return pa.table({"skey": uniq, "n_partial": counts.astype(np.int64)})

    partials = ds.map_batches(
        salted_partials, batch_format="pyarrow", batch_size=131072
    )
    salted = agg.sum_by_key(partials, "skey", ["n_partial"], final="single")

    def unsalt(batch: pa.Table) -> pa.Table:
        skey = batch["skey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"tile": skey & ~np.int64(salt - 1),
             "n_partial": batch["n_partial"].to_numpy(zero_copy_only=False)}
        )

    unsalted = agg.sum_by_key(
        salted.map_batches(unsalt, batch_format="pyarrow"),
        "tile", ["n_partial"], final="single",
    )

    def tokenize(batch: pa.Table) -> pa.Table:
        toks = cellid.to_hex(
            cellid.from_sort_key(batch["tile"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {"tile_token": toks, "n": batch["n_partial"].to_numpy(zero_copy_only=False)}
        )

    return unsalted.map_batches(tokenize, batch_format="pyarrow")


def cap_bounds(ds: "ray.data.Dataset", key_col: str, level: int = 5,
               num_parts: int | None = None) -> "ray.data.Dataset":
    """Per-tile BOUNDING-CAP aggregate (S2Cap::add_point folded in key
    order, src/cap.rs:285-295): for each level-K tile, the cap anchored at
    the min-key point whose radius covers every point in the tile.
    Output (tile_token, keep_key, n, r2) — r2 is the squared-chord radius,
    pure +-*/ arithmetic, so the SQL oracle (min-key anchor via argmin +
    MAX of the same chord^2 expression) matches bit-exactly.  Anchoring at
    the min-key point makes the fold order-independent, unlike raw C++
    add_point over arbitrary insertion order."""
    from ..functions.coords import latlng_deg_to_xyz
    from ..stages import exchange

    def project(batch: pa.Table) -> pa.Table:
        batch = geotag_and_encode(key_col)(batch)
        cid = batch["cell_id"].to_numpy(zero_copy_only=False)
        tiles = cellid.to_sort_key(cellid.parent(cid, level))
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        return pa.table(
            {"tile": tiles, "key": batch[key_col].to_numpy(zero_copy_only=False),
             "x": x, "y": y, "z": z}
        )

    if num_parts is None:
        num_parts = exchange.default_num_parts()

    def per_partition(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"tile_token": pa.array([], pa.string()),
             "keep_key": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64()),
             "r2": pa.array([], pa.float64())}
        )
        if tbl.num_rows == 0:
            return empty
        t = tbl["tile"].to_numpy(zero_copy_only=False)
        k = tbl["key"].to_numpy(zero_copy_only=False)
        x = tbl["x"].to_numpy(zero_copy_only=False)
        y = tbl["y"].to_numpy(zero_copy_only=False)
        z = tbl["z"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, t))
        t, k, x, y, z = t[order], k[order], x[order], y[order], z[order]
        uniq, starts, counts = np.unique(t, return_index=True, return_counts=True)
        # anchor = first row of each segment (min key after the lexsort)
        cx = np.repeat(x[starts], counts)
        cy = np.repeat(y[starts], counts)
        cz = np.repeat(z[starts], counts)
        dx, dy, dz = x - cx, y - cy, z - cz
        c2 = (dx * dx + dy * dy) + dz * dz
        r2 = np.maximum.reduceat(c2, starts)
        toks = cellid.to_hex(cellid.from_sort_key(uniq))
        return pa.table(
            {"tile_token": toks, "keep_key": k[starts],
             "n": counts.astype(np.int64), "r2": r2}
        )

    def project_chunked(batch: pa.Table) -> pa.Table:
        # split tasks see WHOLE blocks; cap the geotag+encode temporaries
        # (several float64 arrays per row) at 64k rows per slice — the
        # memory bound the former map_batches(batch_size=65536) provided
        if batch.num_rows <= 65536:
            return project(batch)
        return pa.concat_tables(
            [project(batch.slice(i, 65536))
             for i in range(0, batch.num_rows, 65536)]
        )

    # fused exchange: the geotag+encode+project runs inside the split
    # task, the per-tile cap fold in the shard-concat task (one plasma
    # round-trip for the 5-column payload)
    return exchange.hash_exchange_apply(
        ds, "tile", num_parts, per_partition, map_fn=project_chunked
    )


def snap_dedup(
    ds: "ray.data.Dataset", key_col: str, level: int = 16
) -> "ray.data.Dataset":
    """Near-duplicate geotag dedup by snap-to-cell (S2CellIdSnapFunction
    semantics, src/builder/snap_functions.rs:217-290): rows sharing the
    level-K cell collapse to (snap_token, keep_key=min, n)."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = geotag_and_encode(key_col)(batch)
        cid = batch["cell_id"].to_numpy(zero_copy_only=False)
        snap = cellid.to_sort_key(cellid.parent(cid, level))
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {"snap": snap, "keep_key": keys,
             "n": np.ones(len(keys), dtype=np.int64)}
        )

    reduced = agg.reduce_by_key(
        ds.map_batches(partial, batch_format="pyarrow"),
        "snap", {"keep_key": "min", "n": "sum"}, final="single",
    )

    def tokenize(batch: pa.Table) -> pa.Table:
        toks = cellid.to_hex(
            cellid.from_sort_key(batch["snap"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {"snap_token": toks, "keep_key": batch["keep_key"], "n": batch["n"]}
        )

    return reduced.map_batches(tokenize, batch_format="pyarrow")


def h3_tile_counts(
    ds: "ray.data.Dataset", key_col: str, res: int, final: str = "single"
) -> "ray.data.Dataset":
    """H3-parity tile assignment: key -> geotag -> h3 cell at `res` ->
    counts.  Same sort-exchange shape as the S2 path, keyed by h3_cell
    (uint64 < 2^55, so the int64 view preserves order directly)."""
    from ..functions import geo, h3

    def partial(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False)
        lat, lng = geo.derive_latlng(key)
        cells = h3.latlng_to_h3(lat, lng, res).view(np.int64)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table({"h3_cell": uniq, "n_partial": counts.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    summed = agg.sum_by_key(partials, "h3_cell", ["n_partial"], final=final)

    def tokenize(batch: pa.Table) -> pa.Table:
        toks = cellid.to_hex(
            batch["h3_cell"].to_numpy(zero_copy_only=False).view(np.uint64)
        )
        return pa.table(
            {"h3_token": toks, "n": batch["n_partial"].to_numpy(zero_copy_only=False)}
        )

    return summed.map_batches(tokenize, batch_format="pyarrow")


def cell_encode_table(
    ds: "ray.data.Dataset", key_col: str, key_name: str
) -> "ray.data.Dataset":
    """Per-row encode result (key, lat, lng, face, cell_token) — the
    oracle-compared per-row pipeline."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = geotag_and_encode(key_col, with_face=True, with_token=True)(batch)
        return pa.table(
            {
                key_name: batch[key_col],
                "lat": batch["lat"],
                "lng": batch["lng"],
                "face": batch["face"],
                "cell_token": batch["cell_token"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
