"""Flagship pipeline over the PRIMARY table (input_hint images schema):

  read images (COLUMN-PRUNED: geometry stages read only image_id/lat/lng;
  the wide `bytes` payload never enters the object store for them)
    -> leaf S2 cell encode + tile parents        (stateless map_batches)
    -> (a) tile assignment groupby               (sort-exchange aggregate)
    -> (b) PIP join vs the polygon layer         (broadcast actor pool)
    -> (c) indexed pass-through write            (payload + derived cols,
           partitioned by coarse tile, resumable via state/manifest)

The pass-through path (c) preserves `bytes`/`caption` byte-exactly — it
only APPENDS derived columns (cell_id, cell_l{K}) — which is what the
PSNR/caption invariant demands.
"""

from __future__ import annotations

import glob

import pyarrow as pa

from ..functions import cellid
from ..stages.encode import encode_cells
from ..stages.exchange import actor_map as _actor_map
from . import tiling


def geometry_view(images_dir: str):
    """Column-pruned read for geometry stages (never loads payload)."""
    import ray.data

    return ray.data.read_parquet(
        f"{images_dir}", columns=["image_id", "lat", "lng"]
    )


def image_tile_counts(images_dir: str, level: int = 8, final: str = "single"):
    ds = geometry_view(images_dir)
    encoded = ds.map_batches(
        lambda b: encode_cells(b), batch_format="pyarrow", batch_size=131072
    )
    partials = encoded.map_batches(
        tiling.tile_partial_counts(level), batch_format="pyarrow", batch_size=131072
    )
    from ..stages import agg

    summed = agg.sum_by_key(partials, "tile", ["n_partial"], final=final)

    def tokenize(batch: pa.Table) -> pa.Table:
        toks = cellid.to_hex(
            cellid.from_sort_key(batch["tile"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {"tile_token": toks, "n": batch["n_partial"].to_numpy(zero_copy_only=False)}
        )

    return summed.map_batches(tokenize, batch_format="pyarrow")


def image_pip_join(images_dir: str, layer=None, mode: str = "inner",
                   concurrency=None):
    from ..stages import pip as pip_stages
    from .pip import standard_polygon_layer

    if layer is None:
        layer = standard_polygon_layer()
    prepared = pip_stages.prepare_layer(layer)
    ds = geometry_view(images_dir)
    return _actor_map(
        ds,
        pip_stages.PIPJoin,
        fn_constructor_kwargs={"layer": prepared, "key_col": "image_id", "mode": mode},
        batch_size=65536,
        concurrency=concurrency,
    )


def indexed_passthrough(images_dir: str, out_dir: str, tile_level: int = 5,
                        max_shards: int | None = None):
    """Resumable pass-through write: full rows + appended cell columns,
    one output dir per input shard (state/manifest lineage)."""
    from ..state.manifest import resumable_shard_write

    def pipeline(ds):
        return ds.map_batches(
            lambda b: encode_cells(b, levels=(tile_level,)),
            batch_format="pyarrow",
            batch_size=8192,  # wide payload rows: keep batches small
        )

    files = sorted(glob.glob(f"{images_dir}/*.parquet"))
    return resumable_shard_write(files, out_dir, pipeline, max_shards=max_shards)
