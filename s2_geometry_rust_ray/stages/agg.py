"""Shuffle-efficient aggregation patterns.

Measured on this Ray build (2.49): ``Dataset.groupby().aggregate()`` runs its
combine in a single task at ~20k rows/s — 20-100x slower than
``Dataset.sort()`` (polars-backed range-partition shuffle, ~4M rows/s) plus a
vectorized per-block NumPy reduce.  So the engine's aggregates are built on:

  1. optional map-side partial combine (one row per key per batch),
  2. ``ds.sort(key)`` — the only all-to-all exchange,
  3. per-block unique+reduce (keys are contiguous after the range sort, so a
     key is split across at most adjacent blocks),
  4. a final boundary merge: the per-block outputs are re-reduced either in
     one small task (`final='single'`, for bounded-cardinality keys like tile
     levels <= 12: at most 6*4^K tiles exist) or with a second (much smaller)
     sort+reduce round (`final='sorted'`, stays distributed — the 100 TB
     path for high-cardinality keys).

Skew note: a pathologically hot key concentrates in one range partition of
the sort; the map-side partial combine bounds its contribution to one row per
input block, so the sort itself never sees the skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _reduce_block(key_col: str, spec: dict[str, str] | list[str]):
    """Per-block grouped reduce.  spec: {col: 'sum'|'min'|'max'} (a list
    means all-sum).  Works for numeric and (min/max) string columns."""
    if isinstance(spec, list):
        spec = {c: "sum" for c in spec}

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        k = batch[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        boundaries = np.nonzero(ks[1:] != ks[:-1])[0] + 1
        starts = np.concatenate([[0], boundaries])
        uk = ks[starts]
        cols = {key_col: uk}
        for c, op in spec.items():
            v = batch[c].to_numpy(zero_copy_only=False)[order]
            if op == "sum":
                cols[c] = np.add.reduceat(v, starts)
            elif op == "min":
                cols[c] = np.minimum.reduceat(v, starts)
            elif op == "max":
                cols[c] = np.maximum.reduceat(v, starts)
            else:
                raise ValueError(op)
        return pa.table(cols)

    return fn


def tree_reduce_by_key(ds, key_col: str, spec: dict[str, str] | list[str],
                       branching: int = 8):
    """Sort-free TREE merge for BOUNDED-cardinality keys (e.g. level-K tile
    counts: at most 6*4^K keys exist): per-block partial reduce, then
    log_branching(B) rounds of repartition+reduce down to one block.  No
    all-to-all exchange at all — each round only concatenates blocks —
    which beats sorting when the per-block partials compress poorly
    (high-cardinality blocks of a bounded-key aggregate).  The final block
    holds one row per distinct key; use the sort-based reduce_by_key
    final='sorted' when that can't fit a single task."""
    import ray
    import ray.data

    if isinstance(spec, list):
        spec = {c: "sum" for c in spec}
    reduce_fn = _reduce_block(key_col, spec)
    partials = ds.map_batches(reduce_fn, batch_format="pyarrow")
    # raw-Ray merge tasks instead of Dataset.repartition: the Repartition
    # operator costs ~2 s/task of split overhead at this shape (measured),
    # while a concat+reduceat task on the same data costs ~0.3 s
    refs = partials.to_arrow_refs()

    @ray.remote
    def merge(*tbls):
        tbls = [t for t in tbls if t is not None and t.num_rows > 0]
        if not tbls:
            return None
        return reduce_fn(pa.concat_tables(tbls, promote_options="default"))

    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i : i + branching])
            for i in range(0, len(refs), branching)
        ]
    out = ray.get(refs[0])
    if out is None:
        out = pa.table({key_col: []})
    return ray.data.from_arrow(out)


def reduce_by_key(
    ds,
    key_col: str,
    spec: dict[str, str],
    final: str = "single",
    batch_size: int | None = None,
):
    """Distributed grouped reduce with per-column ops ('sum'/'min'/'max').
    Same sort-exchange plan as sum_by_key; all three ops are re-reducible
    so partial combine -> sort -> block reduce -> boundary merge is exact."""
    reduce_fn = _reduce_block(key_col, spec)
    partials = ds.map_batches(reduce_fn, batch_format="pyarrow", batch_size=batch_size)
    first = partials.sort(key_col).map_batches(
        reduce_fn, batch_format="pyarrow", batch_size=None
    )
    if final == "single":
        return first.repartition(1).map_batches(
            reduce_fn, batch_format="pyarrow", batch_size=None
        )
    return first.sort(key_col).map_batches(
        reduce_fn, batch_format="pyarrow", batch_size=None
    )


def sum_by_key(
    ds,
    key_col: str,
    sum_cols: list[str],
    final: str = "single",
    batch_size: int | None = None,
):
    """Distributed SUM(...) GROUP BY key — sort-exchange + NumPy reduces.

    `final='single'`: last merge in one task (bounded-cardinality keys).
    `final='sorted'`: second sort round; result stays range-partitioned by
    key and sorted (scale path; also what a downstream merge-join wants).
    """
    reduce_fn = _reduce_block(key_col, sum_cols)
    # per-block partial combine (pre-shuffle): bounds skew + shrinks exchange
    partials = ds.map_batches(reduce_fn, batch_format="pyarrow", batch_size=batch_size)
    first = partials.sort(key_col).map_batches(
        reduce_fn, batch_format="pyarrow", batch_size=None
    )
    if final == "single":
        return first.repartition(1).map_batches(
            reduce_fn, batch_format="pyarrow", batch_size=None
        )
    # second, far smaller round fixes block-boundary splits, stays distributed
    return first.sort(key_col).map_batches(
        reduce_fn, batch_format="pyarrow", batch_size=None
    )


def distinct_keys(ds, key_col: str, final: str = "single"):
    """DISTINCT key_col — per-block unique, sort-exchange, boundary dedup."""

    def uniq(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return pa.table({key_col: np.unique(k)})

    partials = ds.map_batches(uniq, batch_format="pyarrow")
    first = partials.sort(key_col).map_batches(uniq, batch_format="pyarrow")
    if final == "single":
        return first.repartition(1).map_batches(uniq, batch_format="pyarrow")
    return first.sort(key_col).map_batches(uniq, batch_format="pyarrow")


def count_by_key(ds, key_col: str, final: str = "single", out_col: str = "n"):
    """COUNT(*) GROUP BY key via sum_by_key over a ones column."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        uk, counts = np.unique(k, return_counts=True)
        return pa.table({key_col: uk, out_col: counts.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return sum_by_key(partials, key_col, [out_col], final=final)
