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
    so partial combine -> sort -> block reduce -> boundary merge is exact.

    `final='hash'`: hash exchange + per-partition reduce instead of the
    second sort round.  Unlike a range sort (whose oversized partitions
    split at ARBITRARY rows, so a straddling key can come back as two
    partial rows), hash partitioning co-locates every key exactly —
    guaranteed ONE row per key.  Use it whenever the consumer counts or
    sums the reduced rows directly (e.g. a convergence certificate)."""
    if final not in ("single", "sorted", "hash"):
        raise ValueError(f"unknown final {final!r}")
    reduce_fn = _reduce_block(key_col, spec)
    partials = ds.map_batches(reduce_fn, batch_format="pyarrow", batch_size=batch_size)
    if final == "hash":
        from . import exchange

        return exchange.hash_exchange_apply(
            partials, key_col, exchange.default_num_parts(), reduce_fn
        )
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


def _reduce_block_multi(key_cols: list[str], spec: dict[str, str]):
    """Per-block grouped reduce over a COMPOSITE key (SQL GROUP BY a, b):
    lexsort over the key columns (object/string keys supported), group
    boundaries where ANY key changes, then the same reduceat kernels as
    _reduce_block.  Exact — no hashed composite, no string concatenation."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ks = [batch[c].to_numpy(zero_copy_only=False) for c in key_cols]
        order = np.lexsort(tuple(ks[::-1]))  # key_cols[0] is primary
        ks_s = [k[order] for k in ks]
        diff = np.zeros(batch.num_rows - 1, dtype=bool)
        for k in ks_s:
            diff |= k[1:] != k[:-1]
        starts = np.concatenate([[0], np.nonzero(diff)[0] + 1])
        cols = {c: k[starts] for c, k in zip(key_cols, ks_s)}
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


def reduce_by_key_multi(
    ds,
    key_cols: list[str],
    spec: dict[str, str],
    final: str = "single",
    batch_size: int | None = None,
):
    """Distributed grouped reduce over a composite key — the multi-column
    GROUP BY.  Same physical plan as reduce_by_key (map-side partial
    combine -> sort exchange on the key tuple -> block reduce -> boundary
    merge); `final='hash'` hash-partitions on the FULL key tuple, so the
    partition spread follows the joint cardinality even when the leading
    key has few distinct values (e.g. (event_type, window))."""
    if final not in ("single", "sorted", "hash"):
        raise ValueError(f"unknown final {final!r}")
    reduce_fn = _reduce_block_multi(key_cols, spec)
    partials = ds.map_batches(
        reduce_fn, batch_format="pyarrow", batch_size=batch_size
    )
    if final == "hash":
        from . import exchange

        return exchange.hash_exchange_apply(
            partials, key_cols, exchange.default_num_parts(), reduce_fn
        )
    first = partials.sort(key_cols).map_batches(
        reduce_fn, batch_format="pyarrow", batch_size=None
    )
    if final == "single":
        return first.repartition(1).map_batches(
            reduce_fn, batch_format="pyarrow", batch_size=None
        )
    return first.sort(key_cols).map_batches(
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
    `final='hash'`: hash exchange + per-partition reduce (the
    high-cardinality path; see reduce_by_key).

    The all-sum special case of reduce_by_key — one plan dispatcher, so
    the finals can never drift apart (a silent fallthrough here once let
    final='hash' run the sorted plan unnoticed)."""
    return reduce_by_key(
        ds, key_col, {c: "sum" for c in sum_cols}, final=final,
        batch_size=batch_size,
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


def grouped_topk(ds, key_col: str, val_col: str, id_col: str, n: int,
                 final: str = "single"):
    """Per-group top-N: for each key the n rows with largest (val desc,
    id asc) — the grouped companion of the kNN/ANN top-k merges.

    Plan: per-block LOCAL top-n per key (the combine — each block emits at
    most n rows per distinct key it contains), sort-exchange by key, final
    per-key truncation.  The exchange payload is bounded by
    distinct_keys_per_block * n, independent of row count.  Ties break by
    id ascending — the SQL row_number contract."""

    def local_topn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([key_col, val_col, id_col])
        k = batch[key_col].to_numpy(zero_copy_only=False)
        v = batch[val_col].to_numpy(zero_copy_only=False)
        i = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, -v, k))
        k, v, i = k[order], v[order], i[order]
        is_new = np.ones(len(k), dtype=bool)
        is_new[1:] = k[1:] != k[:-1]
        starts = np.nonzero(is_new)[0]
        rank = np.arange(len(k)) - np.repeat(
            starts, np.diff(np.append(starts, len(k)))
        )
        keep = rank < n
        return pa.table({key_col: k[keep], val_col: v[keep], id_col: i[keep]})

    partials = ds.map_batches(local_topn, batch_format="pyarrow")

    def add_rank(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        is_new = np.ones(len(k), dtype=bool)
        is_new[1:] = k[1:] != k[:-1]
        starts = np.nonzero(is_new)[0]
        rank = np.arange(len(k)) - np.repeat(
            starts, np.diff(np.append(starts, len(k)))
        )
        return batch.append_column("rank", pa.array(rank + 1, pa.int64()))

    if final == "single":
        # one bounded task (<= distinct_keys * n rows after a range sort)
        merged = partials.sort(key_col).map_batches(
            local_topn, batch_format="pyarrow", batch_size=None
        )
        out = merged.repartition(1).map_batches(
            local_topn, batch_format="pyarrow", batch_size=None
        )
        return out.map_batches(add_rank, batch_format="pyarrow", batch_size=None)
    # scale path: HASH exchange — unlike a range sort (whose oversized
    # partitions get split at arbitrary rows, letting one key straddle two
    # blocks and emit 2n rows with duplicate ranks), hash partitioning
    # co-locates every key exactly, so the per-partition top-n + rank is
    # final
    from . import exchange

    return exchange.hash_exchange_apply(
        partials, key_col, exchange.default_num_parts(),
        lambda t: add_rank(local_topn(t)),
    )


def distinct_count_by_key(ds, key_col: str, distinct_col: str,
                          out_col: str = "n_distinct", final: str = "single"):
    """Exact COUNT(DISTINCT distinct_col) GROUP BY key_col.

    Plan: per-block (key, value) dedup (combine), sort-exchange on the
    key, per-block pair dedup + boundary-safe final count in one bounded
    task (pair cardinality = sum of per-key distinct counts).

    NULL semantics match SQL exactly: COUNT(DISTINCT) ignores NULL values,
    but a key whose values are ALL null still appears (n_distinct = 0) —
    GROUP BY keeps the group.  Nulls aren't dropped up front (that erased
    all-null keys entirely, ADVICE r3); instead validity travels as an
    explicit `v_ok` column (null values filled with a type-appropriate
    filler so the value array stays its native dtype — an int column with
    nulls would otherwise decay to float NaN, whose NaN != NaN also
    defeats the != dedup mask), every all-null row collapses to one
    (key, filler, False) sentinel per key per block, and the finalizer
    counts only v_ok rows."""

    import pyarrow.compute as pc

    # resolve the value type ONCE driver-side: a block whose values are all
    # null carries arrow type `null` (no filler constructible, and emitted
    # partials would disagree on schema); cast such blocks to the dataset
    # type.  fetch_if_missing executes at most the first block's task chain.
    sch = ds.schema(fetch_if_missing=True)
    arrow_sch = getattr(sch, "base_schema", sch)
    if hasattr(arrow_sch, "field"):
        vtype = arrow_sch.field(distinct_col).type
    else:  # PandasBlockSchema: parallel name/dtype lists (may be pandas
        # extension dtypes like StringDtype — infer via an empty Series)
        import pandas as pd

        np_dtype = dict(zip(arrow_sch.names, arrow_sch.types))[distinct_col]
        vtype = pa.Array.from_pandas(pd.Series([], dtype=np_dtype)).type
    if pa.types.is_null(vtype):
        vtype = pa.int64()  # the whole column is null: any type works

    def _filler(t: pa.DataType):
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return ""
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return b""
        return 0

    def pair_dedup(batch: pa.Table) -> pa.Table:
        if "v_ok" in batch.column_names:
            ok = batch["v_ok"].to_numpy(zero_copy_only=False)
            v = batch[distinct_col].to_numpy(zero_copy_only=False)
        else:
            col = batch[distinct_col]
            if pa.types.is_null(col.type):
                col = col.cast(vtype)
            ok = pc.is_valid(col).to_numpy(zero_copy_only=False)
            v = pc.fill_null(col, _filler(col.type)).to_numpy(
                zero_copy_only=False
            )
        if batch.num_rows == 0:
            return pa.table({key_col: batch[key_col], distinct_col: v,
                             "v_ok": pa.array(ok, pa.bool_())})
        k = batch[key_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, ok, k))
        k, v, ok = k[order], v[order], ok[order]
        keep = np.ones(len(k), dtype=bool)
        keep[1:] = (k[1:] != k[:-1]) | (ok[1:] != ok[:-1]) | (v[1:] != v[:-1])
        return pa.table({key_col: k[keep], distinct_col: v[keep],
                         "v_ok": pa.array(ok[keep], pa.bool_())})

    def count_final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: batch[key_col],
                             out_col: pa.array([], pa.int64())})
        t = pair_dedup(batch)
        k = t[key_col].to_numpy(zero_copy_only=False)
        ok = t["v_ok"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        counts = np.bincount(inv, weights=ok).astype(np.int64)
        return pa.table({key_col: uk, out_col: counts})

    partials = ds.map_batches(pair_dedup, batch_format="pyarrow")
    if final == "single":
        merged = partials.sort(key_col).map_batches(
            pair_dedup, batch_format="pyarrow", batch_size=None
        )
        return merged.repartition(1).map_batches(
            count_final, batch_format="pyarrow", batch_size=None
        )
    # scale path: HASH exchange co-locates every key exactly (a range
    # sort's oversized partitions split at arbitrary rows, which would
    # double-count a straddling key — and the count finalizer, unlike
    # sum/min/max, is NOT re-reducible, so no later round could fix it)
    from . import exchange

    return exchange.hash_exchange_apply(
        partials, key_col, exchange.default_num_parts(), count_final
    )


def count_by_key(ds, key_col: str, final: str = "single", out_col: str = "n"):
    """COUNT(*) GROUP BY key via sum_by_key over a ones column."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        uk, counts = np.unique(k, return_counts=True)
        return pa.table({key_col: uk, out_col: counts.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return sum_by_key(partials, key_col, [out_col], final=final)
