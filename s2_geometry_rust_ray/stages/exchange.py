"""Explicit hash-partitioned exchange + equi-join on raw Ray tasks.

WHY raw Ray here (the one deliberate drop below the Dataset API, per the
mandate's escape hatch): Ray Data's groupby/aggregate combine runs ~20x
slower than a NumPy reduce (see stages/agg.py), and Dataset has no
key-partitioned exchange primitive — `repartition` ignores keys and
`sort` gives ranges, which joins can't use without boundary surgery.  This
module implements the classic M x P shuffle: M map tasks split each block
by hash(key) % P (num_returns=P), P reduce tasks concat their shards.
Everything is zero-copy Arrow through the object store; the reduce output
is re-wrapped as a Dataset via from_arrow_refs so downstream stays in the
Dataset API.

Skew handling (north_rule "salting for hot cells"): `salted_key` spreads a
configurable hot-key set over SALT sub-keys on the map side; mergeable
aggregations un-salt in a second tiny pass.  For joins, hot LEFT keys are
salted and the matching RIGHT rows replicated to every salt (standard
skew-join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash_part(table: pa.Table, key_col: str, num_parts: int) -> list[pa.Table]:
    k = table[key_col].to_numpy(zero_copy_only=False)
    # multiplicative hash on int64/uint64 keys (strings: hash of bytes)
    if k.dtype.kind in "iu":
        h = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    else:
        h = np.array([hash(x) & 0xFFFFFF for x in k], dtype=np.uint64)
    part = (h % np.uint64(num_parts)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sorted_tbl = table.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(num_parts + 1))
    return [sorted_tbl.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(num_parts)]


def hash_exchange(ds, key_col: str, num_parts: int):
    """Dataset -> list of per-partition ObjectRef[pa.Table] (co-partitioned
    by hash(key) % num_parts)."""
    import ray

    @ray.remote(num_returns="dynamic")
    def split(block: pa.Table):
        for t in _hash_part(block, key_col, num_parts):
            yield t

    @ray.remote
    def concat(*shards):
        shards = [s for s in shards if s.num_rows > 0]
        if not shards:
            return None
        return pa.concat_tables(shards, promote_options="default")

    block_refs = ds.to_arrow_refs()
    shard_lists = [list(ray.get(split.remote(b))) for b in block_refs]
    parts = []
    for p in range(num_parts):
        parts.append(concat.remote(*[sl[p] for sl in shard_lists]))
    return parts


def hash_join(left_ds, right_ds, key_col: str, num_parts: int = 32, how: str = "inner"):
    """Hash-partitioned equi-join of two Datasets on key_col -> Dataset.

    Both sides exchanged with the same partitioner; per-partition joins run
    as parallel Ray tasks (pyarrow join).  For broadcast-sized right sides
    prefer the broadcast pattern (stages/pip.py) — this is the both-sides-
    large path."""
    import ray
    import ray.data

    left_parts = hash_exchange(left_ds, key_col, num_parts)
    right_parts = hash_exchange(right_ds, key_col, num_parts)

    @ray.remote
    def join_part(lt, rt):
        if lt is None or (how == "inner" and rt is None):
            return None
        if rt is None:
            rt_schema_empty = None
            return lt if how in ("left", "left outer") else None
        return lt.join(rt, keys=key_col, join_type=how)

    out = [join_part.remote(l, r) for l, r in zip(left_parts, right_parts)]
    refs = [r for r in out if ray.get(r) is not None]
    if not refs:
        import pyarrow as _pa

        return ray.data.from_arrow(_pa.table({key_col: []}))
    return ray.data.from_arrow_refs(refs)


def hot_key_histogram(ds, key_col: str, top_n: int = 64):
    """Cheap first-pass histogram for salting decisions: per-block partial
    counts -> driver-side top-N merge (bounded by top_n * num_blocks)."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        uk, counts = np.unique(k, return_counts=True)
        if len(uk) > top_n:
            idx = np.argpartition(-counts, top_n)[:top_n]
            uk, counts = uk[idx], counts[idx]
        return pa.table({key_col: uk, "n": counts.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    from collections import Counter

    c: Counter = Counter()
    for row in parts:
        c[row[key_col]] += row["n"]
    return dict(c.most_common(top_n))


def salted_key(keys: np.ndarray, row_hash: np.ndarray, hot_keys: set, salt: int):
    """Map-side salting for SMALL integer keys: hot keys spread over `salt`
    sub-keys (key*salt + s).  Un-salt with key // salt.  Caller must
    guarantee |key| * salt fits int64 — for 64-bit cell ids use
    salted_cell_key (low-bit salting) instead."""
    keys = np.asarray(keys, dtype=np.int64)
    is_hot = np.isin(keys, np.fromiter(hot_keys, dtype=np.int64, count=len(hot_keys)))
    s = (np.asarray(row_hash, dtype=np.uint64) % np.uint64(salt)).astype(np.int64)
    return keys * salt + np.where(is_hot, s, 0)


def salted_cell_key(tile_sort_keys: np.ndarray, row_hash: np.ndarray,
                    hot_keys: set, salt: int):
    """Salting for S2 cell sort keys: a level-L cell id has 2*(30-L) zero
    bits below its lsb, so hot tiles take the salt in the LOW bits (no
    overflow, order preserved within a tile).  `salt` must be a power of
    two well below the level's lsb.  Un-salt: key & ~(salt-1)."""
    keys = np.asarray(tile_sort_keys, dtype=np.int64)
    is_hot = np.isin(keys, np.fromiter(hot_keys, dtype=np.int64, count=len(hot_keys)))
    s = (np.asarray(row_hash, dtype=np.uint64) % np.uint64(salt)).astype(np.int64)
    return keys | np.where(is_hot, s, 0)
