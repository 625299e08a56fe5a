"""Property-based invariants (hypothesis) for the exchange and hashing
kernels — pure-function level, no Ray session needed."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from s2_geometry_rust_ray.functions.hashing import splitmix64
from s2_geometry_rust_ray.stages import exchange

keys_arrays = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300
)


@settings(max_examples=50, deadline=None)
@given(keys=keys_arrays, num_parts=st.integers(min_value=1, max_value=17))
def test_hash_part_is_a_partition(keys, num_parts):
    """Partitions are disjoint, cover the input exactly (multiset), and
    co-locate equal keys."""
    t = pa.table({"k": np.array(keys, dtype=np.int64),
                  "v": np.arange(len(keys), dtype=np.int64)})
    parts = exchange._hash_part(t, "k", num_parts)
    assert len(parts) == num_parts
    vs = np.concatenate(
        [p["v"].to_numpy(zero_copy_only=False) for p in parts]
    ) if keys else np.array([], dtype=np.int64)
    assert sorted(vs.tolist()) == sorted(range(len(keys)))
    seen = {}
    for i, p in enumerate(parts):
        for k in set(p["k"].to_pylist()):
            assert seen.setdefault(k, i) == i


@settings(max_examples=50, deadline=None)
@given(keys=keys_arrays, num_parts=st.integers(min_value=2, max_value=16))
def test_hash_part_outputs_pickle_compact(keys, num_parts):
    """Partition outputs must serialize at their true size, not their
    parent block's (the r4 write-amplification regression)."""
    import pickle

    n = len(keys)
    t = pa.table({"k": np.array(keys, dtype=np.int64),
                  "pay": np.arange(n, dtype=np.int64)})
    if n < 32:
        return
    parts = exchange._hash_part(t, "k", num_parts)
    whole = len(pickle.dumps(t))
    for p in parts:
        if 0 < p.num_rows < n // 2:
            assert len(pickle.dumps(p)) < whole * 0.9


@settings(max_examples=30, deadline=None)
@given(us=st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                   min_size=1, max_size=200))
def test_splitmix64_matches_duckdb(us):
    """The numpy kernel and the SQL CTE generator agree bit-for-bit on
    arbitrary inputs (the HLL / sampling oracle contract)."""
    import duckdb

    from s2_geometry_rust_ray.functions.hashing import sql_splitmix64_ctes

    u = np.array(us, dtype=np.uint64)
    hn = splitmix64(u)
    lst = ", ".join(str(int(x)) for x in us)
    q = sql_splitmix64_ctes(
        f"SELECT unnest([{lst}]) AS u", "u", "u"
    ) + " SELECT u, h FROM h"
    df = duckdb.sql(q).df()
    got = dict(zip(df["u"].astype(np.uint64), df["h"].astype(np.uint64)))
    for uu, hh in zip(u, hn):
        assert got[uu] == hh


@settings(max_examples=30, deadline=None)
@given(keys=st.lists(st.integers(min_value=-(2**31), max_value=2**31),
                     min_size=0, max_size=200),
       f1=st.integers(min_value=0, max_value=100),
       f2=st.integers(min_value=0, max_value=100))
def test_sample_by_hash_thresholds_nest(keys, f1, f2):
    """A smaller sampling fraction always selects a SUBSET of a larger
    one (threshold monotonicity) — resampling at higher frac only adds."""
    lo, hi = sorted([f1, f2])
    k = np.array(keys, dtype=np.int64)
    h = splitmix64(k)
    t_lo = np.uint64(((1 << 64) * lo) // 100) if lo < 100 else np.uint64(2**64 - 1)
    t_hi = np.uint64(((1 << 64) * hi) // 100) if hi < 100 else np.uint64(2**64 - 1)
    keep_lo = set(k[h < t_lo].tolist())
    keep_hi = set(k[h < t_hi].tolist())
    assert keep_lo <= keep_hi


@settings(max_examples=40, deadline=None)
@given(keys=st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                     min_size=1, max_size=400))
def test_key_hash_deterministic_and_string_parity(keys):
    """pip_shuffle._key_hash: stable across calls, defined for int64 AND
    string keys (the salted path's crash class), and spreads values
    (not constant) for non-trivial inputs."""
    from s2_geometry_rust_ray.pipelines.pip_shuffle import _key_hash

    k = np.array(keys, dtype=np.int64)
    h1, h2 = _key_hash(k), _key_hash(k)
    assert h1.dtype == np.uint64 and np.array_equal(h1, h2)
    s = np.array([f"k-{v}" for v in keys], dtype=object)
    sh1, sh2 = _key_hash(s), _key_hash(s)
    assert sh1.dtype == np.uint64 and np.array_equal(sh1, sh2)
    if len(set(keys)) > 50:  # enough distinct input to expect spread
        assert len(set(h1.tolist())) > 1
        assert len(set(sh1.tolist())) > 1


@settings(max_examples=40, deadline=None)
@given(counts=st.lists(st.integers(min_value=1, max_value=50),
                       min_size=1, max_size=40),
       top_n=st.integers(min_value=1, max_value=8))
def test_hot_key_histogram_partial_total_invariant(counts, top_n):
    """The with_total sentinel-row partial: per-block totals must sum to
    the exact row count regardless of truncation, and the sentinel can
    never collide with a real key (block-level invariant of
    exchange.hot_key_histogram, checked without a Ray session by
    replicating the partial's arithmetic)."""
    sentinel = -(1 << 63)
    keys = np.repeat(np.arange(len(counts), dtype=np.int64),
                     np.array(counts))
    uk, c = np.unique(keys, return_counts=True)
    if len(uk) > top_n:
        idx = np.argpartition(-c, top_n)[:top_n]
        uk, c = uk[idx], c[idx]
    uk2 = np.concatenate([uk, [sentinel]]).astype(np.int64)
    c2 = np.concatenate([c, [len(keys)]])
    assert sentinel not in set(uk.tolist())
    assert c2[-1] == sum(counts)  # the sentinel row carries the block total
    assert c2[-1] >= c2[:-1].max()  # sentinel survives any top-k cut
