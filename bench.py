"""Benchmark harness — prints ONE JSON line with per-query seconds.

Usage:
    python bench.py              # $GRAFT_SF_DIR (default sf0.1), $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # same job at num_cpus=8 and 32 in fresh
                                 # processes; reports throughputs + efficiency

The headline pipeline is the north-star workload: derive geotags -> leaf S2
cell encode -> tile assignment (groupby parent cell with map-side combine).
The input is expanded deterministically (EXPAND sub-keys per lineitem row) so
single-node timings exercise multi-block parallelism (~10M points at sf0.1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("GRAFT_EXPAND", "16"))


def expanded_points(sf_dir: str, expand: int):
    """lineitem keys x EXPAND deterministic sub-keys -> Dataset of int64 `k`."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    nblocks = int(os.environ.get("RAY_GRAFT_CPUS", "32")) * 2
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber"],
        override_num_blocks=nblocks,
    )

    def explode(batch: pa.Table) -> pa.Table:
        base = (
            batch["l_orderkey"].to_numpy(zero_copy_only=False) * 8
            + batch["l_linenumber"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        k = (base[:, None] * expand + np.arange(expand, dtype=np.int64)[None, :]).ravel()
        return pa.table({"k": k})

    return ds.map_batches(explode, batch_format="pyarrow")


def run_benchmarks() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from s2_geometry_rust_ray.pipelines import tiling

    queries = {}

    # warm the page cache (untimed)
    expanded_points(SF_DIR, 1).count()

    n_points = None

    t0 = time.perf_counter()
    ds = expanded_points(SF_DIR, EXPAND)
    tiles = tiling.tile_counts(ds, "k", level=8)
    total = tiles.to_pandas()["n"].sum()
    queries["encode_tile_l8"] = time.perf_counter() - t0
    n_points = int(total)

    t0 = time.perf_counter()
    ds = expanded_points(SF_DIR, EXPAND)
    tiling.tile_counts(ds, "k", level=12, final="sorted").count()
    queries["encode_tile_l12"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ds = expanded_points(SF_DIR, EXPAND)
    tiling.face_histogram(ds, "k").count()
    queries["face_histogram"] = time.perf_counter() - t0

    from s2_geometry_rust_ray.pipelines import knn as pknn
    from s2_geometry_rust_ray.pipelines import pip as ppip

    t0 = time.perf_counter()
    ds = expanded_points(SF_DIR, EXPAND)
    ppip.pip_join(ds, "k", concurrency=(1, max(2, NUM_CPUS // 2))).count()
    queries["pip_join"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ds = expanded_points(SF_DIR, EXPAND)
    pknn.knn_brute(ds, "k", k=10, n_queries=50,
                   concurrency=(1, max(2, NUM_CPUS // 2))).count()
    queries["knn_brute"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ds = expanded_points(SF_DIR, EXPAND)
    pknn.knn_cell(ds, "k", k=10, n_queries=50, n_estimate=n_points,
                  concurrency=(1, max(2, NUM_CPUS // 2))).count()
    queries["knn_cell"] = time.perf_counter() - t0

    from s2_geometry_rust_ray.pipelines import tiling as ptiling

    t0 = time.perf_counter()
    ds = expanded_points(SF_DIR, EXPAND)
    ptiling.h3_tile_counts(ds, "k", res=6).count()
    queries["h3_tile_r6"] = time.perf_counter() - t0

    headline = queries["encode_tile_l8"]
    result = {
        "metric": "s2_encode_tile_headline",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_points": n_points,
        "rows_per_sec": round(n_points / headline) if n_points else None,
    }
    return result


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (sandbox stand-in
    for N vs 4N nodes; see BASELINE.md)."""
    out = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
    thr8 = out[8]["rows_per_sec"]
    thr32 = out[32]["rows_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "rows_per_sec_8": thr8,
        "rows_per_sec_32": thr32,
        "sec_8": out[8]["value"],
        "sec_32": out[32]["value"],
        "n_points": out[32]["n_points"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
    import ray

    if ray.is_initialized():
        ray.shutdown()
