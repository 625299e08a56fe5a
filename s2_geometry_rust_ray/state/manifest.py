"""Per-partition lineage manifests — resumable, deterministic output
(north_rule: "resumable from checkpoint with per-partition lineage").

Unit of work = one input shard (parquet file / fragment group).  For each
shard the manifest records (shard_id, input_fingerprint, kernel_version,
row_count, output_path).  A rerun skips shards whose manifest row exists
AND whose fingerprint + kernel version still match — so resumed output is
byte-identical to a single run (kernels are deterministic: no RNG, no
wall-clock).

The manifest itself is a directory of tiny per-shard JSON files (atomic
rename), readable as a Dataset for audit.
"""

from __future__ import annotations

import hashlib
import json
import os


KERNEL_VERSION = "1"  # bump when kernel semantics change => full recompute


def shard_fingerprint(path: str) -> str:
    st = os.stat(path)
    return hashlib.md5(
        f"{os.path.basename(path)}|{st.st_size}".encode()
    ).hexdigest()[:16]


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _row_path(self, shard_id: str) -> str:
        return os.path.join(self.dir, f"{shard_id}.json")

    def done(self, shard_id: str, fingerprint: str) -> bool:
        p = self._row_path(shard_id)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            row = json.load(f)
        return (
            row.get("fingerprint") == fingerprint
            and row.get("kernel_version") == KERNEL_VERSION
            and os.path.exists(row.get("output_path", ""))
        )

    def record(self, shard_id: str, fingerprint: str, output_path: str,
               row_count: int, **metrics):
        """Write the shard's manifest row atomically.  Extra keyword args
        (wall_s, rows_per_sec, ...) land in the row as per-shard METRICS —
        the north_rule's "per-partition lineage + metrics" in one record."""
        tmp = self._row_path(shard_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "shard_id": shard_id,
                    "fingerprint": fingerprint,
                    "kernel_version": KERNEL_VERSION,
                    "output_path": output_path,
                    "row_count": row_count,
                    **metrics,
                },
                f,
            )
        os.replace(tmp, self._row_path(shard_id))  # atomic

    def rows(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.dir, fn)) as f:
                    out.append(json.load(f))
        return out

    def metrics(self) -> dict:
        """Job-level rollup of the per-shard metrics: shard count, total
        rows, total wall seconds, aggregate rows/s.  rows_per_sec divides
        only over METERED shards (rows that carry wall_s) — a manifest
        mixing pre-metrics rows with new ones must not overstate the rate."""
        rows = self.rows()
        metered = [r for r in rows if "wall_s" in r]
        total_rows = sum(r.get("row_count", 0) for r in rows)
        metered_rows = sum(r.get("row_count", 0) for r in metered)
        total_wall = sum(r["wall_s"] for r in metered)
        return {
            "shards": len(rows),
            "rows": total_rows,
            "unmetered_shards": len(rows) - len(metered),
            "wall_s": round(total_wall, 3),
            "rows_per_sec": round(metered_rows / total_wall) if total_wall else None,
        }

    def to_table(self):
        """Manifest as an Arrow table (one row per shard) — readable as a
        Dataset for distributed audit of a huge manifest."""
        import pyarrow as pa

        rows = self.rows()
        if not rows:
            return pa.table({"shard_id": pa.array([], pa.string())})
        keys = sorted({k for r in rows for k in r})
        return pa.table({k: [r.get(k) for r in rows] for k in keys})


def resumable_shard_write(
    input_files: list[str],
    out_dir: str,
    pipeline_fn,
    max_shards: int | None = None,
):
    """Run `pipeline_fn(Dataset) -> Dataset` over each input shard, writing
    out_dir/<shard_id>/ atomically (temp dir + rename) and recording a
    manifest row.  Reruns skip finished shards; `max_shards` simulates an
    interrupted run for tests.

    At cluster scale the per-shard Dataset jobs still fan out across the
    whole cluster (a shard is a large fragment group, not a file per task);
    shards are the RESUME granularity, not the parallelism granularity.
    """
    import ray.data

    man = Manifest(out_dir)
    done = 0
    for path in sorted(input_files):
        shard_id = os.path.splitext(os.path.basename(path))[0]
        fp = shard_fingerprint(path)
        if man.done(shard_id, fp):
            continue
        if max_shards is not None and done >= max_shards:
            break
        out_path = os.path.join(out_dir, shard_id)
        tmp_path = out_path + ".tmp"
        if os.path.exists(tmp_path):
            import shutil

            shutil.rmtree(tmp_path)
        import time

        t0 = time.perf_counter()
        ds = pipeline_fn(ray.data.read_parquet(path))
        ds.write_parquet(tmp_path)
        wall = time.perf_counter() - t0
        import pyarrow.parquet as pq

        n = sum(pq.read_metadata(os.path.join(tmp_path, f)).num_rows
                for f in os.listdir(tmp_path) if f.endswith(".parquet"))
        if os.path.exists(out_path):
            import shutil

            shutil.rmtree(out_path)
        os.replace(tmp_path, out_path)
        man.record(
            shard_id, fp, out_path, n,
            wall_s=round(wall, 4),
            rows_per_sec=round(n / wall) if wall > 0 else None,
        )
        done += 1
    return man
