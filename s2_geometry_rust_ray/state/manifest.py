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

    def record(self, shard_id: str, fingerprint: str, output_path: str, row_count: int):
        tmp = self._row_path(shard_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "shard_id": shard_id,
                    "fingerprint": fingerprint,
                    "kernel_version": KERNEL_VERSION,
                    "output_path": output_path,
                    "row_count": row_count,
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
        ds = pipeline_fn(ray.data.read_parquet(path))
        ds.write_parquet(tmp_path)
        n = sum(1 for _ in ())  # row count from written files (cheap stat)
        import pyarrow.parquet as pq

        n = sum(pq.read_metadata(os.path.join(tmp_path, f)).num_rows
                for f in os.listdir(tmp_path) if f.endswith(".parquet"))
        if os.path.exists(out_path):
            import shutil

            shutil.rmtree(out_path)
        os.replace(tmp_path, out_path)
        man.record(shard_id, fp, out_path, n)
        done += 1
    return man
