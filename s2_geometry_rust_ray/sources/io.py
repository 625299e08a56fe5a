"""Source readers — Lance-first per input_hint, parquet fallback.

The input_hint names a Lance table; this container has no lance library, so
the reader is gated behind an import-try and falls back to the partitioned
parquet layout (sources/images.py).  At deploy time `pip install pylance`
switches the fast path on with no pipeline changes (Lance fragments map to
Ray blocks the same way parquet row groups do)."""

from __future__ import annotations


def read_images(path: str, columns=None, **kwargs):
    import ray.data

    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path, columns=columns, **kwargs)
    except ImportError:
        return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_images(ds, path: str, **kwargs):
    try:
        import lance  # noqa: F401

        return ds.write_lance(path, **kwargs)
    except ImportError:
        return ds.write_parquet(path, **kwargs)
