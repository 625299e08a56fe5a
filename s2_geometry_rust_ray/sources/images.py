"""Synthetic geotagged image+caption table — the BASELINE.json input_hint
schema: (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64, lat:float64, lng:float64).

Generated deterministically from the row index (seeded, no external data):
pixels from a per-row PRNG, encoded as real PNGs with a from-scratch stdlib
codec (no image libraries exist in this container — PNG encode/decode is
zlib + filter-0 scanlines; JPEG support is stubbed, see stages/multimodal).

Per-row invariants the engine must preserve through every pipeline
(BASELINE.md): `caption` byte-exact, decoded pixels PSNR >= 40 dB (exact
for PNG).  Geometry stages guarantee this trivially by never touching the
payload columns (column pruning at the read); check_invariants() verifies.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import geo

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (8-bit RGB, filter 0)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + row.tobytes() for row in pixels)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Supports the subset this engine
    writes (8-bit RGB, filter 0); raises on anything else."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        if line[0] != 0:
            raise NotImplementedError("only filter-0 scanlines supported")
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)


def _pixels_for_row(i: int, w: int = 8, h: int = 8) -> np.ndarray:
    rng = np.random.default_rng(42_000_000 + i)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _phash(pixels: np.ndarray) -> int:
    """64-bit average-hash of the gray image (deterministic, library-free)."""
    gray = pixels.astype(np.int64).sum(axis=2)
    bits = (gray >= np.median(gray)).ravel()[:64]
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return np.int64(np.uint64(v).astype(np.int64))


_WORDS = (
    "sunset harbor mountain forest city street market river temple bridge "
    "desert island garden castle meadow lighthouse canyon glacier plaza dock"
).split()


def caption_for_row(i: int) -> str:
    w1 = _WORDS[i % len(_WORDS)]
    w2 = _WORDS[(i * 7 + 3) % len(_WORDS)]
    return f"caption for img{i:012d} {w1} {w2}"


def generate_images_table(n_rows: int, start: int = 0, dup_frac: float = 0.01) -> pa.Table:
    """Deterministic batch [start, start+n); ~dup_frac rows duplicate the
    pixels of row (i - 7) to create known dedup fixtures."""
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in range(start, start + n_rows):
        dup = (i * 2654435761) % 100 < int(dup_frac * 100) and i >= 7
        px = _pixels_for_row(i - 7 if dup else i)
        ids.append(f"img{i:012d}")
        blobs.append(encode_png(px))
        ws.append(8)
        hs.append(8)
        fmts.append("png")
        caps.append(caption_for_row(i))
        phs.append(_phash(px))
    lat, lng = geo.derive_latlng(np.arange(start, start + n_rows))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
            "lat": pa.array(lat),
            "lng": pa.array(lng),
        }
    )


def write_images_dataset(path: str, n_rows: int, rows_per_file: int = 50_000):
    """Partitioned parquet layout (one file per row range => resumable)."""
    import os

    os.makedirs(path, exist_ok=True)
    for start in range(0, n_rows, rows_per_file):
        fn = f"{path}/part-{start:010d}.parquet"
        if os.path.exists(fn):
            continue  # resume: skip finished partitions
        pq.write_table(generate_images_table(min(rows_per_file, n_rows - start), start), fn)
    return path


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def check_invariants(batch: pa.Table) -> pa.Table:
    """Verification stage: decode `bytes`, PSNR >= 40 dB vs the deterministic
    source pixels; `caption` byte-exact.  Returns (image_id, psnr_ok,
    caption_ok) — meant for test/audit pipelines, not the hot path."""
    out_id, out_p, out_c = [], [], []
    for iid, blob, cap, fmt in zip(
        batch["image_id"].to_pylist(),
        batch["bytes"].to_pylist(),
        batch["caption"].to_pylist(),
        batch["fmt"].to_pylist(),
    ):
        i = int(iid[3:])
        if fmt == "png":
            dec = decode_png(blob)
            dup = (i * 2654435761) % 100 < 1 and i >= 7
            src = _pixels_for_row(i - 7 if dup else i)
            p = psnr(dec, src)
        else:  # lossy path: no codec in this container (see multimodal stub)
            p = float("nan")
        out_id.append(iid)
        out_p.append(bool(p >= 40.0))
        out_c.append(cap == caption_for_row(i))
    return pa.table(
        {"image_id": pa.array(out_id), "psnr_ok": pa.array(out_p),
         "caption_ok": pa.array(out_c)}
    )
