"""Multimodal column operators: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched mapInPandas.

The reference stores large media as blob columns (out-of-line binary,
rust/lance-core/src/datatypes.rs:29-75) and leaves decode to the client
(python/python/lance/blob.py BlobFile). At 100 TB the pipeline shape is
what matters, and it IS implemented here for real:
  - binary column in its own column group (write.py blob_columns) so scans
    never drag media bytes through a shuffle;
  - decode/feature/resize/frame-sample as mapInPandas over Arrow batches —
    bytes stay in Arrow buffers, one Python hop, no per-row overhead;
  - processing partitions by fragment (input files), so media locality
    follows storage locality.

The codec call itself is STUBBED: this container has no image/audio libs.
``decode_image(..., codec="pil")`` raises NotImplementedError where
Pillow would be invoked; ``codec="header"`` parses a deterministic fake
header (magic + width + height + channels packed big-endian) so the full
Spark path — schema, batching, partitioning, UDF signatures — is testable
and oracle-checkable. Swapping in a real codec changes ONE function.
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"IMG0"
IMG_META_SCHEMA = "width int, height int, channels int, format string"

_PPM_HEADER = re.compile(rb"^P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s")


def _parse_ppm(b: bytes) -> tuple[int, int, int, np.ndarray | None]:
    """Pure-numpy binary PPM (P6) decode: header + H*W*3 uint8 pixels.
    Returns (width, height, channels, pixel array) or (-1,-1,-1,None)."""
    if b is None:
        return (-1, -1, -1, None)
    b = bytes(b)
    m = _PPM_HEADER.match(b)
    if not m:
        return (-1, -1, -1, None)
    w, h, maxval = (int(m.group(i)) for i in (1, 2, 3))
    if maxval > 255:  # 16-bit-per-sample PPM not supported
        return (-1, -1, -1, None)
    payload = np.frombuffer(b, dtype=np.uint8, offset=m.end())
    if payload.size < w * h * 3:
        return (-1, -1, -1, None)
    return (w, h, 3, payload[: w * h * 3].reshape(h, w, 3))


def _parse_bmp(b: bytes) -> tuple[int, int, int, np.ndarray | None]:
    """Pure-numpy uncompressed 24-bit BMP (BITMAPINFOHEADER) decode.
    Rows are bottom-up and padded to 4-byte boundaries; pixels are BGR —
    returned flipped to top-down RGB."""
    if b is None or len(b) < 54 or bytes(b[:2]) != b"BM":
        return (-1, -1, -1, None)
    b = bytes(b)
    data_offset = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return (-1, -1, -1, None)
    top_down = h < 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3
    if len(b) < data_offset + row_stride * h:
        return (-1, -1, -1, None)
    rows = np.frombuffer(
        b, dtype=np.uint8, count=row_stride * h, offset=data_offset
    ).reshape(h, row_stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return (w, h, 3, rows[..., ::-1])  # BGR → RGB


def _ppm_header(b: bytes) -> tuple[int, int, int]:
    """Header-only PPM parse (no pixel materialization) for metadata paths."""
    if b is None:
        return (-1, -1, -1)
    b = bytes(b)
    m = _PPM_HEADER.match(b)
    if not m:
        return (-1, -1, -1)
    w, h, maxval = (int(m.group(i)) for i in (1, 2, 3))
    if maxval > 255 or len(b) - m.end() < w * h * 3:
        return (-1, -1, -1)
    return (w, h, 3)


def _bmp_header(b: bytes) -> tuple[int, int, int]:
    """Header-only BMP parse (no pixel materialization) for metadata paths."""
    if b is None or len(b) < 54 or bytes(b[:2]) != b"BM":
        return (-1, -1, -1)
    b = bytes(b)
    data_offset = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return (-1, -1, -1)
    if len(b) < data_offset + ((w * 3 + 3) & ~3) * abs(h):
        return (-1, -1, -1)
    return (w, abs(h), 3)


_CODECS = {"ppm": _parse_ppm, "bmp": _parse_bmp}
_HEADER_CODECS = {"ppm": _ppm_header, "bmp": _bmp_header}


def pack_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic fake 'encoded image': header + seeded payload bytes."""
    payload_len = min(width * height * channels, 4096)
    rng = np.random.default_rng(seed)
    return (
        FAKE_MAGIC
        + struct.pack(">III", width, height, channels)
        + rng.integers(0, 256, payload_len, dtype=np.uint8).tobytes()
    )


def _parse_header(b: bytes) -> tuple[int, int, int]:
    if b is None or len(b) < 16 or b[:4] != FAKE_MAGIC:
        return (-1, -1, -1)
    return struct.unpack(">III", b[4:16])


def decode_image_meta(df: DataFrame, binary_col: str, codec: str = "header") -> DataFrame:
    """binary → typed metadata struct. codec='header' parses the fake
    16-byte header; codec='ppm'/'bmp' are real pure-numpy decoders
    (_parse_ppm/_parse_bmp); anything else (e.g. 'pil') is the
    NotImplementedError seam where an image library would plug in."""
    if codec != "header" and codec not in _CODECS:
        raise NotImplementedError(
            f"codec {codec!r} requires an image library not present in this "
            "environment; built-in codecs: header, ppm, bmp"
        )

    out_schema = f"{', '.join(f'{c.name} {c.dataType.simpleString()}' for c in df.schema)}, meta struct<{IMG_META_SCHEMA}>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "header":
                hdr = [_parse_header(b) for b in pdf[binary_col]]
            else:
                # metadata-only: header parse, no pixel materialization
                hdr = [_HEADER_CODECS[codec](b) for b in pdf[binary_col]]
            pdf = pdf.copy()
            fmt = "fake" if codec == "header" else codec
            pdf["meta"] = [
                {"width": w, "height": h, "channels": c,
                 "format": fmt if w >= 0 else "invalid"}
                for (w, h, c) in hdr
            ]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def decode_image_stats(
    df: DataFrame, binary_col: str, id_col: str, codec: str = "ppm"
) -> DataFrame:
    """Real decode: binary → (id, width, height, channels, mean_px) where
    mean_px is the mean of the DECODED pixel array (computed from the actual
    bytes, not the header). Arrow-batched mapInPandas; bytes never leave the
    executor. Reference surface: python/python/lance/blob.py BlobFile decode
    client-side; here decode is pushed into the scan pipeline."""
    if codec not in _CODECS:
        raise NotImplementedError(f"unknown codec {codec!r}; built-in: ppm, bmp")
    parse = _CODECS[codec]

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, sums, means = [], [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                w, h, c, px = parse(b)
                ids.append(i)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                # px_sum is integer-exact (oracle-safe); mean_px is derived
                sums.append(int(px.sum()) if px is not None else None)
                means.append(round(float(px.mean()), 4) if px is not None else None)
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "channels": cs,
                 "px_sum": sums, "mean_px": means}
            )

    return df.mapInPandas(
        stats,
        schema=(
            f"{id_col} long, width int, height int, channels int, "
            "px_sum bigint, mean_px double"
        ),
    )


def image_features(df: DataFrame, binary_col: str, id_col: str, dim: int = 8) -> DataFrame:
    """Feature-extraction plumbing: binary → fixed-dim float vector.
    The 'model' is a deterministic byte-histogram projection (a real
    embedding model slots into the same mapInPandas body). Returns
    (id_col, feature array<float>)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[binary_col]:
                if b is None:
                    feats.append([0.0] * dim)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).astype(np.float32).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.mapInPandas(extract, schema=f"{id_col} long, feature array<float>")


def resize_images(df: DataFrame, binary_col: str, width: int, height: int) -> DataFrame:
    """Resize plumbing: rewrites the header dims, passes payload through
    (real resize = decode→scale→encode in the same batch loop)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[binary_col]:
                if b is None or len(b) < 16:
                    out.append(b)
                    continue
                b = bytes(b)
                _, _, c = _parse_header(b)
                out.append(FAKE_MAGIC + struct.pack(">III", width, height, max(c, 0)) + b[16:])
            pdf = pdf.copy()
            pdf[binary_col] = out
            yield pdf

    return df.mapInPandas(resize, schema=df.schema)


def sample_frames(df: DataFrame, binary_col: str, id_col: str, every_n: int = 2, frame_size: int = 64) -> DataFrame:
    """Video frame-sampling plumbing: one row in → k frame rows out
    (explode-shaped mapInPandas; payload chunks stand in for decoded
    frames). Returns (id_col, frame_idx, frame binary)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                if b is None:
                    continue
                payload = bytes(b)[16:]
                n_frames = max(len(payload) // frame_size, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(payload[fi * frame_size : (fi + 1) * frame_size])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(sample, schema=f"{id_col} long, frame_idx int, frame binary")
