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

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"IMG0"
IMG_META_SCHEMA = "width int, height int, channels int, format string"


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
    """binary → typed metadata struct. Real-decoder seam: codec='pil' is the
    NotImplementedError stub; codec='header' parses the fake header."""
    if codec != "header":
        raise NotImplementedError(
            f"codec {codec!r} requires an image library not present in this "
            "environment; plug it into _parse_header's position"
        )

    out_schema = f"{', '.join(f'{c.name} {c.dataType.simpleString()}' for c in df.schema)}, meta struct<{IMG_META_SCHEMA}>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdr = [_parse_header(b) for b in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["meta"] = [
                {"width": w, "height": h, "channels": c,
                 "format": "fake" if w >= 0 else "invalid"}
                for (w, h, c) in hdr
            ]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


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
