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

Codecs: ``ppm``/``bmp``/``png``/``jpeg`` are REAL pure-numpy/stdlib
decoders (PNG inflates IDAT and undoes all five scanline filters; JPEG is
a full baseline-sequential implementation — Huffman, dequant, IDCT,
4:2:0/4:2:2 upsampling, see operators/jpeg.py); ``pil``
decodes any Pillow-readable format when the library is installed and is
a guarded NotImplementedError otherwise (this container ships no image
libs — the gate fails the CALL on the driver, never an executor task).
``header`` parses a deterministic fake header (magic + width + height +
channels packed big-endian) for plumbing tests.
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
    """Header-only PPM parse for metadata paths. Delegates to the full
    decoder — its 'pixel' array is a zero-copy numpy view over the bytes
    already in memory, so sharing ONE validation path costs nothing and
    the two can't drift (r12 review)."""
    return _parse_ppm(b)[:3]


def _bmp_header(b: bytes) -> tuple[int, int, int]:
    """Header-only BMP parse for metadata paths (delegates; see
    _ppm_header)."""
    return _parse_bmp(b)[:3]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _png_chunks(b: bytes):
    pos = 8
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        typ = b[pos + 4 : pos + 8]
        yield typ, b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IEND":
            return


def _png_header(b: bytes) -> tuple[int, int, int]:
    """Header-only PNG parse (IHDR; no decompression). Supports 8-bit
    non-interlaced grayscale / RGB / gray+alpha / RGBA."""
    if b is None or len(b) < 33 or bytes(b[:8]) != _PNG_SIG:
        return (-1, -1, -1)
    b = bytes(b)
    for typ, data in _png_chunks(b):
        if typ != b"IHDR" or len(data) != 13:
            return (-1, -1, -1)  # IHDR must be the first chunk
        w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
        if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
            return (-1, -1, -1)
        return (w, h, _PNG_CHANNELS[color])
    return (-1, -1, -1)


def _parse_png(b: bytes) -> tuple[int, int, int, np.ndarray | None]:
    """Pure-stdlib REAL PNG decode: zlib-inflate the IDAT stream, undo the
    per-scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6). 8-bit
    non-interlaced gray/RGB/gray+alpha/RGBA — the shapes a training-data
    pipeline's thumbnails use; anything else returns invalid rather than
    mis-decoding."""
    import zlib

    w, h, c = _png_header(b)
    if w < 0:
        return (-1, -1, -1, None)
    b = bytes(b)
    idat = b"".join(data for typ, data in _png_chunks(b) if typ == b"IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return (-1, -1, -1, None)
    stride = w * c
    if len(raw) < h * (stride + 1):
        return (-1, -1, -1, None)
    raw = np.frombuffer(raw, dtype=np.uint8)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(raw[y * (stride + 1)])
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorized (the common photographic filter)
            rec = (line + prev) & 0xFF
        elif f == 1:
            # Sub: rec[x] = line[x] + rec[x-c] (mod 256) is a per-channel
            # prefix sum — vectorized as a cumsum over the (w, c) view
            # (r12: replaces the per-byte Python loop)
            rec = (
                (np.cumsum(line.reshape(w, c), axis=0, dtype=np.int64) & 0xFF)
                .reshape(stride)
                .astype(np.int32)
            )
        elif f in (3, 4):  # Average / Paeth: left-neighbor dependence
            # through a nonlinear predictor — row-sequential by necessity,
            # but plain-int list arithmetic beats numpy scalar indexing ~4×
            # (r12). Still thumbnail-grade: route big scraped images to the
            # 'pil' codec when Pillow is available.
            rec_l = [0] * stride
            line_l = line.tolist()
            prev_l = prev.tolist()
            if f == 3:
                for x in range(stride):
                    a = rec_l[x - c] if x >= c else 0
                    rec_l[x] = (line_l[x] + ((a + prev_l[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = rec_l[x - c] if x >= c else 0
                    up = prev_l[x]
                    ul = prev_l[x - c] if x >= c else 0
                    p = a + up - ul
                    pa, pb_, pc_ = abs(p - a), abs(p - up), abs(p - ul)
                    pred = a if (pa <= pb_ and pa <= pc_) else (up if pb_ <= pc_ else ul)
                    rec_l[x] = (line_l[x] + pred) & 0xFF
            rec = np.asarray(rec_l, dtype=np.int32)
        else:
            return (-1, -1, -1, None)
        prev = rec
        out[y] = rec.astype(np.uint8)
    return (w, h, c, out.reshape(h, w, c))


def pack_png(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Minimal REAL PNG encoder (filter 0, single IDAT, correct CRCs): the
    fixture builder for the png decode path — its output opens in any PNG
    reader. ``payload`` bytes become the pixel stream (repeated/truncated
    to fit)."""
    import zlib

    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    need = width * height * channels
    px = (payload * (need // max(len(payload), 1) + 1))[:need] if payload else b"\x00" * need
    stride = width * channels
    raw = b"".join(
        b"\x00" + px[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _require_pil(codec: str) -> None:
    """Driver-side availability gate: a missing library must fail the CALL,
    not a Spark task deep inside an executor."""
    if codec == "pil" and not _pil_available():
        raise NotImplementedError(
            "codec 'pil' requires Pillow, which is not installed in this"
            " environment; built-in codecs: header, ppm, bmp, png"
        )


def _parse_pil(b: bytes) -> tuple[int, int, int, np.ndarray | None]:
    """Pillow-backed decode (any format Pillow reads) — active only when
    the library is importable (guarded; _require_pil gates the API)."""
    import io

    from PIL import Image

    if b is None:
        return (-1, -1, -1, None)
    try:
        img = Image.open(io.BytesIO(bytes(b)))
        arr = np.asarray(img)
    except Exception:
        return (-1, -1, -1, None)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return (int(img.width), int(img.height), int(arr.shape[2]), arr)


def _pil_header(b: bytes) -> tuple[int, int, int]:
    """Pillow header read — Image.open is lazy, so no pixel decode."""
    import io

    from PIL import Image

    if b is None:
        return (-1, -1, -1)
    try:
        img = Image.open(io.BytesIO(bytes(b)))
    except Exception:
        return (-1, -1, -1)
    return (int(img.width), int(img.height), len(img.getbands()))


def _parse_jpeg(b):
    from lance_spark.operators.jpeg import parse_jpeg

    return parse_jpeg(b)


def _jpeg_header(b):
    from lance_spark.operators.jpeg import jpeg_header

    return jpeg_header(b)


_CODECS = {
    "ppm": _parse_ppm, "bmp": _parse_bmp, "png": _parse_png,
    "jpeg": _parse_jpeg, "pil": _parse_pil,
}
_HEADER_CODECS = {
    "ppm": _ppm_header,
    "bmp": _bmp_header,
    "png": _png_header,
    "jpeg": _jpeg_header,
    "pil": _pil_header,
}


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
    16-byte header; 'ppm'/'bmp'/'png' are real pure-numpy/stdlib decoders;
    'pil' decodes any Pillow-readable format when the library is installed
    (guarded — a missing library fails the call, not an executor task)."""
    _require_pil(codec)
    if codec != "header" and codec not in _CODECS:
        raise NotImplementedError(
            f"codec {codec!r} requires an image library not present in this "
            "environment; built-in codecs: header, ppm, bmp, png, jpeg, pil"
        )

    if "meta" in df.columns:
        raise ValueError(
            "decode_image_meta appends a 'meta' column; the input already"
            " has one — rename it first"
        )
    out_schema = (
        ", ".join(f"`{c.name}` {c.dataType.simpleString()}" for c in df.schema)
        + f", meta struct<{IMG_META_SCHEMA}>"
    )

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
    _require_pil(codec)
    if codec not in _CODECS:
        raise NotImplementedError(
            f"unknown codec {codec!r}; built-in: ppm, bmp, png, pil"
        )
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

    id_t = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(
        stats,
        schema=(
            f"`{id_col}` {id_t}, width int, height int, channels int, "
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

    id_t = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(extract, schema=f"`{id_col}` {id_t}, feature array<float>")


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
                if b[:4] != FAKE_MAGIC:
                    # a REAL image (PPM/BMP/PNG/...) must pass through, not
                    # get its first 16 bytes stomped with a fake header —
                    # real resize = decode→scale→encode (r12 review fix)
                    out.append(b)
                    continue
                _, _, c = _parse_header(b)
                out.append(FAKE_MAGIC + struct.pack(">III", width, height, max(c, 0)) + b[16:])
            pdf = pdf.copy()
            pdf[binary_col] = out
            yield pdf

    return df.mapInPandas(resize, schema=df.schema)


def sample_frames(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_n: int = 2,
    frame_size: int = 64,
    codec: str = "fake",
) -> DataFrame:
    """Video frame sampling: one row in → k frame rows out (explode-shaped
    mapInPandas). Returns (id_col, frame_idx, frame binary).

    ``codec='mjpeg'`` (r12): REAL container path — the payload is a RIFF
    AVI holding Motion-JPEG frames; the AVI is chunk-walked
    (operators/jpeg.py parse_avi_frames) and every ``every_n``-th frame's
    complete baseline-JPEG bytes are emitted (decode them with
    decode_image_stats(codec='jpeg')). ``codec='fake'`` keeps the
    plumbing-test behavior: payload chunks stand in for frames."""
    if codec not in ("fake", "mjpeg"):
        raise ValueError(f"sample_frames codec must be 'fake' or 'mjpeg', got {codec!r}")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lance_spark.operators.jpeg import parse_avi_frames

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                if b is None:
                    continue
                if codec == "mjpeg":
                    _w, _h, n, fr = parse_avi_frames(bytes(b))
                    for fi in range(0, n, every_n):
                        ids.append(i)
                        idxs.append(fi)
                        frames.append(fr[fi])
                    continue
                payload = bytes(b)[16:]
                n_frames = max(len(payload) // frame_size, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(payload[fi * frame_size : (fi + 1) * frame_size])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    id_t = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(
        sample, schema=f"`{id_col}` {id_t}, frame_idx int, frame binary"
    )


# ---------------------------------------------------------------- audio

def pack_wav(sample_rate: int, channels: int, samples: np.ndarray) -> bytes:
    """Minimal REAL RIFF/WAVE encoder (PCM 16-bit little-endian): the
    fixture builder for the wav decode path — output opens in any audio
    tool. ``samples``: int16 array, shape (n_frames,) mono or
    (n_frames, channels)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.shape[1] != channels:
        raise ValueError(f"samples have {s.shape[1]} channels, declared {channels}")
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    out = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return out


def parse_wav(b: bytes) -> tuple[int, int, int, int, np.ndarray | None]:
    """Pure-stdlib RIFF/WAVE decode (PCM 8/16-bit, any channel count):
    → (sample_rate, channels, bits, n_frames, samples int32 array of shape
    (n_frames, channels)) or (-1, -1, -1, -1, None) for non-PCM/invalid.
    Chunk-walks the RIFF container, so extra chunks (LIST/fact/cue) are
    skipped like any compliant reader."""
    invalid = (-1, -1, -1, -1, None)
    if b is None or len(b) < 44:
        return invalid
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return invalid
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + ln]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return invalid
    audio_fmt, channels, rate, _br, _ba, bits = fmt
    if audio_fmt != 1 or channels < 1 or bits not in (8, 16):
        return invalid  # non-PCM (float/ADPCM/mp3-in-wav) → invalid
    width = bits // 8
    n_frames = len(data) // (width * channels)
    if n_frames == 0:
        return (rate, channels, bits, 0, np.zeros((0, channels), dtype=np.int32))
    raw = data[: n_frames * width * channels]
    if bits == 16:
        s = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    else:  # 8-bit WAV is UNSIGNED, centered at 128
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    return (rate, channels, bits, n_frames, s.reshape(n_frames, channels))


def decode_audio_stats(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """REAL audio decode over a binary column (Arrow-batched mapInPandas,
    bytes never shuffle): → (id, sample_rate, channels, n_frames,
    duration_ms, abs_sum). ``abs_sum`` (Σ|sample|, integer-exact) is the
    oracle-safe loudness proxy; duration_ms = n_frames·1000/rate floored.
    Invalid/non-PCM bytes yield -1 rows, never a task failure."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, chs, frames, durs, sums = [], [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                rate, ch, _bits, nf, s = parse_wav(b)
                ids.append(i)
                rates.append(rate)
                chs.append(ch)
                frames.append(nf)
                durs.append(nf * 1000 // rate if rate > 0 else -1)
                sums.append(int(np.abs(s).sum()) if s is not None else -1)
            yield pd.DataFrame(
                {id_col: ids, "sample_rate": rates, "channels": chs,
                 "n_frames": frames, "duration_ms": durs, "abs_sum": sums}
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(
        stats,
        schema=(
            f"`{id_col}` {id_t}, sample_rate int, channels int,"
            " n_frames int, duration_ms int, abs_sum bigint"
        ),
    )
