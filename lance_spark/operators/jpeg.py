"""Pure numpy/stdlib baseline JPEG codec (ITU-T T.81 sequential DCT).

The reference leaves image decode to the client (Arrow image extension
types + PIL, python/python/lance/arrow.py); this container ships no image
library, and JPEG is the format a scraped corpus actually contains — so
this module implements the baseline sequential process for real:

  - decoder ``parse_jpeg``: marker parse, DHT canonical Huffman tables,
    DQT, SOF0, entropy-decode (0xFF00 unstuffing, RSTn restarts),
    dequantize, de-zigzag, vectorized 8×8 IDCT (orthonormal DCT matrix),
    sampling-factor upsampling (4:4:4 / 4:2:2 / 4:2:0 by replication),
    YCbCr→RGB. Progressive / arithmetic / 12-bit JPEGs return invalid
    rather than mis-decoding.
  - encoder ``pack_jpeg``: the inverse pipeline with simple canonical
    Huffman tables emitted in DHT (any spec-compliant decoder reads the
    tables from the stream) and IJG-style quality scaling of the Annex-K
    quantization tables. quality=100 → all-ones tables, so a FLAT 8×8
    block (only a DC coefficient, integer-exact in the orthonormal DCT)
    roundtrips pixel-exactly — the property the value oracle pins.

Scale note: Huffman entropy coding is a sequential bit stream — the
per-symbol Python loop makes this codec thumbnail-grade (same tier as the
PNG path); route large scraped images to the ``pil`` codec when Pillow is
available. Everything around the entropy loop (IDCT, color transform,
upsampling) is vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance / chrominance quantization tables (in zigzag order
# they'd appear in a stream; stored here in natural row-major order).
_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# zigzag scan order: _ZIGZAG[k] = flat row-major index of the k-th
# zigzag-ordered coefficient
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix D: FDCT = D @ x @ D.T, IDCT = D.T @ X @ D."""
    d = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for j in range(8):
            d[u, j] = c * np.cos((2 * j + 1) * u * np.pi / 16)
    return d


_DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: q=50 → Annex K verbatim; q=100 → all ones."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (_QT_LUMA, _QT_CHROMA):
        tq = (t * scale + 50) // 100
        out.append(np.clip(tq, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------------- huffman

# simple canonical tables the ENCODER emits (decoder always reads tables
# from the DHT segments, so any baseline stream — Annex K included — still
# decodes): 12 DC categories at length 4 (last code 1011 < 1111), and the
# 162 AC symbols at length 8 (last code < 0xFF — all-ones stays unused for
# padding, as the spec's standard tables also guarantee).
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0] * 7 + [162] + [0] * 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the JPEG canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # pad with 1s
            b = self.acc & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n = 0
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over entropy-coded data.

    The stream is pre-scanned ONCE up front: 0xFF00 stuffing is stripped
    and the data split into per-restart-interval segments (any other
    marker ends the scan). The hot path then never inspects bytes for
    markers — ``bits(k)`` is one shift/mask, and ``peek16``/``skip`` back
    the LUT Huffman decode (r13: the per-bit Python loop made the codec
    thumbnail-only; this tier handles ~0.25 MP in seconds)."""

    def __init__(self, data: bytes, pos: int):
        segments: list[bytes] = []
        cur = bytearray()
        d = data
        n = len(d)
        i = pos
        while True:
            j = d.find(b"\xff", i)
            if j < 0 or j + 1 >= n:
                cur += d[i : n if j < 0 else j]
                break
            cur += d[i:j]
            nxt = d[j + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i = j + 2
            elif 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i = j + 2
            else:
                break  # real marker: scan is over
        segments.append(bytes(cur))
        self._segments = segments
        self._seg = 0
        self._buf = segments[0]
        self._pos = 0
        self.acc = 0
        self.n = 0

    def _ensure(self, k: int) -> bool:
        buf, p = self._buf, self._pos
        end = len(buf)
        acc, n = self.acc, self.n
        while n < k and p < end:
            acc = (acc << 8) | buf[p]
            p += 1
            n += 8
        self._pos, self.acc, self.n = p, acc, n
        return n >= k

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if not self._ensure(k):
            raise EOFError("jpeg entropy stream truncated")
        n = self.n - k
        v = (self.acc >> n) & ((1 << k) - 1)
        # mask consumed history off acc, or it grows into a multi-megabit
        # int and every shift turns O(stream length)
        self.acc &= (1 << n) - 1
        self.n = n
        return v

    def bit(self) -> int:
        return self.bits(1)

    def peek16(self) -> int:
        """Next 16 bits without consuming; zero-padded past segment end
        (a code that needs the padding is caught by the length check in
        ``_decode_huff``)."""
        if self._ensure(16):
            return (self.acc >> (self.n - 16)) & 0xFFFF
        return (self.acc << (16 - self.n)) & 0xFFFF

    def remaining_bits(self) -> int:
        return self.n + 8 * (len(self._buf) - self._pos)

    def skip(self, k: int) -> None:
        self.n -= k
        self.acc &= (1 << self.n) - 1  # see bits(): keep acc bounded

    def sync_restart(self) -> None:
        """Advance to the next restart segment and reset the bit buffer."""
        self._seg += 1
        if self._seg >= len(self._segments):
            raise EOFError("expected restart marker")
        self._buf = self._segments[self._seg]
        self._pos = 0
        self.acc = 0
        self.n = 0


def _huff_lut(table: dict[tuple[int, int], int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek lookup tables: luts[v] = (symbol, code length) for every
    16-bit window whose prefix is a code; length 0 = invalid prefix."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for (code, length), s in table.items():
        base = code << (16 - length)
        span = 1 << (16 - length)
        sym[base : base + span] = s
        ln[base : base + span] = length
    return sym, ln


def _decode_huff(reader: _BitReader, lut: tuple[np.ndarray, np.ndarray]) -> int:
    v = reader.peek16()
    length = int(lut[1][v])
    if length == 0:
        raise ValueError("invalid huffman code")
    if length > reader.remaining_bits():
        raise EOFError("jpeg entropy stream truncated")
    reader.skip(length)
    return int(lut[0][v])


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a ``size``-bit magnitude to its signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- encoder


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    m = np.array([
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ])
    out = px.astype(np.float64) @ m.T
    out[..., 1:] += 128.0
    return out


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y = px[..., 0]
    cb = px[..., 1] - 128.0
    cr = px[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _encode_block(
    bw: _BitWriter, coefs: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """Entropy-encode one quantized block (zigzag order); returns new DC."""
    zz = coefs.reshape(64)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size = int(diff).bit_length() if diff else 0
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        mag = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(mag, size)
    # AC: run-length of zeros + size
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = abs(v).bit_length()
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        mag = v if v > 0 else v + (1 << size) - 1
        bw.write(mag, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return dc


def _pad_edge(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Pad the first two axes up to (rows, cols) by edge replication —
    ONE implementation for the plane, chroma, and block-grid pads (three
    hand-rolled copies drifted-prone slice arithmetic before; r12)."""
    pad = [(0, rows - a.shape[0]), (0, cols - a.shape[1])]
    pad += [(0, 0)] * (a.ndim - 2)
    return np.pad(a, pad, mode="edge")


def _plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Level-shifted plane → quantized 8×8 coefficient blocks, edge-padded
    (replication keeps padded-block AC energy, and thus stream size, low).
    Returns (rows, cols, 8, 8)."""
    height, width = plane.shape
    bh = (height + 7) // 8
    bw_ = (width + 7) // 8
    padded = _pad_edge(plane, bh * 8, bw_ * 8)
    blocks = padded.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coefs = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    return np.round(coefs / qt).astype(np.int32).reshape(bh, bw_, 8, 8)


def pack_jpeg(
    width: int,
    height: int,
    pixels: np.ndarray | bytes,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Encode pixels (uint8, shape (h, w) grayscale or (h, w, 3) RGB, or
    raw bytes of those shapes) into a baseline sequential JPEG.
    ``subsampling``: '444' (default) or '420' (chroma averaged 2×2, the
    layout most scraped JPEGs use). The emitted stream carries its own
    DQT/DHT tables, so any spec-compliant decoder opens it."""
    px = np.frombuffer(pixels, dtype=np.uint8) if isinstance(pixels, (bytes, bytearray)) else np.asarray(pixels, dtype=np.uint8)
    if px.size == width * height:
        px = px.reshape(height, width)
        ncomp = 1
    elif px.size == width * height * 3:
        px = px.reshape(height, width, 3)
        ncomp = 3
    else:
        raise ValueError(
            f"pixel buffer of {px.size} bytes fits neither {width}x{height}"
            " grayscale nor RGB"
        )
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    sub = subsampling == "420" and ncomp == 3
    qt_l, qt_c = _quality_tables(quality)
    if ncomp == 1:
        planes = [px.astype(np.float64) - 128.0]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., i] - 128.0 for i in range(3)]
        if sub:
            for i in (1, 2):
                p = planes[i]
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                pad = _pad_edge(p, ph, pw)
                planes[i] = pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    qts = [qt_l] + [qt_c] * (ncomp - 1)
    factors = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * ncomp
    max_h = max(f[0] for f in factors[:ncomp])
    max_v = max(f[1] for f in factors[:ncomp])

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMBOLS)

    mcus_x = (width + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (height + 8 * max_v - 1) // (8 * max_v)
    grids = []
    for ci in range(ncomp):
        ch, cv = factors[ci]
        g = _plane_blocks(planes[ci], qts[ci])
        # pad the block grid to the MCU lattice (DC-only blocks at edges)
        need_r, need_c = mcus_y * cv, mcus_x * ch
        if g.shape[0] < need_r or g.shape[1] < need_c:
            # replicate edge blocks so padding stays cheap and valid
            g = _pad_edge(g, need_r, need_c)
        grids.append(g)

    bwriter = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                ch, cv = factors[ci]
                for by in range(cv):
                    for bx in range(ch):
                        preds[ci] = _encode_block(
                            bwriter,
                            grids[ci][my * cv + by, mx * ch + bx],
                            preds[ci], dc_codes, ac_codes,
                        )
    entropy = bwriter.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    for tid, qt in enumerate([qt_l] + ([qt_c] if ncomp == 3 else [])):
        z = qt.reshape(64)[_ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([tid]) + z)
    comp_spec = b"".join(
        bytes([cid + 1, factors[cid][0] << 4 | factors[cid][1], 0 if cid == 0 else 1])
        for cid in range(ncomp)
    )
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, ncomp) + comp_spec,
    )
    for cls, (bits, syms) in ((0, (_DC_BITS, _DC_SYMBOLS)), (1, (_AC_BITS, _AC_SYMBOLS))):
        payload = bytes([cls << 4 | 0]) + bytes(bits) + bytes(syms)
        out += seg(0xFFC4, payload)
    scan_spec = b"".join(bytes([cid + 1, 0x00]) for cid in range(ncomp))
    out += seg(0xFFDA, bytes([ncomp]) + scan_spec + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


def jpeg_header(b: bytes) -> tuple[int, int, int]:
    """Header-only parse → (width, height, channels); (-1,-1,-1) for
    non-baseline or invalid streams."""
    meta = _scan_markers(b)
    if meta is None:
        return (-1, -1, -1)
    _, _, sof, *_ = meta
    h, w, ncomp = sof[1], sof[2], len(sof[3])
    return (w, h, ncomp)


def _scan_markers(b: bytes):
    """Parse the marker stream up to SOS. Returns (qts, huffs, sof,
    restart_interval, sos_comps, entropy_start) or None."""
    try:
        return _scan_markers_inner(b)
    except (IndexError, ValueError, struct.error):
        return None  # truncated/corrupt marker segment → invalid, no crash


def _scan_markers_inner(b: bytes):
    if b is None or len(b) < 4:
        return None
    b = bytes(b)
    if b[:2] != b"\xff\xd8":
        return None
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        marker = b[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", b, pos + 2)
        payload = b[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                prec, tid = payload[p] >> 4, payload[p] & 0x0F
                if prec != 0:
                    return None  # 16-bit tables: not baseline
                z = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p + 1)
                qt = np.zeros(64, dtype=np.int32)
                qt[_ZIGZAG] = z
                qts[tid] = qt.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nsym = sum(bits)
                syms = list(payload[p + 17 : p + 17 + nsym])
                codes = _canonical_codes(bits, syms)
                huffs[(cls, tid)] = {(c, ln): s for s, (c, ln) in codes.items()}
                p += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline-decodable)
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                return None
            comps = []
            for i in range(nc):
                cid, samp, qtid = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, qtid))
            sof = (prec, h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scomps = [(payload[1 + 2 * i], payload[2 + 2 * i]) for i in range(ns)]
            if sof is None or not qts or not huffs:
                return None
            comps = sof[3]
            if any(not (1 <= c[1] <= 4 and 1 <= c[2] <= 4) for c in comps):
                return None  # zero/huge sampling factor: corrupt SOF (r12)
            if len(scomps) != len(comps):
                # spec-valid NON-interleaved multi-scan baseline: decoding
                # only the first scan would return valid-looking garbage —
                # invalid beats mis-decoding (the module contract; r12)
                return None
            return (qts, huffs, sof, restart, scomps, pos)
        elif marker == 0xD9:
            return None
    return None


def parse_jpeg(b: bytes) -> tuple[int, int, int, np.ndarray | None]:
    """Full baseline decode → (width, height, channels, uint8 pixels) or
    (-1, -1, -1, None) for invalid/unsupported streams."""
    meta = _scan_markers(b)
    if meta is None:
        return (-1, -1, -1, None)
    qts, huffs, (_, height, width, comps), restart, scomps, epos = meta
    try:
        max_h = max(c[1] for c in comps)
        max_v = max(c[2] for c in comps)
        if max_h > 2 or max_v > 2:
            return (-1, -1, -1, None)
        mcus_x = (width + 8 * max_h - 1) // (8 * max_h)
        mcus_y = (height + 8 * max_v - 1) // (8 * max_v)
        reader = _BitReader(bytes(b), epos)
        comp_by_id = {c[0]: c for c in comps}
        # per-component quantized coefficient storage
        store = {
            c[0]: np.zeros((mcus_y * c[2], mcus_x * c[1], 8, 8), dtype=np.int32)
            for c in comps
        }
        preds = {c[0]: 0 for c in comps}
        # t's high nibble = DC table id (Td), low nibble = AC table id (Ta);
        # one LUT per distinct table (shared tables build once)
        luts = {k: _huff_lut(t) for k, t in huffs.items()}
        tables = {cid: (luts[(0, t >> 4)], luts[(1, t & 0x0F)]) for cid, t in scomps}
        n_mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and n_mcu and n_mcu % restart == 0:
                    reader.sync_restart()
                    for k in preds:
                        preds[k] = 0
                n_mcu += 1
                for cid, _tsel in scomps:
                    _, ch, cv, _qtid = comp_by_id[cid]
                    dc_tbl, ac_tbl = tables[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            zz = np.zeros(64, dtype=np.int32)
                            s = _decode_huff(reader, dc_tbl)
                            diff = _extend(reader.bits(s), s) if s else 0
                            preds[cid] += diff
                            zz[0] = preds[cid]
                            k = 1
                            while k < 64:
                                rs = _decode_huff(reader, ac_tbl)
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0x0F
                                if k > 63:
                                    return (-1, -1, -1, None)
                                zz[k] = _extend(reader.bits(size), size)
                                k += 1
                            blk = np.zeros(64, dtype=np.int32)
                            blk[_ZIGZAG] = zz
                            store[cid][my * cv + by, mx * ch + bx] = blk.reshape(8, 8)
        planes = []
        for cid, ch, cv, qtid in comps:
            blocks = store[cid].reshape(-1, 8, 8).astype(np.float64)
            blocks *= qts[qtid]
            spatial = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT)
            rows, cols = mcus_y * cv, mcus_x * ch
            plane = (
                spatial.reshape(rows, cols, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(rows * 8, cols * 8)
            )
            # upsample to full resolution by replication
            plane = np.repeat(np.repeat(plane, max_v // cv, axis=0), max_h // ch, axis=1)
            planes.append(plane[:height, :width] + 128.0)
        if len(planes) == 1:
            px = planes[0]
        elif len(planes) == 3:
            px = _ycbcr_to_rgb(np.stack(planes, axis=-1))
        else:
            return (-1, -1, -1, None)
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        if px.ndim == 2:
            px = px[..., None]
        return (width, height, px.shape[-1], px)
    except (EOFError, ValueError, KeyError, IndexError, struct.error,
            ZeroDivisionError):
        return (-1, -1, -1, None)



# ------------------------------------------------------------ AVI / MJPEG

def pack_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Minimal REAL AVI container around Motion-JPEG frames (RIFF 'AVI '
    with hdrl/avih/strl/strh/strf, a movi list of 00dc chunks, and an
    idx1 index — the layout any AVI player/demuxer reads). The fixture
    builder for the video frame-sampling path; each frame is a complete
    baseline JPEG (pack_jpeg)."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(frames)
    max_size = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # usec per frame
        0, 0, 0x10,  # max bytes/sec, padding, flags (HASINDEX)
        n, 0, 1, max_size, width, height, 0, 0, 0, 0,
    )
    strh = (
        # AVISTREAMHEADER: fccType..dwSampleSize is exactly 48 bytes
        # (dwFlags, wPriority, wLanguage, dwInitialFrames, dwScale, dwRate,
        # dwStart, dwLength, dwSuggestedBufferSize, dwQuality, dwSampleSize)
        # + 8-byte rcFrame = 56; an extra DWORD here misaligned rcFrame for
        # strict VfW demuxers (r13 fix)
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, max(fps, 1),
                      0, n, max_size, 0, 0)
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    # BITMAPINFOHEADER with MJPG compression
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the movi list body
    idx_entries, off = [], 4  # 4 = the 'movi' kind tag
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_avi_frames(b: bytes) -> tuple[int, int, int, list[bytes]]:
    """Walk a RIFF/AVI container and return (width, height, n_frames,
    [frame bytes...]) for the first video stream's 00dc/00db chunks —
    (-1, -1, -1, []) for invalid/non-AVI input. Works on any AVI whose
    frames this codec can then decode (MJPG = baseline JPEGs)."""
    invalid = (-1, -1, -1, [])
    if b is None or len(b) < 12:
        return invalid
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return invalid
    width = height = -1
    frames: list[bytes] = []
    try:
        # declared size clamped to the buffer: a truncated download must
        # not slice partial 'frames' past the data we actually have (r12)
        end0 = min(12 + struct.unpack_from("<I", b, 4)[0] - 4, len(b))
    except struct.error:
        return invalid
    # iterative walk (explicit stack): crafted deeply-nested LISTs would
    # blow Python's recursion limit and crash the executor task (r12)
    stack = [(12, end0)]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", b, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + ln, end)
            if cid == b"LIST":
                next_pos = body_start + ln + (ln & 1)
                stack.append((next_pos, end))  # resume after the list
                pos, end = body_start + 4, body_end  # descend into it
                continue
            if cid == b"avih" and ln >= 40 and body_start + 40 <= len(b):
                width, height = struct.unpack_from("<II", b, body_start + 32)
            elif cid in (b"00dc", b"00db"):
                if body_start + ln > len(b):
                    return invalid  # truncated frame: reject, don't emit
                frames.append(b[body_start:body_end])
            pos = body_start + ln + (ln & 1)
    if width < 0 and not frames:
        return invalid
    return (width, height, len(frames), frames)
