"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman).

The compressed-image gap the round-10 verdict ranked first: a real
training-data pipeline's image payloads are overwhelmingly JPEG, and
this container has no libjpeg/Pillow. This module is a genuine codec,
not an arithmetic stub:

- ``decode_jpeg`` — marker parse (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/
  EOI), Huffman tables built FROM THE STREAM's DHT segments (spec
  behavior — the decoder carries no table constants), byte-unstuffed
  bit reader with RSTn restart handling, interleaved-MCU entropy
  decode (DC differential + AC run/size with ZRL/EOB), dequantize,
  inverse zigzag, orthonormal IDCT, chroma upsampling for subsampled
  scans (e.g. 4:2:0), YCbCr→RGB. Grayscale (1 component) and color
  (3 components, any hᵢ/vᵢ ≤ 2 sampling) supported. Rejected loudly:
  progressive (SOF2) and every non-baseline SOF, 12-bit precision,
  arithmetic coding, truncated/garbled streams.
- ``encode_jpeg`` — the matching writer (fixture generator): IJG
  quality-scaled Annex-K quantization tables, standard Annex-K Huffman
  tables emitted as real DHT segments, 4:4:4 or 4:2:0 (box-filter
  chroma downsample), 0xFF byte stuffing.

Self-consistency is NOT the only evidence (a shared zigzag/DCT bug
would round-trip): tests/test_multimodal.py pins the zigzag constant
to its spec-defining anti-diagonal property, the DCT matrix to
orthonormality, Huffman codes to canonical prefix-freeness, and flat
blocks to near-exact reconstruction; the driver-level oracle bounds
the decoded raster against the uncompressed synthesis.

JPEG is lossy — equality oracles don't apply; the query layer
(``multimodal.mm_decode_jpeg``) emits spec-exact dimensions plus an
error-bound boolean instead.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan: ZIGZAG[k] = raster index of the k-th zigzag position
# (T.81 Figure 5; the anti-diagonal property is test-pinned).
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 base quantization tables (raster order).
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL). The DECODER
# never reads these — it builds tables from the stream's DHT segments;
# they exist so the ENCODER emits standard tables.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (C @ C.T = I, test-pinned):
    forward block transform is C @ B @ C.T, inverse is C.T @ F @ C."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_DCT = dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K base tables (raster order)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def build_huffman(bits, vals):
    """Canonical Huffman tables from a DHT (BITS, HUFFVAL) spec:
    returns (encode: symbol → (code, length), decode: (length, code) →
    symbol). Raises on over-subscribed BITS (more codes than a prefix
    code of that length profile can hold)."""
    encode, decode = {}, {}
    code, idx = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        if code + n > (1 << length):
            raise ValueError("invalid Huffman BITS: over-subscribed length")
        for _ in range(n):
            sym = vals[idx]
            encode[sym] = (code, length)
            decode[(length, code)] = sym
            code += 1
            idx += 1
        code <<= 1
    return encode, decode


def _build_decode_lut(decode: dict) -> list:
    """16-bit-window decode LUT: lut[w] = (sym << 5) | code_length for
    the unique prefix code matching the high bits of the 16-bit window
    ``w``, 0 where no code matches (invalid stream). Prefix-freeness
    (build_huffman's canonical construction) makes the entry unique, so
    one list index replaces the 1..16 per-length probe walk with the
    identical symbol, consumed-bit count, and invalid-code error."""
    lut = [0] * 65536
    for (length, code), sym in decode.items():
        span = 1 << (16 - length)
        base = code * span
        lut[base : base + span] = [(sym << 5) | length] * span
    return lut


# DHT-spec-keyed memo for decoder tables. The table build (dict + 64K
# LUT) is pure in the (BITS, HUFFVAL) bytes; real corpora reuse a
# handful of specs (overwhelmingly Annex-K), so the per-image rebuild
# cost — which dominated tiny-image decode setup — amortizes to one
# build per worker process. Capped so adversarial streams with
# endlessly novel tables cannot grow it without bound.
_DHT_MEMO: dict = {}


def _huff_decode_cached(spec: bytes, bits, vals):
    tabs = _DHT_MEMO.get(spec)
    if tabs is None:
        decode = build_huffman(bits, vals)[1]
        tabs = (decode, _build_decode_lut(decode))
        if len(_DHT_MEMO) >= 64:
            _DHT_MEMO.clear()
        _DHT_MEMO[spec] = tabs
    return tabs


def _category(v: int) -> int:
    """Bit category (SSSS) of a DC difference / AC coefficient."""
    return int(abs(v)).bit_length()


def _extend_bits(v: int, size: int) -> int:
    """The raw ``size`` bits encoding v (negative values use the
    one's-complement convention of T.81 F.12 EXTEND)."""
    return v if v >= 0 else v + (1 << size) - 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)

    def restart(self, idx: int) -> None:
        """Pad to a byte boundary and emit RST(idx mod 8)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, surfaces RSTn as
    restart events, stops at any other marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        # pre-fill byte positions of the most recent fills — lets
        # align_and_skip_restart rewind whole UNCONSUMED buffered
        # bytes so the eager 16-bit lookahead (see _fill_to) is
        # position-invisible at restart boundaries, stuffed FF00
        # included (the recorded position is the FF's)
        self.fills = [0, 0, 0, 0]

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise ValueError("truncated JPEG entropy stream")
        byte = b[self.pos]
        before = self.pos
        if byte == 0xFF:
            if self.pos + 1 >= len(b):
                raise ValueError("truncated JPEG entropy stream")
            nxt = b[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        # mask to the live bits on every append: consumed high bits are
        # dead weight (every read masks to nbits), and without the trim
        # acc grows 8 bits per fill for the WHOLE entropy segment — a
        # latent quadratic that made a 120 KiB frame decode ~15x slower
        # per byte than an 8 KiB one (fixture-sized streams never
        # showed it; real frames would)
        self.acc = ((self.acc << 8) | byte) & ((1 << (self.nbits + 8)) - 1)
        self.nbits += 8
        f = self.fills
        f[0], f[1], f[2] = f[1], f[2], f[3]
        f[3] = before

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def _fill_to(self, n: int) -> bool:
        """Best-effort buffer of ≥ n bits. False when the stream ends
        or a marker intervenes first — the caller falls back to the
        per-bit path, which re-encounters the identical condition at
        exactly the bit the original reader would have (a failed
        ``_fill`` mutates nothing, so swallowing its exception here is
        state-neutral)."""
        while self.nbits < n:
            try:
                self._fill()
            except (ValueError, _RestartMarker):
                return False
        return True

    def receive(self, n: int) -> int:
        if n and self._fill_to(n):
            self.nbits -= n
            return (self.acc >> self.nbits) & ((1 << n) - 1)
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_restart(self) -> None:
        """Consume a restart marker at a restart boundary."""
        # undo the eager lookahead first: whole buffered-but-unconsumed
        # bytes rewind to their pre-fill positions (the lazy reader
        # never read them, and its pos — hence the marker check — sits
        # before them; only the ≤7 sub-byte pad bits are discarded,
        # exactly as before)
        k = self.nbits // 8
        if k:
            # the 4-slot fill ring covers the current max lookahead
            # (_fill_to(16) ⇒ nbits ≤ 23 ⇒ k ≤ 2); fail loudly if a
            # future wider lookahead outgrows it instead of silently
            # rewinding to the wrong byte (advisor r16)
            assert k <= len(self.fills), "fill ring smaller than lookahead"
            self.pos = self.fills[4 - k]
        self.acc, self.nbits = 0, 0
        b = self.buf
        if (
            self.pos + 1 < len(b)
            and b[self.pos] == 0xFF
            and 0xD0 <= b[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected JPEG restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_symbol(r: _BitReader, table: tuple) -> int:
    decode, lut = table
    if r._fill_to(16):
        # fast path: one 16-bit peek resolved through the prefix-free
        # LUT — one list index instead of up to 16 dict probes.
        # Identical symbol, identical bits consumed, identical
        # invalid-code error (lut entry 0 = no code matches).
        e = lut[(r.acc >> (r.nbits - 16)) & 0xFFFF]
        if e:
            r.nbits -= e & 31
            return e >> 5
        raise ValueError("invalid Huffman code in JPEG stream")
    # boundary path (stream end / marker within 16 bits): the original
    # per-bit walk, which raises truncation/marker exactly where the
    # symbol actually needs the missing bit
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = decode.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.12 EXTEND: map ``size`` raw bits back to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- encoder ------------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y, cb, cr = (arr[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to (bh, bw) — hand-rolled np.pad(mode="edge"):
    identical values, ~8x less per-call overhead (np.pad's generic
    machinery was the single hottest line of tiny-image encode)."""
    h, w = plane.shape
    if bh <= h and bw <= w:
        return plane
    out = np.empty((bh, bw), dtype=plane.dtype)
    out[:h, :w] = plane
    if bh > h:
        out[h:, :w] = plane[-1, :]
    if bw > w:
        out[:h, w:] = plane[:, -1][:, None]
    if bh > h and bw > w:
        out[h:, w:] = plane[-1, -1]
    return out


def _component_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Plane (already padded to 8-multiples, level-shifted) → quantized
    zigzag coefficient blocks, shape (n_blocks_y, n_blocks_x, 64)."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    # _DCT @ blocks @ _DCT.T via broadcast BLAS matmuls — identical to
    # einsum("ij,abjk,lk->abil", ...) but avoids un-optimized einsum's
    # naive 4-index contraction (the with_phash lesson).
    f = _DCT @ blocks @ _DCT.T
    # zigzag-order both the coefficients and the (raster-order) quant
    # table so position k divides by its own quantizer
    zz = f.reshape(by, bx, 64)[:, :, ZIGZAG]
    return np.round(zz / q[ZIGZAG].reshape(1, 1, 64)).astype(np.int64)


def _enc_tables_np():
    """Annex-K encode tables as numpy LUTs indexed by symbol —
    [(dc_code, dc_len, ac_code, ac_len)] for tsel 0 (luma) / 1
    (chroma). Built once per process (encode_jpeg previously rebuilt
    all four dict tables per call — a measurable constant at the
    fixture's 8-48 px frame sizes)."""
    tabs = []
    for dcb, dcv, acb, acv in [
        (_DC_LUMA_BITS, _DC_LUMA_VALS, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (_DC_CHROMA_BITS, _DC_CHROMA_VALS, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]:
        dc_enc = build_huffman(dcb, dcv)[0]
        ac_enc = build_huffman(acb, acv)[0]
        dc_code = np.zeros(17, dtype=np.int64)
        dc_len = np.zeros(17, dtype=np.int64)
        for sym, (code, length) in dc_enc.items():
            dc_code[sym] = code
            dc_len[sym] = length
        ac_code = np.zeros(256, dtype=np.int64)
        ac_len = np.zeros(256, dtype=np.int64)
        for sym, (code, length) in ac_enc.items():
            ac_code[sym] = code
            ac_len[sym] = length
        tabs.append((dc_code, dc_len, ac_code, ac_len))
    return tabs


_ENC_TABS: list | None = None


def _bit_length_i64(v: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length`` (SSSS category) for int64 JPEG
    coefficients. log2 is exact in this range: |v| ≤ 2^16 keeps the
    float64 mantissa far from the rounding boundary."""
    out = np.zeros(v.shape, dtype=np.int64)
    nz = v != 0
    out[nz] = np.floor(np.log2(np.abs(v[nz]))).astype(np.int64) + 1
    return out


def _entropy_encode(all_blocks, comps, mcux, mcuy, restart_interval) -> bytes:
    """Vectorized whole-scan entropy coder — byte-identical to the
    per-coefficient ``_BitWriter``/``_encode_block`` walk (which stays
    below as the reference implementation, test-pinned and used by the
    differential-parity campaign).

    Shape: every Huffman symbol of the scan becomes one (value, length)
    entry in a flat array — DC code/extend per block, ZRL/AC-code/AC-
    extend per nonzero coefficient, EOB per early-terminated block —
    ordered by one stable integer-key argsort; restart padding and RSTn
    markers are inserted as entries by vectorized index arithmetic; the
    bit stream is packed by five byte-plane bincounts (each entry spans
    ≤ 40 bits at its byte offset, disjoint bits ⇒ sum == OR); 0xFF
    stuffing is a repeat/scatter over the packed bytes with marker
    bytes masked out. Everything is O(output) with ~40 numpy calls
    total, against ~5 Python-level calls per coefficient before."""
    global _ENC_TABS
    if _ENC_TABS is None:
        _ENC_TABS = _enc_tables_np()
    ncomp = len(comps)
    n_mcu = mcux * mcuy
    total_bpm = sum(c[1] * c[2] for c in comps)
    nblocks = n_mcu * total_bpm

    zz = np.empty((nblocks, 64), dtype=np.int64)
    tsel = np.empty(nblocks, dtype=np.int64)
    comp_of = np.empty(nblocks, dtype=np.int64)
    mcu_idx = np.arange(n_mcu, dtype=np.int64)
    my = mcu_idx // mcux
    mx = mcu_idx % mcux
    off = 0
    for ci, (cid, hi, vi, qidx) in enumerate(comps):
        blocks = all_blocks[ci]  # (mcuy*vi, mcux*hi, 64)
        for v in range(vi):
            for hh in range(hi):
                seq = mcu_idx * total_bpm + off + v * hi + hh
                zz[seq] = blocks[my * vi + v, mx * hi + hh]
                tsel[seq] = 0 if ci == 0 else 1
                comp_of[seq] = ci
        off += hi * vi

    if restart_interval:
        seg_of_mcu = mcu_idx // restart_interval
    else:
        seg_of_mcu = np.zeros(n_mcu, dtype=np.int64)
    seg = np.repeat(seg_of_mcu, total_bpm)
    nseg = int(seg_of_mcu[-1]) + 1

    # DC differentials: chained per component, reset per restart segment
    dc = zz[:, 0]
    diff = np.empty(nblocks, dtype=np.int64)
    for ci in range(ncomp):
        m = comp_of == ci
        dcv = dc[m]
        sg = seg[m]
        prev = np.empty(len(dcv), dtype=np.int64)
        prev[0] = 0
        prev[1:] = dcv[:-1]
        newseg = np.empty(len(dcv), dtype=bool)
        newseg[0] = True
        newseg[1:] = sg[1:] != sg[:-1]
        prev[newseg] = 0
        diff[m] = dcv - prev
    dsize = _bit_length_i64(diff)

    # AC nonzeros: np.nonzero is row-major ⇒ already (block, k)-sorted
    bidx, kpos = np.nonzero(zz[:, 1:])
    kpos = kpos + 1
    val = zz[bidx, kpos]
    nnz = len(bidx)
    prevk = np.empty(nnz, dtype=np.int64)
    if nnz:
        prevk[0] = 0
        prevk[1:] = kpos[:-1]
        firstnz = np.empty(nnz, dtype=bool)
        firstnz[0] = True
        firstnz[1:] = bidx[1:] != bidx[:-1]
        prevk[firstnz] = 0
    run = kpos - prevk - 1
    n_zrl = run >> 4
    asize = _bit_length_i64(val)
    if np.any(asize > 10):
        # Annex-K AC tables only define sizes 1..10 (|coef| <= 1023) —
        # same loud failure (and same first-in-stream offender) as the
        # reference encoder
        i = int(np.argmax(asize > 10))
        raise ValueError(
            f"AC coefficient {int(val[i])} exceeds the Annex-K Huffman "
            f"envelope (category {int(asize[i])} > 10); lower the "
            "quality setting"
        )
    acsym = ((run & 15) << 4) | asize

    last_nz = np.zeros(nblocks, dtype=np.int64)
    if nnz:
        np.maximum.at(last_nz, bidx, kpos)
    eob_b = np.nonzero(last_nz < 63)[0]

    # symbol → (code, length) gathers
    dc_code = np.empty(nblocks, dtype=np.int64)
    dc_len = np.empty(nblocks, dtype=np.int64)
    ac_code = np.empty(nnz, dtype=np.int64)
    ac_len = np.empty(nnz, dtype=np.int64)
    zrl_code = np.empty(nnz, dtype=np.int64)
    zrl_len = np.empty(nnz, dtype=np.int64)
    eob_code = np.empty(len(eob_b), dtype=np.int64)
    eob_len = np.empty(len(eob_b), dtype=np.int64)
    ac_tsel = tsel[bidx]
    eob_tsel = tsel[eob_b]
    for t in (0, 1):
        dcc, dcl, acc, acl = _ENC_TABS[t]
        m = tsel == t
        dc_code[m] = dcc[dsize[m]]
        dc_len[m] = dcl[dsize[m]]
        m = ac_tsel == t
        ac_code[m] = acc[acsym[m]]
        ac_len[m] = acl[acsym[m]]
        zrl_code[m] = acc[0xF0]
        zrl_len[m] = acl[0xF0]
        m = eob_tsel == t
        eob_code[m] = acc[0x00]
        eob_len[m] = acl[0x00]
    dc_ext = np.where(diff >= 0, diff, diff + (1 << dsize) - 1)
    ac_ext = np.where(val >= 0, val, val + (1 << asize) - 1)

    # flat entry stream ordered by (block, zigzag pos, phase): phase 0
    # = ZRL/EOB/DC-code, 1 = DC-extend/AC-code, 2 = AC-extend; DC rides
    # k=0, EOB k=65 — one int64 key, one stable argsort
    dce_b = np.nonzero(dsize > 0)[0]
    zrl_rep = np.repeat(np.arange(nnz), n_zrl)
    allb = np.arange(nblocks)
    key = np.concatenate([
        allb * 268,                                 # (b*67+0)*4+0: DC code
        dce_b * 268 + 1,                            # DC extend
        (bidx[zrl_rep] * 67 + kpos[zrl_rep]) * 4,   # ZRLs
        (bidx * 67 + kpos) * 4 + 1,                 # AC codes
        (bidx * 67 + kpos) * 4 + 2,                 # AC extends
        (eob_b * 67 + 65) * 4,                      # EOBs
    ])
    ev = np.concatenate([dc_code, dc_ext[dce_b], zrl_code[zrl_rep],
                         ac_code, ac_ext, eob_code])
    el = np.concatenate([dc_len, dsize[dce_b], zrl_len[zrl_rep],
                         ac_len, asize, eob_len])
    order = np.argsort(key, kind="stable")
    ev = ev[order]
    el = el[order]
    eseg = seg[(key[order] >> 2) // 67]

    # restart padding + RSTn markers as inserted entries (the reference
    # writer pads to a byte with 1-bits before each marker and at
    # flush; pad lengths are derivable per segment because markers are
    # byte-aligned, so everything before a segment starts on a byte)
    E = len(ev)
    bits_per_seg = np.bincount(
        eseg, weights=el.astype(np.float64), minlength=nseg
    ).astype(np.int64)
    pad = (-bits_per_seg) % 8
    has_pad = pad > 0
    has_marker = np.zeros(nseg, dtype=bool)
    has_marker[:-1] = True
    extras_before = np.concatenate(
        [[0], np.cumsum(has_pad.astype(np.int64) + has_marker)]
    )[:-1]
    total_e = E + int(has_pad.sum()) + int(has_marker.sum())
    fv = np.empty(total_e, dtype=np.int64)
    fl = np.empty(total_e, dtype=np.int64)
    fv[np.arange(E) + extras_before[eseg]] = ev
    fl[np.arange(E) + extras_before[eseg]] = el
    seg_end = np.searchsorted(eseg, np.arange(nseg), side="right") + extras_before
    pseg = np.nonzero(has_pad)[0]
    fv[seg_end[pseg]] = (1 << pad[pseg]) - 1
    fl[seg_end[pseg]] = pad[pseg]
    mseg = np.nonzero(has_marker)[0]
    mpos = seg_end[mseg] + has_pad[mseg]
    fv[mpos] = 0xFFD0 + (mseg % 8)
    fl[mpos] = 16

    # bit packing: five byte-plane bincounts (disjoint bits ⇒ sum==OR)
    end = np.cumsum(fl)
    start = end - fl
    nbytes = int(end[-1]) // 8
    byte0 = start >> 3
    v40 = fv << (40 - (start & 7) - fl)
    acc = np.zeros(nbytes + 5, dtype=np.int64)
    for k in range(5):
        plane = (v40 >> (8 * (4 - k))) & 0xFF
        acc += np.bincount(
            byte0 + k, weights=plane.astype(np.float64), minlength=nbytes + 5
        ).astype(np.int64)
    arr = acc[:nbytes].astype(np.uint8)

    # 0xFF byte stuffing, marker bytes excluded
    is_marker = np.zeros(nbytes, dtype=bool)
    if len(mpos):
        mstart = start[mpos] >> 3
        is_marker[mstart] = True
        is_marker[mstart + 1] = True
    ff = (arr == 0xFF) & ~is_marker
    counts = np.ones(nbytes, dtype=np.int64) + ff
    stuffed = np.repeat(arr, counts)
    stuffed[(np.cumsum(counts) - counts)[ff] + 1] = 0
    return stuffed.tobytes()


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int, dc_enc, ac_enc) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_enc[size]
    w.write(code, length)
    if size:
        w.write(_extend_bits(diff, size), size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _category(v)
        if size > 10:
            # Annex-K AC tables only define sizes 1..10 (|coef| <= 1023).
            # Quality near 100 clips quant values to 1 and can push an AC
            # coefficient past that envelope — fail loudly instead of a
            # bare KeyError from the table lookup.
            raise ValueError(
                f"AC coefficient {v} exceeds the Annex-K Huffman envelope "
                f"(category {size} > 10); lower the quality setting"
            )
        code, length = ac_enc[(run << 4) | size]
        w.write(code, length)
        w.write(_extend_bits(v, size), size)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        w.write(code, length)
    return dc


def encode_jpeg(
    arr, quality: int = 90, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Baseline JFIF writer: 8-bit grayscale or RGB, 4:4:4 by default,
    4:2:0 with ``subsample=True`` (box-filter chroma downsample).
    Standard Annex-K Huffman tables, IJG quality-scaled quant tables,
    real DHT/DQT segments, 0xFF byte stuffing; ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (the
    decoder's restart path is exercised by real files this way)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    ql, qc = quality_tables(quality)

    if nch == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        comps = [(1, 1, 1, 0)]  # (id, hi, vi, qidx)
    else:
        ycc = _rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # box-filter 2x2 downsample on edge-padded chroma
            def down(p):
                ph = _pad_to(p, -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2)
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0

            planes = [y, down(cb), down(cr)]
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            planes = [y, cb, cr]
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qtabs = [ql, qc] if nch == 3 else [ql]

    all_blocks = []
    for (cid, hi, vi, qidx), plane in zip(comps, planes):
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        plane = _pad_to(plane[:chh, :cw], mcuy * 8 * vi, mcux * 8 * hi)
        all_blocks.append(
            _component_blocks(plane - 128.0, qtabs[qidx])
        )

    # vectorized whole-scan entropy coder — byte-identical to the
    # per-coefficient _BitWriter/_encode_block reference walk (pinned
    # by the r17 differential-parity campaign and test_plans' codec
    # parity tests)
    entropy = _entropy_encode(all_blocks, comps, mcux, mcuy, restart_interval)

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    for i, q in enumerate(qtabs):
        body = bytes([i]) + bytes(int(x) for x in q[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci, (cid, hi, vi, qidx) in enumerate(comps):
        sof += bytes([cid, (hi << 4) | vi, qidx])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    tables = [
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ]
    if nch == 3:
        tables += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in tables:
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for ci, (cid, hi, vi, qidx) in enumerate(comps):
        tsel = 0 if ci == 0 else 1
        sos += bytes([cid, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------


def decode_jpeg(payload: bytes):
    """Baseline sequential JPEG decoder — returns (w, h, (h, w, ch)
    uint8 array), ch 1 (grayscale) or 3 (RGB). See module docstring
    for the supported/rejected envelope."""
    b = payload
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    sof = None
    restart_interval = 0

    while True:
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG (no SOS/EOI)")
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them so files from padding encoders decode.
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG (no SOS/EOI)")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG has no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        seg = b[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qtabs[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _huff_decode_cached(
                    bytes(seg[p + 1 : p + 17 + n]), bits, vals
                )
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (8 only)")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(
                        f"unsupported sampling factors {hi}x{vi} (1-2 only)"
                    )
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            sof = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise ValueError(f"unsupported JPEG coding process ({kind})")
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            pos += seglen
            return _decode_scan(
                b, pos, sof, scan, qtabs, huff, restart_interval
            )
        # APPn / COM / others: skip
        pos += seglen


def _decode_scan(b, pos, sof, scan, qtabs, huff, restart_interval):
    w, h, comps = sof
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        c = by_id[cs]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG scan references missing Huffman table")
        if c["tq"] not in qtabs:
            raise ValueError("JPEG component references missing quant table")
        order.append((c, huff[(0, td)], huff[(1, ta)], qtabs[c["tq"]]))
    if len(order) != len(comps):
        raise ValueError("non-interleaved JPEG scans not supported")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component zigzag coefficient grids, filled during the
    # (sequential, bit-serial) entropy decode and dequantized +
    # IDCT-transformed in ONE batched numpy pass per component after
    # the scan — the per-block zeros/fancy-index/8x8-matmul overhead
    # was pure Python-call tax (same math per block, just batched)
    zz_grids = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in comps
    ]

    rdr = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rdr.align_and_skip_restart()
                preds = [0] * len(comps)
            try:
                for ci, (c, dct_tab, act_tab, q) in enumerate(order):
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            zz, preds[ci] = _decode_block(
                                rdr, dct_tab, act_tab, preds[ci]
                            )
                            zz_grids[ci][my * c["v"] + v, mx * c["h"] + hh] = zz
            except _RestartMarker:
                raise ValueError("unexpected JPEG restart marker") from None
            mcu_count += 1

    planes = []
    for (c, dct_tab, act_tab, q), zzg in zip(order, zz_grids):
        gy, gx = zzg.shape[:2]
        f = np.zeros((gy, gx, 64), dtype=np.float64)
        f[:, :, ZIGZAG] = zzg * q[ZIGZAG]
        blk = _DCT.T @ f.reshape(gy, gx, 8, 8) @ _DCT
        planes.append(blk.transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8))

    out_planes = []
    for c, plane in zip(comps, planes):
        cw = -(-w * c["h"] // hmax)
        chh = -(-h * c["v"] // vmax)
        p = plane[:chh, :cw] + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
            p = p[:h, :w]
        else:
            p = p[:h, :w]
        out_planes.append(p)

    if len(out_planes) == 1:
        img = out_planes[0][:, :, None]
    else:
        img = _ycbcr_to_rgb(np.stack(out_planes, axis=-1))
    return w, h, np.clip(np.round(img), 0, 255).astype(np.uint8)


def _decode_block(rdr, dc_tab, ac_tab, pred):
    size = _decode_symbol(rdr, dc_tab)
    diff = _extend(rdr.receive(size), size) if size else 0
    dc = pred + diff
    zz = [0] * 64  # plain list: per-element stores beat ndarray scalar writes
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_symbol(rdr, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[k] = _extend(rdr.receive(size), size)
        k += 1
    return zz, dc
