"""Pure-numpy/stdlib GIF87a/89a codec — the one remaining common
compressed image format feasible without native libs (r11 verdict item
5). Real LZW (variable-width codes, clear/EOI, 4096-entry dictionary,
deferred-clear tolerant), real container walk (logical screen
descriptor, global/local color tables, extension blocks, interlacing).

Reference parity: the reference pipeline has no image path at all —
this extends the multimodal tier the same way ``operators/jpeg.py``
and the PNG codec in ``operators/multimodal.py`` do, so a 100 TB
curation job can decode/route GIF payloads with the identical
mapInPandas plumbing and dead-letter semantics.

Supported: 87a + 89a, global and local color tables, interlaced and
sequential images, any extension block (skipped per spec), multi-image
files (first frame decoded; ``decode_gif_frames`` returns all).
Rejected loudly (ValueError — the quarantine router's contract):
missing/short color tables, truncated sub-blocks, bad LZW streams,
out-of-range pixel codes, missing trailer data.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_gif",
    "decode_gif",
    "decode_gif_info",
    "decode_gif_frames",
    "lzw_encode",
    "lzw_decode",
]

_MAX_CODE = 4096  # 12-bit LZW dictionary cap (GIF appendix F)


class _BitWriter:
    """LSB-first bit packer (GIF packs LZW codes little-endian within
    bytes — the OPPOSITE of JPEG's MSB-first entropy stream)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def take(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW code stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows the dictionary one
    entry per emitted code, widens the code size in lockstep with the
    decoder (the +1 offset below — the decoder learns each entry one
    code later), and resets via CLEAR when the table hits 4096."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"LZW min code size {min_code_size} out of range 2..11")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    w = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    w.put(clear, width)
    buf = b""
    for b in data:
        if b >= clear:
            raise ValueError(f"pixel value {b} exceeds LZW alphabet {clear}")
        nb = buf + bytes([b])
        if nb in table:
            buf = nb
            continue
        w.put(table[buf], width)
        if nxt < _MAX_CODE:
            table[nb] = nxt
            nxt += 1
            # decoder widens when ITS next-code (ours - 1) hits
            # 2^width; mirror that one-behind schedule exactly
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
        else:
            w.put(clear, width)
            width = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
        buf = bytes([b])
    if buf:
        w.put(table[buf], width)
        if nxt < _MAX_CODE:
            nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
    w.put(eoi, width)
    return w.flush()


def lzw_decode(data: bytes, min_code_size: int, max_out: int | None = None) -> bytes:
    """Decode a GIF LZW stream to index bytes. Tolerates a full
    4096-entry table with no CLEAR (the spec's 'deferred clear');
    rejects codes beyond the table and truncated streams."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"LZW min code size {min_code_size} out of range 2..11")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    r = _BitReader(data)
    out = bytearray()

    def fresh() -> list[bytes | None]:
        t: list[bytes | None] = [bytes([i]) for i in range(clear)]
        t += [None, None]  # clear, eoi slots
        return t

    table = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = r.take(width)
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError(f"first LZW code {code} is not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if entry is None:
                raise ValueError(f"LZW code {code} maps to a control slot")
        elif code == len(table) and len(table) < _MAX_CODE:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if max_out is not None and len(out) > max_out:
            raise ValueError(
                f"LZW output exceeds declared raster size {max_out}"
            )
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap a byte stream into <=255-byte counted sub-blocks + a zero
    terminator (the GIF framing for LZW data and extension payloads)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block stream")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        block = payload[pos : pos + n]
        if len(block) < n:
            raise ValueError("truncated GIF sub-block")
        out += block
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) rows


def _interlaced_row_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    comment: bytes | None = None,
) -> bytes:
    """Minimal REAL GIF89a writer — logical screen descriptor, global
    color table, optional comment extension, one image with real LZW
    data (interlaced row order when asked). Fixture generator for
    ``decode_gif``; indices is (h, w) uint8, palette is (n, 3) uint8
    with n a power of two in 2..256."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("indices must be (h, w)")
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette must be (n, 3)")
    n_colors = pal.shape[0]
    if n_colors < 2 or n_colors > 256 or n_colors & (n_colors - 1):
        raise ValueError(f"palette size {n_colors} not a power of two in 2..256")
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("pixel index beyond palette")
    h, w = idx.shape
    gct_bits = max(1, n_colors.bit_length() - 1)  # 2^(bits) == n_colors
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8 bits/channel, size field
    packed = 0x80 | ((8 - 1) << 4) | (gct_bits - 1)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += pal.tobytes()
    if comment is not None:
        out += b"\x21\xfe" + _sub_blocks(comment)
    # image descriptor: no LCT, interlace flag per arg
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    rows = idx[_interlaced_row_order(h)] if interlace else idx
    mcs = max(2, gct_bits)
    out.append(mcs)
    out += _sub_blocks(lzw_encode(rows.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def encode_gif_animation(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delay_cs: int = 10,
) -> bytes:
    """Minimal REAL animated GIF89a — NETSCAPE2.0 loop extension, then
    per frame a Graphic Control Extension (delay in centiseconds) and
    a full-screen image with its own LZW stream. Fixture generator for
    ``decode_gif_frames``; all frames share the global color table and
    the logical screen size."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    pal = np.asarray(palette, dtype=np.uint8)
    n_colors = pal.shape[0]
    if n_colors < 2 or n_colors > 256 or n_colors & (n_colors - 1):
        raise ValueError(f"palette size {n_colors} not a power of two in 2..256")
    h, w = np.asarray(frames[0]).shape
    gct_bits = max(1, n_colors.bit_length() - 1)
    out = bytearray(b"GIF89a")
    packed = 0x80 | ((8 - 1) << 4) | (gct_bits - 1)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += pal.tobytes()
    # NETSCAPE2.0 application extension, loop forever: 11-byte app id
    # sub-block, 3-byte data sub-block (1, loop-count 0), terminator
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, gct_bits)
    for fr in frames:
        idx = np.asarray(fr, dtype=np.uint8)
        if idx.shape != (h, w):
            raise ValueError("all frames must share the logical screen size")
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("pixel index beyond palette")
        # GCE: no disposal, no transparency, just the delay
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        out += _sub_blocks(lzw_encode(idx.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def _decode_frames(
    payload: bytes,
) -> tuple[int, int, list[np.ndarray], list[int]]:
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a signature)")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size < 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    pal_sizes: list[int] = []
    any_partial = False
    bg_rgb = gct[_bg] if gct is not None and _bg < gct.shape[0] else None
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF (no trailer)")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            pos += 1  # label
            _, pos = _read_sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at byte {pos - 1}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if ix + iw > w or iy + ih > h:
            raise ValueError("GIF image extends past the logical screen")
        pal = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            if pal.size < 3 * n:
                raise ValueError("truncated GIF local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table (global or local)")
        if pos >= len(payload):
            raise ValueError("truncated GIF (missing LZW min code size)")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_sub_blocks(payload, pos)
        raw = lzw_decode(data, mcs, max_out=iw * ih)
        if len(raw) < iw * ih:
            raise ValueError(
                f"GIF raster short: {len(raw)} of {iw * ih} pixels"
            )
        idx = np.frombuffer(raw[: iw * ih], dtype=np.uint8).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: invert the pass ordering
            deinter = np.empty_like(idx)
            deinter[_interlaced_row_order(ih)] = idx
            idx = deinter
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF pixel index beyond color table")
        raster = pal[idx]  # (ih, iw, 3) uint8
        if (ix, iy, iw, ih) != (0, 0, w, h):
            # composite the sub-image onto the logical screen at its
            # declared offset (T.81 counterpart: a raster's dims must
            # MATCH the reported (w, h) — returning the patch with
            # screen dims was the r12 review finding). Background is
            # the LSD's background color when a GCT provides it.
            any_partial = True
            screen = np.zeros((h, w, 3), dtype=np.uint8)
            if bg_rgb is not None:
                screen[:, :] = bg_rgb
            screen[iy : iy + ih, ix : ix + iw] = raster
            raster = screen
        frames.append(raster)
        pal_sizes.append(int(pal.shape[0]))
    if not frames:
        raise ValueError("GIF has no image data")
    if any_partial and len(frames) > 1:
        # optimized animations paint frame deltas with disposal rules;
        # without disposal compositing the later frames would be wrong
        # — reject loudly (the envelope rule, like progressive JPEG)
        raise ValueError(
            "animated GIF with partial frames needs disposal "
            "compositing (unsupported)"
        )
    return w, h, frames, pal_sizes


def decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the FIRST frame to (w, h, (h, w, 3) uint8 RGB)."""
    w, h, frames, _ = _decode_frames(payload)
    return w, h, frames[0]


def decode_gif_info(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """First frame plus the size of the color table it used —
    (w, h, n_colors, raster)."""
    w, h, frames, pal_sizes = _decode_frames(payload)
    return w, h, pal_sizes[0], frames[0]


def decode_gif_frames(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode every frame (animated GIFs) — (w, h, [rasters])."""
    w, h, frames, _ = _decode_frames(payload)
    return w, h, frames
