"""Pure-Python GIF codec (87a/89a) — no external libs.

GIF's only compression is LZW over palette indices, so full decode is
stdlib logic: logical-screen descriptor → global/local color tables →
per-frame LZW inflate (variable-width codes, clear/EOI, 12-bit cap) →
optional Adam-less 4-pass de-interlace → canvas composition honoring
transparency and disposal (restore-to-background). Animated GIFs come
back as a frame list, which upgrades the engine's video story with a
second real container-free format beside concatenated-PPM streams.

The encoder writes GIF89a with a per-image palette and real LZW
compression (growing code widths, dictionary reset at 4096), enough to
generate genuine compressed fixtures/corpora in-sandbox; goldens in
tests/test_operators.py include a hand-assembled LZW bitstream decoded
with no self-consistency loophole.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

# interlace pass starts/steps per the 89a spec
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> np.ndarray:
    """GIF-variant LZW: variable code width starting at min+1, CLEAR
    resets the dictionary, widths grow after the dict fills a width,
    capped at 12 bits.

    r13 hot-path form (the GIF analogue of the r12 JPEG rework, same
    byte-identical contract): every dictionary entry is a substring of
    output already produced — emissions are contiguous, so the entry for
    a new code (prev + first byte of current) occupies exactly
    ``out[prev_pos : prev_pos + prev_len + 1]``. Representing entries as
    (start, length) into the output bytearray turns the per-code work
    into two list writes plus one C-speed ``bytearray`` slice copy — no
    per-code ``bytes`` concatenation, no per-code ``np.frombuffer``."""
    clear = 1 << min_code_size
    eoi = clear + 1
    if n_expected <= 0:  # zero-area frame: nothing to decode into
        return np.empty(0, np.uint8)
    out = bytearray(n_expected)
    n_out = 0
    # bit reader: GIF packs codes LSB-first
    buf = 0
    nbits = 0
    pos = 0
    ldata = len(data)
    width = min_code_size + 1
    mask = (1 << width) - 1
    # codes < clear are literals; built codes live in (start, length)
    # tables indexed by code — 4096 is the spec's hard cap
    starts = [0] * 4096
    lens = [0] * 4096
    next_code = clear + 2
    prev_pos = -1
    prev_len = 0

    while True:
        while nbits < width:
            if pos >= ldata:
                return np.frombuffer(bytes(out[:n_out]), np.uint8)
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & mask
        buf >>= width
        nbits -= width
        if code == clear:
            next_code = clear + 2
            width = min_code_size + 1
            mask = (1 << width) - 1
            prev_pos = -1
            continue
        if code == eoi:
            return np.frombuffer(bytes(out[:n_out]), np.uint8)
        cur_pos = n_out
        if code < clear:  # literal
            out[n_out] = code
            n_out += 1
            cur_len = 1
        elif clear + 2 <= code < next_code:
            s = starts[code]
            L = lens[code]
            take = L if n_out + L <= n_expected else n_expected - n_out
            out[n_out : n_out + take] = out[s : s + take]
            n_out += take
            cur_len = L
        elif code == next_code and prev_pos >= 0:
            # KwKwK: prev + prev[0] — prev's bytes sit contiguously at
            # prev_pos, and its first byte doubles as the tail
            L = prev_len + 1
            take = L if n_out + L <= n_expected else n_expected - n_out
            body = take if take <= prev_len else prev_len
            out[n_out : n_out + body] = out[prev_pos : prev_pos + body]
            if take > prev_len:
                out[n_out + prev_len] = out[prev_pos]
            n_out += take
            cur_len = L
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        if n_out >= n_expected:
            return np.frombuffer(bytes(out), np.uint8)
        if prev_pos >= 0 and next_code < 4096:
            starts[next_code] = prev_pos
            lens[next_code] = prev_len + 1
            next_code += 1
        if next_code == mask + 1 and width < 12:
            width += 1
            mask = (1 << width) - 1
        prev_pos = cur_pos
        prev_len = cur_len


def _sub_blocks(payload: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at *i*; returns (data, next)."""
    parts = []
    while True:
        n = payload[i]
        i += 1
        if n == 0:
            return b"".join(parts), i
        parts.append(payload[i : i + n])
        i += n


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """GIF bytes → list of (H, W, 3) uint8 RGB frames, canvas-composed
    (each frame is the full logical screen as a viewer would show it)."""
    if payload[:6] not in _GIF_MAGICS:
        raise NotImplementedError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed, bg_idx = payload[10], payload[11]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[bg_idx] if bg_idx < len(gct) else 0
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[i + 1]
            if label == 0xF9:  # graphic control
                gce, j = _sub_blocks(payload, i + 2)
                disposal = (gce[0] >> 2) & 0x7
                transparent = gce[3] if gce[0] & 0x1 else None
                i = j
            else:  # comment / app / plain text: skip sub-blocks
                _, i = _sub_blocks(payload, i + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, i + 1)
        fpacked = payload[i + 9]
        i += 10
        table = gct
        if fpacked & 0x80:  # local color table
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
            i += n * 3
        if table is None:
            raise ValueError("GIF frame without any color table")
        min_code = payload[i]
        data, i = _sub_blocks(payload, i + 1)
        idx = _lzw_decode(min_code, data, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("GIF LZW stream truncated")
        grid = np.empty((fh, fw), np.uint8)
        if fpacked & 0x40:  # interlaced: 4-pass row order
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, fh, step))
            grid[np.array(rows, np.int64)] = idx.reshape(fh, fw)
        else:
            grid = idx.reshape(fh, fw)
        before = canvas.copy()
        region = canvas[top : top + fh, left : left + fw]
        rgb = table[np.minimum(grid, len(table) - 1)]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            canvas[top : top + fh, left : left + fw] = (
                gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0
            )
        elif disposal == 3:  # restore to previous
            canvas = before
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF has no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF as (H, W, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0]


class _LZWWriter:
    """GIF LZW encoder: LSB-first variable-width codes."""

    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.buf = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, width: int) -> None:
        self.buf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
        return bytes(self.out)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    wr = _LZWWriter(min_code_size)
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    wr.put(clear, width)
    cur = b""
    for v in indices.tobytes():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        wr.put(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dictionary full: reset
            wr.put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        cur = nxt[-1:]
    if cur:
        wr.put(table[cur], width)
    wr.put(eoi, width)
    return wr.flush()


def _palettize(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(indices HxW, palette Nx3) — requires ≤ 256 distinct colors."""
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif needs ≤256 colors, got {len(palette)}")
    return inverse.astype(np.uint8).reshape(arr.shape[:2]), palette


def encode_gif(frames: np.ndarray | list[np.ndarray], delay_cs: int = 10) -> bytes:
    """Frame(s) → GIF89a bytes (per-frame local palettes, real LZW).
    A single (H, W, 3) array gives a static GIF; a list gives an
    animation with *delay_cs* centiseconds between frames."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0]))
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all GIF frames must share one size")
        idx, palette = _palettize(np.asarray(f, np.uint8))
        size_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
        pal = np.zeros((2**size_bits, 3), np.uint8)
        pal[: len(palette)] = palette
        if len(frames) > 1:
            out += bytes([0x21, 0xF9, 4, 0x00]) + struct.pack("<H", delay_cs) + bytes(
                [0, 0]
            )
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes(
            [0x80 | (size_bits - 1)]
        )
        out += pal.tobytes()
        min_code = max(2, size_bits)
        out.append(min_code)
        data = _lzw_encode(min_code, idx)
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
