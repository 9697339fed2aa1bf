"""Pure-Python AVI/MJPEG container support — no external libs.

AVI is RIFF (the same chunk grammar as the WAV parser in
functions/multimodal.py). Two frame codecs decode natively: Motion-JPEG
(each frame a complete JPEG — functions/jpeg.py) and uncompressed raw
DIB (BI_RGB 24-bit, r9). Demux is a chunk walk (RIFF 'AVI ' → LIST
'hdrl' for stream format/timing → LIST 'movi' for the '##dc'/'##db'
frame chunks). Truly opaque codecs (h264-in-mp4 etc.) still route
through the clearly-marked stub until a real decoder exists — this
module never fakes a frame.

The writer emits a structurally spec-shaped single-stream AVI
('avih' + 'strh'/'strf' headers, even-padded chunks, 'idx1' index) so
fixtures and corpora carry genuine container payloads.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _walk_chunks(payload: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, data_start, data_size) for each chunk in [start, end);
    a LIST chunk is yielded as (b'LIST:' + list_type, ...) over its body."""
    i = start
    while i + 8 <= end:
        cc = payload[i : i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        if cc in (b"RIFF", b"LIST"):
            yield (b"LIST:" + payload[i + 8 : i + 12], i + 12, size - 4)
        else:
            yield (cc, i + 8, size)
        i += 8 + size + (size & 1)  # chunks are even-padded


def demux_mjpeg_frames(payload: bytes) -> list[bytes]:
    """AVI bytes → list of per-frame JPEG byte payloads ('##dc'/'##db'
    video chunks of the 'movi' list, in stream order)."""
    if not is_avi(payload):
        raise NotImplementedError("not an AVI payload")
    frames: list[bytes] = []

    def scan(start: int, end: int) -> None:
        for cc, ds, sz in _walk_chunks(payload, start, end):
            if cc.startswith(b"LIST:"):
                if cc[5:] in (b"movi", b"rec "):
                    scan(ds, ds + sz)
            elif len(cc) == 4 and cc[2:4] in (b"dc", b"db"):
                frames.append(payload[ds : ds + sz])

    scan(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if not frames:
        raise ValueError("AVI has no video frame chunks")
    return frames


def _video_strf(payload: bytes) -> tuple[int, int, int, int] | None:
    """(biWidth, biHeight, biBitCount, biCompression) from the first
    VIDEO stream's 'strf' BITMAPINFOHEADER, or None if absent. biHeight
    keeps its sign (negative = top-down DIB, rows already in display
    order). An 'strf' is only a BITMAPINFOHEADER when the preceding
    'strh' in the same 'strl' declares fccType 'vids' — an audio-first
    AVI's 30-byte WAVEFORMATEX must not be misparsed as video geometry."""
    if not is_avi(payload):
        return None
    found: list[tuple[int, int, int, int]] = []

    def scan(start: int, end: int) -> None:
        stream_type = b""
        for cc, ds, sz in _walk_chunks(payload, start, end):
            if cc.startswith(b"LIST:"):
                if cc[5:] in (b"hdrl", b"strl"):
                    scan(ds, ds + sz)
            elif cc == b"strh" and sz >= 4:
                stream_type = payload[ds : ds + 4]
            elif cc == b"strf" and sz >= 20 and stream_type == b"vids" and not found:
                _bi, w, h = struct.unpack_from("<Iii", payload, ds)
                _planes, bpp = struct.unpack_from("<HH", payload, ds + 12)
                (comp,) = struct.unpack_from("<I", payload, ds + 16)
                found.append((w, h, bpp, comp))

    scan(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    return found[0] if found else None


def decode_avi_frames(payload: bytes) -> list[np.ndarray]:
    """AVI bytes → list of (H, W, 3) uint8 RGB frames. Two real codecs:
    MJPEG (each frame a complete JPEG — production preference order,
    PIL/libjpeg-turbo first when importable, pure-numpy fallback) and
    uncompressed raw DIB (BI_RGB 24-bit: bottom-up, 4-byte-padded BGR
    rows, geometry from the stream's 'strf'). Anything else (h264, DV,
    sub-24-bit DIB) raises NotImplementedError — an honest gate, never a
    fake frame."""
    from .multimodal import decode_jpeg_rgb

    strf = _video_strf(payload)
    out = []
    for f in demux_mjpeg_frames(payload):
        if f[:2] == b"\xff\xd8":
            out.append(decode_jpeg_rgb(f))
            continue
        if strf is not None and strf[3] == 0 and strf[2] == 24:  # BI_RGB 24
            w, h = strf[0], abs(strf[1])
            stride = (w * 3 + 3) & ~3
            if len(f) < stride * h:
                raise ValueError("AVI DIB frame shorter than its geometry")
            rows = np.frombuffer(f, np.uint8, count=stride * h)
            img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
            # positive biHeight = bottom-up rows (flip); negative = top-down
            out.append(img[::-1] if strf[1] > 0 else img)
            continue
        raise NotImplementedError(
            f"AVI frame codec {f[:4]!r} is not MJPEG or raw 24-bit DIB — "
            "needs a real decoder"
        )
    return out


def encode_avi_dib(frames: list[np.ndarray], fps: int = 4) -> bytes:
    """Frames → single-stream UNCOMPRESSED AVI (raw BI_RGB 24-bit DIB
    frames: bottom-up, 4-byte-padded BGR — the lossless sibling of
    :func:`encode_avi_mjpeg`, exercising the decoder's second codec)."""
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    payloads = []
    for f in frames:
        arr = np.asarray(f, np.uint8)
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        payloads.append(rows.tobytes())
    return _encode_avi(payloads, w, h, fps, handler=b"DIB ", compression=0, chunk_cc=b"00db")


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 4, quality: int = 90
) -> bytes:
    """Frames → single-stream AVI/MJPEG bytes (spec-shaped headers,
    even-padded '00dc' chunks, 'idx1' index)."""
    from .jpeg import encode_jpeg

    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(np.asarray(f, np.uint8), quality) for f in frames]
    return _encode_avi(
        jpegs, w, h, fps, handler=b"MJPG", compression=b"MJPG", chunk_cc=b"00dc"
    )


def _encode_avi(
    payloads: list[bytes],
    w: int,
    h: int,
    fps: int,
    *,
    handler: bytes,
    compression,
    chunk_cc: bytes,
) -> bytes:
    bufsize = max(len(j) for j in payloads)

    def chunk(cc: bytes, data: bytes) -> bytes:
        return cc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(body) + 4) + list_type + body

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        bufsize * fps,     # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(payloads),     # dwTotalFrames
        0, 1,              # dwInitialFrames, dwStreams
        bufsize,           # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,  # dwWidth, dwHeight, reserved[4]
    )
    strh = (
        b"vids" + handler
        # dwFlags, wPriority, wLanguage, dwInitialFrames, dwScale, dwRate,
        # dwStart, dwLength, dwSuggestedBufferSize, dwQuality, dwSampleSize
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(payloads), bufsize, 0xFFFFFFFF, 0
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    comp = compression if isinstance(compression, bytes) else struct.pack("<I", compression)
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + comp + struct.pack(
        "<IiiII", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(chunk_cc, j) for j in payloads)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame — offsets relative to the 'movi' list type
    idx_entries = []
    off = 4
    for j in payloads:
        idx_entries.append(chunk_cc + struct.pack("<III", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
