"""Pure-Python AVI/MJPEG container support — no external libs.

AVI is RIFF (the same chunk grammar as the WAV parser in
functions/multimodal.py) and Motion-JPEG stores each frame as a complete
baseline JPEG — which functions/jpeg.py decodes natively. Together they
give the engine a REAL container video format: demux is a chunk walk
(RIFF 'AVI ' → LIST 'hdrl' for timing metadata → LIST 'movi' for the
'##dc'/'##db' frame chunks), decode is per-frame JPEG. Truly opaque
codecs (h264-in-mp4 etc.) still route through the clearly-marked stub
until a real decoder exists — this module never fakes a frame.

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


def decode_avi_frames(payload: bytes) -> list[np.ndarray]:
    """AVI/MJPEG bytes → list of (H, W, 3) uint8 RGB frames. Non-JPEG
    frame payloads raise NotImplementedError (an honest gate — e.g. a
    DIB-frame or h264 AVI), never a fake frame. Per-frame JPEG decode
    goes through the production preference order (PIL/libjpeg-turbo
    first when importable, pure-numpy fallback — multimodal.decode_jpeg_rgb)."""
    from .multimodal import decode_jpeg_rgb

    out = []
    for f in demux_mjpeg_frames(payload):
        if f[:2] != b"\xff\xd8":
            raise NotImplementedError(
                f"AVI frame codec {f[:4]!r} is not MJPEG — needs a real decoder"
            )
        out.append(decode_jpeg_rgb(f))
    return out


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 4, quality: int = 90
) -> bytes:
    """Frames → single-stream AVI/MJPEG bytes (spec-shaped headers,
    even-padded '00dc' chunks, 'idx1' index)."""
    from .jpeg import encode_jpeg

    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(np.asarray(f, np.uint8), quality) for f in frames]
    bufsize = max(len(j) for j in jpegs)

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
        len(frames),       # dwTotalFrames
        0, 1,              # dwInitialFrames, dwStreams
        bufsize,           # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,  # dwWidth, dwHeight, reserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        # dwFlags, wPriority, wLanguage, dwInitialFrames, dwScale, dwRate,
        # dwStart, dwLength, dwSuggestedBufferSize, dwQuality, dwSampleSize
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), bufsize, 0xFFFFFFFF, 0
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame — offsets relative to the 'movi' list type
    idx_entries = []
    off = 4
    for j in jpegs:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
