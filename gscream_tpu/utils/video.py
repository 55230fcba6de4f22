"""Minimal dependency-free video encoding: MJPEG frames in an AVI container.

The reference pipes spiral renders through ffmpeg into an mp4
(``/root/reference/train.py:844-846``); this environment ships no ffmpeg
binary, so we mux JPEG-compressed frames (via imageio/Pillow, which are
available) into the classic AVI RIFF container by hand — ~90 lines, plays
in every mainstream player.  Only the structures MJPEG needs are written:
RIFF/AVI, hdrl(avih + one strl(strh/strf)), movi with 00dc chunks, idx1.
"""
from __future__ import annotations

import io
import struct
from typing import Iterable

import numpy as np


def _jpeg_bytes(frame: np.ndarray, quality: int) -> bytes:
    import imageio.v2 as imageio
    buf = io.BytesIO()
    arr = (np.clip(frame, 0, 1) * 255).astype(np.uint8) \
        if frame.dtype != np.uint8 else frame
    imageio.imwrite(buf, arr, format="jpeg", quality=quality)
    return buf.getvalue()


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def write_mjpeg_avi(path: str, frames: Iterable[np.ndarray],
                    fps: int = 30, quality: int = 90) -> int:
    """Encode (H,W,3) float[0,1]/uint8 frames as MJPEG AVI.

    Returns the number of frames written (0 = nothing to do).
    """
    frames = list(frames)
    jpegs = [_jpeg_bytes(f, quality) for f in frames]
    if not jpegs:
        return 0
    h, w = frames[0].shape[:2]
    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 // fps),        # microseconds per frame
        max_size * fps,         # max bytes per second (upper bound)
        0,                      # padding granularity
        0x10,                   # flags: AVIF_HASINDEX
        n, 0,                   # total frames, initial frames
        1,                      # streams
        max_size,               # suggested buffer size
        w, h, 0, 0, 0, 0)       # width, height, reserved[4]

    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0,                      # dwFlags
        0, 0,                   # wPriority, wLanguage
        0,                      # dwInitialFrames
        1, fps,                 # dwScale, dwRate → fps frames/s
        0, n,                   # dwStart, dwLength (frames)
        max_size,               # dwSuggestedBufferSize
        0xFFFFFFFF, 0,          # dwQuality (-1 = default), dwSampleSize
        0, 0, w & 0x7FFF, h & 0x7FFF)  # rcFrame l,t,r,b

    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)

    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_chunks, idx, offset = [], [], 4  # offset starts after 'movi'
    for j in jpegs:
        ch = _chunk(b"00dc", j)
        movi_chunks.append(ch)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(j)))
        offset += len(ch)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))

    body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return n


def write_video(path_base: str, frames, fps: int = 30) -> str:
    """Spiral video artifact: ``<path_base>.mp4`` (MPEG-4 part 2 via
    OpenCV's bundled encoder — the reference ffmpeg-encodes an mp4,
    train.py:844-846), falling back to the dependency-free MJPEG AVI when
    cv2 is unavailable.  Returns the path actually written."""
    frames = list(frames)
    if not frames:
        return ""
    try:
        import cv2
        h, w = frames[0].shape[:2]
        out = path_base + ".mp4"
        vw = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError("VideoWriter failed to open")
        for f in frames:
            arr = (np.clip(f, 0, 1) * 255).astype(np.uint8) \
                if f.dtype != np.uint8 else f
            vw.write(arr[..., ::-1])               # RGB → BGR
        vw.release()
        return out
    except Exception:
        out = path_base + ".avi"
        write_mjpeg_avi(out, frames, fps=fps)
        return out
