"""Pure-stdlib media codecs: PNG (zlib), baseline JPEG, and WAV.

No image/audio libraries ship in this environment, but PNG is DEFLATE
(zlib, stdlib) plus well-specified per-scanline filters, baseline JPEG is
Huffman + IDCT over the published T.81 spec (see
:mod:`geomesa_ray.sources.jpeg`), and WAV is raw PCM behind a RIFF header
— all implementable from the public specs. These power the multimodal
stages' ``mode="real"`` path for png/jpeg/wav payloads; mp3/mp4 still
raise, documented.

PNG support: 8-bit depth, grayscale / RGB / RGBA, no interlace, all five
scanline filters on decode (the encoder writes filter 0).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

from geomesa_ray.sources.gif import (  # noqa: E402  (re-export: one codec namespace)
    GIF_MAGIC,
    gif_decode,
    gif_encode,
)
from geomesa_ray.sources.jpeg import (  # noqa: E402
    JPEG_MAGIC,
    jpeg_decode,
    jpeg_encode,
)


def image_decode(data: bytes) -> np.ndarray:
    """Magic-dispatched image decode: PNG, baseline JPEG or GIF (first
    frame) → (h, w, c) uint8."""
    if data[:8] == PNG_MAGIC:
        return png_decode(data)
    if data[:2] == JPEG_MAGIC:
        return jpeg_decode(data)
    if data[:4] == GIF_MAGIC:
        return gif_decode(data)[0]
    raise ValueError("unrecognized image payload (PNG/JPEG/GIF magic expected)")

_CHANNELS = {0: 1, 2: 3, 6: 4}  # colortype → channels (8-bit only)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8 array (c = 1/3/4)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, colortype, comp, filt, interlace = ihdr
    if depth != 8 or colortype not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"png variant unsupported (depth={depth} colortype={colortype} "
            f"interlace={interlace})"
        )
    c = _CHANNELS[colortype]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # sub / average / paeth need a left scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - c] if x >= c else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    cc = prev[x - c] if x >= c else 0  # upper-left
                    p = a + b - cc
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 array → PNG bytes (filter 0)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    colortype = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(rows.tobytes(), 6)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) array (vectorized take)."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi[:, None], xi[None, :]]


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        channels = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {width}")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def wav_encode(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Mono float samples in [-1, 1] → 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()
