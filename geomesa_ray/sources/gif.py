"""Pure-stdlib GIF codec (GIF87a/89a, the published CompuServe spec).

GIF is the web's third image format and its lightweight animation
container, so the multimodal stages' ``mode="real"`` path covers it:
:func:`gif_decode` returns EVERY frame composited onto the logical
screen (palette indirection, local palettes, interlace, transparency,
disposal methods 0-2), which also makes real frame-sampling possible
(stages/multimodal.py SampleFrames) — mp4 stays a deterministic fake.

The LZW loops iterate over CODES (≤ 4096-entry dictionary), not pixels,
and run inside small-batch actor stages like the other codecs.

Encoder: GIF89a, global 256-color palette built from the frames (inputs
must use ≤ 256 distinct colors — synthetic/test media does), full-frame
images, optional multi-frame animation with a graphic-control block per
frame. Round-trip is exact and property-tested.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF8"


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0

    def reset_table():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = reset_table()
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = reset_table()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out[:pos]
            if prev is None:
                if code >= len(table) or not table[code]:
                    raise ValueError(
                        f"LZW: first code {code} not a literal root"
                    )
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if not entry:  # clear/eoi placeholder slots hold b''
                    raise ValueError(
                        f"LZW: code {code} hits a clear/eoi placeholder"
                    )
                table.append(prev + entry[:1])
            elif code == len(table):  # the (only legal) KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(
                    f"LZW: code {code} beyond next table slot {len(table)}"
                )
            n = len(entry)
            if pos + n > n_pixels:
                n = n_pixels - pos
            out[pos:pos + n] = np.frombuffer(entry[:n], dtype=np.uint8)
            pos += n
            if pos >= n_pixels:
                return out
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out[:pos]


def _lzw_encode(min_code_size: int, pixels: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    buf = b""
    for px in pixels.tobytes():
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = bytes([px])
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = len(rows)
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_decode(data: bytes) -> list[np.ndarray]:
    """GIF bytes → list of (h, w, 3) uint8 frames (composited canvas)."""
    if data[:4] != GIF_MAGIC or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/89a payload")
    w, h, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            subs = []
            while data[pos]:
                size = data[pos]
                subs.append(data[pos + 1:pos + 1 + size])
                pos += 1 + size
            pos += 1  # terminator
            if label == 0xF9 and subs:  # graphic control
                gflags = subs[0][0]
                disposal = (gflags >> 2) & 0x07
                transparent = subs[0][3] if gflags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image without any color table")
        mcs = data[pos]
        pos += 1
        comp = bytearray()
        while data[pos]:
            size = data[pos]
            comp += data[pos + 1:pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = _lzw_decode(mcs, bytes(comp), iw * ih).reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        region = canvas[iy:iy + ih, ix:ix + iw]
        rgb = pal[idx]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            rgb = np.where(mask, rgb, region)
        prev_region = region.copy()
        canvas[iy:iy + ih, ix:ix + iw] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background (bg_idx indexes the GLOBAL
            # color table per the spec — never a frame-local palette)
            canvas[iy:iy + ih, ix:ix + iw] = (
                gct[bg_idx] if gct is not None else 0
            )
        elif disposal == 3:  # restore to previous
            canvas[iy:iy + ih, ix:ix + iw] = prev_region
        transparent = None
        disposal = 0
    return frames


def gif_encode(frames: np.ndarray | list[np.ndarray], delay_cs: int = 4) -> bytes:
    """(h, w, 3) uint8 frame (or list of equally-sized frames) → GIF89a
    bytes with one global palette over all frames (≤ 256 distinct colors
    required; raises otherwise)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors (max 256 for GIF)")
    # palette size must be a power of two ≥ 2
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += pal.tobytes()
    mcs = max(2, bits)
    idx_frames = inverse.astype(np.uint8).reshape(len(frames), h, w)
    for i, fidx in enumerate(idx_frames):
        if len(idx_frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        comp = _lzw_encode(mcs, fidx.ravel())
        for off in range(0, len(comp), 255):
            chunk = comp[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
