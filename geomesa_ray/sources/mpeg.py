"""MPEG audio (MP3) frame-header parsing — from the public MPEG-1/2
audio spec (ISO/IEC 11172-3 / 13818-3 frame header layout).

Structural PROBE, not a decoder: locates the frame sync, validates the
header fields, walks the frame chain to count frames / bytes / duration,
and reads the Xing/Info VBR tag when present — the metadata a corpus
pipeline needs to filter/route/batch audio at scale. PCM decode raises
in stages/multimodal.py (no audio codec in this environment).

``mp3_synth`` emits a chain of VALID CBR frame headers with zeroed
payloads (structure real, audio silent), so tests parse real frames.
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III bitrate table (kbps), index 1..14
_BITRATES_V1_L3 = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320]
# MPEG-2/2.5 Layer III
_BITRATES_V2_L3 = [None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   144, 160]
_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
          0: [11025, 12000, 8000]}  # version bits → sample rates


class MpegError(ValueError):
    pass


def _parse_header(b: bytes, pos: int) -> dict | None:
    """Parse 4 header bytes at pos; None if not a valid L3 frame header."""
    if pos + 4 > len(b):
        return None
    h = struct.unpack_from(">I", b, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 3       # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h >> 17) & 3         # 1 == Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3           # 3 = mono
    table = _BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3
    bitrate = table[br_idx] * 1000
    rate = _RATES[version][sr_idx]
    spf = 1152 if version == 3 else 576  # samples per L3 frame
    size = spf * bitrate // (8 * rate) + padding
    return {"version": version, "bitrate": bitrate, "sample_rate": rate,
            "samples": spf, "size": size, "channels": 1 if mode == 3 else 2}


def mp3_probe(payload: bytes) -> dict:
    """Walk the frame chain → ``{"n_frames", "duration_s", "sample_rate",
    "channels", "bitrate_kbps" (mean), "vbr": bool}``. Skips a leading
    ID3v2 tag; raises :class:`MpegError` when no coherent frame chain
    exists (never guesses)."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # syncsafe 28-bit size
        sz = 0
        for byte in payload[6:10]:
            sz = (sz << 7) | (byte & 0x7F)
        pos = 10 + sz
    first = _parse_header(payload, pos)
    if first is None:
        raise MpegError("no MPEG audio frame sync at stream start")
    n = 0
    total_samples = 0
    total_bits = 0
    bitrates = set()
    vbr = False
    # Xing/Info tag sits in the first frame's side-info region
    side = 17 if first["channels"] == 1 else 32
    if first["version"] != 3:
        side = 9 if first["channels"] == 1 else 17
    tag_at = pos + 4 + side
    if payload[tag_at:tag_at + 4] in (b"Xing", b"Info"):
        flags = struct.unpack_from(">I", payload, tag_at + 4)[0]
        vbr = payload[tag_at:tag_at + 4] == b"Xing"
        if flags & 1:
            n_declared = struct.unpack_from(">I", payload, tag_at + 8)[0]
        else:
            n_declared = None
    else:
        n_declared = None
    while True:
        h = _parse_header(payload, pos)
        if h is None:
            break
        n += 1
        total_samples += h["samples"]
        total_bits += h["size"] * 8
        bitrates.add(h["bitrate"])
        pos += h["size"]
        if pos >= len(payload):
            break
    if n == 0:
        raise MpegError("frame chain empty")
    dur = total_samples / first["sample_rate"]
    return {
        "n_frames": n_declared if n_declared is not None else n,
        "walked_frames": n,
        "duration_s": dur,
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "bitrate_kbps": round(total_bits / dur / 1000) if dur else None,
        "vbr": vbr or len(bitrates) > 1,
    }


def mp3_synth(n_frames: int = 38, bitrate_kbps: int = 128,
              sample_rate: int = 44100, mono: bool = False) -> bytes:
    """Valid CBR MPEG-1 Layer III frame chain with zeroed payloads."""
    br_idx = _BITRATES_V1_L3.index(bitrate_kbps)
    sr_idx = _RATES[3].index(sample_rate)
    mode = 3 if mono else 0
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
    hdr = struct.pack(">I", h)
    size = 1152 * bitrate_kbps * 1000 // (8 * sample_rate)
    frame = hdr + b"\x00" * (size - 4)
    return frame * n_frames
