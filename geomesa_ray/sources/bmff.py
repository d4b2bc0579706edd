"""ISO Base Media File Format (MP4) box parsing — from the public spec
(ISO/IEC 14496-12): box = [size:4][type:4][payload], size==1 → 64-bit
largesize follows, size==0 → to end of enclosure.

This is a structural PROBE, not a codec: it walks the box tree and
extracts movie/track metadata (brands, timescales, durations, track
handlers, dimensions, sample counts, codec fourcc) so a media pipeline
can filter/route/batch 100 TB of video by metadata without decoding.
Actual frame decode still raises in stages/multimodal.py — no video
codec exists in this environment, and we do not pretend otherwise.

``mp4_synth`` builds a minimal VALID box structure (ftyp + moov with
mvhd/trak/tkhd/mdia/mdhd/hdlr/stbl + mdat) whose mdat payload is opaque
bytes; tests and the plumbing stages get real files to parse.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex"}


class BmffError(ValueError):
    pass


def _iter_boxes(buf: memoryview, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in [start, end)."""
    pos = start
    while pos < end:
        if end - pos < 8:
            raise BmffError(f"truncated box header at {pos}")
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = bytes(buf[pos + 4:pos + 8])
        hdr = 8
        if size == 1:
            if end - pos < 16:
                raise BmffError(f"truncated largesize at {pos}")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise BmffError(f"bad box size {size} at {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def _fullbox(buf: memoryview, start: int):
    """(version, flags, body_start) of a full box."""
    v = buf[start]
    flags = int.from_bytes(bytes(buf[start + 1:start + 4]), "big")
    return v, flags, start + 4


def mp4_probe(payload: bytes) -> dict:
    """Parse the box tree → movie metadata dict.

    Returns ``{"brands": [...], "duration_s": float, "timescale": int,
    "tracks": [{"id", "handler", "codec", "width", "height",
    "duration_s", "timescale", "n_samples"}, ...], "mdat_bytes": int}``.
    Raises :class:`BmffError` on malformed structure (never a silent
    wrong answer)."""
    buf = memoryview(payload)
    out = {"brands": [], "duration_s": None, "timescale": None,
           "tracks": [], "mdat_bytes": 0}
    found_moov = False

    def walk_stbl(s: int, e: int, track: dict) -> None:
        for t, ps, pe in _iter_boxes(buf, s, e):
            if t == b"stsd":
                _v, _f, b = _fullbox(buf, ps)
                n = struct.unpack_from(">I", buf, b)[0]
                if n >= 1 and pe - b >= 12:
                    # first sample entry: [size:4][format:4]
                    track["codec"] = bytes(buf[b + 8:b + 12]).decode(
                        "ascii", "replace"
                    )
            elif t == b"stsz":
                _v, _f, b = _fullbox(buf, ps)
                sample_size, count = struct.unpack_from(">II", buf, b)
                track["n_samples"] = count
            elif t == b"stts":
                _v, _f, b = _fullbox(buf, ps)
                n = struct.unpack_from(">I", buf, b)[0]
                total = 0
                for i in range(n):
                    cnt, _delta = struct.unpack_from(">II", buf, b + 4 + 8 * i)
                    total += cnt
                track.setdefault("n_samples", total)

    def walk_trak(s: int, e: int) -> None:
        track = {"id": None, "handler": None, "codec": None, "width": None,
                 "height": None, "duration_s": None, "timescale": None,
                 "n_samples": None}
        for t, ps, pe in _iter_boxes(buf, s, e):
            if t == b"tkhd":
                v, _f, b = _fullbox(buf, ps)
                if v == 1:
                    track["id"] = struct.unpack_from(">I", buf, b + 16)[0]
                    b2 = b + 28
                else:
                    track["id"] = struct.unpack_from(">I", buf, b + 8)[0]
                    b2 = b + 16
                # width/height are the last two 16.16 fixed values
                w, h = struct.unpack_from(">II", buf, pe - 8)
                track["width"] = w / 65536.0
                track["height"] = h / 65536.0
            elif t == b"mdia":
                for t2, ps2, pe2 in _iter_boxes(buf, ps, pe):
                    if t2 == b"mdhd":
                        v, _f, b = _fullbox(buf, ps2)
                        if v == 1:
                            ts, dur = struct.unpack_from(">IQ", buf, b + 16)
                        else:
                            ts, dur = struct.unpack_from(">II", buf, b + 8)
                        track["timescale"] = ts
                        track["duration_s"] = dur / ts if ts else None
                    elif t2 == b"hdlr":
                        _v, _f, b = _fullbox(buf, ps2)
                        track["handler"] = bytes(buf[b + 4:b + 8]).decode(
                            "ascii", "replace"
                        )
                    elif t2 == b"minf":
                        for t3, ps3, pe3 in _iter_boxes(buf, ps2, pe2):
                            if t3 == b"stbl":
                                walk_stbl(ps3, pe3, track)
        out["tracks"].append(track)

    for t, ps, pe in _iter_boxes(buf, 0, len(buf)):
        if t == b"ftyp":
            # [major_brand:4][minor_version:4][compatible brands:4 each] —
            # the version word is binary, not a brand
            out["brands"] = [
                bytes(buf[p:p + 4]).decode("ascii", "replace")
                for p in [ps] + list(range(ps + 8, pe, 4))
            ]
        elif t == b"moov":
            found_moov = True
            for t2, ps2, pe2 in _iter_boxes(buf, ps, pe):
                if t2 == b"mvhd":
                    v, _f, b = _fullbox(buf, ps2)
                    if v == 1:
                        ts, dur = struct.unpack_from(">IQ", buf, b + 16)
                    else:
                        ts, dur = struct.unpack_from(">II", buf, b + 8)
                    out["timescale"] = ts
                    out["duration_s"] = dur / ts if ts else None
                elif t2 == b"trak":
                    walk_trak(ps2, pe2)
        elif t == b"mdat":
            out["mdat_bytes"] += pe - ps
    if not found_moov:
        raise BmffError("no moov box (not an MP4 movie)")
    return out


# --- synthesis ---------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _fbox(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def mp4_synth(duration_s: float = 2.0, timescale: int = 1000,
              width: int = 64, height: int = 48, n_samples: int = 48,
              handler: bytes = b"vide", codec: bytes = b"mp4v",
              mdat: bytes = b"\x00" * 256) -> bytes:
    """Minimal valid ISO BMFF movie (structure real, mdat opaque)."""
    dur = int(duration_s * timescale)
    mvhd = _fbox(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, dur) + b"\x00" * 80)
    tkhd = _fbox(b"tkhd", 0, 7, struct.pack(
        ">IIII", 0, 0, 1, 0) + struct.pack(">I", dur) + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _fbox(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, dur) + b"\x00" * 4)
    hdlr = _fbox(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"x\x00")
    entry = struct.pack(">I", 16) + codec + b"\x00" * 8
    stsd = _fbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _fbox(b"stts", 0, 0, struct.pack(
        ">III", 1, n_samples, max(1, dur // max(1, n_samples))))
    stsz = _fbox(b"stsz", 0, 0, struct.pack(">III", 0, n_samples, 0)
                 + b"".join(struct.pack(">I", 16) for _ in range(n_samples)))
    stco = _fbox(b"stco", 0, 0, struct.pack(">II", 1, 0))
    stbl = _box(b"stbl", stsd + stts + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov + _box(b"mdat", mdat)
