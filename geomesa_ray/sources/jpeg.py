"""Pure-stdlib+numpy baseline JPEG codec (ITU-T T.81 / JFIF).

No image library ships in this environment, so the dominant web image
format is implemented from the public spec: baseline sequential DCT,
8-bit, Huffman entropy coding, grayscale and YCbCr with 4:4:4 / 4:2:2 /
4:2:0 subsampling, restart markers. The encoder (used by tests to build
fixtures and by exporters) writes 4:4:4 with the Annex K example tables,
quality-scaled per the common IJG convention.

Decode strategy: marker parse → per-table 16-bit-peek Huffman LUTs (every
JPEG code is ≤ 16 bits, so one 65536-entry table gives O(1) symbol
decode) → a 32-bit bit-buffer entropy loop (the per-symbol Python loop is
inherent to Huffman; everything after — dequantize, de-zigzag, IDCT,
upsample, color convert — is batched numpy over all blocks at once).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# zig-zag scan order: zigzag index -> raster index (T.81 figure 5)
_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K example quantization tables (luminance / chrominance), raster order
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K example Huffman specs: (bits[1..16] counts, symbol values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: spatial = C.T @ coef @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5
        )


def _canonical_codes(bits: list[int], values: list[int]):
    """(length, code) per symbol in canonical JPEG order."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, values[k]))
            code += 1
            k += 1
        code <<= 1
    return out


def _peek_lut(bits: list[int], values: list[int]):
    """65536-entry (symbol, length) LUT keyed by the next 16 bits."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for length, code, value in _canonical_codes(bits, values):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = value
        ln[lo:hi] = length
    return sym, ln


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: category-t magnitude bits → signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitReader:
    """32-bit buffered MSB-first reader over de-stuffed entropy bytes."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)


def _destuff(data: bytes) -> list[bytes]:
    """Entropy-coded bytes → per-restart-interval segments with 0xFF00
    stuffing removed (RSTn markers delimit segments)."""
    segs, cur = [], bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            m = data[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # restart marker
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the scan (EOI / next SOS)
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, c) uint8, c = 1 (grayscale) or 3 (RGB)."""
    if data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> LUT pair
    comps: list[dict] = []
    h = w = 0
    restart = 0
    i = 2
    scan_data = None
    scan_comps = None
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"marker sync lost at {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xFF:  # fill byte padding before a marker
            i -= 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = vals  # stored in zigzag order
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nsym = sum(bits)
                values = list(seg[j + 17 : j + 17 + nsym])
                huff[(tc, th)] = _peek_lut(bits, values)
                j += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            h, w = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline (SOF0) JPEG")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan_comps.append({**comp, "td": tt >> 4, "ta": tt & 15})
            scan_data = data[i:]
            break
        # APPn / COM / others: skipped via seglen
    if not comps or scan_data is None:
        raise ValueError("missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # per-scan-component coefficient store, one 64-vector per block
    for c in scan_comps:
        c["blocks"] = np.zeros((n_mcu * c["h"] * c["v"], 64), dtype=np.int32)
        c["nb"] = 0
        c["pred"] = 0

    segs = _destuff(scan_data)
    mcu_done = 0
    seg_idx = 0
    reader = _BitReader(segs[0])
    interval = restart if restart else n_mcu
    while mcu_done < n_mcu:
        if mcu_done and restart and mcu_done % interval == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            for c in scan_comps:
                c["pred"] = 0
        for c in scan_comps:
            dc_sym, dc_len = huff[(0, c["td"])]
            ac_sym, ac_len = huff[(1, c["ta"])]
            for _ in range(c["h"] * c["v"]):
                blk = c["blocks"][c["nb"]]
                # DC
                p16 = reader.peek16()
                t = int(dc_sym[p16])
                if t < 0:
                    raise ValueError("bad DC Huffman code")
                reader.skip(int(dc_len[p16]))
                diff = _extend(reader.read(t), t) if t else 0
                c["pred"] += diff
                blk[0] = c["pred"]
                # AC
                k = 1
                while k < 64:
                    p16 = reader.peek16()
                    rs = int(ac_sym[p16])
                    if rs < 0:
                        raise ValueError("bad AC Huffman code")
                    reader.skip(int(ac_len[p16]))
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC index overflow")
                    blk[k] = _extend(reader.read(s), s)
                    k += 1
                c["nb"] += 1
        mcu_done += 1

    # batched dequantize → de-zigzag → IDCT → level shift, all blocks at once
    planes = []
    for c in scan_comps:
        coef = c["blocks"].astype(np.float64) * qt[c["tq"]][_ZZ][None, :]
        raster = np.zeros_like(coef)
        raster[:, _ZZ] = coef
        blocks = raster.reshape(-1, 8, 8)
        spatial = np.einsum("ki,nkl,lj->nij", _C, blocks, _C) + 128.0
        # assemble the component plane from MCU-ordered blocks
        ch, cv = c["h"], c["v"]
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        plane = np.zeros((ph, pw))
        b = spatial.reshape(mcuy, mcux, cv, ch, 8, 8)
        plane = b.transpose(0, 2, 4, 1, 3, 5).reshape(ph, pw)
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4, Annex K tables, IJG quality scaling)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.buf = (self.buf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _enc_maps(bits, values):
    """symbol -> (code, length) dict for the encoder."""
    return {v: (code, length) for length, code, v in _canonical_codes(bits, values)}


def _encode_block(blk: np.ndarray, pred: int, dc_map, ac_map, bw: _BitWriter) -> int:
    """Quantized raster block → entropy bits; returns the new DC predictor."""
    zz = blk.ravel()[_ZZ]
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = int(mag).bit_length()
    code, length = dc_map[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                c, ln = ac_map[0x00]  # EOB
                bw.write(c, ln)
                break
            run += 1
            if run == 16:
                c, ln = ac_map[0xF0]  # ZRL
                bw.write(c, ln)
                run = 0
            continue
        s = int(abs(v)).bit_length()
        c, ln = ac_map[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


_SAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 1|3) uint8 → baseline JFIF bytes (Annex K tables; luma
    sampling per ``subsampling``, chroma averaged-pooled; optional RSTn
    markers every ``restart_interval`` MCUs)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [y, cb, cr]
        hs, vs = _SAMPLING[subsampling]
        samp = [(hs, vs), (1, 1), (1, 1)]
        qts = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
        comp_qt = [0, 1, 1]
        huffs = [
            (_enc_maps(*_HUFF_DC_LUMA), _enc_maps(*_HUFF_AC_LUMA)),
            (_enc_maps(*_HUFF_DC_CHROMA), _enc_maps(*_HUFF_AC_CHROMA)),
        ]
        comp_huff = [0, 1, 1]
    elif ch == 1:
        planes = [arr[..., 0].astype(np.float64)]
        samp = [(1, 1)]
        qts = [_scaled_qt(_QT_LUMA, quality)]
        comp_qt = [0]
        huffs = [(_enc_maps(*_HUFF_DC_LUMA), _enc_maps(*_HUFF_AC_LUMA))]
        comp_huff = [0]
    else:
        raise ValueError("need 1 or 3 channels")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(JPEG_MAGIC)
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in q.reshape(8, 8).ravel()[_ZZ]
        )
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * len(planes)) + b"\x08" + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci in range(len(planes)):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], comp_qt[ci]])
    specs = [(_HUFF_DC_LUMA, 0x00), (_HUFF_AC_LUMA, 0x10)]
    if len(planes) == 3:
        specs += [(_HUFF_DC_CHROMA, 0x01), (_HUFF_AC_CHROMA, 0x11)]
    for (bits, values), tcth in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tcth]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(planes)) + bytes([len(planes)])
    for ci in range(len(planes)):
        t = comp_huff[ci]
        out += bytes([ci + 1, (t << 4) | t])
    out += b"\x00\x3f\x00"

    # per-comp quantized block grids (rows = mcuy*v, cols = mcux*h), numpy-batched
    grids = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # average-pool chroma to its sampling grid
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        rows, cols = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(
            plane,
            ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = p.reshape(rows // 8, 8, cols // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ik,rckl,jl->rcij", _C, blocks, _C)
        q = qts[comp_qt[ci]].reshape(8, 8)
        grids.append(np.round(coef / q).astype(np.int32))

    bw = _BitWriter()
    preds = [0] * len(planes)
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci in range(len(planes)):
            hi, vi = samp[ci]
            dc_map, ac_map = huffs[comp_huff[ci]]
            for by in range(vi):
                for bx in range(hi):
                    blk = grids[ci][my * vi + by, mx * hi + bx]
                    preds[ci] = _encode_block(blk, preds[ci], dc_map, ac_map, bw)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_size(data: bytes) -> tuple[int, int]:
    """(height, width) from the first SOF marker — a header probe that
    works for ANY SOF type (progressive included), unlike the baseline
    decoder above."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # legal fill byte run: resync on the next 0xFF
            i += 1
            continue
        if marker == 0xD9:  # EOI: no SOF seen
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # length-less markers
            continue
        if i + 4 > len(data):
            break
        seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            return h, w
        i += 2 + seglen
    raise ValueError("no SOF marker found")
