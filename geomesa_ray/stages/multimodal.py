"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. ``mode="real"`` decodes PNG and baseline JPEG
images and WAV audio with the pure-stdlib codecs in
:mod:`geomesa_ray.sources.codecs` / :mod:`geomesa_ray.sources.jpeg`
(no external image/audio library exists in this environment); mp3/mp4
raise ``NotImplementedError`` there, and ``mode="fake"`` produces
deterministic bytes-derived outputs so the plumbing stays testable for
the formats we cannot decode.

Batch-size guidance: payloads are large, so these stages run with SMALL
``batch_size`` (default 64) and actor pools; at scale, block size should be
capped via DataContext.target_max_block_size so a batch × concurrency fits
worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_META_TYPE = pa.struct(
    [
        ("media_type", pa.string()),  # image/audio/video
        ("format", pa.string()),  # e.g. jpeg/png/wav/mp4
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic pseudo-decode: bytes → (h, w, c) uint8 via sha256 PRF."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


class DecodeImage:
    """Actor stage: binary → fixed-size pixel tensor column.

    ``mode="real"`` decodes PNG and baseline JPEG via the pure-stdlib
    codecs (bound once per actor in ``__init__`` — the model-load slot);
    other formats raise there. ``mode="fake"`` derives deterministic
    pixels from the payload bytes.
    """

    def __init__(self, mode: str = "fake", out_h: int = 32, out_w: int = 32,
                 payload_col: str = "payload"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.out_h = out_h
        self.out_w = out_w
        self.payload_col = payload_col
        if mode == "real":
            # codec bound once per actor (the model-load slot)
            from geomesa_ray.sources.codecs import image_decode, resize_nearest

            self._decode = image_decode
            self._resize = resize_nearest

    def _real_pixels(self, payload: bytes) -> np.ndarray:
        img = self._decode(payload)  # PNG/baseline JPEG; others raise
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        elif img.shape[2] == 4:
            img = img[:, :, :3]
        return self._resize(img, self.out_h, self.out_w).ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            pixels = [
                self._real_pixels(p)
                for p in batch[self.payload_col].to_pylist()
            ]
        else:
            pixels = [
                _fake_pixels(p, self.out_h, self.out_w).ravel()
                for p in batch[self.payload_col].to_pylist()
            ]
        flat = np.concatenate(pixels) if pixels else np.empty(0, np.uint8)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.uint8()), self.out_h * self.out_w * 3
        )
        return batch.drop_columns([self.payload_col]).append_column("pixels", arr)


class ImageFeatures:
    """Actor stage: pixel tensor → small float feature vector (channel
    means/stds + a 8-bin luma histogram). Pure numpy; runs on fake pixels."""

    def __init__(self, h: int = 32, w: int = 32):
        self.h = h
        self.w = w

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array([], pa.float64()), 14
            )
            return batch.drop_columns(["pixels"]).append_column("features", arr)
        flat = batch["pixels"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        imgs = flat.reshape(n, self.h, self.w, 3)
        means = imgs.mean(axis=(1, 2))  # (n, 3)
        stds = imgs.std(axis=(1, 2))
        luma = imgs @ np.array([0.299, 0.587, 0.114])
        hists = np.stack(
            [np.histogram(luma[i], bins=8, range=(0, 255))[0] for i in range(n)]
        ).astype(np.float64)
        feats = np.concatenate([means, stds, hists], axis=1)  # (n, 14)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float64()), feats.shape[1]
        )
        return batch.drop_columns(["pixels"]).append_column("features", arr)


class DecodeAudio:
    """Actor stage (audio): binary payload → fixed-rate sample window +
    8-band spectrum-ish features. ``mode="real"`` decodes WAV via the
    pure-stdlib codec (bound once per actor); mp3 etc. raise there. Fake
    mode derives deterministic samples from payload bytes."""

    def __init__(self, mode: str = "fake", n_samples: int = 1024,
                 payload_col: str = "payload"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.n_samples = n_samples
        self.payload_col = payload_col
        if mode == "real":
            from geomesa_ray.sources.codecs import wav_decode

            self._decode = wav_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch[self.payload_col].to_pylist():
            if self.mode == "real":
                samples, _rate = self._decode(p)  # WAV only; others raise
                wave = np.resize(samples, self.n_samples)
            else:
                seed = int.from_bytes(hashlib.sha256(p).digest()[:8], "little")
                rng = np.random.default_rng(seed)
                wave = rng.standard_normal(self.n_samples)
            spec = np.abs(np.fft.rfft(wave))
            bands = np.array_split(spec, 8)
            feats.append(
                np.concatenate(
                    [[wave.mean(), wave.std()], [b.mean() for b in bands]]
                )
            )
        flat = np.concatenate(feats) if feats else np.empty(0, np.float64)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float64()), 10)
        return batch.drop_columns([self.payload_col]).append_column(
            "audio_features", arr
        )


class SampleFrames:
    """Actor stage (video/animation): payload → ``n_frames`` evenly-spaced
    frames (one output row per frame: frame_idx + pixels).

    ``mode="real"`` decodes animated GIF payloads (sources/gif.py) and
    samples their true frames, nearest-resized to (out_h, out_w); mp4 has
    no in-environment decoder so real mode raises for it (documented
    capability edge — the fake path keeps the plumbing testable)."""

    def __init__(self, n_frames: int = 4, out_h: int = 16, out_w: int = 16,
                 payload_col: str = "payload", id_col: str = "media_id",
                 mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.n_frames = n_frames
        self.out_h = out_h
        self.out_w = out_w
        self.payload_col = payload_col
        self.id_col = id_col

    def _real_frames(self, p: bytes) -> list[np.ndarray]:
        from geomesa_ray.sources.codecs import resize_nearest
        from geomesa_ray.sources.gif import GIF_MAGIC, gif_decode

        if p[:4] != GIF_MAGIC:
            raise NotImplementedError(
                "real frame sampling supports GIF only (no mp4 decoder in env)"
            )
        frames = gif_decode(p)
        picks = np.linspace(0, len(frames) - 1, self.n_frames).round().astype(int)
        return [resize_nearest(frames[i], self.out_h, self.out_w) for i in picks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, pix = [], [], []
        for mid, p in zip(
            batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            if self.mode == "real":
                for f, frame in enumerate(self._real_frames(p)):
                    ids.append(mid)
                    fidx.append(f)
                    pix.append(frame.ravel())
                continue
            for f in range(self.n_frames):
                ids.append(mid)
                fidx.append(f)
                pix.append(_fake_pixels(p + f.to_bytes(4, "little"), self.out_h, self.out_w).ravel())
        flat = np.concatenate(pix) if pix else np.empty(0, np.uint8)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.uint8()), self.out_h * self.out_w * 3
        )
        return pa.table(
            {
                self.id_col: pa.array(ids, batch[self.id_col].type),
                "frame_idx": pa.array(fidx, pa.int32()),
                "pixels": arr,
            }
        )


def decode_pipeline(
    media: ray.data.Dataset,
    concurrency: int = 4,
    batch_size: int = 64,
    mode: str = "fake",
) -> ray.data.Dataset:
    """binary payloads → features, small batches through actor pools."""
    return media.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    ).map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def synth_media(n: int, seed: int = 42, fmt: str = "fake") -> pa.Table:
    """Deterministic media table for tests: (media_id, meta, payload).

    ``fmt="png"`` / ``"wav"`` produce REAL decodable payloads via the
    stdlib codecs (random RGB images / sine-mix clips); ``"fake"`` keeps
    opaque random bytes for the fake-decode plumbing path."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    if fmt == "png":
        from geomesa_ray.sources.codecs import png_encode

        sizes = rng.integers(8, 64, (n, 2))
        payloads = [
            png_encode(rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8))
            for h, w in sizes
        ]
        media_type, duration = "image", 0
    elif fmt == "jpeg":
        from geomesa_ray.sources.codecs import jpeg_encode

        sizes = rng.integers(8, 64, (n, 2))
        subs = ["444", "422", "420"]
        payloads = [
            jpeg_encode(
                rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8),
                quality=90,
                subsampling=subs[i % 3],
            )
            for i, (h, w) in enumerate(sizes)
        ]
        media_type, duration = "image", 0
    elif fmt == "gif":
        from geomesa_ray.sources.gif import gif_encode

        sizes = rng.integers(8, 48, (n, 2))
        payloads = []
        for h, w in sizes:
            # ≤ 16 distinct colors per animation (GIF palette bound)
            pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
            frames = [
                pal[rng.integers(0, 16, (int(h), int(w)))] for _ in range(4)
            ]
            payloads.append(gif_encode(frames))
        media_type, duration = "video", 16
    elif fmt == "mp4":
        from geomesa_ray.sources.bmff import mp4_synth

        payloads = [
            mp4_synth(
                duration_s=float(rng.uniform(1.0, 30.0)),
                width=int(rng.integers(64, 1920)),
                height=int(rng.integers(48, 1080)),
                n_samples=int(rng.integers(10, 300)),
            )
            for _ in range(n)
        ]
        media_type, duration = "video", 0
    elif fmt == "mp3":
        from geomesa_ray.sources.mpeg import mp3_synth

        brs = [64, 96, 128, 192, 320]
        payloads = [
            mp3_synth(
                n_frames=int(rng.integers(5, 80)),
                bitrate_kbps=brs[i % len(brs)],
                mono=bool(i % 2),
            )
            for i in range(n)
        ]
        media_type, duration = "audio", 0
    elif fmt == "wav":
        from geomesa_ray.sources.codecs import wav_encode

        payloads = []
        for _ in range(n):
            t = np.arange(1600) / 16_000.0
            f0 = float(rng.uniform(100, 2000))
            payloads.append(
                wav_encode(0.5 * np.sin(2 * np.pi * f0 * t)
                           + 0.2 * np.sin(2 * np.pi * 2 * f0 * t))
            )
        media_type, duration = "audio", 100
    else:
        payloads = [
            rng.integers(0, 256, int(rng.integers(200, 2000)), dtype=np.uint8).tobytes()
            for _ in range(n)
        ]
        media_type, duration = "image", 0
    meta = pa.array(
        [
            {
                "media_type": media_type,
                "format": fmt,
                "width": 32,
                "height": 32,
                "duration_ms": duration,
            }
            for _ in range(n)
        ],
        MEDIA_META_TYPE,
    )
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "meta": meta,
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class ProbeMedia:
    """Actor stage: REAL container-structure metadata extraction for every
    format the repo ships a parser for — MP4 (ISO BMFF box walk,
    sources/bmff.py), MP3 (MPEG frame-chain walk, sources/mpeg.py), plus
    the decodable formats (PNG/JPEG/GIF/WAV header probes). This is the
    pass a 100 TB media pipeline runs FIRST: filter/route/batch by
    duration, dimensions, codec, bitrate — no decode, no fake values.
    Unknown/corrupt payloads land as ``probe_ok=False`` with the error
    string (never a silent wrong answer); parsers bind once per actor.
    """

    OUT_FIELDS = [
        ("probe_ok", pa.bool_()),
        ("probe_error", pa.string()),
        ("container", pa.string()),
        ("codec", pa.string()),
        ("width", pa.float64()),
        ("height", pa.float64()),
        ("duration_s", pa.float64()),
        ("n_tracks", pa.int32()),
        ("n_samples", pa.int64()),
        ("sample_rate", pa.int32()),
        ("channels", pa.int32()),
        ("bitrate_kbps", pa.int32()),
    ]

    def __init__(self, payload_col: str = "payload"):
        from geomesa_ray.sources import bmff, codecs, gif, mpeg

        self.payload_col = payload_col
        self._bmff = bmff
        self._mpeg = mpeg
        self._gif = gif
        self._codecs = codecs

    def _probe(self, p: bytes) -> dict:
        out = {k: None for k, _ in self.OUT_FIELDS}
        out["probe_ok"] = True
        if len(p) >= 12 and p[4:8] == b"ftyp":
            m = self._bmff.mp4_probe(p)
            vid = next((t for t in m["tracks"] if t["handler"] == "vide"), None)
            t0 = vid or (m["tracks"][0] if m["tracks"] else {})
            out.update(
                container="mp4", codec=t0.get("codec"),
                width=t0.get("width"), height=t0.get("height"),
                duration_s=m["duration_s"], n_tracks=len(m["tracks"]),
                n_samples=t0.get("n_samples"),
            )
        elif p[:3] == b"ID3" or (len(p) > 1 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0):
            m = self._mpeg.mp3_probe(p)
            out.update(
                container="mp3", duration_s=m["duration_s"],
                n_samples=m["walked_frames"], sample_rate=m["sample_rate"],
                channels=m["channels"], bitrate_kbps=m["bitrate_kbps"],
                n_tracks=1,
            )
        elif p[:8] == b"\x89PNG\r\n\x1a\n":
            import struct

            w, h = struct.unpack(">II", p[16:24])
            out.update(container="png", width=float(w), height=float(h),
                       n_tracks=1)
        elif p[:2] == b"\xff\xd8":
            from geomesa_ray.sources.jpeg import jpeg_size

            h, w = jpeg_size(p)
            out.update(container="jpeg", width=float(w), height=float(h),
                       n_tracks=1)
        elif p[:6] in (b"GIF87a", b"GIF89a"):
            import struct

            w, h = struct.unpack("<HH", p[6:10])
            out.update(container="gif", width=float(w), height=float(h),
                       n_tracks=1)
        elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            import struct

            rate = struct.unpack("<I", p[24:28])[0]
            ch = struct.unpack("<H", p[22:24])[0]
            out.update(container="wav", sample_rate=rate, channels=ch,
                       n_tracks=1)
        else:
            raise ValueError(f"unrecognized container (magic {p[:4]!r})")
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch[self.payload_col].to_pylist():
            try:
                rows.append(self._probe(p))
            except Exception as e:
                row = {k: None for k, _ in self.OUT_FIELDS}
                row["probe_ok"] = False
                row["probe_error"] = f"{type(e).__name__}: {e}"[:160]
                rows.append(row)
        out = batch.drop_columns([self.payload_col])
        for name, typ in self.OUT_FIELDS:
            out = out.append_column(
                name, pa.array([r[name] for r in rows], typ)
            )
        return out
