"""Pure-stdlib PNG/WAV codecs + the multimodal real-decode path."""

import numpy as np
import pytest

from geomesa_ray.sources.codecs import (
    png_decode,
    png_encode,
    resize_nearest,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("shape", [(5, 7, 3), (16, 16, 4), (9, 3, 1)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    back = png_decode(png_encode(img))
    np.testing.assert_array_equal(back, img)


def test_png_all_decode_filters():
    """Hand-build a PNG using every scanline filter type; the decoder must
    reconstruct the same pixels as the filter-0 encoding."""
    import struct
    import zlib

    from geomesa_ray.sources.codecs import PNG_MAGIC, _chunk

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8).astype(np.int32)
    h, w, c = img.shape
    raws = []
    prev = np.zeros(w * c, dtype=np.int32)
    filters = [0, 1, 2, 3, 4]
    for y in range(h):
        cur = img[y].reshape(-1)
        ft = filters[y]
        enc = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
            enc[x] = (cur[x] - pred) & 0xFF
        raws.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png_decode(data), img.astype(np.uint8))


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_resize_nearest():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = resize_nearest(img, 2, 2)
    assert out.shape == (2, 2, 1)
    assert out[0, 0, 0] == img[0, 0, 0]


def test_wav_roundtrip():
    t = np.arange(800) / 16_000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    back, rate = wav_decode(wav_encode(sig, 16_000))
    assert rate == 16_000
    np.testing.assert_allclose(back, sig, atol=1e-4)


def test_multimodal_real_png_pipeline(ray_session):
    import ray.data

    from geomesa_ray.stages.multimodal import decode_pipeline, synth_media

    media = synth_media(12, seed=5, fmt="png")
    out = decode_pipeline(
        ray.data.from_arrow(media), mode="real", concurrency=2, batch_size=4
    ).to_pandas()
    assert len(out) == 12
    assert all(len(f) == 14 for f in out["features"])
    # real decode is deterministic: same input → same features
    out2 = decode_pipeline(
        ray.data.from_arrow(media), mode="real", concurrency=2, batch_size=4
    ).to_pandas()
    a = np.stack(out.sort_values("media_id")["features"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["features"].to_numpy())
    np.testing.assert_array_equal(a, b)


def test_multimodal_real_wav(ray_session):
    import ray.data

    from geomesa_ray.stages.multimodal import DecodeAudio, synth_media

    media = synth_media(6, seed=6, fmt="wav")
    out = (
        ray.data.from_arrow(media)
        .map_batches(
            DecodeAudio,
            fn_constructor_kwargs={"mode": "real"},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    assert len(out) == 6
    feats = np.stack(out["audio_features"].to_numpy())
    assert feats.shape == (6, 10)
    assert np.isfinite(feats).all()


def test_real_mode_raises_on_undedcodable_format(ray_session):
    from geomesa_ray.stages.multimodal import DecodeImage, synth_media

    media = synth_media(2, seed=7, fmt="fake")  # opaque bytes, not PNG
    with pytest.raises(Exception):
        DecodeImage(mode="real")(media)
