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


# ---------------------------------------------------------------------------
# baseline JPEG (pure-stdlib T.81 codec)
# ---------------------------------------------------------------------------


def _handmade_gray_jpeg() -> bytes:
    """A byte-by-byte hand-assembled 8x8 grayscale baseline JPEG,
    independent of jpeg_encode: identity quant table, two tiny Huffman
    tables, DC=20 (-> every pixel 20/8 + 128 = 130.5 -> 130), EOB."""
    import struct

    out = bytearray(b"\xff\xd8")
    # DQT tq=0, all ones (identity dequant)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF0: 8-bit, 8x8, 1 component (id 1, 1x1 sampling, qt 0)
    out += b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 8, 8) + b"\x01" + bytes([1, 0x11, 0])
    # DHT DC class0 id0: one 2-bit code -> symbol 5 (category 5)
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x00" + bytes([0, 1] + [0] * 14) + bytes([5])
    # DHT AC class1 id0: one 2-bit code -> symbol 0x00 (EOB)
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x10" + bytes([0, 1] + [0] * 14) + bytes([0x00])
    # SOS: 1 comp (id 1, DC table 0 / AC table 0)
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00"
    # entropy: DC code '00' + magnitude 10100 (=20, category 5) + EOB '00'
    # bits: 00 10100 00 -> 001010000 + 7 one-pad = 0010 1000 0111 1111
    out += bytes([0b00101000, 0b01111111])
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_handmade_fixture_decodes_exactly():
    from geomesa_ray.sources.jpeg import jpeg_decode

    img = jpeg_decode(_handmade_gray_jpeg())
    assert img.shape == (8, 8, 1)
    # DC-only block: IDCT gives 20/8 + 128 = 130.5 everywhere; np.round
    # (half-to-even) -> 130
    assert (img == 130).all()


def test_jpeg_roundtrip_all_paths():
    from geomesa_ray.sources.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(11)
    h, w = 37, 53  # non-multiple-of-MCU dims exercise edge padding
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    for sub in ("444", "422", "420"):
        for ri in (0, 3):
            dec = jpeg_decode(
                jpeg_encode(img, quality=90, subsampling=sub, restart_interval=ri)
            )
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            # smooth gradients survive q90 quantization almost exactly;
            # chroma subsampling averages 2px neighborhoods
            assert err.max() <= (2 if sub == "444" else 8), (sub, ri)
    # grayscale
    g = (128 + 60 * np.sin(np.linspace(0, 3, 64))[None, :]
         * np.cos(np.linspace(0, 2, 48))[:, None]).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(g, quality=95))
    assert dec.shape == (48, 64, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2
    # random noise content still round-trips within JPEG's lossy envelope
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(noise, quality=95))
    assert dec.shape == noise.shape


def test_jpeg_rejects_non_baseline():
    import struct

    from geomesa_ray.sources.jpeg import jpeg_decode

    prog = bytearray(b"\xff\xd8")
    prog += b"\xff\xc2" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 8, 8) + b"\x01" + bytes([1, 0x11, 0])
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(prog))
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")


def test_multimodal_real_jpeg_pipeline(ray_session):
    import ray.data

    from geomesa_ray.stages.multimodal import decode_pipeline, synth_media

    media = synth_media(9, seed=8, fmt="jpeg")
    out = decode_pipeline(
        ray.data.from_arrow(media), mode="real", concurrency=2, batch_size=4
    ).to_pandas()
    assert len(out) == 9
    assert all(len(f) == 14 for f in out["features"])
    out2 = decode_pipeline(
        ray.data.from_arrow(media), mode="real", concurrency=2, batch_size=4
    ).to_pandas()
    a = np.stack(out.sort_values("media_id")["features"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["features"].to_numpy())
    np.testing.assert_array_equal(a, b)
