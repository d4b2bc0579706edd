"""GIF codec (sources/gif.py): exact LZW round-trips incl. the KwKwK
case and dictionary resets, interlace, transparency/disposal compositing,
animation frames, and the real-mode frame-sampling stage."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_ray.sources.gif import (
    GIF_MAGIC,
    _deinterlace,
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
)


def test_lzw_kwkwk_case():
    # 'ababab...' forces the code-not-yet-in-table branch
    px = np.array([0, 1] * 50, dtype=np.uint8)
    out = _lzw_decode(2, _lzw_encode(2, px), len(px))
    np.testing.assert_array_equal(out, px)


def test_lzw_dictionary_reset():
    # enough distinct phrases to push next_code past 4096
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, 20_000, dtype=np.uint8)
    out = _lzw_decode(8, _lzw_encode(8, px), len(px))
    np.testing.assert_array_equal(out, px)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    ncol=st.integers(1, 16), seed=st.integers(0, 10_000),
)
def test_gif_roundtrip_exact(h, w, ncol, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, (h, w))]
    frames = gif_decode(gif_encode(img))
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0], img)


def test_gif_animation_roundtrip():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 32, (20, 24))] for _ in range(5)]
    data = gif_encode(frames)
    assert data[:4] == GIF_MAGIC
    out = gif_decode(data)
    assert len(out) == 5
    for a, b in zip(out, frames):
        np.testing.assert_array_equal(a, b)


def test_gif_palette_overflow_raises():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # ~4k colors
    with pytest.raises(ValueError, match="distinct colors"):
        gif_encode(img)


def test_deinterlace_order():
    h = 11
    rows = np.arange(h)[:, None]
    # rows as written by an interlaced encoder: pass order 0::8,4::8,2::4,1::2
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    np.testing.assert_array_equal(_deinterlace(rows[order]).ravel(), np.arange(h))


def test_gif_transparency_composites_previous():
    """Frame 2 marks index 0 transparent: those pixels must keep frame 1's
    content (hand-assembled graphic-control block)."""
    import struct

    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    f1 = pal[np.zeros((4, 4), dtype=int)]       # all red
    f2_idx = np.zeros((4, 4), dtype=np.uint8)
    f2_idx[2:, :] = 1                            # bottom green, top transparent
    data = bytearray(gif_encode([f1, pal[f2_idx]]))
    # flip frame 2's graphic-control flags to transparent_idx=0:
    # find the second 0x21 0xF9 block and set its flag byte + index
    pos = data.find(b"\x21\xf9\x04", data.find(b"\x21\xf9\x04") + 1)
    assert pos > 0
    data[pos + 3] |= 0x01      # transparency on
    # the encoder's palette is np.unique-sorted: green [0,255,0] = 0,
    # red [255,0,0] = 1 — mark RED transparent (frame 2's top rows)
    data[pos + 6] = 1
    frames = gif_decode(bytes(data))
    np.testing.assert_array_equal(frames[1][:2], f1[:2])      # kept from f1
    np.testing.assert_array_equal(frames[1][2:], pal[f2_idx][2:])


def test_image_decode_dispatches_gif():
    from geomesa_ray.sources.codecs import image_decode

    pal = np.array([[1, 2, 3], [9, 8, 7]], dtype=np.uint8)
    img = pal[np.random.default_rng(0).integers(0, 2, (6, 5))]
    np.testing.assert_array_equal(image_decode(gif_encode(img)), img)


def test_sample_frames_real_gif(ray_session):
    import ray.data

    from geomesa_ray.stages.multimodal import SampleFrames, synth_media

    t = synth_media(6, fmt="gif")
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        SampleFrames(n_frames=3, out_h=8, out_w=8, mode="real").__call__,
        batch_format="pyarrow", batch_size=4,
    ).to_pandas()
    assert len(out) == 6 * 3
    assert set(out["frame_idx"]) == {0, 1, 2}
    assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])


def test_sample_frames_real_rejects_non_gif(ray_session):
    from geomesa_ray.stages.multimodal import SampleFrames

    stage = SampleFrames(mode="real")
    with pytest.raises(NotImplementedError, match="GIF only"):
        stage._real_frames(b"\x00\x00\x00\x18ftypmp42")


def test_lzw_rejects_out_of_range_code():
    """A code beyond the next free table slot is not a legal KwKwK —
    corrupt streams must raise, not decode to wrong pixels (ADVICE r3)."""
    # encode a tiny stream, then splice in a far-out-of-range code word
    enc = _lzw_encode(2, np.array([0, 1, 2, 3, 0, 1], dtype=np.uint8))
    # min_code_size=2: after clear(4), codes are 3 bits; craft a raw
    # stream: clear(4), literal 0, then code 7 (table has 6 entries,
    # next slot is 6 → 7 is out of range)
    bits = [(4, 3), (0, 3), (7, 3)]
    acc = nbits = 0
    raw = bytearray()
    for code, w in bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            raw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        raw.append(acc & 0xFF)
    with pytest.raises(ValueError, match="beyond next table slot"):
        _lzw_decode(2, bytes(raw), 16)
    assert isinstance(enc, bytes)  # sanity: encoder untouched


def test_lzw_rejects_first_code_nonliteral():
    """The first code after a clear must be a literal root."""
    bits = [(4, 3), (6, 3)]  # clear, then a non-literal (table slot 6)
    acc = nbits = 0
    raw = bytearray()
    for code, w in bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            raw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        raw.append(acc & 0xFF)
    with pytest.raises(ValueError, match="not a literal root"):
        _lzw_decode(2, bytes(raw), 16)
