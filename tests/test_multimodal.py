"""Multimodal stages: decode plumbing + real container probes."""

import numpy as np
import pyarrow as pa
import pytest



def test_multimodal_stages_tolerate_empty_batches():
    import numpy as np
    import pyarrow as pa

    from geomesa_ray.stages.multimodal import (
        DecodeAudio, DecodeImage, ImageFeatures, SampleFrames, synth_media,
    )

    empty = synth_media(1).slice(0, 0)
    out = DecodeImage()(empty)
    assert len(out) == 0 and "pixels" in out.schema.names
    assert len(ImageFeatures()(out)) == 0
    assert len(DecodeAudio()(empty)) == 0
    assert len(SampleFrames()(empty)) == 0


# --- round 4: real container probes (ISO BMFF / MPEG audio) -----------------


def test_mp4_probe_round_trip():
    from geomesa_ray.sources.bmff import BmffError, mp4_probe, mp4_synth

    p = mp4_synth(duration_s=12.5, timescale=600, width=320, height=240,
                  n_samples=300, codec=b"avc1")
    m = mp4_probe(p)
    assert m["duration_s"] == 12.5
    assert m["brands"][0] == "isom"
    t = m["tracks"][0]
    assert (t["width"], t["height"]) == (320.0, 240.0)
    assert t["codec"] == "avc1" and t["handler"] == "vide"
    assert t["n_samples"] == 300
    assert m["mdat_bytes"] == 256
    with pytest.raises(BmffError):
        mp4_probe(b"\x00\x00\x00\x08ftyp")  # ftyp only, no moov
    with pytest.raises(BmffError):
        mp4_probe(b"\xff\xff\xff\xffmoov" + b"\x00" * 4)  # bad size


def test_mp3_probe_round_trip():
    from geomesa_ray.sources.mpeg import MpegError, mp3_probe, mp3_synth

    p = mp3_synth(n_frames=77, bitrate_kbps=192, sample_rate=32000, mono=True)
    m = mp3_probe(p)
    assert m["walked_frames"] == 77
    assert m["sample_rate"] == 32000
    assert m["channels"] == 1
    assert m["bitrate_kbps"] == 192
    assert abs(m["duration_s"] - 77 * 1152 / 32000) < 1e-9
    assert not m["vbr"]
    with pytest.raises(MpegError):
        mp3_probe(b"not audio at all..")


def test_jpeg_size_probe_matches_decoder():
    from geomesa_ray.sources.codecs import jpeg_encode
    from geomesa_ray.sources.jpeg import jpeg_size

    img = np.arange(23 * 17 * 3, dtype=np.uint8).reshape(23, 17, 3)
    assert jpeg_size(jpeg_encode(img)) == (23, 17)
    with pytest.raises(ValueError):
        jpeg_size(b"\x00\x00 not a jpeg")


def test_probe_media_stage_all_formats(ray_session):
    import ray.data

    from geomesa_ray.stages.multimodal import ProbeMedia, synth_media

    parts = []
    for fmt in ("png", "jpeg", "gif", "wav", "mp4", "mp3"):
        t = synth_media(4, seed=9, fmt=fmt)
        parts.append(t)
    tbl = pa.concat_tables(parts)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(ProbeMedia, batch_format="pyarrow",
                     batch_size=6, concurrency=(1, 2))
        .to_pandas()
    )
    assert len(out) == 24
    assert out["probe_ok"].all()
    by = out.set_index(out.index)
    containers = out["container"].value_counts().to_dict()
    assert containers == {"png": 4, "jpeg": 4, "gif": 4, "wav": 4,
                          "mp4": 4, "mp3": 4}
    mp4s = out[out["container"] == "mp4"]
    assert (mp4s["duration_s"] > 0).all() and (mp4s["width"] >= 64).all()
    mp3s = out[out["container"] == "mp3"]
    assert set(mp3s["bitrate_kbps"]) <= {64, 96, 128, 192, 320}
    wavs = out[out["container"] == "wav"]
    assert (wavs["sample_rate"] == 16000).all()


def test_probe_media_corrupt_payload_flags_not_raises(ray_session):
    import ray.data

    from geomesa_ray.stages.multimodal import ProbeMedia

    tbl = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array(
            [b"garbage-bytes-here", b"\xff\xd8truncated"], pa.binary()
        ),
    })
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(ProbeMedia(), batch_format="pyarrow")
        .to_pandas()
    )
    assert (~out["probe_ok"]).all()
    assert out["probe_error"].str.len().gt(0).all()
