

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
