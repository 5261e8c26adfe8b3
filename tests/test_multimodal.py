"""Multimodal plumbing tests (decode kernels stubbed; Ray-side real)."""

import numpy as np
import pyarrow as pa
import pytest

from phrasekit_ray.stages import multimodal


def test_synth_media_schema():
    t = multimodal.synth_media_table(8)
    assert t.schema.equals(multimodal.MEDIA_SCHEMA)
    assert t.num_rows == 8


def test_image_decode_actor_pool(ray_session):
    import ray

    ds = ray.data.from_arrow(multimodal.synth_media_table(16))
    out = multimodal.decode_images(ds, concurrency=2, batch_size=4)
    rows = list(out.iter_rows())
    assert len(rows) == 16
    assert all(r["decoded_ok"] for r in rows)
    assert all(len(r["features"]) == 64 for r in rows)
    assert all(r["out_width"] == 64 for r in rows)


def test_fake_decode_deterministic():
    t = multimodal.synth_media_table(4)
    a = multimodal.ImageDecodeActor()(t)
    b = multimodal.ImageDecodeActor()(t)
    assert a["features"].to_pylist() == b["features"].to_pylist()


def test_real_backend_raises():
    actor = multimodal.ImageDecodeActor(backend="real")
    with pytest.raises(NotImplementedError):
        actor(multimodal.synth_media_table(1))
    with pytest.raises(ValueError):
        multimodal.ImageDecodeActor(backend="bogus")


def test_audio_frame_sample(ray_session):
    import ray

    ds = ray.data.from_arrow(multimodal.synth_media_table(6))
    out = multimodal.sample_audio_frames(ds, concurrency=1, batch_size=3, frames=8, feature_dim=4)
    rows = list(out.iter_rows())
    assert len(rows) == 6
    ff = rows[0]["frame_features"]
    assert len(ff) == 8 and len(ff[0]) == 4
