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


def test_video_frame_sample_actor_pool(ray_session):
    import ray

    from phrasekit_ray.stages.multimodal import (
        VideoFrameSampleActor,
        sample_video_frames,
        synth_media_table,
    )

    tbl = synth_media_table(n=12)
    out = list(
        sample_video_frames(
            ray.data.from_arrow(tbl), concurrency=(1, 2), frames=4, feature_dim=8
        ).iter_rows()
    )
    assert len(out) == 12
    for r in out:
        assert len(r["frame_ts_ms"]) == 4
        assert len(r["frame_features"]) == 4
        assert len(r["frame_features"][0]) == 8
    # timestamps monotonically increase for rows with duration
    with_dur = [r for r in out if r["frame_ts_ms"][-1] > 0]
    assert with_dur
    for r in with_dur:
        assert r["frame_ts_ms"] == sorted(r["frame_ts_ms"])

    import pytest as _pytest

    actor = VideoFrameSampleActor(backend="real")
    with _pytest.raises(NotImplementedError):
        actor(tbl)
