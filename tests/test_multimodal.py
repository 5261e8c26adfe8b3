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


def test_real_backend_feature_detects():
    # backend="real" is PIL-backed: construction raises a clear
    # ImportError naming the dependency when it is absent (this image)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="Pillow"):
            multimodal.ImageDecodeActor(backend="real")
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

    try:
        import av  # noqa: F401
    except ImportError:
        with _pytest.raises(ImportError, match="PyAV"):
            VideoFrameSampleActor(backend="real")


# --- real numpy-backend decoders -------------------------------------------

def _ppm(w, h, rgb):
    """Binary P6 payload of a constant-color w×h image."""
    return (f"P6\n# comment\n{w} {h}\n255\n").encode() + bytes(rgb) * (w * h)


def _pgm_gradient(w, h):
    img = (np.arange(w * h) % 256).astype(np.uint8).reshape(h, w)
    return (f"P5\n{w} {h}\n255\n").encode() + img.tobytes(), img


def _wav_pcm16(samples: np.ndarray, rate=8000, channels=1):
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _y4m(frames_y: list[np.ndarray], fps=25):
    h, w = frames_y[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()]
    uv = bytes((w // 2) * (h // 2) * 2)
    for f in frames_y:
        out.append(b"FRAME\n" + f.astype(np.uint8).tobytes() + uv)
    return b"".join(out)


def test_decode_pnm_p5_p6():
    pay, img = _pgm_gradient(8, 4)
    got = multimodal.decode_pnm(pay)
    assert got.shape == (4, 8)
    np.testing.assert_allclose(got, img.astype(np.float32))
    # constant red P6 → luma 0.299*255
    gray = multimodal.decode_pnm(_ppm(4, 4, (255, 0, 0)))
    np.testing.assert_allclose(gray, np.full((4, 4), 0.299 * 255, np.float32),
                               rtol=1e-6)


def test_resize_bilinear_identity_and_constant():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    np.testing.assert_allclose(multimodal.resize_bilinear(img, 4, 4), img)
    const = np.full((5, 7), 42.0, np.float32)
    np.testing.assert_allclose(multimodal.resize_bilinear(const, 3, 2), 42.0)


def test_decode_wav_pcm16_stereo_mono_mix():
    left = np.full(100, 1000, np.int16)
    right = np.full(100, 3000, np.int16)
    inter = np.empty(200, np.int16)
    inter[0::2], inter[1::2] = left, right
    samples, rate = multimodal.decode_wav_pcm16(_wav_pcm16(inter, rate=16000,
                                                           channels=2))
    assert rate == 16000 and len(samples) == 100
    np.testing.assert_allclose(samples, 2000.0)


def test_decode_y4m_frames_and_fps():
    f0 = np.full((4, 6), 10, np.uint8)
    f1 = np.full((4, 6), 200, np.uint8)
    frames, fps = multimodal.decode_y4m(_y4m([f0, f1], fps=30))
    assert fps == 30.0 and len(frames) == 2
    np.testing.assert_array_equal(frames[0], f0)
    np.testing.assert_array_equal(frames[1], f1)


def test_numpy_backend_image_actor(ray_session):
    import ray

    pay, _ = _pgm_gradient(16, 16)
    t = pa.table(
        {
            "media_id": pa.array(["a", "bad"]),
            "media_type": pa.array(["image", "image"]),
            "payload": pa.array([pay, b"not an image"], pa.binary()),
            "width": pa.array([16, -1], pa.int32()),
            "height": pa.array([16, -1], pa.int32()),
            "duration_ms": pa.array([-1, -1], pa.int32()),
        }
    )
    out = multimodal.decode_images(
        ray.data.from_arrow(t), backend="numpy", feature_dim=16, resize=(8, 8)
    ).to_pandas().set_index("media_id")
    assert bool(out.loc["a", "decoded_ok"]) is True
    assert bool(out.loc["bad", "decoded_ok"]) is False
    assert out.loc["a", "out_width"] == 8
    assert out.loc["bad", "out_width"] == -1
    assert len(out.loc["a", "features"]) == 16
    assert not np.allclose(out.loc["a", "features"], 0.0)


def test_numpy_backend_audio_actor(ray_session):
    import ray

    # first half silent, second half loud: segment features must differ
    s = np.concatenate([np.zeros(4000), np.full(4000, 8000.0)]).astype(np.int16)
    t = pa.table(
        {
            "media_id": pa.array(["w"]),
            "media_type": pa.array(["audio"]),
            "payload": pa.array([_wav_pcm16(s)], pa.binary()),
            "width": pa.array([-1], pa.int32()),
            "height": pa.array([-1], pa.int32()),
            "duration_ms": pa.array([1000], pa.int32()),
        }
    )
    out = multimodal.sample_audio_frames(
        ray.data.from_arrow(t), backend="numpy", frames=2, feature_dim=4
    ).to_pandas()
    assert bool(out.loc[0, "decoded_ok"])
    ff = out.loc[0, "frame_features"]
    assert np.allclose(ff[0], 0.0) and np.allclose(ff[1], 8000.0)


def test_numpy_backend_video_actor(ray_session):
    import ray

    f0 = np.full((8, 8), 10, np.uint8)
    f1 = np.full((8, 8), 200, np.uint8)
    t = pa.table(
        {
            "media_id": pa.array(["v"]),
            "media_type": pa.array(["video"]),
            "payload": pa.array([_y4m([f0, f1], fps=10)], pa.binary()),
            "width": pa.array([8], pa.int32()),
            "height": pa.array([8], pa.int32()),
            "duration_ms": pa.array([200], pa.int32()),
        }
    )
    out = multimodal.sample_video_frames(
        ray.data.from_arrow(t), backend="numpy", frames=2, feature_dim=4
    ).to_pandas()
    assert bool(out.loc[0, "decoded_ok"])
    ff = out.loc[0, "frame_features"]
    assert np.allclose(ff[0], 10.0) and np.allclose(ff[1], 200.0)
    assert out.loc[0, "frame_ts_ms"].tolist() == [0, 100]


def test_malformed_media_raises_value_error_only():
    import struct

    # truncated fmt chunk: declared csize=16, body ends early — must be
    # ValueError (the actors' skip-handler), never struct.error
    bad_wav = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x02\x00"
    )
    with pytest.raises(ValueError):
        multimodal.decode_wav_pcm16(bad_wav)

    # data chunk claiming more bytes than the payload holds
    hdr = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    )
    trunc = hdr + b"data" + struct.pack("<I", 100000) + b"\x00" * 100
    with pytest.raises(ValueError):
        multimodal.decode_wav_pcm16(trunc)

    # zero denominator / zero fps frame rates — must be ValueError,
    # never ZeroDivisionError
    for f in (b"F25:0", b"F0:1"):
        payload = b"YUV4MPEG2 W2 H2 " + f + b" Cmono\nFRAME\n" + b"\x00" * 4
        with pytest.raises(ValueError):
            multimodal.decode_y4m(payload)


def test_pool2d_smaller_than_grid_is_finite():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = multimodal._pool2d_to_dim(img, 32)  # grid g=6 > 4
    assert out.shape == (32,)
    assert np.isfinite(out).all()


def test_q_media_decode_stats(ray_session, sf_dir):
    """q_media_decode (X17 first-class query, r5): per-format counts
    match the synthesis rule exactly — n = docs/4 per format, and for
    the formats whose truncation detection is deterministic (pnm, png,
    gif) n_bad equals the corrupted-doc count; JPEG truncation may
    decode leniently (bit reader pads past EOI) so only the upper bound
    is pinned."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    out = (
        entrymod.queries()["q_media_decode"](sf_dir)
        .to_pandas()
        .set_index("format")
    )
    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    fmts = ("pnm", "png", "jpeg", "gif")
    expected_n = {f: 0 for f in fmts}
    expected_bad = {f: 0 for f in fmts}
    for d in range(n_docs):
        f = fmts[d % 4]
        expected_n[f] += 1
        if d % 23 == 0:
            expected_bad[f] += 1
    for f in fmts:
        assert int(out.loc[f, "n"]) == expected_n[f]
        assert int(out.loc[f, "n"]) == int(out.loc[f, "n_ok"]) + int(
            out.loc[f, "n_bad"]
        )
        if f == "jpeg":
            assert int(out.loc[f, "n_bad"]) <= expected_bad[f]
        else:
            assert int(out.loc[f, "n_bad"]) == expected_bad[f]
        assert int(out.loc[f, "feat_sum_e3"]) > 0
