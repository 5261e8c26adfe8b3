"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data extension. Image/audio decode libraries are NOT available in
this environment, so the decode kernels are STUBS: each actor takes
``backend="fake"`` (default — a deterministic content-hash-derived feature,
so the Ray-side plumbing is fully testable) or ``backend="real"`` which
raises NotImplementedError at the exact point a PIL/libsndfile call would
go. Everything around the kernel — schema, actor-pool shape, batch sizing
for large binary payloads, output layout — is real.

Scale notes: binary payloads make blocks heavy; callers should use a small
``batch_size`` (32-128) and let `target_max_block_size` govern block
splits. Decoders are actor pools (model/codec init once per actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_features(payloads: list[bytes | None], dim: int) -> np.ndarray:
    """Deterministic per-payload feature: repeatable bytes→float32 vector
    derived from the md5 of the content (stands in for a real decoder)."""
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        if not p:
            continue
        seed = int.from_bytes(hashlib.md5(p).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        out[i] = rng.standard_normal(dim).astype(np.float32)
    return out


class ImageDecodeActor:
    """media rows → decoded feature rows (actor pool stage).

    backend="real" is the integration point for PIL/turbojpeg — stubbed:
    raises NotImplementedError (library not in this container).
    """

    def __init__(self, backend: str = "fake", feature_dim: int = 64, resize=(64, 64)):
        if backend not in ("fake", "real"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.feature_dim = feature_dim
        self.resize = resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.backend == "real":
            raise NotImplementedError(
                "real image decode requires PIL/turbojpeg (not in container); "
                "use backend='fake' for plumbing tests"
            )
        feats = _fake_features(payloads, self.feature_dim)
        ok = pa.array([bool(p) for p in payloads], pa.bool_())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "decoded_ok": ok,
                "features": pa.array(list(feats), pa.list_(pa.float32())),
                "out_width": pa.array(
                    [self.resize[0] if p else -1 for p in payloads], pa.int32()
                ),
                "out_height": pa.array(
                    [self.resize[1] if p else -1 for p in payloads], pa.int32()
                ),
            }
        )


class AudioFrameSampleActor:
    """media rows → fixed-rate frame-sample features (actor pool stage).

    backend="real" is the libsndfile/ffmpeg integration point — stubbed.
    """

    def __init__(self, backend: str = "fake", frames: int = 16, feature_dim: int = 16):
        if backend not in ("fake", "real"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.frames = frames
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "real":
            raise NotImplementedError(
                "real audio decode requires libsndfile/ffmpeg (not in container)"
            )
        payloads = batch["payload"].to_pylist()
        feats = _fake_features(payloads, self.frames * self.feature_dim)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "decoded_ok": pa.array([bool(p) for p in payloads], pa.bool_()),
                "frame_features": pa.array(
                    [f.reshape(self.frames, self.feature_dim).tolist() for f in feats],
                    pa.list_(pa.list_(pa.float32())),
                ),
            }
        )


class VideoFrameSampleActor:
    """media rows → uniformly sampled frame features (actor pool stage).

    backend="real" is the ffmpeg/pyav integration point — stubbed. Frame
    timestamps are derived from ``duration_ms`` (uniform sampling), so the
    output layout (per-frame ts + feature vector) is real even with the
    fake decoder.
    """

    def __init__(
        self, backend: str = "fake", frames: int = 8, feature_dim: int = 32
    ):
        if backend not in ("fake", "real"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.frames = frames
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "real":
            raise NotImplementedError(
                "real video decode requires ffmpeg/pyav (not in container)"
            )
        payloads = batch["payload"].to_pylist()
        durations = batch["duration_ms"].to_pylist()
        feats = _fake_features(payloads, self.frames * self.feature_dim)
        ts = [
            [
                int((d if d and d > 0 else 0) * (i + 0.5) / self.frames)
                for i in range(self.frames)
            ]
            for d in durations
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "decoded_ok": pa.array([bool(p) for p in payloads], pa.bool_()),
                "frame_ts_ms": pa.array(ts, pa.list_(pa.int32())),
                "frame_features": pa.array(
                    [
                        f.reshape(self.frames, self.feature_dim).tolist()
                        for f in feats
                    ],
                    pa.list_(pa.list_(pa.float32())),
                ),
            }
        )


def decode_images(ds, concurrency=(1, 4), batch_size: int = 64, **actor_kwargs):
    """Actor-pool image decode over a media Dataset (small batch_size: the
    payload column is heavy)."""
    return ds.map_batches(
        ImageDecodeActor,
        fn_constructor_kwargs=actor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_audio_frames(ds, concurrency=(1, 4), batch_size: int = 64, **actor_kwargs):
    return ds.map_batches(
        AudioFrameSampleActor,
        fn_constructor_kwargs=actor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(ds, concurrency=(1, 4), batch_size: int = 32, **actor_kwargs):
    """Actor-pool video frame sampling (smallest batch_size of the three:
    video payloads are the heaviest)."""
    return ds.map_batches(
        VideoFrameSampleActor,
        fn_constructor_kwargs=actor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for plumbing tests (mixed types:
    image rows have dimensions, audio/video rows have durations)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, size=128, dtype=np.uint8).tobytes() for _ in range(n)]
    types = [kinds[i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"m{i:04d}" for i in range(n)], pa.string()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(
                [640 if t == "image" else -1 for t in types], pa.int32()
            ),
            "height": pa.array(
                [480 if t == "image" else -1 for t in types], pa.int32()
            ),
            "duration_ms": pa.array(
                [
                    -1 if t == "image" else int(1000 + 500 * (i % 7))
                    for i, t in enumerate(types)
                ],
                pa.int32(),
            ),
        },
        schema=MEDIA_SCHEMA,
    )
