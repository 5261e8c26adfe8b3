"""Pure-numpy PNG codec (core/png.py) — roundtrips, every filter type,
palette/tRNS, sub-byte and 16-bit depths, Adam7 interlace, CRC checks,
ValueError-only contract, multimodal actor integration."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from phrasekit_ray.core import png


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _stream(ihdr: bytes, *chunks: bytes) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + b"".join(chunks) + _chunk(b"IEND", b"")
    )


def test_roundtrip_all_shapes_and_filters():
    rng = np.random.default_rng(5)
    for shape in [(17, 19), (16, 16, 3), (9, 31, 4), (1, 1), (2, 3, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for strat in ("none", "sub", "up", "cycle"):
            dec = png.decode_png(png.encode_png(img, strat))
            assert dec.shape == img.shape
            assert np.array_equal(dec.astype(np.uint8), img), (shape, strat)


def test_average_and_paeth_filters_handcrafted():
    """Rows filtered 0/3/4/2 assembled from the spec's reconstruction
    functions independently of the encoder (it never emits 3/4)."""
    rng = np.random.default_rng(7)
    w, h = 5, 4
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    lines = bytearray()
    prev = np.zeros(w * 3, np.int64)
    flat = img.reshape(h, -1).astype(np.int64)
    for y, ft in enumerate([0, 3, 4, 2]):
        row = flat[y]
        enc = np.zeros(w * 3, np.int64)
        for x in range(w * 3):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ft == 0:
                enc[x] = row[x]
            elif ft == 2:
                enc[x] = (row[x] - b) % 256
            elif ft == 3:
                enc[x] = (row[x] - ((a + b) >> 1)) % 256
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c
                )
                enc[x] = (row[x] - pred) % 256
        lines.append(ft)
        lines += bytes(enc.astype(np.uint8))
        prev = row
    data = _stream(
        struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0),
        _chunk(b"IDAT", zlib.compress(bytes(lines))),
    )
    assert np.array_equal(png.decode_png(data).astype(np.uint8), img)


def test_palette_4bit_with_trns():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (7, 3)).astype(np.uint8)
    idx = rng.integers(0, 7, (6, 9)).astype(np.uint8)
    stride = (9 * 4 + 7) // 8
    lines = bytearray()
    for y in range(6):
        lines.append(0)
        row = np.zeros(stride * 2, np.uint8)
        row[:9] = idx[y]
        lines += bytes(((row[0::2] << 4) | row[1::2])[:stride])
    data = _stream(
        struct.pack(">IIBBBBB", 9, 6, 4, 3, 0, 0, 0),
        _chunk(b"PLTE", pal.tobytes()),
        _chunk(b"tRNS", bytes([255, 255, 0, 255, 255, 255, 255])),
        _chunk(b"IDAT", zlib.compress(bytes(lines))),
    )
    dec = png.decode_png(data)
    assert dec.shape == (6, 9, 4)
    assert np.array_equal(dec[..., :3].astype(np.uint8), pal[idx])
    assert np.array_equal(dec[..., 3] == 0, idx == 2)  # index 2 → alpha 0


def test_16bit_gray_scales_to_255():
    rng = np.random.default_rng(3)
    img16 = rng.integers(0, 65536, (5, 7)).astype(">u2")
    lines = bytearray()
    for y in range(5):
        lines.append(0)
        lines += img16[y].tobytes()
    data = _stream(
        struct.pack(">IIBBBBB", 7, 5, 16, 0, 0, 0, 0),
        _chunk(b"IDAT", zlib.compress(bytes(lines))),
    )
    dec = png.decode_png(data)
    assert dec.shape == (5, 7)
    assert np.allclose(dec, img16.astype(np.float64) * 255 / 65535, atol=1e-3)


def test_gray_alpha_expands_to_rgba():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (4, 5, 2)).astype(np.uint8)
    lines = bytearray()
    for y in range(4):
        lines.append(0)
        lines += img[y].tobytes()
    data = _stream(
        struct.pack(">IIBBBBB", 5, 4, 8, 4, 0, 0, 0),
        _chunk(b"IDAT", zlib.compress(bytes(lines))),
    )
    dec = png.decode_png(data)
    assert dec.shape == (4, 5, 4)
    assert np.array_equal(dec[..., 0].astype(np.uint8), img[..., 0])
    assert np.array_equal(dec[..., 3].astype(np.uint8), img[..., 1])


def test_adam7_interlace_exact():
    """Interlaced streams built directly from the ISO 15948 pass grid
    (incl. the 4/6 passes that start at ROW 0 — the bug the first
    implementation had) reconstruct exactly, for RGB and for sub-byte
    palette with per-pass stride padding."""
    rng = np.random.default_rng(5)
    for (w, h) in [(3, 2), (10, 11), (8, 8), (1, 9), (9, 1), (17, 5)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        lines = bytearray()
        for x0, y0, dx, dy in png._ADAM7:
            sub = img[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            for y in range(ph):
                lines.append(0)
                lines += sub[y].tobytes()
        data = _stream(
            struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1),
            _chunk(b"IDAT", zlib.compress(bytes(lines))),
        )
        assert np.array_equal(
            png.decode_png(data).astype(np.uint8), img
        ), (w, h)


def test_crc_mismatch_raises():
    bad = bytearray(png.encode_png(np.zeros((4, 4), np.uint8)))
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(bad))


def test_corruption_and_truncation_raise_only_valueerror(monkeypatch):
    monkeypatch.setattr(png, "MAX_DECODE_PIXELS", 64 * 64)
    rng = np.random.default_rng(11)
    enc = png.encode_png(
        rng.integers(0, 256, (24, 24, 3)).astype(np.uint8), "cycle"
    )
    for _ in range(300):
        pos = int(rng.integers(8, len(enc)))
        mutated = enc[:pos] + bytes([int(rng.integers(0, 256))]) + enc[pos + 1:]
        try:
            png.decode_png(mutated)
        except ValueError:
            pass
    for cut in range(8, len(enc), max(1, len(enc) // 97)):
        try:
            png.decode_png(enc[:cut])
        except ValueError:
            pass
    with pytest.raises(ValueError):
        png.decode_png(b"\x89PNG\r\n\x1a\nxx")
    with pytest.raises(ValueError):
        png.decode_png(b"GIF89a")


def test_decode_image_dispatches_png_with_alpha_composite():
    from phrasekit_ray.stages.multimodal import decode_image

    gray = np.full((8, 8), 100, np.uint8)
    out = decode_image(png.encode_png(gray))
    assert out.shape == (8, 8) and np.allclose(out, 100.0)
    # fully transparent RGBA composites to white background
    rgba = np.zeros((4, 4, 4), np.uint8)
    out = decode_image(png.encode_png(rgba))
    assert out.shape == (4, 4) and np.allclose(out, 254.99, atol=0.1)


def test_image_actor_decodes_png_payloads(ray_session):
    import ray

    from phrasekit_ray.stages.multimodal import ImageDecodeActor

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    rows = pa.table(
        {
            "media_id": pa.array(["p", "bad"]),
            "media_type": pa.array(["image"] * 2),
            "payload": pa.array(
                [png.encode_png(img, "cycle"), b"\x89PNG\r\n\x1a\nnope"],
                pa.binary(),
            ),
            "width": pa.array([32, -1], pa.int32()),
            "height": pa.array([32, -1], pa.int32()),
            "duration_ms": pa.array([-1, -1], pa.int32()),
        }
    )
    out = (
        ray.data.from_arrow(rows)
        .map_batches(
            ImageDecodeActor,
            fn_constructor_kwargs=dict(backend="numpy", feature_dim=16),
            batch_format="pyarrow",
            concurrency=1,
            batch_size=8,
        )
        .to_pandas()
        .set_index("media_id")
    )
    assert bool(out.loc["p", "decoded_ok"])
    assert not bool(out.loc["bad", "decoded_ok"])
