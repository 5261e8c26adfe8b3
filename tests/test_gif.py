"""Pure-Python GIF decoder (core/gif.py) — handcrafted LZW streams
(the classic uncompressed-GIF encoding with periodic clear codes),
interlace, transparency/disposal, animation compositing, ValueError
contract, multimodal dispatch."""

import numpy as np
import pytest

from phrasekit_ray.core import gif


class _Bits:
    """LSB-first code packer (GIF bit order)."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, code: int, width: int):
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_uncompressed(indices, min_code: int) -> bytes:
    """Encode pixel indices as literal codes, emitting CLEAR every
    2^m − 2 codes so the decoder's table never forces a width bump —
    the standard 'uncompressed GIF' trick."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    b = _Bits()
    b.put(clear, width)
    run = 0
    for v in indices:
        if run == clear - 2:
            b.put(clear, width)
            run = 0
        b.put(int(v), width)
        run += 1
    b.put(eoi, width)
    return b.done()


def _blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def _gif(w, h, palette, frames, gct_bits=None, trailer=True, sig=b"GIF89a"):
    """frames: list of dicts {x,y,w,h,idx,interlace,gce:(flags,delay,tidx),
    local_palette}."""
    if gct_bits is None:
        gct_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << gct_bits
    out = bytearray(sig)
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | (gct_bits - 1), 0, 0])
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(palette)] = palette
    out += pal.tobytes()
    for f in frames:
        gce = f.get("gce")
        if gce is not None:
            gflags, delay, tidx = gce
            out += bytes([0x21, 0xF9, 4, gflags]) \
                + int(delay).to_bytes(2, "little") \
                + bytes([tidx, 0])
        out += bytes([0x2C])
        out += int(f.get("x", 0)).to_bytes(2, "little")
        out += int(f.get("y", 0)).to_bytes(2, "little")
        out += int(f["w"]).to_bytes(2, "little")
        out += int(f["h"]).to_bytes(2, "little")
        iflags = 0x40 if f.get("interlace") else 0
        out += bytes([iflags])
        mcs = max(2, gct_bits)
        idx = np.asarray(f["idx"], np.uint8)
        if f.get("interlace"):
            ih = f["h"]
            order = np.concatenate([
                np.arange(0, ih, 8), np.arange(4, ih, 8),
                np.arange(2, ih, 4), np.arange(1, ih, 2),
            ])
            idx = idx[order]
        out += bytes([mcs]) + _blocks(_lzw_uncompressed(idx.reshape(-1), mcs))
    if trailer:
        out += bytes([0x3B])
    return bytes(out)


def test_single_frame_exact():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, (7, 9)).astype(np.uint8)
    data = _gif(9, 7, pal, [{"w": 9, "h": 7, "idx": idx}])
    frames, delays = gif.decode_gif(data)
    assert len(frames) == 1 and delays == [0]
    assert frames[0].shape == (7, 9, 4)
    assert np.array_equal(frames[0][..., :3], pal[idx])
    assert (frames[0][..., 3] == 255).all()


def test_interlaced_frame_exact():
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.integers(0, 4, (11, 5)).astype(np.uint8)
    data = _gif(5, 11, pal, [{"w": 5, "h": 11, "idx": idx,
                              "interlace": True}])
    frames, _ = gif.decode_gif(data)
    assert np.array_equal(frames[0][..., :3], pal[idx])


def test_gif87a_and_big_palette_width_growth():
    """256-color palette forces 8-bit min code size; the uncompressed
    trick still holds width at 9 bits via periodic clears."""
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    data = _gif(16, 16, pal, [{"w": 16, "h": 16, "idx": idx}],
                sig=b"GIF87a")
    frames, _ = gif.decode_gif(data)
    assert np.array_equal(frames[0][..., :3], pal[idx])


def test_animation_compositing_transparency_and_disposal():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   np.uint8)
    base = np.zeros((4, 4), np.uint8)  # all red
    # frame 2: 2x2 patch at (1,1), index 1 transparent → shows frame 1
    patch = np.array([[1, 2], [2, 1]], np.uint8)
    data = _gif(
        4, 4, pal,
        [
            {"w": 4, "h": 4, "idx": base},
            {"x": 1, "y": 1, "w": 2, "h": 2, "idx": patch,
             "gce": (1 | (1 << 2), 5, 1)},  # transparent idx 1, disposal 1
        ],
    )
    frames, delays = gif.decode_gif(data)
    assert len(frames) == 2
    assert delays == [0, 50]
    f2 = frames[1]
    assert np.array_equal(f2[0, 0, :3], [255, 0, 0])  # untouched red
    assert np.array_equal(f2[1, 1, :3], [255, 0, 0])  # transparent → red
    assert np.array_equal(f2[1, 2, :3], [0, 0, 255])  # opaque blue
    assert np.array_equal(f2[2, 1, :3], [0, 0, 255])


def test_malformed_raise_only_valueerror():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, (12, 13)).astype(np.uint8)
    enc = _gif(13, 12, pal, [{"w": 13, "h": 12, "idx": idx}])
    for _ in range(300):
        pos = int(rng.integers(6, len(enc)))
        mutated = enc[:pos] + bytes([int(rng.integers(0, 256))]) \
            + enc[pos + 1:]
        try:
            gif.decode_gif(mutated)
        except ValueError:
            pass
    for cut in range(6, len(enc), max(1, len(enc) // 61)):
        try:
            gif.decode_gif(enc[:cut])
        except ValueError:
            pass
    with pytest.raises(ValueError):
        gif.decode_gif(b"GIF89a")
    with pytest.raises(ValueError):
        gif.decode_gif(b"\x89PNG\r\n\x1a\n")
    # frame rectangle outside the logical screen
    bad = _gif(4, 4, pal[:4], [{"x": 3, "y": 3, "w": 3, "h": 3,
                                "idx": np.zeros((3, 3), np.uint8)}])
    with pytest.raises(ValueError, match="outside"):
        gif.decode_gif(bad)


def test_decode_image_dispatches_gif():
    from phrasekit_ray.stages.multimodal import decode_image

    pal = np.array([[100, 100, 100]], np.uint8)
    idx = np.zeros((6, 8), np.uint8)
    data = _gif(8, 6, pal, [{"w": 8, "h": 6, "idx": idx}])
    out = decode_image(data)
    assert out.shape == (6, 8)
    assert np.allclose(out, 100.0, atol=0.5)
