"""Pure-numpy PNG (ISO/IEC 15948 / RFC 2083) decoder + encoder.

Extends the multimodal image stage's real-decode coverage (X17/X76) to
the second dominant web image format, using only numpy and the stdlib
``zlib`` (DEFLATE + CRC-32 — no external codec library). Scope:

- decode: bit depths 1/2/4/8/16; color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters;
  Adam7 interlace; multiple IDATs; tRNS transparency (palette alpha and
  single-color keys); chunk CRC verification. Returns float32 in
  [0, 255]: (h, w) for gray, (h, w, 3) RGB, (h, w, 4) RGBA.
- encode: 8-bit gray / RGB / RGBA, non-interlaced, per-row filter
  0/1/2 (``filter_strategy``) — enough to generate real fixtures and
  differential-test the decoder without an external reference.

Error contract matches core/jpeg.py: malformed/unsupported payloads
raise ValueError and ONLY ValueError (ImageDecodeActor catches
(ValueError, OSError) per row).

Performance shape: filters 0/1/2 are fully vectorized per scanline
(Sub is a cumsum mod 256); 3/4 (Average/Paeth) walk pixels per row on
bpp-wide vectors — the irreducibly sequential part of the format, same
trade as the JPEG entropy loop. Decode parallelism comes from the
actor-pool ``map_batches`` fan-out, not per-image speed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from phrasekit_ray.core.jpeg import MAX_DECODE_PIXELS

_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass layout (x0, y0, dx, dy), ISO 15948 §8.2: passes 4 and 6
# start at ROW 0 (the 8x8 template's top row reads 1 6 4 6 2 6 4 6)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → float32 image in [0, 255]: (h, w) gray, (h, w, 3)
    RGB, or (h, w, 4) RGBA. Raises ValueError — and ONLY ValueError —
    on malformed or unsupported streams (same contract as
    decode_jpeg)."""
    try:
        return _decode_png_chunks(payload)
    except (ValueError, MemoryError):
        raise
    except Exception as exc:  # truncated/garbage: struct.error, zlib.error...
        raise ValueError(
            f"malformed PNG stream: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_png_chunks(payload: bytes) -> np.ndarray:
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0:
                raise ValueError("unknown PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError("unknown PNG interlace method")
            if color not in _CHANNELS:
                raise ValueError(f"unknown PNG color type {color}")
            allowed = {
                0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                4: (8, 16), 6: (8, 16),
            }[color]
            if depth not in allowed:
                raise ValueError(
                    f"bit depth {depth} invalid for color type {color}"
                )
            if w == 0 or h == 0:
                raise ValueError("zero PNG dimension")
            if w * h > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"declared image {w}x{h} exceeds MAX_DECODE_PIXELS "
                    f"({MAX_DECODE_PIXELS})"
                )
            ihdr = (w, h, depth, color, interlace)
        elif ctype == b"PLTE":
            if len(data) % 3 != 0 or len(data) == 0:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    if not idat:
        raise ValueError("missing IDAT")
    w, h, depth, color, interlace = ihdr
    channels = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        img = _unfilter_image(raw, w, h, channels, depth)
    else:  # Adam7: seven independently filtered sub-images, scattered
        img = np.zeros(
            (h, w, channels),
            np.uint16 if depth == 16 else np.uint8,
        )
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * channels * depth + 7) // 8
            nbytes = ph * (1 + stride)
            sub = _unfilter_image(
                raw[off:off + nbytes], pw, ph, channels, depth
            )
            off += nbytes
            img[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
        if off != len(raw):
            raise ValueError("PNG interlaced data length mismatch")
        img = img.reshape(h, w, channels)
    return _finish_png(img, w, h, depth, color, plte, trns)


def _unfilter_image(raw, w, h, channels, depth) -> np.ndarray:
    """Filtered scanlines → (h, w, channels) uint8/uint16 samples."""
    stride = (w * channels * depth + 7) // 8
    bpp = max(1, channels * depth // 8)
    need = h * (1 + stride)
    if len(raw) < need:
        raise ValueError("PNG pixel data truncated")
    rows = np.frombuffer(raw[:need], np.uint8).reshape(h, 1 + stride)
    recon = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:]
        if ft == 0:
            cur = line.copy()
        elif ft == 1:  # Sub: cumsum per byte phase, mod 256
            if stride % bpp == 0:
                cur = (
                    np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.int64)
                    % 256
                ).astype(np.uint8).reshape(-1)
            else:  # sub-byte depths: bpp == 1, always divides
                cur = (np.cumsum(line, dtype=np.int64) % 256).astype(np.uint8)
        elif ft == 2:  # Up
            cur = line + prev  # uint8 wraps
        elif ft == 3:  # Average: sequential in x on bpp-wide vectors
            cur = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.int64)
            for x in range(0, stride, bpp):
                e = min(x + bpp, stride)
                up = prev[x:e].astype(np.int64)
                v = (line[x:e] + ((left[: e - x] + up) >> 1)) & 0xFF
                cur[x:e] = v
                left[: e - x] = v
        elif ft == 4:  # Paeth
            cur = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.int64)
            upleft = np.zeros(bpp, np.int64)
            for x in range(0, stride, bpp):
                e = min(x + bpp, stride)
                n = e - x
                up = prev[x:e].astype(np.int64)
                p = left[:n] + up - upleft[:n]
                pa = np.abs(p - left[:n])
                pb = np.abs(p - up)
                pc = np.abs(p - upleft[:n])
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left[:n],
                    np.where(pb <= pc, up, upleft[:n]),
                )
                v = (line[x:e] + pred) & 0xFF
                cur[x:e] = v
                upleft[:n] = up
                left[:n] = v
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        recon[y] = cur
        prev = cur
    # bytes → samples
    if depth == 8:
        return recon.reshape(h, w, channels)
    if depth == 16:
        return (
            recon.reshape(h, -1)
            .view(">u2")
            .astype(np.uint16)
            .reshape(h, w, channels)
        )
    # sub-byte: unpack bits MSB-first, group per sample, trim row pad
    bits = np.unpackbits(recon, axis=1)
    spr = w * channels  # samples per row
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (vals * weights).sum(axis=2).astype(np.uint8)
    return samples[:, :spr].reshape(h, w, channels)


def _finish_png(img, w, h, depth, color, plte, trns) -> np.ndarray:
    """Samples → float32 [0,255] with palette/tRNS applied."""
    if color == 3:
        if plte is None:
            raise ValueError("palette image missing PLTE")
        idx = img.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            t = np.frombuffer(trns, np.uint8)
            if len(t) > len(plte):
                raise ValueError("tRNS longer than palette")
            alpha[: len(t)] = t
            out = np.concatenate(
                [rgb, alpha[idx][..., None]], axis=-1
            )
            return out.astype(np.float32)
        return rgb.astype(np.float32)
    maxval = (1 << depth) - 1
    f = img.astype(np.float32) * (255.0 / maxval)
    if color == 0:
        if trns is not None and len(trns) >= 2:
            (key,) = struct.unpack(">H", trns[:2])
            alpha = np.where(img.reshape(h, w) == key, 0.0, 255.0)
            return np.stack(
                [f.reshape(h, w)] * 3 + [alpha], axis=-1
            ).astype(np.float32)
        return f.reshape(h, w)
    if color == 2:
        if trns is not None and len(trns) >= 6:
            key = np.array(struct.unpack(">HHH", trns[:6]), img.dtype)
            match = (img == key).all(axis=-1)
            alpha = np.where(match, 0.0, 255.0)
            return np.concatenate(
                [f, alpha[..., None]], axis=-1
            ).astype(np.float32)
        return f
    if color == 4:  # gray+alpha → RGBA
        g, al = f[..., 0], f[..., 1]
        return np.stack([g, g, g, al], axis=-1).astype(np.float32)
    return f  # color == 6: RGBA as-is


def encode_png(
    img: np.ndarray, filter_strategy: str = "none"
) -> bytes:
    """8-bit image → PNG bytes. (h, w) gray, (h, w, 3) RGB or
    (h, w, 4) RGBA; non-interlaced. ``filter_strategy``: "none" (all
    filter 0), "sub", "up", or "cycle" (rows cycle 0/1/2 — exercises
    the decoder's vectorized filter paths)."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a.astype(np.float64)), 0, 255).astype(np.uint8)
    if a.ndim == 2:
        color, channels = 0, 1
        a = a[..., None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported image shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    flat = a.reshape(h, w * channels)
    bpp = channels
    lines = bytearray()
    prev = np.zeros(w * channels, np.uint8)
    for y in range(h):
        row = flat[y]
        if filter_strategy == "none":
            ft = 0
        elif filter_strategy == "sub":
            ft = 1
        elif filter_strategy == "up":
            ft = 2
        elif filter_strategy == "cycle":
            ft = y % 3
        else:
            raise ValueError(f"unknown filter_strategy {filter_strategy!r}")
        if ft == 0:
            enc = row
        elif ft == 1:
            shifted = np.zeros_like(row)
            shifted[bpp:] = row[:-bpp]
            enc = row - shifted
        else:
            enc = row - prev
        lines.append(ft)
        lines += enc.tobytes()
        prev = row
    out = bytearray(_SIG)

    def chunk(ctype: bytes, data: bytes):
        out.extend(struct.pack(">I", len(data)))
        out.extend(ctype)
        out.extend(data)
        out.extend(struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    chunk(b"IDAT", zlib.compress(bytes(lines), 6))
    chunk(b"IEND", b"")
    return bytes(out)
