"""Pure-Python/numpy GIF (GIF87a/GIF89a) decoder.

Completes the multimodal image stage's real-decode coverage (X17) for
the third classic web image format — no external codec library. Scope:
global/local color tables, LZW image data (variable 3-12 bit codes,
clear/EOI), row interlacing, GIF89a graphic-control extensions
(transparency index, frame delay, disposal methods 0-2), multi-frame
animations composited onto the logical screen. Returns every frame as
an RGBA uint8 canvas plus per-frame delays — the image path uses frame
0; an animation can feed the video frame-sampling stage.

Error contract matches core/jpeg.py / core/png.py: malformed or
truncated payloads raise ValueError and ONLY ValueError.

The LZW code loop is per-code Python — the irreducibly sequential
entropy layer, same trade as the JPEG Huffman loop; palette mapping and
compositing are numpy.
"""

from __future__ import annotations

import numpy as np

from phrasekit_ray.core.jpeg import MAX_DECODE_PIXELS


def decode_gif(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    """GIF bytes → (frames, delays_ms): each frame an (h, w, 4) uint8
    RGBA canvas of the full logical screen after compositing, delays in
    milliseconds (0 for still images). Raises ValueError — and ONLY
    ValueError — on malformed/truncated streams."""
    try:
        return _decode_gif_blocks(payload)
    except (ValueError, MemoryError):
        raise
    except Exception as exc:
        raise ValueError(
            f"malformed GIF stream: {type(exc).__name__}: {exc}"
        ) from exc


def _color_table(payload: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    if pos + 3 * n > len(payload):
        raise ValueError("truncated GIF color table")
    tbl = np.frombuffer(payload[pos:pos + 3 * n], np.uint8).reshape(n, 3)
    return tbl, pos + 3 * n


def _subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at pos."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise ValueError("truncated GIF sub-block")
        out += payload[pos:pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW: variable code width, LSB-first bit packing."""
    if not (2 <= min_code_size <= 11):
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = table[: clear + 2]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("LZW code before table entry")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            if len(out) > max_pixels:
                raise ValueError("LZW output exceeds declared image size")
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out  # tolerant of a missing explicit EOI (common in the wild)


def _decode_gif_blocks(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_index = payload[11]
    if w == 0 or h == 0:
        raise ValueError("zero GIF dimension")
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"declared image {w}x{h} exceeds MAX_DECODE_PIXELS "
            f"({MAX_DECODE_PIXELS})"
        )
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(payload, pos, 2 << (flags & 7))
    canvas = np.zeros((h, w, 4), np.uint8)  # transparent logical screen
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    delay_ms = 0
    disposal = 0
    n_frames = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _subblocks(payload, pos)
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise ValueError("short graphic control extension")
                gflags = data[0]
                delay_ms = int.from_bytes(data[1:3], "little") * 10
                transparent = data[3] if gflags & 1 else None
                disposal = (gflags >> 2) & 7
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        ix = int.from_bytes(payload[pos:pos + 2], "little")
        iy = int.from_bytes(payload[pos + 2:pos + 4], "little")
        iw = int.from_bytes(payload[pos + 4:pos + 6], "little")
        ih = int.from_bytes(payload[pos + 6:pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        if iw == 0 or ih == 0 or ix + iw > w or iy + ih > h:
            raise ValueError("GIF frame rectangle outside logical screen")
        lct = None
        if iflags & 0x80:
            lct, pos = _color_table(payload, pos, 2 << (iflags & 7))
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        data, pos = _subblocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(data, min_code, iw * ih), np.uint8
        )
        if len(idx) < iw * ih:
            raise ValueError("GIF frame pixel data short")
        idx = idx[: iw * ih].reshape(ih, iw)
        if iflags & 0x40:  # interlaced: 4-pass row order
            de = np.empty((ih, iw), np.uint8)
            order = np.concatenate([
                np.arange(0, ih, 8), np.arange(4, ih, 8),
                np.arange(2, ih, 4), np.arange(1, ih, 2),
            ])
            de[order] = idx
            idx = de
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index out of color table range")
        rgba = np.concatenate(
            [palette[idx], np.full((ih, iw, 1), 255, np.uint8)], axis=-1
        )
        prev_region = canvas[iy:iy + ih, ix:ix + iw].copy()
        if transparent is not None:
            keep = idx == transparent
            rgba[keep] = prev_region[keep]  # transparent pixels show through
        canvas[iy:iy + ih, ix:ix + iw] = rgba
        frames.append(canvas.copy())
        delays.append(delay_ms)
        n_frames += 1
        if n_frames * w * h > 4 * MAX_DECODE_PIXELS:
            raise ValueError("GIF animation exceeds total pixel budget")
        # disposal AFTER the frame is shown
        if disposal == 2:  # restore to background
            if gct is not None and transparent is None and bg_index < len(gct):
                bg = np.concatenate(
                    [gct[bg_index], np.array([255], np.uint8)]
                )
                canvas[iy:iy + ih, ix:ix + iw] = bg
            else:
                canvas[iy:iy + ih, ix:ix + iw] = 0
        elif disposal == 3:  # restore to previous
            canvas[iy:iy + ih, ix:ix + iw] = prev_region
        transparent = None
        delay_ms = 0
        disposal = 0
    if not frames:
        raise ValueError("GIF has no image frames")
    return frames, delays


def encode_gif(
    idx: np.ndarray, palette: np.ndarray, transparent: int | None = None
) -> bytes:
    """Single-frame GIF89a from an index raster + palette, using the
    classic 'uncompressed LZW' encoding (literal codes with a CLEAR
    every 2^m−2 codes so the decoder's table never forces a width
    bump). Used by the media-synthesis fixture stage and differential
    tests; the decoder handles real compressed streams too."""
    idx = np.asarray(idx, np.uint8)
    palette = np.asarray(palette, np.uint8).reshape(-1, 3)
    h, w = idx.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("index out of palette range")
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << bits
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 1, 0, 0, int(transparent), 0])
    out += bytes([0x2C, 0, 0, 0, 0])
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0])
    mcs = max(2, bits)
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    acc = 0
    nb = 0
    packed = bytearray()

    def put(code: int):
        nonlocal acc, nb
        acc |= code << nb
        nb += width
        while nb >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nb -= 8

    put(clear)
    run = 0
    for v in idx.reshape(-1):
        if run == clear - 2:
            put(clear)
            run = 0
        put(int(v))
        run += 1
    put(eoi)
    if nb:
        packed.append(acc & 0xFF)
    out += bytes([mcs])
    data = bytes(packed)
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out += bytes([len(part)]) + part
    out += bytes([0, 0x3B])
    return bytes(out)
