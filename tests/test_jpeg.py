"""Pure-numpy JPEG codec (core/jpeg.py), baseline + progressive — spec goldens,
roundtrips, subsampling, restart markers, rejection of non-baseline
streams, and the multimodal actor integration (VERDICT r2 item 5)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from phrasekit_ray.core import jpeg


def _smooth_rgb(h=44, w=60):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [128 + 100 * np.sin(x / 11.0),
         128 + 100 * np.cos(y / 13.0),
         128 + 60 * np.sin((x + y) / 17.0)],
        axis=-1,
    )


def _handcrafted_dc_only(dc_mag_bits="1000"):
    """A minimal 8×8 grayscale stream assembled BYTE BY BYTE from T.81
    (not via our encoder): flat quant 16, Annex K Huffman tables, one
    block with DC diff +8 and EOB. Expected pixels: DC coef = 8·16 =
    128 → IDCT flat 128/8 = 16 → +128 level shift = 144."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 19 + 12) + bytes([0x00]) \
        + bytes(jpeg.DC_LUM_BITS) + bytes(jpeg.DC_LUM_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(jpeg.AC_LUM_VALS)) \
        + bytes([0x10]) + bytes(jpeg.AC_LUM_BITS) + bytes(jpeg.AC_LUM_VALS)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    # DC sym 4 (code 101) + mag 1000 (+8); AC EOB (code 1010); pad 1s
    out += bytes([0b10110001, 0b01011111])
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_handcrafted_spec_golden():
    img = jpeg.decode_jpeg(_handcrafted_dc_only())
    assert img.shape == (8, 8)
    assert np.allclose(img, 144.0)


def test_roundtrip_gray_flat_and_gradient():
    flat = np.full((16, 24), 200.0)
    assert np.abs(jpeg.decode_jpeg(jpeg.encode_jpeg(flat, 50)) - flat).max() < 1
    grad = np.tile(np.arange(64, dtype=np.float64) * 3, (32, 1))
    d = jpeg.decode_jpeg(jpeg.encode_jpeg(grad, quality=95))
    assert np.sqrt(((d - grad) ** 2).mean()) < 3.0


@pytest.mark.parametrize("sub,rmse_bound", [("444", 6.0), ("420", 12.0)])
def test_roundtrip_rgb_subsampling(sub, rmse_bound):
    rgb = _smooth_rgb()
    enc = jpeg.encode_jpeg(rgb, quality=90, subsampling=sub)
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == rgb.shape
    assert np.sqrt(((dec - rgb) ** 2).mean()) < rmse_bound
    # 4:2:0 carries a quarter of the chroma samples → smaller stream
    if sub == "420":
        assert len(enc) < len(jpeg.encode_jpeg(rgb, quality=90))


def test_roundtrip_odd_dimensions_preserved():
    rgb = _smooth_rgb(37, 41)
    for sub in ("444", "420"):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, 85, subsampling=sub))
        assert dec.shape == (37, 41, 3)


def test_restart_markers_reset_dc_predictors():
    """DRI=1 stream with two MCUs separated by RST0, assembled from the
    module's own tables: each block's DC is coded ABSOLUTE (predictor
    reset), so a decoder ignoring restarts would read block 2 wrong."""
    enc = jpeg._build_huff_encode(jpeg.DC_LUM_BITS, jpeg.DC_LUM_VALS)
    ac = jpeg._build_huff_encode(jpeg.AC_LUM_BITS, jpeg.AC_LUM_VALS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1 MCU
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 19 + 12) + bytes([0x00]) \
        + bytes(jpeg.DC_LUM_BITS) + bytes(jpeg.DC_LUM_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(jpeg.AC_LUM_VALS)) \
        + bytes([0x10]) + bytes(jpeg.AC_LUM_BITS) + bytes(jpeg.AC_LUM_VALS)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"

    def block_bits(dc):
        w = jpeg._BitWriter()
        t, mag = jpeg._magnitude(dc)
        code, ln = enc[t]
        w.write(code, ln)
        if t:
            w.write(mag, t)
        code, ln = ac[0x00]
        w.write(code, ln)
        w.flush()
        return bytes(w.out)

    out += block_bits(8)       # MCU 0: DC +8 → 144
    out += b"\xff\xd0"         # RST0, predictors reset
    out += block_bits(-8)      # MCU 1: DC −8 ABSOLUTE → 112
    out += b"\xff\xd9"
    img = jpeg.decode_jpeg(bytes(out))
    assert img.shape == (8, 16)
    assert np.allclose(img[:, :8], 144.0)
    assert np.allclose(img[:, 8:], 112.0)


def test_rejects_unsupported_sof_and_malformed():
    rgb_bytes = jpeg.encode_jpeg(_smooth_rgb(16, 16), 80)
    # SOF9 (arithmetic sequential) stays rejected
    arith = rgb_bytes.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="SOF9"):
        jpeg.decode_jpeg(arith)
    # a BASELINE body with the marker flipped to SOF2 is NOT a valid
    # progressive stream (its single scan claims Ss=0,Se=63 — illegal
    # for a progressive DC scan) and must still raise ValueError
    fake_prog = rgb_bytes.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(fake_prog)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff")


def test_image_actor_decodes_jpeg_payloads(ray_session):
    import ray

    from phrasekit_ray.stages.multimodal import ImageDecodeActor

    rgb = _smooth_rgb(32, 32)
    good = jpeg.encode_jpeg(rgb, 85)
    rows = pa.table(
        {
            "media_id": pa.array(["a", "b", "c"]),
            "media_type": pa.array(["image"] * 3),
            "payload": pa.array([good, b"\xff\xd8garbage", good], pa.binary()),
            "width": pa.array([32, -1, 32], pa.int32()),
            "height": pa.array([32, -1, 32], pa.int32()),
            "duration_ms": pa.array([-1, -1, -1], pa.int32()),
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
    assert bool(out.loc["a", "decoded_ok"]) and bool(out.loc["c", "decoded_ok"])
    assert not bool(out.loc["b", "decoded_ok"])  # malformed → flagged
    assert len(out.loc["a", "features"]) == 16
    assert np.allclose(out.loc["a", "features"], out.loc["c", "features"])


def test_real_backend_feature_detection():
    from phrasekit_ray.stages.multimodal import ImageDecodeActor

    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed — real backend available")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="Pillow"):
        ImageDecodeActor(backend="real")


def test_dqt_emitted_in_zigzag_order_and_hf_roundtrip():
    """Review fix: DQT bytes must be zigzag-ordered (T.81 B.2.4.1) — the
    decoder (ours and every external one) dequantizes zigzag-ordered
    coefficients directly against the DQT bytes. Natural-order emission
    roundtripped smooth images fine (low zigzag positions coincide) but
    mangled high-frequency content ~30× in RMSE."""
    x = np.arange(8)
    # single strong AC(0,3) horizontal cosine — energy far from the
    # zigzag prefix where natural/zigzag orders coincide
    row = (128 + 100 * np.cos((2 * x + 1) * 3 * np.pi / 16)).clip(0, 255)
    img = np.tile(row.astype(np.uint8), (16, 4))
    enc = jpeg.encode_jpeg(img, quality=90)
    i = enc.find(b"\xff\xdb")
    dqt = np.frombuffer(enc[i + 5:i + 5 + 64], np.uint8)
    q = jpeg._scaled_quant(jpeg.QUANT_LUM, 90)
    assert np.array_equal(dqt, q[jpeg.ZIGZAG].astype(np.uint8))
    dec = jpeg.decode_jpeg(enc)
    rmse = float(np.sqrt(((dec.astype(float) - img.astype(float)) ** 2).mean()))
    assert rmse < 3.0, rmse


def test_rejects_non_interleaved_multi_scan():
    """Review fix: a baseline color stream whose first SOS covers fewer
    components than the frame declares (one-scan-per-component layout,
    legal per T.81) must raise rather than silently return Y-only."""
    enc = bytearray(jpeg.encode_jpeg(_smooth_rgb(16, 16), quality=85))
    i = enc.find(b"\xff\xda")
    assert i > 0
    # original SOS: len=12, ns=3; rewrite to a single-component scan
    single = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    seglen = struct.unpack(">H", enc[i + 2:i + 4])[0]
    patched = bytes(enc[:i]) + single + bytes(enc[i + 2 + seglen:])
    with pytest.raises(ValueError, match="non-interleaved"):
        jpeg.decode_jpeg(patched)


# --- ADVICE r3 (high): malformed streams must raise ValueError ONLY ------
# ImageDecodeActor catches (ValueError, OSError); any other exception type
# escaping decode_jpeg crashes a whole batch instead of yielding one
# decoded_ok=false row. These four cases previously escaped as
# StopIteration / ZeroDivisionError / IndexError / struct.error.


def _patch_segment(enc: bytes, marker: bytes, new_seg: bytes) -> bytes:
    """Replace the first `marker` segment (payload after the 2-byte length)
    with new_seg, rewriting the length field."""
    i = enc.find(marker)
    assert i > 0
    seglen = struct.unpack(">H", enc[i + 2:i + 4])[0]
    return (
        enc[:i + 2]
        + struct.pack(">H", len(new_seg) + 2)
        + new_seg
        + enc[i + 2 + seglen:]
    )


def test_sos_component_id_absent_from_sof_raises_valueerror():
    enc = bytearray(jpeg.encode_jpeg(_smooth_rgb(16, 16), quality=85))
    i = enc.find(b"\xff\xda")
    assert i > 0
    enc[i + 5] = 77  # first scan component id → one not declared in SOF0
    with pytest.raises(ValueError, match="not declared in SOF"):
        jpeg.decode_jpeg(bytes(enc))


def test_zero_sampling_factor_raises_valueerror():
    enc = bytearray(jpeg.encode_jpeg(_smooth_rgb(16, 16), quality=85))
    i = enc.find(b"\xff\xc0")
    assert i > 0
    # component 0 h/v nibble byte sits at seg offset 7 → file offset i+4+7
    enc[i + 4 + 7] = 0x00
    with pytest.raises(ValueError, match="sampling factors"):
        jpeg.decode_jpeg(bytes(enc))


def test_truncated_dht_raises_valueerror():
    enc = bytes(jpeg.encode_jpeg(_smooth_rgb(16, 16), quality=85))
    # replace first DHT payload with a half-written header
    patched = _patch_segment(enc, b"\xff\xc4", b"\x00\x01\x02")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(patched)


def test_truncated_sof_raises_valueerror():
    enc = bytes(jpeg.encode_jpeg(_smooth_rgb(16, 16), quality=85))
    patched = _patch_segment(enc, b"\xff\xc0", b"\x08\x00")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(patched)


def test_arbitrary_corruption_raises_only_valueerror(monkeypatch):
    """Fuzz: flipping any single byte of a valid stream must either decode
    or raise ValueError — never any other exception type. The pixel cap
    is tightened so mutations that corrupt the declared dimensions don't
    spend seconds decoding megapixels of garbage."""
    monkeypatch.setattr(jpeg, "MAX_DECODE_PIXELS", 64 * 64)
    enc = bytes(jpeg.encode_jpeg(_smooth_rgb(24, 24), quality=75))
    rng = np.random.default_rng(42)
    for _ in range(300):
        pos = int(rng.integers(2, len(enc)))
        val = int(rng.integers(0, 256))
        mutated = enc[:pos] + bytes([val]) + enc[pos + 1:]
        try:
            jpeg.decode_jpeg(mutated)
        except ValueError:
            pass


def test_truncation_fuzz_raises_only_valueerror():
    enc = bytes(jpeg.encode_jpeg(_smooth_rgb(24, 24), quality=75))
    for cut in range(2, len(enc), max(1, len(enc) // 97)):
        try:
            jpeg.decode_jpeg(enc[:cut])
        except ValueError:
            pass


# --- Progressive (SOF2) decode — VERDICT r4 item 3 ----------------------


def test_progressive_decode_matches_baseline_exactly():
    """encode_jpeg_progressive carries the IDENTICAL quantized
    coefficients as encode_jpeg (its refinement scans complete down to
    Al=0), so the two decodes must agree bit-exactly — a full-pipeline
    differential oracle with no external codec."""
    rng = np.random.default_rng(3)
    cases = [
        (np.full((16, 24), 200.0), "444"),
        (np.tile(np.arange(64, dtype=np.float64) * 3, (32, 1)), "444"),
        (_smooth_rgb(), "444"),
        (_smooth_rgb(37, 41), "420"),
        (rng.uniform(0, 255, (24, 31, 3)), "444"),
        (rng.uniform(0, 255, (17, 19)), "444"),
        ((np.indices((40, 40)).sum(0) % 2 * 255).astype(float), "444"),
    ]
    for img, sub in cases:
        for q in (30, 85, 95):
            base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, q, subsampling=sub))
            prog = jpeg.decode_jpeg(
                jpeg.encode_jpeg_progressive(img, q, subsampling=sub)
            )
            assert np.array_equal(base, prog), (img.shape, sub, q)


def test_progressive_stream_is_sof2_multiscan():
    data = jpeg.encode_jpeg_progressive(_smooth_rgb(16, 16), 85)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data[:200]
    assert data.count(b"\xff\xda") == 10  # libjpeg default color script


def test_ac_refine_unit_fuzz_roundtrip():
    """Unit-level fuzz of the hardest scan type: AC refinement with
    EOB runs + positioned correction bits. Encoder and decoder must
    invert each other for arbitrary sparse coefficient blocks and
    arbitrary spectral bands."""
    rng = np.random.default_rng(0)
    enc_tab = jpeg._build_huff_encode(
        jpeg.PROG_AC_LUM_BITS, jpeg.PROG_AC_LUM_VALS
    )
    dec_tab = jpeg._build_huff_decode(
        jpeg.PROG_AC_LUM_BITS, jpeg.PROG_AC_LUM_VALS
    )
    for _ in range(300):
        nb = int(rng.integers(1, 8))
        ct = np.zeros((nb, 64), np.int64)
        mask = rng.random((nb, 64)) < rng.uniform(0.02, 0.95)
        vals = rng.integers(-8, 9, (nb, 64))
        ct[mask] = vals[mask]
        ss = int(rng.integers(1, 10))
        se = int(rng.integers(ss, 64))
        ah = int(rng.integers(1, 3))
        al = ah - 1
        e = {"samp": [(1, 1)], "w": nb * 8, "h": 8, "hmax": 1, "vmax": 1,
             "mcux": nb, "mcuy": 1, "bw": [nb], "coefs": [ct]}
        w = jpeg._BitWriter()
        jpeg._emit_ac_scan(e, 0, ss, se, ah, al, enc_tab, w)
        w.flush()
        data = bytes(w.out) + b"\xff\xd9"
        a = np.abs(ct)
        state = (np.sign(ct) * ((a >> ah) << ah)).astype(np.int64)
        want = state.copy()
        want[:, ss:se + 1] = (
            np.sign(ct) * ((a >> al) << al)
        ).astype(np.int64)[:, ss:se + 1]
        reader = jpeg._BitReader(data, 0)
        eobrun = 0
        for row in range(nb):
            eobrun = jpeg._ac_refine_unit(
                reader, dec_tab, state, row, ss, se, al, eobrun
            )
        assert np.array_equal(state, want)


def test_progressive_handcrafted_dc_only_golden():
    """Minimal SOF2 stream assembled byte by byte from T.81 Annex G:
    a DC-first scan at Al=1 (diff +4 → value 8 after shift) then a DC
    refinement scan appending bit 0 — same flat-144 golden as the
    baseline handcrafted test."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) \
        + bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 19 + 12) + bytes([0x00]) \
        + bytes(jpeg.DC_LUM_BITS) + bytes(jpeg.DC_LUM_VALS)
    # scan 1: DC first, Ss=0 Se=0 Ah=0 Al=1; DC diff +4 = sym 3 (code
    # 100) + mag 100; pad 1s → 1001 0011
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) \
        + bytes([0, 0, 0x01])
    out += bytes([0b10010011])
    # scan 2: DC refine, Ah=1 Al=0: one bit (0); pad 1s
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) \
        + bytes([0, 0, 0x10])
    out += bytes([0b01111111])
    out += b"\xff\xd9"
    img = jpeg.decode_jpeg(bytes(out))
    assert img.shape == (8, 8)
    # DC = (4<<1 | 0) = 8 → 8·16 = 128 → flat 16 + 128 = 144
    assert np.allclose(img, 144.0)


def test_progressive_corruption_raises_only_valueerror(monkeypatch):
    monkeypatch.setattr(jpeg, "MAX_DECODE_PIXELS", 64 * 64)
    enc = bytes(jpeg.encode_jpeg_progressive(_smooth_rgb(24, 24), 75))
    rng = np.random.default_rng(7)
    for _ in range(300):
        pos = int(rng.integers(2, len(enc)))
        val = int(rng.integers(0, 256))
        mutated = enc[:pos] + bytes([val]) + enc[pos + 1:]
        try:
            jpeg.decode_jpeg(mutated)
        except ValueError:
            pass
    for cut in range(2, len(enc), max(1, len(enc) // 97)):
        try:
            jpeg.decode_jpeg(enc[:cut])
        except ValueError:
            pass


def test_image_actor_decodes_progressive_payloads(ray_session):
    import ray

    from phrasekit_ray.stages.multimodal import ImageDecodeActor

    rgb = _smooth_rgb(32, 32)
    base = jpeg.encode_jpeg(rgb, 85)
    prog = jpeg.encode_jpeg_progressive(rgb, 85)
    rows = pa.table(
        {
            "media_id": pa.array(["base", "prog"]),
            "media_type": pa.array(["image"] * 2),
            "payload": pa.array([base, prog], pa.binary()),
            "width": pa.array([32, 32], pa.int32()),
            "height": pa.array([32, 32], pa.int32()),
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
    assert bool(out.loc["base", "decoded_ok"])
    assert bool(out.loc["prog", "decoded_ok"])
    # identical coefficients → identical decoded features
    assert np.allclose(out.loc["base", "features"], out.loc["prog", "features"])


def test_progressive_restart_markers_reset_predictors():
    """Progressive DC scans honor DRI/RSTn: predictors reset at each
    restart in both the first and the refinement scan (handcrafted
    stream, same 144/112 golden as the baseline restart test)."""
    enc = jpeg._build_huff_encode(jpeg.DC_LUM_BITS, jpeg.DC_LUM_VALS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1 MCU
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 16, 1) \
        + bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 19 + 12) + bytes([0x00]) \
        + bytes(jpeg.DC_LUM_BITS) + bytes(jpeg.DC_LUM_VALS)

    def dc_bits(diff):
        w = jpeg._BitWriter()
        t, mag = jpeg._magnitude(diff)
        code, ln = enc[t]
        w.write(code, ln)
        if t:
            w.write(mag, t)
        w.flush()
        return bytes(w.out)

    # scan 1: DC first Al=1; +4 then −4 ABSOLUTE across the restart
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) \
        + bytes([0, 0, 0x01])
    out += dc_bits(4) + b"\xff\xd0" + dc_bits(-4)
    # scan 2: DC refine Al=0, one 0-bit per block, restart between
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) \
        + bytes([0, 0, 0x10])
    w = jpeg._BitWriter()
    w.write(0, 1)
    w.flush()
    out += bytes(w.out) + b"\xff\xd0"
    w = jpeg._BitWriter()
    w.write(0, 1)
    w.flush()
    out += bytes(w.out)
    out += b"\xff\xd9"
    img = jpeg.decode_jpeg(bytes(out))
    assert img.shape == (8, 16)
    assert np.allclose(img[:, :8], 144.0)
    assert np.allclose(img[:, 8:], 112.0)
