"""Compressed-media structural codecs (core/media.py) and the
probe_media actor stage: IMA-ADPCM decode/encode, ISO-BMFF/MP4 box +
sample-table parsing, MP3 frame walking, malformed-payload policy."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from phrasekit_ray.core.media import (
    build_minimal_mp4,
    build_mp3_frames,
    decode_wav_ima_adpcm,
    encode_wav_ima_adpcm,
    extract_mp4_samples,
    parse_mp3,
    parse_mp4,
)


# --- IMA ADPCM ---------------------------------------------------------------

def test_adpcm_known_block_golden():
    """Hand-computed first nibbles of a known block decode exactly: the
    recurrence with predictor 0, index 0 (step 7)."""
    # samples: predictor 0 in header, nibbles 0x1 (+1), 0x9 (-1), 0x2 (+3→..)
    # decode nibble 1: step 7 → diff = 7>>3 + 7>>2 = 0+1=1... compute below
    spb = 9  # 1 + 8 nibbles
    hdr = struct.pack("<hBB", 0, 0, 0)
    nibbles = [0x1, 0x9, 0x2, 0x0, 0x7, 0xF, 0x4, 0x8]
    packed = bytes(
        [nibbles[0] | nibbles[1] << 4, nibbles[2] | nibbles[3] << 4,
         nibbles[4] | nibbles[5] << 4, nibbles[6] | nibbles[7] << 4]
    )
    block = hdr + packed
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000 * len(block) // spb,
                      len(block), 4, 2, spb)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + block
    )
    got, rate = decode_wav_ima_adpcm(wav)
    assert rate == 8000
    # hand-computed against the published IMA recurrence (steps 7, 16,
    # 34, 41 along the walk; indices 0→0→0→0→8→16→18→17):
    ref = [0, 1, 0, 3, 3, 14, -16, 22, 17]
    assert np.allclose(got * 32768.0, ref, atol=1e-3)


def test_adpcm_roundtrip_snr_and_length():
    t = np.arange(5000)
    s = (10000 * np.sin(t / 30.0) + 3000 * np.sin(t / 7.0)).astype(np.int16)
    wav = encode_wav_ima_adpcm(s, 16000, samples_per_block=505)
    dec, rate = decode_wav_ima_adpcm(wav)
    assert rate == 16000
    assert len(dec) >= len(s) and len(dec) % 505 == 0
    ref = s.astype(np.float64) / 32768.0
    err = ref - dec[: len(s)].astype(np.float64)
    snr = 10 * np.log10((ref ** 2).mean() / (err ** 2).mean())
    assert snr > 30.0  # real ADPCM ≈ 35-40 dB on smooth signals


def test_adpcm_stereo_mean_mix():
    """Stereo: per-channel 4-byte interleaved groups decode per channel
    then mean-mix — construct 2 identical channels, expect the mono
    signal back."""
    t = np.arange(497)
    s = (8000 * np.sin(t / 11.0)).astype(np.int16)
    mono_wav = encode_wav_ima_adpcm(s, 8000, samples_per_block=249)
    mono_dec, _ = decode_wav_ima_adpcm(mono_wav)
    # hand-weave a stereo file with channel := the mono stream twice
    pos, fmt_body, data = 12, None, None
    while pos + 8 <= len(mono_wav):
        cid = mono_wav[pos : pos + 4]
        (csize,) = struct.unpack("<I", mono_wav[pos + 4 : pos + 8])
        body = mono_wav[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    tag, ch, rate, br, ba, bits, ext, spb = struct.unpack("<HHIIHHHH", fmt_body)
    st_ba = ba * 2
    blocks = [data[i : i + ba] for i in range(0, len(data), ba)]
    st_data = bytearray()
    for blk in blocks:
        hdr, words = blk[:4], blk[4:]
        st_data += hdr + hdr  # channel headers back to back
        for w in range(0, len(words), 4):
            st_data += words[w : w + 4] * 2  # group for ch0, same for ch1
    st_fmt = struct.pack("<HHIIHHHH", 0x11, 2, rate, br * 2, st_ba, 4, 2, spb)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(st_fmt) + 8 + len(st_data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(st_fmt)) + st_fmt
        + b"data" + struct.pack("<I", len(st_data)) + bytes(st_data)
    )
    st_dec, st_rate = decode_wav_ima_adpcm(wav)
    assert st_rate == rate
    assert np.allclose(st_dec, mono_dec)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],  # truncated
        lambda b: b"JUNK" + b[4:],  # bad magic
        lambda b: b.replace(b"fmt ", b"fmx ", 1),  # data before fmt
    ],
)
def test_adpcm_malformed_raises_valueerror_only(mutate):
    s = (1000 * np.sin(np.arange(600) / 9.0)).astype(np.int16)
    wav = encode_wav_ima_adpcm(s, 8000, samples_per_block=249)
    with pytest.raises(ValueError):
        decode_wav_ima_adpcm(mutate(wav))


# --- MP4 ---------------------------------------------------------------------

def test_mp4_parse_and_sample_extraction():
    samples = [bytes([i]) * (10 + i) for i in range(7)]
    payload = build_minimal_mp4(samples, codec="avc1", handler="vide",
                                timescale=1000, sample_duration=40)
    meta = parse_mp4(payload)
    assert meta["brand"] == "isom"
    assert meta["duration_s"] == pytest.approx(0.28)
    (trk,) = meta["tracks"]
    assert trk["handler"] == "vide" and trk["codec"] == "avc1"
    assert trk["n_samples"] == 7
    assert trk["sample_sizes"] == [len(s) for s in samples]
    assert extract_mp4_samples(payload, trk) == samples
    assert extract_mp4_samples(payload, trk, every=3) == samples[::3]


def test_mp4_malformed_raises_valueerror_only():
    samples = [b"a" * 8, b"b" * 8]
    payload = build_minimal_mp4(samples)
    for bad in (
        payload[: len(payload) // 2],  # truncated mid-boxes
        payload.replace(b"moov", b"m00v", 1),  # no moov
        b"\x00\x00\x00\x08ftyp",  # ftyp only
    ):
        with pytest.raises(ValueError):
            parse_mp4(bad)


def test_mp4_stsz_stco_mismatch_rejected():
    payload = bytearray(build_minimal_mp4([b"a" * 8, b"b" * 8, b"c" * 8]))
    # corrupt stsc samples-per-chunk: claim 1 sample in the only chunk
    i = bytes(payload).find(b"stsc")
    # stsc box: type at i, body = ver/flags(4) + count(4) + (first, spc, desc)
    spc_off = i + 4 + 4 + 4 + 4
    payload[spc_off : spc_off + 4] = struct.pack(">I", 1)
    with pytest.raises(ValueError, match="fewer samples"):
        parse_mp4(bytes(payload))


# --- MP3 ---------------------------------------------------------------------

def test_mp3_walk_counts_and_duration():
    mp3 = build_mp3_frames(25, kbps=128, sample_rate=44100, id3v2=True)
    info = parse_mp3(mp3)
    assert info["n_frames"] == 25
    assert info["sample_rate"] == 44100
    assert info["bitrate_kbps"] == 128
    assert not info["vbr"] and info["id3v2"]
    assert info["duration_s"] == pytest.approx(25 * 1152 / 44100)


def test_mp3_trailing_id3v1_tolerated_and_garbage_rejected():
    mp3 = build_mp3_frames(4, kbps=160, sample_rate=32000)
    assert parse_mp3(mp3 + b"TAG" + b"\x00" * 125)["n_frames"] == 4
    with pytest.raises(ValueError):
        parse_mp3(b"\x00" * 64)
    with pytest.raises(ValueError):
        parse_mp3(mp3[: len(mp3) - 10])  # truncated final frame


# --- probe_media actor stage --------------------------------------------------

def test_probe_media_stage(ray_session, sf_dir):
    import ray

    from phrasekit_ray.stages.multimodal import (
        probe_media,
        synthesize_compressed_media_from_documents,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    n_docs = docs.count()
    out = pa.concat_tables(
        list(
            probe_media(
                synthesize_compressed_media_from_documents(docs)
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="default",
    )
    assert out.num_rows == n_docs
    rows = out.to_pydict()
    by_kind = {}
    for mid, cont, ok, nu in zip(
        rows["media_id"], rows["container"], rows["ok"], rows["n_units"]
    ):
        kind = mid.split("_")[0]
        by_kind.setdefault(kind, []).append((cont, ok, nu))
    # every synthesized format probes to its container; bad rows fail
    assert all(c == "mp4" and ok for c, ok, _ in by_kind["mp4"])
    assert all(c == "wav" and ok and nu > 800 for c, ok, nu in by_kind["adpcm"])
    assert all(c == "mp3" and ok and nu >= 5 for c, ok, nu in by_kind["mp3"])
    assert all(not ok for _, ok, _ in by_kind["bad"])


def test_audio_actor_decodes_adpcm_payloads(ray_session):
    """The numpy audio backend now REALLY decompresses fmt-0x11 WAVs."""
    import ray

    from phrasekit_ray.stages.multimodal import sample_audio_frames

    t = np.arange(2000)
    s = (12000 * np.sin(t / 25.0)).astype(np.int16)
    wav = encode_wav_ima_adpcm(s, 16000, samples_per_block=505)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(["a1", "bad"], pa.string()),
                "payload": pa.array([wav, wav[:30]], pa.binary()),
            }
        )
    )
    out = pa.concat_tables(
        list(
            sample_audio_frames(ds, backend="numpy").iter_batches(
                batch_format="pyarrow"
            )
        ),
        promote_options="default",
    )
    d = dict(zip(out["media_id"].to_pylist(), out["decoded_ok"].to_pylist()))
    assert d == {"a1": True, "bad": False}
    feats = dict(zip(out["media_id"].to_pylist(), out["frame_features"].to_pylist()))
    assert any(v > 0 for row in feats["a1"] for v in row)


def test_q_media_probe_exact_counts(ray_session):
    """Query-level pin at sf0.001: the synthesized fixture mix is a pure
    function of doc_id, so the per-container stats are exact constants."""
    from phrasekit_ray.pipelines.queries_ext import q_media_probe

    t = q_media_probe("/root/testdata/sf0.001")
    assert t.to_pydict() == {
        "kind": ["adpcm", "bad", "mp3", "mp4"],
        "n": [125, 125, 125, 125],
        "n_ok": [125, 0, 125, 125],
        "n_units": [134958, 0, 998, 625],
        "duration_ms": [16844, 0, 26073, 25000],
    }
