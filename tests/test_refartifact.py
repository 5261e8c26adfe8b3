"""Reference binary-artifact interop tests (payloads.bin 17-byte layout,
vocab.json / manifest.json schemas, export→import roundtrip)."""

import json
import os
import struct

import numpy as np
import pytest

from phrasekit_ray.config import BuildConfig
from phrasekit_ray.core.artifact import build_artifact, fixture_artifact
from phrasekit_ray.sources import refartifact

PHRASES = [
    {"tokens": ["rat", "cdk10"], "phrase_id": 1000, "salience": 5.4, "count": 30},
    {"tokens": ["lysis", "buffer"], "phrase_id": 1001, "salience": 4.2, "count": 25},
    {"tokens": ["protein", "assay", "kit"], "phrase_id": 1002, "salience": 3.3,
     "count": 7},
]


def test_payload_record_golden_bytes(tmp_path):
    """Byte-level golden for the 17-byte record (reference
    payload.rs:45-52 write_to: u32 LE, f32 LE, u32 LE, 4 zero pad, u8) —
    the reference's own roundtrip fixture values (payload.rs tests)."""
    art, _ = build_artifact(
        [{"tokens": ["a", "b"], "phrase_id": 12345, "salience": 2.13, "count": 314}]
    )
    p = tmp_path / "payloads.bin"
    refartifact.write_payloads_bin(art, str(p))
    raw = p.read_bytes()
    assert len(raw) == 17
    assert raw[0:4] == struct.pack("<I", 12345)
    assert raw[4:8] == struct.pack("<f", np.float32(2.13))
    assert raw[8:12] == struct.pack("<I", 314)
    assert raw[12:16] == b"\x00\x00\x00\x00"
    assert raw[16] == 2  # n = phrase length


def test_payloads_roundtrip(tmp_path):
    art, _ = build_artifact(PHRASES)
    p = tmp_path / "payloads.bin"
    n = refartifact.write_payloads_bin(art, str(p))
    assert n == 3
    pids, sals, counts, ns = refartifact.read_payloads_bin(str(p))
    assert np.array_equal(pids, art.phrase_ids)
    assert np.array_equal(sals.view(np.uint32), art.saliences.view(np.uint32))
    assert np.array_equal(counts, art.counts)
    assert np.array_equal(ns, art.ns)


def test_truncated_payloads_rejected(tmp_path):
    p = tmp_path / "payloads.bin"
    p.write_bytes(b"\x00" * 20)  # not a multiple of 17
    with pytest.raises(ValueError, match="17"):
        refartifact.read_payloads_bin(str(p))


def test_export_import_roundtrip(tmp_path):
    art, _ = build_artifact(PHRASES, BuildConfig(min_count=5))
    d = str(tmp_path / "ref_artifact")
    out = refartifact.export_reference_artifact(art, d)
    assert out["payload_records"] == art.num_patterns
    # reference-schema vocab.json
    vocab = json.loads((tmp_path / "ref_artifact" / "vocab.json").read_text())
    assert vocab["special_tokens"] == {"<UNK>": 0}
    assert vocab["vocab_size"] == len(art.vocab) + 1
    loaded = refartifact.import_reference_artifact(d)
    assert loaded.pattern_tokens == art.pattern_tokens
    assert np.array_equal(loaded.phrase_ids, art.phrase_ids)
    assert loaded.vocab == art.vocab
    # behavioral parity through the matcher
    q = ["rat", "cdk10"]
    assert loaded.match_tokens(q) == art.match_tokens(q)


def test_import_rejects_mismatched_input(tmp_path):
    art, _ = build_artifact(PHRASES)
    d = str(tmp_path / "ref_artifact")
    refartifact.export_reference_artifact(art, d)
    # corrupt the input jsonl (different salience) → verification must fail
    path = tmp_path / "ref_artifact" / "phrases_input.jsonl"
    lines = path.read_text().splitlines()
    row = json.loads(lines[0])
    row["salience"] = 99.0
    lines[0] = json.dumps(row)
    path.write_text("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="differs from payloads.bin"):
        refartifact.import_reference_artifact(d)


def test_import_rejects_manifest_count_mismatch(tmp_path):
    art, _ = build_artifact(PHRASES)
    d = str(tmp_path / "ref_artifact")
    refartifact.export_reference_artifact(art, d)
    mpath = tmp_path / "ref_artifact" / "manifest.json"
    m = json.loads(mpath.read_text())
    m["num_patterns"] = 99
    mpath.write_text(json.dumps(m))
    with pytest.raises(ValueError, match="num_patterns"):
        refartifact.import_reference_artifact(d)


FROZEN_DIR = os.path.join(os.path.dirname(__file__), "data", "ref_artifact")


def test_frozen_fixture_imports_and_reexports_byte_identically():
    """Interop pinned against the COMMITTED binary fixture
    (tests/data/ref_artifact, VERDICT r2 item 10): any change to the
    17-byte payload record layout (payload.rs:27-52), the vocab.json
    schema, or the build semantics breaks this test against frozen bytes
    rather than self-generated goldens."""
    art = refartifact.import_reference_artifact(FROZEN_DIR)
    assert art.num_patterns == 4
    # frozen byte-level expectations, independent of our writer
    raw = open(os.path.join(FROZEN_DIR, "payloads.bin"), "rb").read()
    assert len(raw) == 4 * 17
    assert raw[0:4] == struct.pack("<I", 1000)
    assert raw[4:8] == struct.pack("<f", np.float32(5.4))
    assert raw[8:12] == struct.pack("<I", 30)
    assert raw[12:16] == b"\x00" * 4 and raw[16] == 2
    assert raw[3 * 17 + 16] == 1  # single-token phrase 1003
    # matching behavior of the imported artifact
    spans = art.match_tokens(
        ["the", "rat", "cdk10", "oligo"], policy="leftmost_longest"
    )
    assert [(s["start"], s["end"], s["phrase_id"]) for s in spans] == [(1, 3, 1000)]
    # re-export reproduces the frozen bytes exactly
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        refartifact.export_reference_artifact(art, td)
        assert open(os.path.join(td, "payloads.bin"), "rb").read() == raw
        assert json.load(open(os.path.join(td, "vocab.json"))) == json.load(
            open(os.path.join(FROZEN_DIR, "vocab.json"))
        )
        assert json.load(open(os.path.join(td, "manifest.json"))) == json.load(
            open(os.path.join(FROZEN_DIR, "manifest.json"))
        )


def test_frozen_fixture_rejects_mismatched_input(tmp_path):
    """A wrong phrases_input.jsonl must be rejected by the payload-table
    verification, not silently mis-tagged."""
    import shutil

    d = tmp_path / "bad"
    shutil.copytree(FROZEN_DIR, d)
    with open(d / "phrases_input.jsonl") as f:
        lines = f.read().splitlines()
    row = json.loads(lines[0])
    row["count"] = 999  # diverges from payloads.bin
    lines[0] = json.dumps(row)
    (d / "phrases_input.jsonl").write_text("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="payloads.bin"):
        refartifact.import_reference_artifact(str(d))
