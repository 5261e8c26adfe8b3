"""Reference binary-artifact interop (payloads.bin / vocab.json /
manifest.json).

The reference builder writes four files per artifact dir (reference
phrasekit_build.rs:145-184): ``phrases.daac`` (a serialized daachorse
Double-Array Aho-Corasick automaton), ``payloads.bin`` (fixed 17-byte LE
records, reference payload.rs:27-52), ``vocab.json`` and
``manifest.json``. This module reads and writes the three parseable
files byte-compatibly:

- **export**: a MatcherArtifact → payloads.bin + vocab.json +
  manifest.json in the reference's exact layouts, plus
  ``phrases_input.jsonl`` in the builder's INPUT format (PhraseInput
  rows, reference phrasekit_build.rs:17-24 / docs/INPUT_FORMAT.md) so
  the reference CLI can regenerate its own ``phrases.daac`` from our
  output (``phrasekit_build phrases_input.jsonl config.json outdir``).
- **import**: a reference artifact dir → MatcherArtifact. ``phrases.daac``
  encodes the pattern token-id sequences inside daachorse's private
  serialization, and payloads carry only (phrase_id, salience, count, n)
  — the token sequences are NOT recoverable from the binary artifacts
  alone. Import therefore replays the build from the builder INPUT
  JSONL (``phrases_input.jsonl`` in the dir, or an explicit path — the
  file every reference build starts from), then VERIFIES the resulting
  payload table byte-for-byte against ``payloads.bin`` and the vocab
  against ``vocab.json``, so a mismatched input is rejected rather than
  silently mis-tagged.

Payload record layout (17 bytes LE, reference payload.rs:45-52):
    offset 0:  phrase_id  u32
    offset 4:  salience   f32
    offset 8:  count      u32
    offset 12: 4 pad bytes (zeros)
    offset 16: n          u8  (phrase token length)
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from phrasekit_ray.config import BuildConfig, UNK_ID
from phrasekit_ray.core.artifact import MatcherArtifact, build_artifact

_RECORD = struct.Struct("<IfI4xB")  # 17 bytes
PAYLOAD_RECORD_SIZE = 17


def write_payloads_bin(artifact: MatcherArtifact, path: str) -> int:
    """payloads.bin in the reference's 17-byte record layout; returns the
    record count."""
    with open(path, "wb") as f:
        for pid, sal, cnt, n in zip(
            artifact.phrase_ids, artifact.saliences, artifact.counts, artifact.ns
        ):
            f.write(_RECORD.pack(int(pid), float(sal), int(cnt), int(n)))
    return artifact.num_patterns


def read_payloads_bin(path: str):
    """payloads.bin → (phrase_ids u32, saliences f32, counts u32, ns u8)
    arrays (reference payload.rs:27-43 / load_payloads:56-68: read fixed
    records until EOF; a trailing partial record is an error)."""
    size = os.path.getsize(path)
    if size % PAYLOAD_RECORD_SIZE != 0:
        raise ValueError(
            f"payloads.bin size {size} is not a multiple of "
            f"{PAYLOAD_RECORD_SIZE}-byte records"
        )
    raw = np.fromfile(path, dtype=np.uint8).reshape(-1, PAYLOAD_RECORD_SIZE)
    phrase_ids = raw[:, 0:4].copy().view(np.uint32).ravel()
    saliences = raw[:, 4:8].copy().view(np.float32).ravel()
    counts = raw[:, 8:12].copy().view(np.uint32).ravel()
    ns = raw[:, 16].copy()
    return phrase_ids, saliences, counts, ns


def export_reference_artifact(artifact: MatcherArtifact, dirpath: str) -> dict:
    """Write the reference-layout artifact files. ``phrases.daac`` is not
    produced (daachorse serialization is private to the Rust crate);
    ``phrases_input.jsonl`` lets the reference builder regenerate it."""
    os.makedirs(dirpath, exist_ok=True)
    n = write_payloads_bin(artifact, os.path.join(dirpath, "payloads.bin"))
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump(
            {
                "tokens": artifact.vocab,
                "special_tokens": {"<UNK>": UNK_ID},
                "vocab_size": len(artifact.vocab) + 1,
                "separator_id": artifact.separator_id,
            },
            f,
        )
    with open(os.path.join(dirpath, "manifest.json"), "w") as f:
        json.dump(artifact.manifest, f)
    with open(os.path.join(dirpath, "phrases_input.jsonl"), "w") as f:
        for toks, pid, sal, cnt in zip(
            artifact.pattern_tokens,
            artifact.phrase_ids,
            artifact.saliences,
            artifact.counts,
        ):
            f.write(
                json.dumps(
                    {
                        "tokens": toks,
                        "phrase_id": int(pid),
                        "salience": float(sal),
                        "count": int(cnt),
                    }
                )
                + "\n"
            )
    return {"payload_records": n, "dir": dirpath}


def import_reference_artifact(
    dirpath: str, phrases_jsonl: str | None = None
) -> MatcherArtifact:
    """Load a reference artifact dir into a MatcherArtifact, replaying the
    build from the builder input JSONL and verifying against the binary
    payload table (see module docstring)."""
    with open(os.path.join(dirpath, "manifest.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(dirpath, "vocab.json")) as f:
        ref_vocab = json.load(f)
    phrase_ids, saliences, counts, ns = read_payloads_bin(
        os.path.join(dirpath, "payloads.bin")
    )
    # load-time cross-check, reference matcher.rs:51-57
    if int(manifest["num_patterns"]) != len(phrase_ids):
        raise ValueError(
            f"payload count {len(phrase_ids)} does not match manifest "
            f"num_patterns {manifest['num_patterns']}"
        )

    jsonl_path = phrases_jsonl or os.path.join(dirpath, "phrases_input.jsonl")
    if not os.path.exists(jsonl_path):
        raise FileNotFoundError(
            "pattern token sequences are not recoverable from phrases.daac; "
            f"provide the builder input JSONL (looked for {jsonl_path})"
        )
    phrases = []
    with open(jsonl_path) as f:
        for line in f:
            if line.strip():
                phrases.append(json.loads(line))

    cfg = BuildConfig(
        version=str(manifest.get("version", "1")),
        tokenizer=manifest.get("tokenizer", "whitespace"),
        min_count=manifest.get("min_count"),
        salience_threshold=manifest.get("salience_threshold"),
        separator_id=int(manifest["separator_id"]),
    )
    artifact, _ = build_artifact(
        phrases, cfg, built_at=manifest.get("built_at", "1970-01-01T00:00:00Z")
    )

    # verify the replayed build against the binary payload table
    if artifact.num_patterns != len(phrase_ids):
        raise ValueError(
            f"replayed build produced {artifact.num_patterns} patterns, "
            f"payloads.bin has {len(phrase_ids)} — wrong input JSONL?"
        )
    if not (
        np.array_equal(artifact.phrase_ids, phrase_ids)
        and np.array_equal(
            artifact.saliences.view(np.uint32), saliences.view(np.uint32)
        )  # bitwise f32 compare
        and np.array_equal(artifact.counts, counts)
        and np.array_equal(artifact.ns, ns)
    ):
        raise ValueError(
            "replayed payload table differs from payloads.bin — the input "
            "JSONL does not match this artifact"
        )
    if artifact.vocab != {k: int(v) for k, v in ref_vocab["tokens"].items()}:
        raise ValueError("replayed vocabulary differs from vocab.json")
    return artifact
