"""The compiled matcher artifact: vocabulary + pattern tables + payloads.

Reference equivalent: the builder's four artifacts — `phrases.daac`
(a Double-Array Aho-Corasick automaton over 8-byte-per-token encodings),
`payloads.bin` (17-byte fixed records), `vocab.json`, `manifest.json`
(reference phrasekit_build.rs:120-186, payload.rs:27-52, manifest.rs:7-16,
docs/BUILDER.md). We do not reproduce the byte encoding (SURVEY.md §1.3 —
it is a daachorse implementation detail whose only purpose is token-boundary
alignment): patterns here are fixed-length token-ID sequences, and matching
is a fully vectorized sliding-window + sorted-key binary search per pattern
length n (n ∈ [1,10] by mining config). Because every pattern is a contiguous
token-ID sequence of known length, "all overlapping automaton hits"
(find_overlapping_iter, reference matcher.rs:84-96) == "all window positions,
for each pattern length, whose window equals some pattern" — which is what
the vectorized scan computes. Span/policy semantics are therefore identical.

The artifact is built once in a single Ray task or on the driver (phrase
tables are 10K–1M rows — reference docs/BUILDER.md:136-142), `ray.put()`
into the object store, and loaded once per tagger actor in __init__
(SURVEY.md T1).
"""

from __future__ import annotations

import json
import os
import warnings
from dataclasses import dataclass, field
from typing import Iterable, Optional, Sequence

import numpy as np

from phrasekit_ray.config import DEFAULT_SEPARATOR_ID, UNK_ID, BuildConfig
from phrasekit_ray.core import salience as saliencemod
from phrasekit_ray.core.policy import Match, emission_sort, resolve_overlaps, truncate


@dataclass
class BuildStats:
    """reference phrasekit_build.rs:45-53."""

    total_input: int = 0
    filtered_low_count: int = 0
    filtered_low_salience: int = 0
    duplicate_phrase_ids: int = 0
    invalid_tokens: int = 0
    built: int = 0


@dataclass
class _PatternTable:
    """All patterns of one length n, sorted for binary search.

    ``keys`` are uint64 rolling-polynomial hashes of the n token ids
    (salted if a hash collision between distinct patterns ever occurs);
    ``mat`` holds the exact token-id rows in key order so candidate hits
    are verified with vectorized uint32 comparisons — hashing is a fast
    path, never a correctness assumption. In the astronomically rare case
    no salt (within ``_MAX_SALT_ATTEMPTS``) separates all keys, the
    colliding extras land in ``overflow_mat`` and are matched by exact
    sliding-window comparison — so construction always terminates and no
    pattern is ever shadowed by a hash collision."""

    n: int
    keys: np.ndarray  # uint64 hashes, sorted ascending
    pattern_idx: np.ndarray  # int64, same order as keys → payload index
    mat: np.ndarray  # (len(keys), n) uint32 token ids, key order
    salt: np.uint64
    overflow_mat: np.ndarray  # (n_overflow, n) uint32 token ids
    overflow_idx: np.ndarray  # int64 payload indices for overflow rows
    bitmap: np.ndarray  # bool[2^_BITMAP_BITS] prefilter over key low bits


_HASH_C = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
_MAX_SALT_ATTEMPTS = 16
# scan prefilter: one boolean load per window replaces a binary search for
# the ~97% of windows whose key low bits hit no pattern bucket
_BITMAP_BITS = 20
_BITMAP_MASK = np.uint64((1 << _BITMAP_BITS) - 1)


def _poly_hash_columns(cols: list[np.ndarray], salt: np.uint64) -> np.ndarray:
    """uint64 polynomial hash over n aligned uint32 columns (mod 2^64).

    The salt is XOR-mixed into EVERY column (not just the initial
    accumulator): an additive-only salt contributes salt*C^n identically
    to all same-length patterns, making pairwise collisions salt-invariant
    — the bump loop could then never resolve a real collision."""
    acc = np.full(len(cols[0]), salt, dtype=np.uint64)
    for c in cols:
        acc = acc * _HASH_C + (c.astype(np.uint64) ^ salt)
    return acc


class MatcherArtifact:
    """Immutable compiled phrase matcher (vocab + patterns + payloads)."""

    def __init__(
        self,
        vocab: dict[str, int],
        pattern_tokens: list[list[str]],
        phrase_ids: np.ndarray,
        saliences: np.ndarray,
        counts: np.ndarray,
        manifest: dict,
    ) -> None:
        self.vocab = vocab
        self.separator_id = int(manifest["separator_id"])
        if self.separator_id == 0:
            raise ValueError("separator_id must be non-zero")  # manifest.rs:37-41
        self.manifest = manifest
        self.pattern_tokens = pattern_tokens
        # payload columns, indexed by pattern index (payload.rs:27-52)
        self.phrase_ids = np.ascontiguousarray(phrase_ids, dtype=np.uint32)
        self.saliences = np.ascontiguousarray(saliences, dtype=np.float32)
        self.counts = np.ascontiguousarray(counts, dtype=np.uint32)
        self.ns = np.array([len(t) for t in pattern_tokens], dtype=np.uint8)
        if int(manifest.get("num_patterns", len(pattern_tokens))) != len(pattern_tokens):
            # matcher.rs:51-57 load-time cross-check
            raise ValueError("payload count does not match manifest num_patterns")
        # precomputed runtime ranking score (payload.rs:23-25)
        self.salience_scores = saliencemod.salience_score(self.saliences, self.counts)
        # pattern tables per length
        self._tables: dict[int, _PatternTable] = {}
        by_n: dict[int, list[int]] = {}
        for i, toks in enumerate(pattern_tokens):
            by_n.setdefault(len(toks), []).append(i)
        for n, idxs in by_n.items():
            mat = np.empty((len(idxs), n), dtype=np.uint32)
            for row, i in enumerate(idxs):
                mat[row] = self.encode_tokens(pattern_tokens[i])
            # salted hash keys: bump the (XOR-mixed) salt in the
            # astronomically rare event two DISTINCT patterns collide, so
            # lookups stay 1:1; bounded attempts, then exact-scan overflow
            idx_arr = np.asarray(idxs, dtype=np.int64)
            keys = np.zeros(len(idx_arr), dtype=np.uint64)
            salt = np.uint64(0)
            resolved = False
            for attempt in range(_MAX_SALT_ATTEMPTS):
                salt = np.uint64(attempt)
                keys = _poly_hash_columns([mat[:, k] for k in range(n)], salt)
                if len(np.unique(keys)) == len(keys):
                    resolved = True
                    break
            if resolved:
                primary = np.ones(len(keys), dtype=bool)
            else:
                # keep the first pattern per colliding key in the hash
                # table; the rest are matched by exact window comparison
                _, first_pos = np.unique(keys, return_index=True)
                primary = np.zeros(len(keys), dtype=bool)
                primary[first_pos] = True
            pk = keys[primary]
            order = np.argsort(pk)
            bitmap = np.zeros(1 << _BITMAP_BITS, dtype=bool)
            bitmap[(pk & _BITMAP_MASK).astype(np.int64)] = True
            self._tables[n] = _PatternTable(
                n=n,
                keys=pk[order],
                pattern_idx=idx_arr[primary][order],
                mat=np.ascontiguousarray(mat[primary][order]),
                salt=salt,
                overflow_mat=np.ascontiguousarray(mat[~primary]),
                overflow_idx=idx_arr[~primary],
                bitmap=bitmap,
            )

    # -- encode ---------------------------------------------------------

    def encode_tokens(self, tokens: Sequence[str]) -> np.ndarray:
        """Token strings → vocab ids; lowercased; miss → <UNK>=0
        (reference phrasekit_tag.rs:74-84, lib/phrasekit.rb:43-51)."""
        v = self.vocab
        return np.fromiter(
            (v.get(t.lower(), UNK_ID) for t in tokens), dtype=np.uint32, count=len(tokens)
        )

    # -- matching -------------------------------------------------------

    def find_matches_flat(
        self, ids: np.ndarray, doc_index: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """All overlapping pattern hits over a flattened token-ID array.

        ``ids`` is the concatenation of every document's token ids in a
        batch; ``doc_index[i]`` is the document ordinal owning position i.
        Returns (doc, start_flat, end_flat, pattern_idx) arrays — positions
        are into the flat array; windows crossing document boundaries are
        masked out. Equivalent to running find_overlapping_iter per doc
        (reference phrasekit_tag.rs:164-177) but vectorized across the batch.
        """
        L = len(ids)
        docs_out, starts_out, ends_out, pidx_out = [], [], [], []
        ids = np.ascontiguousarray(ids, dtype=np.uint32)
        for n, table in self._tables.items():
            if L < n:
                continue
            m = L - n + 1
            keys = _poly_hash_columns(
                [ids[k : k + m] for k in range(n)], table.salt
            )
            # bitmap prefilter: one vectorized gather rejects ~97% of
            # windows before the O(log P) binary search
            sel = table.bitmap[(keys & _BITMAP_MASK).astype(np.int64)]
            if n > 1:
                sel &= doc_index[:m] == doc_index[n - 1 :]
            cand0 = np.flatnonzero(sel)
            if len(cand0) == 0:
                continue
            sub = keys[cand0]
            pos = np.searchsorted(table.keys, sub)
            pos_c = np.minimum(pos, len(table.keys) - 1)
            hit = table.keys[pos_c] == sub
            cand = cand0[hit]
            if len(cand) == 0:
                continue
            # exact verification of hash candidates (no window copies):
            # compare each of the n id columns against the pattern row
            rows = pos_c[hit]
            ok = np.ones(len(cand), dtype=bool)
            for k in range(n):
                ok &= ids[cand + k] == table.mat[rows, k]
            starts = cand[ok]
            if len(starts) == 0:
                continue
            docs_out.append(doc_index[starts])
            starts_out.append(starts)
            ends_out.append(starts + n)
            pidx_out.append(table.pattern_idx[rows[ok]])
        # exact sliding-window scan for hash-collision overflow patterns
        # (normally empty — see _PatternTable docstring)
        for n, table in self._tables.items():
            if len(table.overflow_idx) == 0 or L < n:
                continue
            m = L - n + 1
            in_doc = doc_index[:m] == doc_index[n - 1 :] if n > 1 else None
            for row in range(len(table.overflow_idx)):
                patt = table.overflow_mat[row]
                ok = ids[:m] == patt[0]
                for k in range(1, n):
                    ok &= ids[k : k + m] == patt[k]
                if in_doc is not None:
                    ok &= in_doc
                starts = np.flatnonzero(ok)
                if len(starts) == 0:
                    continue
                docs_out.append(doc_index[starts])
                starts_out.append(starts)
                ends_out.append(starts + n)
                pidx_out.append(
                    np.full(len(starts), table.overflow_idx[row], dtype=np.int64)
                )
        if not docs_out:
            e = np.empty(0, dtype=np.int64)
            return e, e, e, e
        return (
            np.concatenate(docs_out),
            np.concatenate(starts_out),
            np.concatenate(ends_out),
            np.concatenate(pidx_out),
        )

    def match_ids(
        self, token_ids: Sequence[int], policy: str = "leftmost_longest", max_matches: int = 32
    ) -> list[dict]:
        """Runtime single-query API (reference matcher.rs:67-105): scan →
        resolve policy → truncate → payload dicts {start,end,phrase_id,
        salience,count,n} (reference lib.rs:48-57)."""
        ids = np.asarray(token_ids, dtype=np.uint32)
        doc_index = np.zeros(len(ids), dtype=np.int64)
        _, starts, ends, pidx = self.find_matches_flat(ids, doc_index)
        matches = emission_sort(
            [Match(int(s), int(e), int(p)) for s, e, p in zip(starts, ends, pidx)]
        )
        resolved = resolve_overlaps(matches, policy, self.salience_scores)
        resolved = truncate(resolved, max_matches)
        return [
            {
                "start": m.start,
                "end": m.end,
                "phrase_id": int(self.phrase_ids[m.idx]),
                "salience": float(self.saliences[m.idx]),
                "count": int(self.counts[m.idx]),
                "n": int(self.ns[m.idx]),
            }
            for m in resolved
        ]

    def match_tokens(
        self, tokens: Sequence[str], policy: str = "leftmost_longest", max_matches: int = 32
    ) -> list[dict]:
        """reference lib/phrasekit.rb:53-59 match_text_tokens: encode then match."""
        return self.match_ids(self.encode_tokens(tokens), policy, max_matches)

    # -- stats / persistence -------------------------------------------

    @property
    def num_patterns(self) -> int:
        return len(self.pattern_tokens)

    def stats(self) -> dict:
        """reference lib.rs:62-79 stats surface (latency fields are stubbed
        zeros in the reference too, matcher.rs:139-151)."""
        return {
            "patterns": self.num_patterns,
            "vocab_size": len(self.vocab) + 1,
            "version": self.manifest.get("version"),
            "tokenizer": self.manifest.get("tokenizer"),
            "hits_total": 0,
            "p50_us": 0,
            "p95_us": 0,
        }

    def validate_compatible(self, tokenizer: str, separator_id: int) -> None:
        """reference manifest.rs:47-63."""
        if self.manifest.get("tokenizer") != tokenizer:
            raise ValueError(
                f"tokenizer mismatch: artifact={self.manifest.get('tokenizer')!r} "
                f"caller={tokenizer!r}"
            )
        if self.separator_id != separator_id:
            raise ValueError(
                f"separator_id mismatch: artifact={self.separator_id} caller={separator_id}"
            )

    def save(self, dirpath: str) -> None:
        """Persist as npz + json (checkpoint/lineage form of the reference's
        phrases.daac/payloads.bin/vocab.json/manifest.json quartet)."""
        os.makedirs(dirpath, exist_ok=True)
        flat_tokens = [t for toks in self.pattern_tokens for t in toks]
        offsets = np.cumsum([0] + [len(t) for t in self.pattern_tokens])
        np.savez_compressed(
            os.path.join(dirpath, "patterns.npz"),
            phrase_ids=self.phrase_ids,
            saliences=self.saliences,
            counts=self.counts,
            offsets=offsets,
        )
        with open(os.path.join(dirpath, "vocab.json"), "w") as f:
            json.dump(
                {
                    "tokens": self.vocab,
                    "special_tokens": {"<UNK>": UNK_ID},
                    "vocab_size": len(self.vocab) + 1,
                    "separator_id": self.separator_id,
                },
                f,
            )
        with open(os.path.join(dirpath, "pattern_tokens.json"), "w") as f:
            json.dump(flat_tokens, f)
        with open(os.path.join(dirpath, "manifest.json"), "w") as f:
            json.dump(self.manifest, f)

    @classmethod
    def load(cls, dirpath: str) -> "MatcherArtifact":
        with open(os.path.join(dirpath, "manifest.json")) as f:
            manifest = json.load(f)
        with open(os.path.join(dirpath, "vocab.json")) as f:
            vocab = json.load(f)["tokens"]
        with open(os.path.join(dirpath, "pattern_tokens.json")) as f:
            flat_tokens = json.load(f)
        data = np.load(os.path.join(dirpath, "patterns.npz"))
        offsets = data["offsets"]
        pattern_tokens = [
            flat_tokens[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)
        ]
        return cls(
            vocab=vocab,
            pattern_tokens=pattern_tokens,
            phrase_ids=data["phrase_ids"],
            saliences=data["saliences"],
            counts=data["counts"],
            manifest=manifest,
        )


def build_vocabulary(unique_tokens: Iterable[str]) -> dict[str, int]:
    """IDs 1..N over alphabetically sorted unique (already-lowercased)
    tokens; <UNK>=0 held separately (reference phrasekit_build.rs:306-326,
    docs/VOCABULARY.md:9-39)."""
    return {tok: i + 1 for i, tok in enumerate(sorted(set(unique_tokens)))}


def build_artifact(
    phrases: Iterable[dict],
    config: BuildConfig | None = None,
    built_at: str = "1970-01-01T00:00:00Z",
) -> tuple[MatcherArtifact, BuildStats]:
    """Compile scored phrases into a MatcherArtifact.

    ``phrases`` rows carry tokens (list[str]), phrase_id, salience, and
    count (alias domain_count — reference phrasekit_build.rs:17-24 serde
    alias, so scorer output feeds build directly).

    Validation mirrors reference phrasekit_build.rs:212-295: optional
    min_count then salience_threshold filters, empty-token-sequence
    rejection, duplicate-phrase_id first-wins skip. Divergence (documented):
    the reference's per-token empty check is a no-op (its `continue`
    only continues the token loop, build.rs:266-272); here a phrase
    containing an empty token IS skipped, which is the evident intent.
    Duplicate patterns (identical lowercased token sequences) raise, as the
    daachorse build does (build.rs:141-143, docs/BUILDER.md:123).
    """
    config = config or BuildConfig()
    stats = BuildStats()
    seen_ids: set[int] = set()
    kept: list[tuple[list[str], int, float, int]] = []
    unique_tokens: set[str] = set()
    for phrase in phrases:
        stats.total_input += 1
        tokens = phrase["tokens"]
        count = int(phrase.get("count", phrase.get("domain_count", 0)))
        sal = float(phrase["salience"])
        pid = int(phrase["phrase_id"])
        if config.min_count is not None and count < config.min_count:
            stats.filtered_low_count += 1
            continue
        if config.salience_threshold is not None and sal < config.salience_threshold:
            stats.filtered_low_salience += 1
            continue
        if len(tokens) == 0 or any(t == "" for t in tokens):
            stats.invalid_tokens += 1
            continue
        if pid in seen_ids:
            warnings.warn(f"Duplicate phrase_id {pid}; first occurrence wins")
            stats.duplicate_phrase_ids += 1
            continue
        seen_ids.add(pid)
        low = [t.lower() for t in tokens]
        unique_tokens.update(low)
        kept.append((low, pid, sal, count))
        stats.built += 1

    # duplicate-pattern rejection (build.rs:141-143)
    seen_patterns: set[tuple[str, ...]] = set()
    for low, _, _, _ in kept:
        key = tuple(low)
        if key in seen_patterns:
            raise ValueError(f"Duplicate pattern: {' '.join(key)!r}")
        seen_patterns.add(key)

    vocab = build_vocabulary(unique_tokens)
    manifest = {
        "version": config.version,
        "tokenizer": config.tokenizer,
        "num_patterns": len(kept),
        "min_count": config.min_count,
        "salience_threshold": config.salience_threshold,
        "built_at": built_at,
        "separator_id": config.separator_id,
    }
    artifact = MatcherArtifact(
        vocab=vocab,
        pattern_tokens=[k[0] for k in kept],
        phrase_ids=np.array([k[1] for k in kept], dtype=np.uint32),
        saliences=np.array([k[2] for k in kept], dtype=np.float32),
        counts=np.array([k[3] for k in kept], dtype=np.uint32),
        manifest=manifest,
    )
    return artifact, stats


def fixture_artifact() -> MatcherArtifact:
    """The reference's canonical 3-pattern test artifact
    (reference fixture_builder.rs:39-67,94-119; FIXTURES.md §6):
    vocab machine→100-ish ids are NOT reproduced — the reference fixture
    hand-assigns ids 100/101/102/200; we reproduce the same *token ids* by
    injecting the hand-built vocab directly so golden expectations on
    encoded queries ([100,101] → match) hold verbatim."""
    vocab = {"machine": 100, "learning": 101, "algorithms": 102, "deep": 200}
    manifest = {
        "version": "1",
        "tokenizer": "test",
        "num_patterns": 3,
        "built_at": "1970-01-01T00:00:00Z",
        "separator_id": DEFAULT_SEPARATOR_ID,
    }
    return MatcherArtifact(
        vocab=vocab,
        pattern_tokens=[
            ["machine", "learning"],
            ["deep", "learning"],
            ["machine", "learning", "algorithms"],
        ],
        phrase_ids=np.array([100, 200, 300], dtype=np.uint32),
        saliences=np.array([2.5, 2.0, 3.0], dtype=np.float32),
        counts=np.array([150, 100, 200], dtype=np.uint32),
        manifest=manifest,
    )
