"""Normalization: Unicode lowercase + tokenization with Rust-lowercase parity.

The reference lowercases tokens at every stage boundary with Rust
``str::to_lowercase()`` (reference phrasekit_mine.rs:150-153,
phrasekit_score.rs:159-160, phrasekit_build.rs:280-282, phrasekit_tag.rs:80).
Python ``str.lower()`` implements the same full Unicode lowercase mapping
(including İ U+0130 → "i"+U+0307 and Greek final sigma), but Arrow's
``utf8_lower`` kernel does NOT (it applies simple per-codepoint mappings).
So the vectorized path here is: ``ascii_lower`` for everything (a no-op on
non-ASCII bytes), then patch the rows that contain non-ASCII via Python
``str.lower()``. On web-scale English-heavy corpora the fallback is cold.

Tokenization is whitespace-split (any Unicode whitespace run, no empty
tokens) — the reference takes pre-tokenized input and treats the tokenizer
as external (docs/MINING.md:22-39); this module defines ours.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def lower_string(s: str) -> str:
    """Scalar reference implementation (parity with Rust to_lowercase)."""
    return s.lower()


def lower_string_array(arr: pa.Array) -> pa.Array:
    """Vectorized full-Unicode lowercase over a string array.

    ASCII fast path via ``pc.ascii_lower``; non-ASCII rows are patched with
    Python ``str.lower()`` so the result is byte-identical to Rust
    ``str::to_lowercase`` semantics (SURVEY.md §1.4 invariant).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lowered = pc.ascii_lower(arr)
    ascii_mask = pc.string_is_ascii(arr)
    non_ascii = pc.invert(ascii_mask)
    if pc.any(non_ascii).as_py():
        mask_np = non_ascii.to_numpy(zero_copy_only=False)
        mask_np = np.asarray(mask_np, dtype=bool)
        idx = np.flatnonzero(mask_np)
        fixed = pa.array(
            [arr[int(i)].as_py().lower() for i in idx], type=lowered.type
        )
        lowered = pc.replace_with_mask(lowered, pa.array(mask_np), fixed)
    return lowered


def _list_from_arrays_like(src: pa.ListArray, offsets, values) -> pa.ListArray:
    """Rebuild a list array, carrying over ``src``'s validity bitmap (plain
    from_arrays silently turns null rows into empty lists)."""
    if src.null_count:
        return type(src).from_arrays(offsets, values, mask=pc.is_null(src))
    return type(src).from_arrays(offsets, values)


def lower_token_lists(arr: pa.Array) -> pa.Array:
    """Lowercase every token in a list<string> column, preserving offsets."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    values = lower_string_array(arr.values)
    return _list_from_arrays_like(arr, arr.offsets, values)


def _rebuild_list_filtered(arr: pa.ListArray, keep: np.ndarray) -> pa.ListArray:
    """Drop flat values where ``keep`` is False, recomputing list offsets."""
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    sizes = np.diff(offsets)
    parent = np.repeat(np.arange(len(sizes)), sizes)
    kept_per_list = np.bincount(parent[keep], minlength=len(sizes))
    new_offsets = np.concatenate(([0], np.cumsum(kept_per_list))).astype(np.int32)
    new_values = arr.values.filter(pa.array(keep))
    return _list_from_arrays_like(
        arr, pa.array(new_offsets, type=pa.int32()), new_values
    )


def tokenize_string_array(arr: pa.Array, lowercase: bool = True) -> pa.Array:
    """string column -> list<string> token column.

    Semantics match Python ``text.split()``: split on any whitespace run,
    never emit empty tokens (Arrow's split kernel emits empties at the
    edges, which we strip by trimming first and filtering residual empties).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(arr)
    split = pc.utf8_split_whitespace(trimmed)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    flat = split.values
    empty_mask = pc.equal(flat, "")
    if pc.any(empty_mask).as_py():
        keep = np.asarray(
            pc.invert(empty_mask).to_numpy(zero_copy_only=False), dtype=bool
        )
        split = _rebuild_list_filtered(split, keep)
        flat = split.values
    if lowercase:
        split = _list_from_arrays_like(split, split.offsets, lower_string_array(flat))
    return split


def tokenize_text(text: str, lowercase: bool = True) -> list[str]:
    """Scalar reference implementation of tokenize_string_array."""
    toks = text.split()
    return [t.lower() for t in toks] if lowercase else toks


# --- HTML text extraction ---------------------------------------------------
# The reference consumes pre-tokenized text and has no HTML stage; the
# north-rule pages input carries (html, text). Extraction is defined here
# deterministically so "byte-identical extracted text per url" is testable:
# drop script/style subtrees, replace tags with a single space, unescape the
# five standard entities, collapse whitespace runs to single spaces, strip.

_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")
_ENTITIES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&nbsp;", b" "),
    (b"&amp;", b"&"),  # last, so &amp;lt; does not double-decode
]
_WS_RE = re.compile(rb"\s+")


def extract_text_from_html(html: bytes) -> str:
    """Deterministic HTML -> text extraction (bytes in, str out, UTF-8)."""
    h = _SCRIPT_STYLE_RE.sub(b" ", html)
    h = _COMMENT_RE.sub(b" ", h)
    h = _TAG_RE.sub(b" ", h)
    for ent, rep in _ENTITIES:
        h = h.replace(ent, rep)
    h = _WS_RE.sub(b" ", h).strip()
    return h.decode("utf-8", errors="replace")
