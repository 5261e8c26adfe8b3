"""Overlap-resolution policies over automaton matches.

Reference has two formulations with identical observable behavior
(SURVEY.md M6-M9): the runtime matcher's (reference policy.rs:49-135) and
the tagger CLI's (reference phrasekit_tag.rs:179-207). This module
implements the runtime formulation (group/greedy) exactly, plus the tag
CLI's silent-fallthrough "all" policy as an explicit name.

Matches enter in *emission order* — the order daachorse's
find_overlapping_iter yields byte matches, i.e. ascending match end, ties
by ascending start (shorter pattern first at the same end). Policies begin
with a stable sort by start (policy.rs:54), so at equal start the
pre-existing emission order (shorter-first) is what greedy policies see —
this matters for leftmost_first tie-breaking.

A match is (start, end, idx) token spans, Python-slice style [start, end),
where idx indexes into the artifact's payload arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np


class Match(NamedTuple):
    start: int
    end: int
    idx: int  # pattern index into payload arrays

    @property
    def length(self) -> int:
        return self.end - self.start

    def overlaps(self, other: "Match") -> bool:
        # reference policy.rs:44-46
        return not (self.end <= other.start or other.end <= self.start)


def emission_sort(matches: list[Match]) -> list[Match]:
    """Canonical automaton emission order: (end asc, start asc)."""
    return sorted(matches, key=lambda m: (m.end, m.start))


def resolve_overlaps(
    matches: Sequence[Match],
    policy: str,
    salience_scores: np.ndarray | None = None,
) -> list[Match]:
    """Dispatch per reference policy.rs:49-61 (+ explicit "all").

    ``salience_scores`` is the per-pattern-index precomputed
    salience * ln(count+1) array (payload.rs:23-25), required for
    salience_max.
    """
    ms = list(matches)
    if not ms:
        return ms
    ms.sort(key=lambda m: m.start)  # stable, as in policy.rs:54
    if policy == "leftmost_longest":
        return _resolve_leftmost_longest(ms)
    if policy == "leftmost_first":
        return _resolve_leftmost_first(ms)
    if policy == "salience_max":
        if salience_scores is None:
            raise ValueError("salience_max requires salience_scores")
        return _resolve_salience_max(ms, salience_scores)
    if policy == "all":
        # reference phrasekit_tag.rs:179-207 implicit else: raw overlapping
        # matches pass through (in start order after the stable sort).
        return ms
    raise ValueError(f"Unknown policy: {policy!r}")


def _resolve_leftmost_longest(ms: list[Match]) -> list[Match]:
    """reference policy.rs:63-89: group equal-start runs, keep max length
    (Rust max_by_key returns the LAST maximal element on ties — irrelevant
    here because duplicate patterns are rejected at build), skip groups
    starting inside the covered region."""
    result: list[Match] = []
    current_end = 0
    i = 0
    n = len(ms)
    while i < n:
        if ms[i].start < current_end:
            i += 1
            continue
        j = i
        while j < n and ms[j].start == ms[i].start:
            j += 1
        longest = ms[i]
        for m in ms[i + 1 : j]:
            if m.length >= longest.length:
                longest = m
        current_end = longest.end
        result.append(longest)
        i = j
    return result


def _resolve_leftmost_first(ms: list[Match]) -> list[Match]:
    """reference policy.rs:91-103: greedy accept when start >= covered end."""
    result: list[Match] = []
    current_end = 0
    for m in ms:
        if m.start >= current_end:
            current_end = m.end
            result.append(m)
    return result


def _resolve_salience_max(ms: list[Match], scores: np.ndarray) -> list[Match]:
    """reference policy.rs:105-135: take the chain of transitively
    overlapping-with-ms[i] matches, keep the max salience_score (first of
    equals, per Rust max_by semantics on Ordering::Equal -> keeps earlier
    ... Rust max_by returns the LAST among equals), resume at the first
    match with start >= best.end."""
    result: list[Match] = []
    i = 0
    n = len(ms)
    while i < n:
        j = i + 1
        while j < n and ms[j].overlaps(ms[i]):
            j += 1
        best = ms[i]
        best_score = scores[ms[i].idx]
        for m in ms[i + 1 : j]:
            sc = scores[m.idx]
            if sc >= best_score:  # Rust max_by keeps the last maximal element
                best = m
                best_score = sc
        result.append(best)
        nxt = None
        for k in range(i, n):
            if ms[k].start >= best.end:
                nxt = k
                break
        i = nxt if nxt is not None else n
    return result


def truncate(ms: list[Match], max_matches: int) -> list[Match]:
    """Truncation happens AFTER resolution (reference matcher.rs:100-104,
    phrasekit_tag.rs:209-211; runtime default 32, tag default 100)."""
    return ms[:max_matches] if len(ms) > max_matches else ms


def resolve_overlaps_batch(
    docs: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    pidx: np.ndarray,
    policy: str,
    salience_scores: np.ndarray | None = None,
    max_spans: int = 100,
) -> np.ndarray:
    """Batch formulation of ``resolve_overlaps`` + ``truncate`` over raw
    hits from MANY documents at once (the tagger hot path — SURVEY.md M6-
    M10). Semantically identical to running the per-list functions per doc
    (property-tested in tests/test_policy.py); avoids per-match Python
    object construction.

    Inputs are parallel arrays in any order; returns indices into them of
    the kept matches, ordered (doc asc, per-policy output order), with
    per-doc ``max_spans`` truncation applied after resolution.
    """
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # processing order: doc, then stable-sort-by-start over emission order
    # (end asc) — equals each policy's entry order (policy.rs:54)
    order = np.lexsort((ends, starts, docs))
    d = docs[order]
    s = starts[order].tolist()
    e = ends[order].tolist()
    doc_change = np.empty(n, dtype=bool)
    doc_change[0] = True
    np.not_equal(d[1:], d[:-1], out=doc_change[1:])

    keep: list[int] = []
    if policy == "all":
        # raw pass-through in (start, end) order; truncation still per doc
        cnt = 0
        for i in range(n):
            if doc_change[i]:
                cnt = 0
            if cnt < max_spans:
                keep.append(i)
                cnt += 1
    elif policy in ("leftmost_longest", "leftmost_first"):
        # equal-(doc,start) groups: leftmost_longest accepts the LAST of a
        # run (max end — length ties impossible, duplicate patterns are
        # rejected at build); leftmost_first accepts the FIRST
        take_last = policy == "leftmost_longest"
        i = 0
        while i < n:
            if doc_change[i]:
                cur_end = 0
                cnt = 0
            j = i + 1
            while j < n and not doc_change[j] and s[j] == s[i]:
                j += 1
            if s[i] >= cur_end:
                c = (j - 1) if take_last else i
                cur_end = e[c]
                if cnt < max_spans:
                    keep.append(c)
                    cnt += 1
            i = j
    elif policy == "salience_max":
        if salience_scores is None:
            raise ValueError("salience_max requires salience_scores")
        sc = salience_scores[pidx[order]].tolist()
        i = 0
        while i < n:
            if doc_change[i]:
                cnt = 0
            # chain: run of matches overlapping ms[i] (start_j < end_i)
            j = i + 1
            while j < n and not doc_change[j] and s[j] < e[i]:
                j += 1
            best = i
            best_score = sc[i]
            for k in range(i + 1, j):
                if sc[k] >= best_score:  # Rust max_by keeps last maximal
                    best = k
                    best_score = sc[k]
            if cnt < max_spans:
                keep.append(best)
                cnt += 1
            # resume at first match (from i) with start >= best.end
            nxt = None
            k = i
            while k < n and not (k > i and doc_change[k]):
                if s[k] >= e[best]:
                    nxt = k
                    break
                k += 1
            if nxt is None:
                # skip to next doc
                k = i + 1
                while k < n and not doc_change[k]:
                    k += 1
                nxt = k
            i = nxt
    else:
        raise ValueError(f"Unknown policy: {policy!r}")

    return order[np.asarray(keep, dtype=np.int64)]
