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
    s_arr = starts[order]
    e_arr = ends[order]
    doc_change = np.empty(n, dtype=bool)
    doc_change[0] = True
    np.not_equal(d[1:], d[:-1], out=doc_change[1:])
    doc_ord = np.cumsum(doc_change) - 1  # compact 0..n_docs-1

    if policy == "all":
        # raw pass-through in (start, end) order; truncation still per doc
        kept_idx = np.arange(n, dtype=np.int64)
    elif policy in ("leftmost_longest", "leftmost_first"):
        # equal-(doc,start) groups: leftmost_longest's candidate is the
        # LAST of a run (max end — length ties impossible, duplicate
        # patterns are rejected at build); leftmost_first's is the FIRST.
        # Then a rounds-based vectorized greedy: every round accepts each
        # doc's first alive candidate and kills the candidates its span
        # covers — one O(m) numpy pass per round, rounds = max accepted
        # spans in any one doc (no per-match Python loop).
        group_change = doc_change.copy()
        group_change[1:] |= s_arr[1:] != s_arr[:-1]
        if policy == "leftmost_longest":
            cand = np.empty(n, dtype=bool)
            cand[:-1] = group_change[1:]
            cand[-1] = True
        else:
            cand = group_change
        cidx = np.flatnonzero(cand)
        cd = doc_ord[cidx]
        cs = s_arr[cidx]
        ce = e_arr[cidx]
        m = len(cidx)
        alive = np.ones(m, dtype=bool)
        accepted = np.zeros(m, dtype=bool)
        n_docs = int(doc_ord[-1]) + 1
        thr = np.zeros(n_docs, dtype=e_arr.dtype)
        while True:
            live = np.flatnonzero(alive)
            if not len(live):
                break
            ld = cd[live]
            head_mask = np.empty(len(live), dtype=bool)
            head_mask[0] = True
            np.not_equal(ld[1:], ld[:-1], out=head_mask[1:])
            heads = live[head_mask]
            accepted[heads] = True
            thr[:] = 0
            thr[cd[heads]] = ce[heads]
            # kill covered candidates (incl. each head itself: cs < ce)
            alive &= ~(cs < thr[cd])
        kept_idx = cidx[accepted]
    elif policy == "salience_max":
        if salience_scores is None:
            raise ValueError("salience_max requires salience_scores")
        # chain semantics are inherently sequential; salience_max is the
        # cold policy (not the tagging default), so the per-match loop
        # stays
        s = s_arr.tolist()
        e = e_arr.tolist()
        sc = salience_scores[pidx[order]].tolist()
        keep: list[int] = []
        i = 0
        while i < n:
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
            keep.append(best)
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
        kept_idx = np.asarray(keep, dtype=np.int64)
    else:
        raise ValueError(f"Unknown policy: {policy!r}")

    # per-doc truncation AFTER resolution (M10), vectorized: position of
    # each kept row within its doc run < max_spans
    if len(kept_idx):
        kd = doc_ord[kept_idx]
        seg_change = np.empty(len(kd), dtype=bool)
        seg_change[0] = True
        np.not_equal(kd[1:], kd[:-1], out=seg_change[1:])
        seg_starts = np.flatnonzero(seg_change)
        seg_sizes = np.diff(np.concatenate((seg_starts, [len(kd)])))
        pos_in_doc = np.arange(len(kd)) - np.repeat(seg_starts, seg_sizes)
        kept_idx = kept_idx[pos_in_doc < max_spans]

    return order[kept_idx]
