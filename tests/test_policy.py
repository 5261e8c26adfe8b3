"""Overlap-resolution policy goldens (reference policy.rs:137-189) and
equivalence of the tag-CLI formulation (phrasekit_tag.rs:179-207)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from phrasekit_ray.core import salience
from phrasekit_ray.core.policy import (
    Match,
    emission_sort,
    resolve_overlaps,
    truncate,
)


def scores_for(saliences, counts):
    return salience.salience_score(np.asarray(saliences), np.asarray(counts))


def mk(start, end, idx):
    return Match(start, end, idx)


def test_leftmost_longest_golden():
    # policy.rs:150-162
    ms = [mk(0, 2, 0), mk(0, 3, 1), mk(5, 7, 2)]
    out = resolve_overlaps(ms, "leftmost_longest")
    assert len(out) == 2
    assert out[0].length == 3
    assert out[1].start == 5


def test_leftmost_first_golden():
    # policy.rs:164-176
    ms = [mk(0, 2, 0), mk(1, 3, 1), mk(3, 5, 2)]
    out = resolve_overlaps(ms, "leftmost_first")
    assert len(out) == 2
    assert out[0].end == 2
    assert out[1].start == 3


def test_salience_max_golden():
    # policy.rs:178-189: (0,3) sal 2.0 count 200 beats (0,2) sal 1.0 count 100
    ms = [mk(0, 2, 0), mk(0, 3, 1), mk(5, 7, 2)]
    scores = scores_for([1.0, 2.0, 1.0], [100, 200, 100])
    out = resolve_overlaps(ms, "salience_max", scores)
    assert len(out) == 2
    assert out[0].length == 3


def test_salience_max_chained_overlap_resume():
    # chain 0-2,1-3,2-4: best is middle; resume at first start >= best.end
    ms = [mk(0, 2, 0), mk(1, 3, 1), mk(2, 4, 2), mk(3, 5, 3)]
    scores = scores_for([1.0, 9.0, 1.0, 1.0], [10, 10, 10, 10])
    out = resolve_overlaps(ms, "salience_max", scores)
    assert out[0] == ms[1]
    assert out[1] == ms[3]


def test_all_policy_passthrough():
    ms = [mk(0, 3, 1), mk(0, 2, 0), mk(1, 4, 2)]
    out = resolve_overlaps(ms, "all")
    assert len(out) == 3
    assert [m.start for m in out] == [0, 0, 1]


def test_empty_matches():
    assert resolve_overlaps([], "leftmost_longest") == []


def test_truncate_after_resolution():
    ms = [mk(i * 2, i * 2 + 1, i) for i in range(10)]
    out = truncate(resolve_overlaps(ms, "leftmost_first"), 3)
    assert len(out) == 3
    assert out[0].start == 0


def test_emission_sort_order():
    ms = [mk(2, 5, 0), mk(0, 2, 1), mk(1, 2, 2)]
    assert [m.idx for m in emission_sort(ms)] == [1, 2, 0]


# --- equivalence of the tag-CLI formulation (SURVEY.md M6/M7) --------------

def tag_formulation(ms, policy):
    """reference phrasekit_tag.rs:179-207 verbatim re-expression."""
    ms = list(ms)
    if policy == "leftmost_longest":
        ms.sort(key=lambda m: (m.start, -m.end))
        resolved, covered = [], 0
        for m in ms:
            if m.start >= covered:
                resolved.append(m)
                covered = m.end
        return resolved
    if policy == "leftmost_first":
        ms.sort(key=lambda m: m.start)
        resolved, covered = [], 0
        for m in ms:
            if m.start >= covered:
                resolved.append(m)
                covered = m.end
        return resolved
    return ms


@st.composite
def match_lists(draw):
    n = draw(st.integers(0, 12))
    out = []
    for i in range(n):
        start = draw(st.integers(0, 15))
        length = draw(st.integers(1, 5))
        out.append(Match(start, start + length, i))
    # no duplicate (start,end) pairs: build rejects duplicate patterns, and a
    # single scan cannot emit the same span twice
    seen, uniq = set(), []
    for m in out:
        if (m.start, m.end) not in seen:
            seen.add((m.start, m.end))
            uniq.append(m)
    return emission_sort(uniq)


@settings(max_examples=300, deadline=None)
@given(match_lists())
def test_leftmost_longest_formulations_agree(ms):
    a = resolve_overlaps(list(ms), "leftmost_longest")
    b = tag_formulation(list(ms), "leftmost_longest")
    assert [(m.start, m.end) for m in a] == [(m.start, m.end) for m in b]


@settings(max_examples=300, deadline=None)
@given(match_lists())
def test_leftmost_first_formulations_agree(ms):
    a = resolve_overlaps(list(ms), "leftmost_first")
    b = tag_formulation(list(ms), "leftmost_first")
    assert [(m.start, m.end) for m in a] == [(m.start, m.end) for m in b]


# --- batch formulation equivalence (tagger hot path) -----------------------

import numpy as np

from phrasekit_ray.core.policy import resolve_overlaps_batch, truncate


@st.composite
def multi_doc_matches(draw):
    n_docs = draw(st.integers(1, 4))
    docs, starts, ends, idxs = [], [], [], []
    seen = set()
    for d in range(n_docs):
        for i in range(draw(st.integers(0, 10))):
            s = draw(st.integers(0, 15))
            e = s + draw(st.integers(1, 5))
            if (d, s, e) in seen:
                continue
            seen.add((d, s, e))
            docs.append(d)
            starts.append(s)
            ends.append(e)
            idxs.append(len(idxs))
    return (
        np.asarray(docs, dtype=np.int64),
        np.asarray(starts, dtype=np.int64),
        np.asarray(ends, dtype=np.int64),
        np.asarray(idxs, dtype=np.int64),
    )


@settings(max_examples=300, deadline=None)
@given(
    multi_doc_matches(),
    st.sampled_from(["leftmost_longest", "leftmost_first", "salience_max", "all"]),
    st.integers(1, 6),
)
def test_batch_resolution_matches_list_formulation(data, policy, max_spans):
    docs, starts, ends, idxs = data
    rng = np.random.default_rng(0)
    scores = rng.random(max(len(idxs), 1)).astype(np.float32)
    kept = resolve_overlaps_batch(
        docs, starts, ends, idxs, policy, scores, max_spans
    )
    got = [
        (int(docs[k]), int(starts[k]), int(ends[k]), int(idxs[k])) for k in kept
    ]
    want = []
    for d in sorted(set(docs.tolist())):
        sel = [i for i in range(len(docs)) if docs[i] == d]
        ms = emission_sort(
            [Match(int(starts[i]), int(ends[i]), int(idxs[i])) for i in sel]
        )
        resolved = truncate(resolve_overlaps(ms, policy, scores), max_spans)
        want.extend((d, m.start, m.end, m.idx) for m in resolved)
    assert got == want
