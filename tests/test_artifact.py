"""Matcher artifact goldens, ported from reference spec/phrasekit_spec.rb
and matcher.rs tests (FIXTURES.md §6)."""

import numpy as np
import pytest

from phrasekit_ray.config import BuildConfig
from phrasekit_ray.core.artifact import (
    MatcherArtifact,
    build_artifact,
    build_vocabulary,
    fixture_artifact,
)


@pytest.fixture(scope="module")
def art():
    return fixture_artifact()


# --- matching goldens (spec/phrasekit_spec.rb:62-142) ----------------------

def test_exact_match(art):
    # [100,101] -> one match {start:0,end:2,phrase_id:100,n:2}
    ms = art.match_ids([100, 101])
    assert len(ms) == 1
    m = ms[0]
    assert m["start"] == 0 and m["end"] == 2
    assert m["phrase_id"] == 100
    assert m["n"] == 2
    assert m["salience"] == pytest.approx(2.5)
    assert m["count"] == 150


def test_longer_pattern_wins_leftmost_longest(art):
    # [100,101,102] leftmost_longest -> phrase 300, n=3
    ms = art.match_ids([100, 101, 102], policy="leftmost_longest")
    assert len(ms) == 1
    assert ms[0]["phrase_id"] == 300
    assert ms[0]["n"] == 3


def test_two_nonoverlapping_matches(art):
    # [100,101,50,200,101] -> 2 matches (spec :78-84)
    ms = art.match_ids([100, 101, 50, 200, 101])
    assert len(ms) == 2
    assert ms[0]["phrase_id"] == 100
    assert ms[1]["phrase_id"] == 200
    assert ms[1]["start"] == 3 and ms[1]["end"] == 5


def test_unknown_ids_no_match(art):
    assert art.match_ids([999999, 888888]) == []


def test_empty_and_single(art):
    assert art.match_ids([]) == []
    assert art.match_ids([100]) == []


def test_max_matches_truncation(art):
    ids = [100, 101, 50] * 10
    ms = art.match_ids(ids, max_matches=3)
    assert len(ms) == 3


def test_leftmost_first_prefers_shorter_at_same_start(art):
    ms = art.match_ids([100, 101, 102], policy="leftmost_first")
    assert len(ms) == 1
    assert ms[0]["phrase_id"] == 100  # shorter pattern emitted first


def test_salience_max_policy(art):
    # "machine learning algorithms" sal 3.0*ln(201) beats "machine learning"
    ms = art.match_ids([100, 101, 102], policy="salience_max")
    assert len(ms) == 1
    assert ms[0]["phrase_id"] == 300


def test_encode_tokens_case_folding(art):
    # spec :297-326, :348-353 — "DEEP","Learning" -> [200,101] -> phrase 200
    ids = art.encode_tokens(["DEEP", "Learning"])
    assert ids.tolist() == [200, 101]
    ms = art.match_tokens(["DEEP", "Learning"])
    assert len(ms) == 1
    assert ms[0]["phrase_id"] == 200


def test_encode_unknown_token_is_unk(art):
    assert art.encode_tokens(["machine", "nope"]).tolist() == [100, 0]
    assert art.match_tokens(["machine", "nope"]) == []


# --- vocabulary construction (phrasekit_build.rs:306-326) ------------------

def test_build_vocabulary_sorted_ids_from_1():
    v = build_vocabulary({"zebra", "apple", "mango"})
    assert v == {"apple": 1, "mango": 2, "zebra": 3}


# --- build_artifact validation (phrasekit_build.rs:212-295) ----------------

def phrases_rows():
    return [
        {"tokens": ["rat", "cdk10"], "phrase_id": 1000, "salience": 5.0, "count": 30},
        {"tokens": ["lysis", "buffer"], "phrase_id": 1001, "salience": 3.0, "count": 8},
        {"tokens": ["western", "blot"], "phrase_id": 1002, "salience": 1.5, "count": 20},
    ]


def test_build_counts_and_filters():
    art, stats = build_artifact(
        phrases_rows(), BuildConfig(min_count=10, salience_threshold=2.0)
    )
    assert stats.total_input == 3
    assert stats.filtered_low_count == 1   # lysis buffer count 8
    assert stats.filtered_low_salience == 1  # western blot sal 1.5
    assert stats.built == 1
    assert art.num_patterns == 1
    assert art.phrase_ids.tolist() == [1000]


def test_build_duplicate_phrase_id_first_wins():
    rows = phrases_rows() + [
        {"tokens": ["master", "mix"], "phrase_id": 1000, "salience": 9.0, "count": 99}
    ]
    with pytest.warns(UserWarning):
        art, stats = build_artifact(rows)
    assert stats.duplicate_phrase_ids == 1
    assert stats.built == 3
    assert 1000 in art.phrase_ids
    # first occurrence (rat cdk10) won
    i = art.phrase_ids.tolist().index(1000)
    assert art.pattern_tokens[i] == ["rat", "cdk10"]


def test_build_duplicate_pattern_raises():
    rows = phrases_rows() + [
        {"tokens": ["RAT", "CDK10"], "phrase_id": 2000, "salience": 1.0, "count": 50}
    ]
    with pytest.raises(ValueError, match="Duplicate pattern"):
        build_artifact(rows)


def test_build_empty_tokens_skipped():
    rows = [{"tokens": [], "phrase_id": 1, "salience": 1.0, "count": 5}]
    art, stats = build_artifact(rows)
    assert stats.invalid_tokens == 1
    assert art.num_patterns == 0


def test_build_accepts_domain_count_alias():
    rows = [{"tokens": ["a", "b"], "phrase_id": 7, "salience": 2.0, "domain_count": 42}]
    art, _ = build_artifact(rows)
    assert art.counts.tolist() == [42]


def test_build_lowercases_patterns_and_vocab():
    rows = [{"tokens": ["Rat", "CDK10"], "phrase_id": 1, "salience": 2.0, "count": 5}]
    art, _ = build_artifact(rows)
    assert art.pattern_tokens == [["rat", "cdk10"]]
    assert set(art.vocab) == {"rat", "cdk10"}
    assert len(art.match_tokens(["RAT", "cdk10"])) == 1


def test_separator_zero_rejected():
    with pytest.raises(ValueError):
        BuildConfig(separator_id=0)


def test_validate_compatible():
    art = fixture_artifact()
    art.validate_compatible("test", art.separator_id)
    with pytest.raises(ValueError):
        art.validate_compatible("other-tokenizer", art.separator_id)
    with pytest.raises(ValueError):
        art.validate_compatible("test", 1)


def test_save_load_roundtrip(tmp_path, art):
    d = str(tmp_path / "artifact")
    art.save(d)
    loaded = MatcherArtifact.load(d)
    assert loaded.vocab == art.vocab
    assert loaded.pattern_tokens == art.pattern_tokens
    assert np.array_equal(loaded.phrase_ids, art.phrase_ids)
    assert np.array_equal(loaded.saliences, art.saliences)
    got = loaded.match_ids([100, 101, 102])
    assert got == art.match_ids([100, 101, 102])


# --- batched flat matching ------------------------------------------------

def test_find_matches_flat_respects_doc_boundaries(art):
    # two docs flattened: [100,101] | [101,102] — no cross-boundary match
    ids = np.array([100, 101, 101, 102], dtype=np.uint32)
    doc = np.array([0, 0, 1, 1], dtype=np.int64)
    docs, starts, ends, pidx = art.find_matches_flat(ids, doc)
    assert len(docs) == 1
    assert docs[0] == 0 and starts[0] == 0 and ends[0] == 2


def test_find_matches_flat_overlapping_all(art):
    ids = np.array([100, 101, 102], dtype=np.uint32)
    doc = np.zeros(3, dtype=np.int64)
    docs, starts, ends, pidx = art.find_matches_flat(ids, doc)
    spans = sorted(zip(starts.tolist(), ends.tolist()))
    assert spans == [(0, 2), (0, 3)]


# --- hash-collision resolution (salted keys + exact overflow) --------------

def _colliding_artifact():
    """Two 2-token patterns whose token-id rows collide under the UNSALTED
    polynomial hash: (2533359615, 0) and (0, 2499804749). Under the old
    additive-only salt these collided for EVERY salt (the salt term
    salt*C^n cancels between same-length patterns); the XOR-mixed salt
    separates them at salt=1."""
    from phrasekit_ray.core.artifact import DEFAULT_SEPARATOR_ID

    vocab = {"a": 2533359615, "b": 0, "c": 2499804749}
    manifest = {
        "version": "1",
        "tokenizer": "test",
        "num_patterns": 2,
        "built_at": "1970-01-01T00:00:00Z",
        "separator_id": DEFAULT_SEPARATOR_ID,
    }
    return MatcherArtifact(
        vocab=vocab,
        pattern_tokens=[["a", "b"], ["b", "c"]],
        phrase_ids=np.array([1, 2], dtype=np.uint32),
        saliences=np.array([1.0, 1.0], dtype=np.float32),
        counts=np.array([5, 5], dtype=np.uint32),
        manifest=manifest,
    )


def test_salted_hash_resolves_real_collision():
    art = _colliding_artifact()
    # construction terminates (the old additive salt hung forever here)
    # and BOTH patterns match their own token sequence
    m1 = art.match_ids([2533359615, 0], policy="all")
    m2 = art.match_ids([0, 2499804749], policy="all")
    assert [m["phrase_id"] for m in m1] == [1]
    assert [m["phrase_id"] for m in m2] == [2]
    tbl = art._tables[2]
    assert len(tbl.overflow_idx) == 0  # salt bump sufficed, no overflow


def test_collision_overflow_fallback(monkeypatch):
    import phrasekit_ray.core.artifact as artifact_mod

    # forbid salt bumps so the collision must route through the exact-scan
    # overflow table; matching stays complete
    monkeypatch.setattr(artifact_mod, "_MAX_SALT_ATTEMPTS", 1)
    art = _colliding_artifact()
    tbl = art._tables[2]
    assert len(tbl.overflow_idx) == 1
    m1 = art.match_ids([2533359615, 0], policy="all")
    m2 = art.match_ids([0, 2499804749], policy="all")
    assert [m["phrase_id"] for m in m1] == [1]
    assert [m["phrase_id"] for m in m2] == [2]
    # overflow matches respect document boundaries too
    over_ids = art.encode_tokens(
        art.pattern_tokens[int(tbl.overflow_idx[0])]
    )
    ids = np.concatenate([over_ids[:1], over_ids[1:]]).astype(np.uint32)
    doc = np.array([0, 1], dtype=np.int64)
    docs, starts, ends, pidx = art.find_matches_flat(ids, doc)
    assert len(docs) == 0
