"""Tagger tests, ported from reference spec/tagger_spec.rb and
docs/TAGGING.md goldens."""

import pyarrow as pa
import pytest

from phrasekit_ray.config import BuildConfig, TagConfig
from phrasekit_ray.core.artifact import build_artifact
from phrasekit_ray.stages.build import put_artifact
from phrasekit_ray.stages.tag import TaggerActor, tag_corpus


PHRASES = [
    {"tokens": ["rat", "cdk10", "oligo"], "phrase_id": 1000, "salience": 5.0, "count": 10},
    {"tokens": ["lysis", "buffer"], "phrase_id": 1001, "salience": 4.0, "count": 20},
    {"tokens": ["rat", "cdk10"], "phrase_id": 1002, "salience": 3.0, "count": 30},
]


@pytest.fixture(scope="module")
def artifact():
    art, _ = build_artifact(PHRASES, BuildConfig())
    return art


def corpus_ds(docs):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [d for d, _ in docs],
                "tokens": pa.array([t for _, t in docs], pa.list_(pa.string())),
            }
        )
    )


def run_tag(ray_session, artifact, docs, config=None):
    ref = put_artifact(artifact)
    out = tag_corpus(corpus_ds(docs), ref, config or TagConfig(), concurrency=1, batch_size=64)
    rows = {r["doc_id"]: r for r in out.iter_rows()}
    return rows


DOC1 = ["the", "rat", "cdk10", "oligo", "was", "used", "with", "lysis", "buffer"]


def test_tagging_golden_docs_tagging_md(ray_session, artifact):
    # docs/TAGGING.md:173-177 — spans [{1,4,1000},{7,9,1001}]
    rows = run_tag(ray_session, artifact, [("doc_1", DOC1)])
    spans = rows["doc_1"]["spans"]
    assert [(s["start"], s["end"], s["phrase_id"]) for s in spans] == [
        (1, 4, 1000),
        (7, 9, 1001),
    ]
    assert all(s["label"] == "PHRASE" for s in spans)
    assert rows["doc_1"]["tokens"] == DOC1


def test_span_text_roundtrip(ray_session, artifact):
    # spec/tagger_spec.rb:114-129 — tokens[start:end] reconstructs phrase
    rows = run_tag(ray_session, artifact, [("d", DOC1)])
    for s in rows["d"]["spans"]:
        text = " ".join(DOC1[s["start"] : s["end"]])
        assert text in ("rat cdk10 oligo", "lysis buffer")


def test_no_match_doc_empty_spans(ray_session, artifact):
    # spec/tagger_spec.rb:131-142
    rows = run_tag(ray_session, artifact, [("d", ["completely", "unrelated", "words"])])
    assert rows["d"]["spans"] == []


def test_max_spans_truncation(ray_session, artifact):
    # spec/tagger_spec.rb:144-161
    doc = ["lysis", "buffer", "x"] * 10
    rows = run_tag(
        ray_session, artifact, [("d", doc)], TagConfig(max_spans=3)
    )
    assert len(rows["d"]["spans"]) == 3


def test_custom_label(ray_session, artifact):
    # spec/tagger_spec.rb:163-177
    rows = run_tag(ray_session, artifact, [("d", DOC1)], TagConfig(label="REAGENT"))
    assert all(s["label"] == "REAGENT" for s in rows["d"]["spans"])


def test_policy_leftmost_longest_vs_first(ray_session, artifact):
    # spec/tagger_spec.rb:180-218: "rat cdk10 oligo" contains "rat cdk10"
    doc = ["rat", "cdk10", "oligo"]
    ll = run_tag(ray_session, artifact, [("d", doc)], TagConfig(policy="leftmost_longest"))
    assert [(s["start"], s["end"], s["phrase_id"]) for s in ll["d"]["spans"]] == [
        (0, 3, 1000)
    ]
    lf = run_tag(ray_session, artifact, [("d", doc)], TagConfig(policy="leftmost_first"))
    assert [(s["start"], s["end"], s["phrase_id"]) for s in lf["d"]["spans"]] == [
        (0, 2, 1002)
    ]


def test_policy_all_passes_overlaps(ray_session, artifact):
    doc = ["rat", "cdk10", "oligo"]
    rows = run_tag(ray_session, artifact, [("d", doc)], TagConfig(policy="all"))
    spans = {(s["start"], s["end"]) for s in rows["d"]["spans"]}
    assert spans == {(0, 2), (0, 3)}


def test_span_boundaries_sane(ray_session, artifact):
    # spec/tagger_spec.rb:313-338
    docs = [(f"d{i}", DOC1[i:] + DOC1[:i]) for i in range(5)]
    rows = run_tag(ray_session, artifact, docs)
    for d, toks in docs:
        for s in rows[d]["spans"]:
            assert 0 <= s["start"] < s["end"] <= len(toks)


def test_case_folding_in_tagger(ray_session, artifact):
    rows = run_tag(ray_session, artifact, [("d", ["RAT", "Cdk10", "OLIGO"])])
    assert [(s["start"], s["end"]) for s in rows["d"]["spans"]] == [(0, 3)]


def test_empty_tokens_doc(ray_session, artifact):
    rows = run_tag(ray_session, artifact, [("d", []), ("e", ["lysis", "buffer"])])
    assert rows["d"]["spans"] == []
    assert len(rows["e"]["spans"]) == 1


def test_actor_smoke_direct(ray_session, artifact):
    """Actor __init__ exceptions surface late in pipelines — smoke the class
    directly (ray guide pitfall)."""
    import ray

    ref = ray.put(artifact)
    actor = TaggerActor(artifact_ref=ref, config=TagConfig())
    batch = pa.table(
        {
            "doc_id": ["a"],
            "tokens": pa.array([DOC1], pa.list_(pa.string())),
        }
    )
    out = actor(batch)
    assert out["spans"].to_pylist()[0][0]["phrase_id"] == 1000


def test_tag_stats(ray_session, artifact):
    import ray

    from phrasekit_ray.stages.tag import tag_corpus, tag_stats
    from phrasekit_ray.config import TagConfig

    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "tokens": pa.array(
                [["the", "rat", "cdk10", "oligo"], ["nothing", "here"]]
            ),
        }
    )
    tagged = tag_corpus(
        ray.data.from_arrow(tbl), put_artifact(artifact), TagConfig(), concurrency=(1, 2)
    )
    s = tag_stats(tagged)
    assert s["documents"] == 2
    assert s["documents_with_spans"] >= 1
    assert s["total_spans"] >= 1
    assert s["avg_spans_per_document"] == s["total_spans"] / 2


def test_cached_tagger_fifo_keeps_alternating_artifacts(ray_session, artifact):
    """Two artifacts alternating in one worker must each deserialize ONCE
    (8-slot FIFO, mirroring score._BG_CACHE) — the old single-slot clear()
    re-deserialized on every batch when pipelines interleave."""
    from phrasekit_ray.stages.tag import _TAGGER_CACHE, _cached_tagger

    art2, _ = build_artifact(
        [{"tokens": ["other", "phrase"], "phrase_id": 7, "salience": 1.0,
          "count": 1}],
        BuildConfig(),
    )
    ref_a, ref_b = put_artifact(artifact), put_artifact(art2)
    _TAGGER_CACHE.clear()
    cfg = TagConfig()
    a1 = _cached_tagger(ref_a, cfg)
    b1 = _cached_tagger(ref_b, cfg)
    # alternating lookups hit the same instances — no re-deserialization
    assert _cached_tagger(ref_a, cfg) is a1
    assert _cached_tagger(ref_b, cfg) is b1
    assert _cached_tagger(ref_a, cfg) is a1
    # FIFO evicts oldest beyond 8 slots, never grows unbounded
    from phrasekit_ray.stages.tag import _TAGGER_CACHE_SLOTS

    for i in range(_TAGGER_CACHE_SLOTS + 2):
        art_i, _ = build_artifact(
            [{"tokens": ["t%d" % i], "phrase_id": 100 + i, "salience": 1.0,
              "count": 1}],
            BuildConfig(),
        )
        _cached_tagger(put_artifact(art_i), cfg)
    assert len(_TAGGER_CACHE) <= _TAGGER_CACHE_SLOTS
