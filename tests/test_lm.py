"""Unigram-LM scoring + conjunctive retrieval (stages/lm)."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


def test_unigram_nll_matches_driver_reference(ray_session):
    from phrasekit_ray.stages.lm import unigram_nll_scores

    texts = [
        "a a a b b c",
        "a b rare1",      # rare1 count 1 < min_count → OOV
        "",               # empty doc scores 0
        "c c b a a rare1 rare2",
    ]
    got = unigram_nll_scores(_docs_ds(texts), min_count=2).to_pandas()
    got = got.set_index("doc_id").sort_index()

    # driver reference
    from collections import Counter

    cnt = Counter(t for x in texts for t in x.split(" "))
    vocab = {t: c for t, c in cnt.items() if c >= 2}
    n, v = sum(vocab.values()), len(vocab)
    lp = {t: round(math.log((c + 1) / (n + v)) * 1e6) for t, c in vocab.items()}
    oov = round(math.log(1 / (n + v)) * 1e6)
    for i, x in enumerate(texts):
        toks = x.split(" ")
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "nll_micro"] == -sum(lp.get(t, oov) for t in toks)


def test_unigram_vocab_cap_is_deterministic(ray_session):
    from phrasekit_ray.stages.lm import unigram_logprob_table

    # ties on count broken by token asc: cap at 2 keeps {'a','b'} not 'c'
    table, oov, n, v = unigram_logprob_table(
        _docs_ds(["a b c", "a b c", "a b c"]), min_count=2, max_vocab=2
    )
    assert sorted(table) == ["a", "b"]
    assert (n, v) == (6, 2)
    assert oov == round(math.log(1 / 8) * 1e6)


def test_conjunctive_search_all_terms_required(ray_session):
    from phrasekit_ray.stages.lm import conjunctive_search, top_tokens

    ds = _docs_ds(["x y z", "x z", "y", "z x y x", ""])
    got = sorted(conjunctive_search(ds, ["x", "y"]).to_pandas().doc_id)
    assert got == [0, 3]
    assert top_tokens(ds, k=2) == ["x", "y"]  # x:4; y:3 == z:3 tie → tok asc


def test_bm25_matches_driver_reference(ray_session):
    from phrasekit_ray.stages.lm import bm25_topk

    texts = [
        "apple banana apple cherry",
        "banana banana banana",
        "cherry apple",
        "durian durian",
        "",
    ]
    q = ["apple", "banana", "zzz_absent"]
    got = bm25_topk(_docs_ds(texts), q, topk=10).to_pandas()

    n = len(texts)
    dls = [len(t.split(" ")) for t in texts]
    avgdl = np.float64(sum(dls)) / np.float64(n)
    ref = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        total = 0
        for term in q:
            tf = np.float64(toks.count(term))
            df = sum(1 for x in texts if term in x.split(" "))
            idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s = np.float64(idf) * (tf * np.float64(2.2)) / (
                tf + np.float64(1.2) * (np.float64(0.25) + np.float64(0.75) * np.float64(dls[i]) / avgdl)
            )
            total += int(np.round(s * 1e6))
        if total > 0:
            ref[i] = total
    assert dict(zip(got.doc_id, got.bm25_micro)) == ref
    # ranking is score desc
    assert list(got.bm25_micro) == sorted(got.bm25_micro, reverse=True)


def test_bigram_nll_matches_driver_reference(ray_session):
    from phrasekit_ray.stages.lm import bigram_nll_scores

    texts = [
        "a b a b c",
        "a b",
        "x",          # 1 token → 0 bigrams, score 0
        "",           # empty → 0
        "b c b c a b",
    ]
    got = bigram_nll_scores(_docs_ds(texts), min_count=2).to_pandas()
    got = got.set_index("doc_id").sort_index()

    from collections import Counter

    uni = Counter(t for x in texts for t in x.split(" "))
    uni = {t: c for t, c in uni.items() if c >= 2}
    v = len(uni)
    big = Counter(
        f"{ts[i]} {ts[i+1]}"
        for x in texts for ts in [x.split(" ")] for i in range(len(ts) - 1)
    )
    big = {p: c for p, c in big.items() if c >= 2}
    for i, x in enumerate(texts):
        ts = x.split(" ")
        nb = max(len(ts) - 1, 0)
        nll = -sum(
            round(
                math.log(
                    (big.get(f"{ts[j]} {ts[j+1]}", 0) + 1.0)
                    / (uni.get(ts[j], 0) + v)
                )
                * 1e6
            )
            for j in range(nb)
        )
        assert got.loc[i, "n_bigrams"] == nb, i
        assert got.loc[i, "nll_micro"] == nll, i


def test_bm25_empty_corpus(ray_session):
    import ray

    from phrasekit_ray.stages.lm import bm25_topk

    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert bm25_topk(empty, ["x", "y"]).count() == 0


def test_kn_continuation_beats_raw_frequency(ray_session):
    """The defining Kneser–Ney property: after an UNSEEN context, a
    token with many distinct predecessors (high continuation count)
    outscores a token with equal raw frequency but one predecessor —
    'francisco' appears often but only after 'san', so p_cont punishes
    it vs a versatile token."""
    import ray

    from phrasekit_ray.stages.lm import kn_bigram_nll_scores

    # 'versatile' follows 6 distinct tokens (6 bigram types x2 each);
    # 'francisco' follows only 'san' (1 type, 12 occurrences)
    train = []
    for w in ["a", "b", "c", "d", "e", "f"]:
        train += [f"{w} versatile"] * 2
    train += ["san francisco"] * 12
    # two probe docs: identical unseen context, different continuation
    docs = train + ["zzz versatile", "zzz francisco"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    out = {
        r["doc_id"]: r["kn_nll_micro"]
        for b in kn_bigram_nll_scores(
            ray.data.from_arrow(t), min_count=1
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    nll_versatile = out[len(docs) - 2]
    nll_francisco = out[len(docs) - 1]
    # lower NLL = more probable; versatile must win after unseen 'zzz'
    assert nll_versatile < nll_francisco
