"""BPE trainer/encoder (stages/bpe) — differential vs an independent
naive reference implementation, partitioning-invariance, encoding."""

from collections import Counter

import pyarrow as pa


def naive_bpe(word_freqs: dict[str, int], num_merges: int):
    """Independent reference: recompute ALL pair counts from scratch
    every merge (Sennrich pseudocode, no incremental index)."""
    words = {tuple(w) + ("</w>",): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_words = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wide wider widest",
    "low lower lowest",
]


def _docs_ds(texts, parts=1):
    import ray

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    return ds.repartition(parts) if parts > 1 else ds


def test_merges_match_naive_reference(ray_session):
    from phrasekit_ray.stages.bpe import train_bpe, word_counts

    wc = word_counts(_docs_ds(CORPUS))
    want_wc = Counter(t for x in CORPUS for t in x.split())
    assert wc == dict(want_wc)
    got = train_bpe(_docs_ds(CORPUS), num_merges=12)
    want = naive_bpe(dict(want_wc), 12)
    assert got == want


def test_merges_invariant_to_partitioning(ray_session):
    from phrasekit_ray.stages.bpe import train_bpe

    assert train_bpe(_docs_ds(CORPUS, parts=1), 8) == train_bpe(
        _docs_ds(CORPUS, parts=4), 8
    )


def test_encode_counts(ray_session):
    from phrasekit_ray.stages.bpe import (
        _encode_word,
        bpe_token_counts,
        train_bpe,
    )

    merges = train_bpe(_docs_ds(CORPUS), num_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    out = (
        bpe_token_counts(_docs_ds(CORPUS), merges)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, text in enumerate(CORPUS):
        words = text.split()
        assert out.loc[i, "n_words"] == len(words)
        want = sum(len(_encode_word(w, ranks)) for w in words)
        assert out.loc[i, "n_bpe_tokens"] == want
    # a fully-merged frequent word collapses to one token
    assert len(_encode_word("low", ranks)) == 1


def test_encode_word_greedy_rank_order():
    from phrasekit_ray.stages.bpe import _encode_word

    # rank order controls the merge sequence; unranked pairs never merge
    ranks = {("a", "b"): 0, ("c", "</w>"): 1}
    assert _encode_word("abc", ranks) == ("ab", "c</w>")
    ranks[("ab", "c</w>")] = 2
    assert _encode_word("abc", ranks) == ("abc</w>",)
    # lowest rank wins even when it appears later in the word
    ranks2 = {("b", "c"): 0, ("a", "b"): 1}
    assert _encode_word("abc", ranks2) == ("a", "bc", "</w>")
