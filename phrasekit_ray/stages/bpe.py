"""Distributed BPE (byte-pair-encoding) vocabulary training + encoding.

Training-data extension: the tokenizer-training step of an LLM data
pipeline (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public algorithm; also the shape GPT-2's
public encoder uses for application).

Scale shape — the industry-standard split of labor:
- the CORPUS-sized work is ONE distributed word-count aggregate
  (two-phase hash aggregate over whitespace words, in-block combine
  before the shuffle) capped at ``max_words`` by (count desc, word asc),
  so the driver state is bounded regardless of corpus size;
- the merge loop runs on the driver over that bounded word→count table
  (pair counts are WEIGHTED by word counts, so this is exact for every
  word in the table, not a sample), with an inverted pair→words index
  so each merge touches only affected words;
- ENCODING is a stateless ``map_batches``: the merge ranks broadcast
  once (``ray.put``), words dictionary-encode per batch so the greedy
  merge loop runs once per UNIQUE word (with an actor-level cache),
  never per token.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.core import normalize

END = "</w>"


def word_counts(
    docs,
    text_col: str = "text",
    min_word_count: int = 1,
    max_words: int = 1_000_000,
    num_partitions: int | None = None,
) -> dict[str, int]:
    """Distributed word-frequency table, capped at ``max_words`` by
    (count desc, word asc) — the bounded input the merge loop needs."""
    from phrasekit_ray.stages.agg import grouped_count

    def explode(b: pa.Table) -> pa.Table:
        toks = normalize.tokenize_string_array(
            b[text_col].combine_chunks(), lowercase=False
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        return pa.table({"w": flat})

    counts = grouped_count(
        docs.map_batches(explode, batch_format="pyarrow"),
        "w",
        count_col="c",
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_word_count)),
        batch_format="pyarrow",
    )
    top = counts.sort(["c", "w"], descending=[True, False]).limit(max_words)
    out: dict[str, int] = {}
    for b in top.iter_batches(batch_format="pyarrow"):
        out.update(zip(b["w"].to_pylist(), b["c"].to_pylist()))
    return out


def merges_from_word_counts(
    wcounts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Sennrich merge loop over a word→count table. Deterministic: best
    pair by (count desc, pair lexicographic asc). Incremental — each
    merge re-counts only the words containing the merged pair."""
    words = [tuple(w) + (END,) for w in wcounts]
    freqs = list(wcounts.values())
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words.setdefault((a, b), set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            f = freqs[wi]
            # remove old pair contributions for this word
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[(a, b)]
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = tuple(out)
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += f
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def train_bpe(
    docs,
    num_merges: int = 200,
    text_col: str = "text",
    min_word_count: int = 1,
    max_words: int = 1_000_000,
    num_partitions: int | None = None,
) -> list[tuple[str, str]]:
    """Distributed word count → driver merge loop → ordered merge list."""
    wc = word_counts(docs, text_col, min_word_count, max_words, num_partitions)
    return merges_from_word_counts(wc, num_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Greedy lowest-rank merging of one word (the public GPT-2 bpe()
    shape): repeatedly merge the in-word pair with the smallest rank."""
    syms = list(word) + [END]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b), 1 << 60), i)
                 for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        rank, i = min(pairs)
        if rank >= 1 << 60:
            break
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return tuple(syms)


def bpe_token_counts(
    docs,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dataset(doc_id, text) → Dataset(doc_id, n_words, n_bpe_tokens):
    per-document subword counts under the trained merges. Per-UNIQUE-word
    encoding (dictionary_encode) with a worker-level word cache."""
    import ray

    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})
    cache: dict[str, int] = {}

    def score(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        ranks = _get_broadcast(ranks_ref)
        toks = normalize.tokenize_string_array(
            b[text_col].combine_chunks(), lowercase=False
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        enc = pc.dictionary_encode(flat)
        uniq = enc.dictionary.to_pylist() if len(flat) else []
        n_uniq = np.empty(len(uniq), np.int64)
        for i, w in enumerate(uniq):
            hit = cache.get(w)
            if hit is None:
                hit = cache[w] = len(_encode_word(w, ranks))
            n_uniq[i] = hit
        if len(flat):
            per_tok = n_uniq[enc.indices.to_numpy(zero_copy_only=False)]
        else:
            per_tok = np.zeros(0, np.int64)
        csum = np.concatenate(([0], np.cumsum(per_tok)))
        return pa.table(
            {
                id_col: b[id_col],
                "n_words": pa.array(np.diff(off), pa.int64()),
                "n_bpe_tokens": pa.array(csum[off[1:]] - csum[off[:-1]], pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
