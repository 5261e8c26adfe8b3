"""Mine stage: n-gram frequency counting as a two-phase shuffle aggregate.

Reference analog: phrasekit_mine.rs — a single-process global
HashMap<Vec<String>, u32> accumulated over the whole corpus (SURVEY.md T3,
A1). Ray-native shape: a stateless map_batches that extracts every n-gram
window (M1) and pre-aggregates counts WITHIN the block (the combiner —
this is the skew/hot-key treatment: Zipfian stopword n-grams collapse to
one row per block before the shuffle, so the global groupby moves at most
`num_blocks` rows per key), then a `groupby(ngram).sum(count)` all-to-all,
then the min_count filter (A2) pushed right after the aggregate.

The n-gram key is the space-joined lowercased token sequence — injective
because our tokenizer never emits tokens containing whitespace. (If you
feed externally pre-tokenized input whose tokens may contain spaces, the
join could collide; reject or re-split such input upstream.)

Everything inside the batch fn is Arrow kernels: window slices are
zero-copy `Array.slice` views and joining is `binary_join_element_wise`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.config import MineConfig
from phrasekit_ray.core import normalize
from phrasekit_ray.stages.agg import hash_aggregate

COUNT_TYPE = pa.uint64()


def _materialize_ngram_counts(flat: pa.Array, m: int, n: int, sel) -> pa.StructArray | None:
    """String-join the n-token windows selected by ``sel`` (None = all) and
    value-count them. Shared by the direct miner and the hash-prefiltered
    miner's exact pass — the 'output is IDENTICAL' oracle property rests on
    both paths using this one materialization (join separator, count dtype)."""
    if n == 1:
        joined = flat.slice(0, m)
    else:
        parts = [flat.slice(k, m) for k in range(n)]
        joined = pc.binary_join_element_wise(*parts, " ")
    if sel is not None and not sel.all():
        joined = joined.filter(pa.array(sel))
    if len(joined) == 0:
        return None
    return joined.value_counts()  # StructArray{values, counts}


def _ngram_count_table(ngram_chunks, count_chunks) -> pa.Table:
    if not ngram_chunks:
        return pa.table(
            {"ngram": pa.array([], pa.string()), "count": pa.array([], COUNT_TYPE)}
        )
    return pa.table(
        {
            "ngram": pa.concat_arrays([c.cast(pa.string()) for c in ngram_chunks]),
            "count": pa.concat_arrays(count_chunks),
        }
    )


def _batch_ngram_counts(
    batch: pa.Table, config: MineConfig, tokens_col: str, lowercase: bool
) -> pa.Table:
    tokens = batch[tokens_col].combine_chunks()
    if lowercase:
        tokens = normalize.lower_token_lists(tokens)
    flat = tokens.values
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # tokens.values may be offset into a larger buffer after slicing
    base = offsets[0]
    offsets = offsets - base
    if base:
        flat = flat.slice(base)
    sizes = np.diff(offsets)
    L = int(offsets[-1])
    doc_index = np.repeat(np.arange(len(sizes)), sizes)

    ngram_chunks: list[pa.Array] = []
    count_chunks: list[pa.Array] = []
    for n in range(config.min_n, config.max_n + 1):
        m = L - n + 1
        if m <= 0:
            continue
        sel = None if n == 1 else doc_index[:m] == doc_index[n - 1 :]
        vc = _materialize_ngram_counts(flat, m, n, sel)
        if vc is None:
            continue
        ngram_chunks.append(vc.field("values"))
        count_chunks.append(vc.field("counts").cast(COUNT_TYPE))

    return _ngram_count_table(ngram_chunks, count_chunks)


def mine_ngrams(
    ds,
    config: MineConfig | None = None,
    tokens_col: str = "tokens",
    lowercase: bool = False,
    sort_output: bool = False,
    shuffle_partitions: int = 32,
    **map_kwargs,
):
    """Dataset(tokens: list<string>) → Dataset(ngram: string, count: uint64).

    ``lowercase=True`` re-lowercases tokens as the reference miner does
    (phrasekit_mine.rs:150-153); leave False when the extract stage already
    normalized (our default pipeline), avoiding a second pass.
    ``sort_output`` reproduces the reference's count-desc output ordering
    (phrasekit_mine.rs:181-187) with a deterministic (count desc, ngram asc)
    tiebreak (SURVEY.md O1) — an extra range-shuffle; keep False mid-pipeline.
    """
    config = config or MineConfig()

    def fn(batch: pa.Table) -> pa.Table:
        return _batch_ngram_counts(batch, config, tokens_col, lowercase)

    partial = ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)
    agg = hash_aggregate(
        partial, "ngram", [("count", "sum")], num_partitions=shuffle_partitions
    )
    agg = agg.map_batches(
        lambda b: b.filter(pc.greater_equal(b["count"], config.min_count)),
        batch_format="pyarrow",
    )
    if sort_output:
        agg = agg.sort(["count", "ngram"], descending=[True, False])
    return agg


def _window_hash_columns(tokens: pa.ListArray):
    """Shared per-batch prep for hash-space mining: (tok_h, offsets,
    doc_index, flat token array)."""
    from phrasekit_ray.stages.dedup import _token_hashes

    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base = offsets[0]
    offsets = offsets - base
    flat = tokens.values
    if base:
        flat = flat.slice(base)
    flat = flat.slice(0, int(offsets[-1]))
    tok_h = _token_hashes(flat)
    sizes = np.diff(offsets)
    doc_index = np.repeat(np.arange(len(sizes)), sizes)
    return tok_h, offsets, doc_index, flat


_WIN_F = np.uint64(1099511628211)


def mine_ngrams_hash_prefilter(
    ds,
    config: MineConfig | None = None,
    tokens_col: str = "tokens",
    lowercase: bool = False,
    sort_output: bool = False,
    shuffle_partitions: int = 32,
    **map_kwargs,
):
    """Two-pass frequency-prefiltered mining — the scale path when
    ``min_count`` prunes most n-grams (it always does on web text):

      pass 1: count 64-bit WINDOW HASHES only (no string materialization;
        the all-to-all moves uint64 keys instead of n-gram strings),
        filter ≥ min_count, broadcast the surviving hash set (sorted
        array — survivor count ≈ final output size, model-sized by
        definition);
      pass 2: string-join ONLY the windows whose hash survives, then the
        same exact string-keyed aggregate + min_count re-filter as
        ``mine_ngrams``.

    Hash collisions can only MERGE pass-1 counts upward, so the survivor
    set is a superset and the pass-2 exact filter restores precision —
    output is IDENTICAL to ``mine_ngrams`` (oracle-checked). Costs one
    extra pass over the corpus; wins when n-gram strings dwarf the
    survivor set.
    """
    import ray

    config = config or MineConfig()

    def phase1(batch: pa.Table) -> pa.Table:
        tokens = batch[tokens_col].combine_chunks()
        if lowercase:
            tokens = normalize.lower_token_lists(tokens)
        tok_h, offsets, doc_index, _ = _window_hash_columns(tokens)
        L = int(offsets[-1])
        hs, cs = [], []
        for n in range(config.min_n, config.max_n + 1):
            m = L - n + 1
            if m <= 0:
                continue
            h = tok_h[:m].copy()
            for j in range(1, n):
                h = h * _WIN_F ^ tok_h[j : m + j]
            # disambiguate n-gram length in the hash space so "a b" and a
            # 1-gram colliding bucket can't merge across n
            h = h * _WIN_F ^ np.uint64(n)
            if n > 1:
                h = h[doc_index[:m] == doc_index[n - 1 :]]
            uniq, cnt = np.unique(h, return_counts=True)
            hs.append(uniq)
            cs.append(cnt.astype(np.int64))
        if not hs:
            return pa.table(
                {"whash": pa.array([], pa.uint64()), "count": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "whash": pa.array(np.concatenate(hs), pa.uint64()),
                "count": pa.array(np.concatenate(cs), pa.int64()),
            }
        )

    hcounts = hash_aggregate(
        ds.map_batches(phase1, batch_format="pyarrow", **map_kwargs),
        "whash",
        [("count", "sum")],
        num_partitions=shuffle_partitions,
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b["count"], int(config.min_count))),
        batch_format="pyarrow",
    )
    surv = [
        b["whash"].to_numpy(zero_copy_only=False)
        for b in hcounts.iter_batches(batch_format="pyarrow")
    ]
    surv_arr = np.sort(np.concatenate(surv)) if surv else np.zeros(0, np.uint64)
    surv_ref = ray.put(surv_arr)

    def phase2(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        allow = _get_broadcast(surv_ref)
        tokens = batch[tokens_col].combine_chunks()
        if lowercase:
            tokens = normalize.lower_token_lists(tokens)
        tok_h, offsets, doc_index, flat = _window_hash_columns(tokens)
        L = int(offsets[-1])
        ngram_chunks, count_chunks = [], []
        for n in range(config.min_n, config.max_n + 1):
            m = L - n + 1
            if m <= 0:
                continue
            h = tok_h[:m].copy()
            for j in range(1, n):
                h = h * _WIN_F ^ tok_h[j : m + j]
            h = h * _WIN_F ^ np.uint64(n)
            if len(allow):
                pos = np.minimum(np.searchsorted(allow, h), len(allow) - 1)
                sel = allow[pos] == h
            else:
                sel = np.zeros(m, dtype=bool)
            if n > 1:
                sel &= doc_index[:m] == doc_index[n - 1 :]
            if not sel.any():
                continue
            vc = _materialize_ngram_counts(flat, m, n, sel)
            if vc is None:
                continue
            ngram_chunks.append(vc.field("values"))
            count_chunks.append(vc.field("counts").cast(COUNT_TYPE))
        return _ngram_count_table(ngram_chunks, count_chunks)

    partial = ds.map_batches(phase2, batch_format="pyarrow", **map_kwargs)
    agg = hash_aggregate(
        partial, "ngram", [("count", "sum")], num_partitions=shuffle_partitions
    )
    agg = agg.map_batches(
        lambda b: b.filter(pc.greater_equal(b["count"], config.min_count)),
        batch_format="pyarrow",
    )
    if sort_output:
        agg = agg.sort(["count", "ngram"], descending=[True, False])
    return agg


def mine_stats(ds, config: MineConfig | None = None, tokens_col: str = "tokens") -> dict:
    """Mining statistics (reference phrasekit_mine.rs:41-48 / SURVEY.md A4),
    computed as Dataset aggregates (triggers execution)."""
    config = config or MineConfig()

    def per_doc(batch: pa.Table) -> pa.Table:
        tokens = batch[tokens_col].combine_chunks()
        sizes = np.diff(tokens.offsets.to_numpy(zero_copy_only=False))
        extracted = np.zeros(len(sizes), dtype=np.int64)
        for n in range(config.min_n, config.max_n + 1):
            extracted += np.maximum(sizes - n + 1, 0)
        return pa.table(
            {
                "docs": pa.array(np.ones(len(sizes), dtype=np.int64)),
                "tokens": pa.array(sizes.astype(np.int64)),
                "extracted": pa.array(extracted),
            }
        )

    t = ds.map_batches(per_doc, batch_format="pyarrow")
    return {
        "total_docs": t.sum("docs"),
        "total_tokens": t.sum("tokens"),
        "total_ngrams_extracted": t.sum("extracted"),
    }


def ngram_table_to_rows(table: pa.Table) -> list[dict]:
    """(ngram, count) Arrow table → reference-style rows with tokens lists."""
    return [
        {"tokens": ng.split(" "), "count": int(c)}
        for ng, c in zip(table["ngram"].to_pylist(), table["count"].to_pylist())
    ]
