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
        if n == 1:
            joined = flat.slice(0, m)
            valid = None
        else:
            parts = [flat.slice(k, m) for k in range(n)]
            joined = pc.binary_join_element_wise(*parts, " ")
            valid = doc_index[:m] == doc_index[n - 1 :]
        if valid is not None and not valid.all():
            joined = joined.filter(pa.array(valid))
        if len(joined) == 0:
            continue
        vc = joined.value_counts()  # StructArray{values, counts}
        ngram_chunks.append(vc.field("values"))
        count_chunks.append(vc.field("counts").cast(COUNT_TYPE))

    if not ngram_chunks:
        return pa.table(
            {"ngram": pa.array([], pa.string()), "count": pa.array([], COUNT_TYPE)}
        )
    return pa.table(
        {
            "ngram": pa.concat_arrays(
                [c.cast(pa.string()) for c in ngram_chunks]
            ),
            "count": pa.concat_arrays(count_chunks),
        }
    )


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
