"""Corpus mixing: deterministic rate-based subsampling / oversampling.

The standard training-data mixture op (cf. GPT-3 / The Pile dataset
weighting): each source corpus gets a sampling RATE; rate < 1
subsamples, rate > 1 oversamples by emitting ⌊rate⌋ copies plus one
more with probability frac(rate). The per-row decision is a pure
function of (id, seed) via the repo's shared splitmix hash
(sources/pages.splitmix17), so the mixture is reproducible across runs,
partitionings and cluster sizes, and exactly re-expressible in the
DuckDB oracle SQL.

Scale shape: ONE stateless map_batches pass — no shuffle, no driver
state; the rate table applies per-UNIQUE source value (dictionary
encode), never per row. Reference has no analog (single-corpus tool);
this is part of the beyond-reference training-data surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from phrasekit_ray.sources.pages import splitmix17


def mix_corpora(
    ds,
    source_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: int = 17,
    default_rate: float = 1.0,
    copy_col: str = "copy",
    **map_kwargs,
):
    """Dataset → Dataset with each row emitted ``n_copies(row)`` times,
    ``n_copies = ⌊rate⌋ + [u(id) < frac(rate)]`` where ``rate`` is the
    row's source rate (``default_rate`` when unlisted) and ``u`` is the
    seeded uniform hash of ``id_col``. Adds ``copy_col`` (int32, 0-based
    copy index — the "epoch" of an oversampled row). Negative rates are
    rejected; rate 0 drops the source entirely.
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("mix_corpora: rates must be >= 0")

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(copy_col, pa.array([], pa.int32()))
        n = batch.num_rows
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = (splitmix17(ids, seed).astype(np.float64) + 0.5) / 2.0**64
        enc = (
            batch[source_col]
            .cast(pa.string())
            .combine_chunks()
            .dictionary_encode()
        )
        # rate lookup per UNIQUE source value, broadcast by take
        rate_u = np.array(
            [
                default_rate if s is None else rates.get(s, default_rate)
                for s in enc.dictionary.to_pylist()
            ],
            dtype=np.float64,
        )
        rate = rate_u[enc.indices.to_numpy(zero_copy_only=False)]
        base = np.floor(rate)
        copies = (base + (u < rate - base)).astype(np.int64)
        idx = np.repeat(np.arange(n, dtype=np.int64), copies)
        out = batch.take(pa.array(idx))
        starts = np.cumsum(copies) - copies
        copy = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, copies)
        return out.append_column(copy_col, pa.array(copy.astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)
