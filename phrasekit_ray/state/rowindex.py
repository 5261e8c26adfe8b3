"""Global ordered row enumeration (zipWithIndex) for a sorted Dataset.

Ray Data has no native zipWithIndex (SURVEY.md O3/§7.3): sequential
phrase_id assignment after the salience sort needs a global ordinal. The
scale path: materialize the sorted Dataset, read the per-block row counts
from the executed plan's ref bundles (metadata only — no block bytes move
to the driver), prefix-sum them into per-block offsets, and add the offset
to each block in a remote task. Blocks of a materialized sorted Dataset
are in sorted order, so offsets are exact.

Falls back to a driver-side pass when the internal bundle API shape is
unavailable — correct but driver-memory-bound; the primary path streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _add_index_block(block: pa.Table, offset: int, col: str, start: int) -> pa.Table:
    ids = np.arange(start + offset, start + offset + block.num_rows, dtype=np.uint32)
    return block.append_column(col, pa.array(ids, type=pa.uint32()))


def with_row_index(ds, col: str = "row_index", start: int = 0):
    """Append a uint32 global ordinal column to an (already sorted) Dataset.

    Returns a new Dataset whose row order and block layout are preserved.
    """
    import ray

    mat = ds.materialize()
    try:
        bundles = list(mat.iter_internal_ref_bundles())
        block_refs: list = []
        counts: list[int] = []
        for b in bundles:
            for block_ref, meta in b.blocks:
                block_refs.append(block_ref)
                counts.append(meta.num_rows)
        if any(c is None for c in counts):
            raise ValueError("missing block row counts")
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

        add = ray.remote(num_cpus=0.5)(_add_index_block)
        out_refs = [
            add.remote(ref, int(off), col, start)
            for ref, off in zip(block_refs, offsets)
        ]
        return ray.data.from_arrow_refs(out_refs)
    except Exception:
        # fallback: single driver pass (bounded tables only)
        tables = ray.get(mat.to_arrow_refs())
        table = pa.concat_tables([t for t in tables if t.num_rows], promote_options="default")
        return ray.data.from_arrow(_add_index_block(table, 0, col, start))
