"""Global ordered row enumeration (zipWithIndex) for a sorted Dataset.

Ray Data has no native zipWithIndex (SURVEY.md O3/§7.3): sequential
phrase_id assignment after the salience sort needs a global ordinal. The
scale path: materialize the sorted Dataset, read the per-block row counts
from the executed plan's ref bundles (metadata only — no block bytes move
to the driver), prefix-sum them into per-block offsets, and add the offset
to each block in a remote task. Blocks of a materialized sorted Dataset
are in sorted order, so offsets are exact.

If the internal bundle API shape changes in a Ray upgrade, the fallback
stays DISTRIBUTED: block refs come from the public ``to_arrow_refs()``,
counts are computed in remote tasks (only ints reach the driver), and the
same per-block offset tasks run — never a driver-side concat of the data.
``LAST_PATH`` records which path ran so tests can pin the primary one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# "bundles" (primary, metadata-only) or "arrow_refs" (fallback, counts
# computed remotely) — set by every with_row_index call; test-observable.
LAST_PATH: str | None = None


def _add_index_block(block: pa.Table, offset: int, col: str, start: int) -> pa.Table:
    ids = np.arange(start + offset, start + offset + block.num_rows, dtype=np.uint32)
    return block.append_column(col, pa.array(ids, type=pa.uint32()))


def _block_rows(block: pa.Table) -> int:
    return block.num_rows


def _bundle_refs_and_counts(mat) -> tuple[list, list[int]]:
    """Primary metadata-only path: block refs + row counts straight from
    the executed plan's ref bundles (isolated here so tests can simulate
    a Ray upgrade breaking just this internal API)."""
    block_refs: list = []
    counts: list[int] = []
    for b in mat.iter_internal_ref_bundles():
        for block_ref, meta in b.blocks:
            block_refs.append(block_ref)
            counts.append(meta.num_rows)
    if any(c is None for c in counts):
        raise ValueError("missing block row counts")
    return block_refs, counts


def with_row_index(ds, col: str = "row_index", start: int = 0):
    """Append a uint32 global ordinal column to an (already sorted) Dataset.

    Returns a new Dataset whose row order and block layout are preserved.
    """
    global LAST_PATH
    import ray

    mat = ds.materialize()
    block_refs: list = []
    counts: list[int] = []
    try:
        block_refs, counts = _bundle_refs_and_counts(mat)
        LAST_PATH = "bundles"
    except Exception:
        # distributed fallback: public block refs; per-block row counts
        # computed in remote tasks (ints to the driver, never blocks)
        block_refs = list(mat.to_arrow_refs())
        count_task = ray.remote(num_cpus=0.25)(_block_rows)
        counts = ray.get([count_task.remote(r) for r in block_refs])
        LAST_PATH = "arrow_refs"

    total = int(sum(counts))
    if start + total > 2**32:
        # the ordinal column is uint32 for reference phrase_id parity;
        # np.arange would wrap silently past 2^32 and emit duplicates
        # (max emitted index is start+total-1, so exactly 2^32 rows from
        # start=0 still fit)
        raise OverflowError(
            f"row index overflow: start={start} + {total} rows exceeds "
            f"uint32; enumerate a bounded (filtered/top-k) dataset"
        )
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) if counts else []
    add = ray.remote(num_cpus=0.5)(_add_index_block)
    out_refs = [
        add.remote(ref, int(off), col, start)
        for ref, off in zip(block_refs, offsets)
    ]
    if not out_refs:
        schema = mat.schema(fetch_if_missing=True)
        cols = {n: pa.array([], t) for n, t in zip(schema.names, schema.types)}
        cols[col] = pa.array([], pa.uint32())
        return ray.data.from_arrow(pa.table(cols))
    return ray.data.from_arrow_refs(out_refs)
