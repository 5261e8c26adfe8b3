"""Strided document chunking: split each document's token stream into
fixed-size, optionally overlapping windows — the training-prep pass that
turns filtered/deduped documents into model-context-sized chunks.

No reference analog (phrasekit is a phrase-mining engine; SURVEY.md
§2.11 extension). Scale shape: pure stateless ``map_batches`` — every
batch explodes independently with one tokenizer kernel + numpy
repeat/gather index math and one ``binary_join``; no shuffle, no state,
no per-row Python. Overlap means the output token volume is
``window/stride`` × the input's, which is the caller's explicit choice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_windows(
    ds,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """documents(doc_id, text) → (doc_id, chunk_idx, chunk_text,
    n_tokens): whitespace tokens split into windows of ``window`` tokens
    every ``stride`` tokens (``stride < window`` ⇒ overlapping training
    windows). Every document emits ≥ 1 chunk (an empty/short doc emits
    its whole token list as chunk 0); the last chunk may be short.

    Window starts are 0, stride, …, ceil((n−window)/stride)·stride —
    just enough windows that every token is covered, and never a
    trailing window fully contained in the previous one (a doc with
    n ≤ window tokens emits exactly one chunk). Starts are additionally
    clamped to land strictly inside the document, so ``stride > window``
    (sampled, gapped windows — tokens between windows are deliberately
    skipped) never emits a phantom empty trailing chunk.
    """
    if window < 1 or stride < 1:
        raise ValueError("chunk_windows: window and stride must be >= 1")

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        toks = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        did = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.diff(offs)
        # second term of the minimum clamps every start inside the doc:
        # with stride > window the coverage formula would place a final
        # start at/past the end and emit an empty phantom chunk
        counts = np.where(
            sizes <= window,
            1,
            np.minimum(
                (sizes - window + stride - 1) // stride + 1,
                (sizes - 1) // stride + 1,
            ),
        ).astype(np.int64)
        total = int(counts.sum())
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        first_w = np.concatenate(([0], np.cumsum(counts)))[:-1]
        widx = np.arange(total, dtype=np.int64) - first_w[doc_rep]
        start = widx * stride
        end = np.minimum(start + window, sizes[doc_rep])
        lens = np.maximum(end - start, 0)
        # gather the (possibly overlapping) token windows into a fresh
        # values buffer — overlapping windows can't share one monotonic
        # ListArray offsets vector over the original buffer
        tot_tok = int(lens.sum())
        wfirst = np.concatenate(([0], np.cumsum(lens)))[:-1]
        tok_rep = np.repeat(np.arange(total, dtype=np.int64), lens)
        pos = (
            np.arange(tot_tok, dtype=np.int64)
            - wfirst[tok_rep]
            + start[tok_rep]
            + offs[:-1][doc_rep[tok_rep]]
        )
        gathered = toks.values.take(pa.array(pos, pa.int64()))
        # int64 offsets (LargeList): overlap amplifies token volume by
        # window/stride ×, so a large text block can exceed 2^31 gathered
        # tokens — int32 offsets would wrap silently into corrupt lists
        out_offs = np.concatenate(([0], np.cumsum(lens)))
        la = pa.LargeListArray.from_arrays(pa.array(out_offs, pa.int64()), gathered)
        return pa.table(
            {
                "doc_id": pa.array(did[doc_rep], pa.int64()),
                "chunk_idx": pa.array(widx, pa.int64()),
                "chunk_text": pc.binary_join(la, " "),
                "n_tokens": pa.array(lens, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
