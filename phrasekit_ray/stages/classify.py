"""Hashed-feature linear text classifier — the batched-model-inference
stage shape (production quality filters run exactly like this: fastText /
logistic models over hashed bag-of-words features).

Training-data extension (no reference analog). The model here is a
DETERMINISTIC synthetic weight table derived from md5 (no external data
or learned weights enter the sandbox), which makes the whole scoring
path SQL-expressible: DuckDB ``md5_number_upper`` is the same token/
bucket hash, scores are integer sums, and the label threshold reduces to
an integer sign test — so the classifier is oracle-checked end to end,
which a real learned model never could be. Swap `_weight_table` for
loaded weights to run a real model with the identical execution shape.

Execution shape (the part that matters at 100 TB): a callable CLASS for
``map_batches`` — the weight table builds ONCE per actor in
``__init__``; ``__call__`` scores a whole Arrow batch with
dictionary-encoded token hashing (md5 once per UNIQUE token) and one
``np.add.reduceat`` per batch. No shuffle, no driver traffic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from phrasekit_ray.core import normalize


def _weight_table(num_buckets: int, seed: int) -> np.ndarray:
    """int8 weight per feature bucket: md5-derived, in [-3, 3] — the
    deterministic stand-in for learned weights (see module docstring)."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(f"w{seed}:{b}".encode()).digest()[:8], "little"
            )
            % 7
            - 3
            for b in range(num_buckets)
        ),
        dtype=np.int64,
        count=num_buckets,
    )


class HashedLinearClassifier:
    """Actor-pool stage: documents(doc_id, text) → (doc_id, score,
    logit, label).

    score = Σ over tokens of w[md5_u64(token) mod num_buckets] (exact
    integer); logit = score / scale (one IEEE division); label = 1 iff
    score >= 0 (== sigmoid(logit) >= 0.5, as an exact integer test).
    """

    def __init__(
        self,
        num_buckets: int = 4096,
        seed: int = 13,
        scale: float = 8.0,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.weights = _weight_table(num_buckets, seed)
        self.num_buckets = np.uint64(num_buckets)
        self.scale = float(scale)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.dedup import _token_hashes

        toks = normalize.tokenize_string_array(
            batch[self.text_col].combine_chunks(), lowercase=False
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        offsets = offsets - base
        flat = toks.values.slice(base, int(offsets[-1]))
        th = _token_hashes(flat)
        per_tok = (
            self.weights[(th % self.num_buckets).astype(np.int64)]
            if len(th)
            else np.zeros(0, np.int64)
        )
        n_docs = len(offsets) - 1
        scores = np.zeros(n_docs, dtype=np.int64)
        sizes = np.diff(offsets)
        if len(per_tok):
            nz = sizes > 0
            starts = offsets[:-1][nz]
            scores[nz] = np.add.reduceat(per_tok, starts)
        logit = scores / self.scale
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "score": pa.array(scores, pa.int64()),
                "logit": pa.array(logit, pa.float64()),
                "label": pa.array((scores >= 0).astype(np.int64), pa.int64()),
            }
        )


def classify_documents(
    ds,
    num_buckets: int = 4096,
    seed: int = 13,
    scale: float = 8.0,
    concurrency=(1, 4),
    batch_size: int = 1024,
    **cols,
):
    """documents → classifier scores via an actor pool (weight table
    built once per actor in __init__, never per batch)."""
    return ds.map_batches(
        HashedLinearClassifier,
        fn_constructor_kwargs={
            "num_buckets": num_buckets,
            "seed": seed,
            "scale": scale,
            **cols,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
