"""Tag stage: actor-pool mention detection over the compiled artifact.

Reference analog: phrasekit_tag.rs — load artifacts once per process, then
per document: encode → byte-encode → automaton scan → policy resolve →
truncate → spans (SURVEY.md T1, M3-M11). Ray-native shape: the artifact is
ONE object-store entry; ``TaggerActor`` is a callable class passed to
``map_batches(..., concurrency=N)`` so Ray runs it as an actor pool —
`__init__` fetches the artifact once per actor, `__call__` processes
batches with vectorized encode + scan and per-document (sparse) overlap
resolution.

Output schema mirrors the reference tagger (phrasekit_tag.rs:46-59):
    doc_id, tokens, spans: list<struct<start:int32, end:int32,
    phrase_id:uint32, label:string>>
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from phrasekit_ray.config import TagConfig, UNK_ID
from phrasekit_ray.core import normalize
from phrasekit_ray.core.artifact import MatcherArtifact
from phrasekit_ray.core.policy import resolve_overlaps_batch

SPAN_TYPE = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("phrase_id", pa.uint32()),
        ("label", pa.string()),
    ]
)


class TaggerActor:
    """Stateful batch tagger for ``map_batches`` actor pools."""

    def __init__(
        self,
        artifact_ref=None,
        artifact_path: str | None = None,
        config: TagConfig | None = None,
        id_col: str = "doc_id",
        tokens_col: str = "tokens",
        keep_tokens: bool = True,
        lowercase: bool = True,
    ) -> None:
        import ray

        if artifact_ref is not None:
            self.artifact: MatcherArtifact = ray.get(artifact_ref)
        elif artifact_path is not None:
            self.artifact = MatcherArtifact.load(artifact_path)
        else:
            raise ValueError("need artifact_ref or artifact_path")
        self.config = config or TagConfig()
        self.id_col = id_col
        self.tokens_col = tokens_col
        self.keep_tokens = keep_tokens
        self.lowercase = lowercase
        # vectorized encode support: vocab over a sorted key array
        vocab = self.artifact.vocab
        self._vocab = vocab

    def _encode_flat(self, flat: pa.Array) -> np.ndarray:
        """Vectorized token→id encode: dictionary-encode the batch so the
        Python dict lookup (and the lowercase normalization, when enabled)
        runs once per UNIQUE token, not per token."""
        dict_arr = flat.dictionary_encode()
        uniq_arr = dict_arr.dictionary
        if self.lowercase:
            # lowercase only the uniques — same ids as lowering the full
            # flat array (lookup key is lower(token) either way), but the
            # kernel touches |uniques| strings instead of |tokens|
            uniq_arr = normalize.lower_string_array(uniq_arr)
        uniq = uniq_arr.to_pylist()
        v = self._vocab
        lut = np.fromiter(
            (v.get(t, UNK_ID) for t in uniq), dtype=np.uint32, count=len(uniq)
        )
        indices = dict_arr.indices.to_numpy(zero_copy_only=False)
        return lut[indices] if len(lut) else np.zeros(len(flat), dtype=np.uint32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = batch[self.tokens_col].combine_chunks()
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        offsets = offsets - base
        flat = tokens.values.slice(base, int(offsets[-1]))
        sizes = np.diff(offsets)
        n_docs = len(sizes)
        doc_index = np.repeat(np.arange(n_docs), sizes)

        ids = self._encode_flat(flat) if len(flat) else np.zeros(0, np.uint32)
        docs, starts, ends, pidx = self.artifact.find_matches_flat(ids, doc_index)

        if len(docs):
            kept = resolve_overlaps_batch(
                docs,
                starts,
                ends,
                pidx,
                self.config.policy,
                self.artifact.salience_scores,
                self.config.max_spans,
            )
            kdocs = docs[kept]
            kstarts = (starts[kept] - offsets[kdocs]).astype(np.int32)
            kends = (ends[kept] - offsets[kdocs]).astype(np.int32)
            kphrase = self.artifact.phrase_ids[pidx[kept]]
        else:
            kdocs = np.zeros(0, dtype=np.int64)
            kstarts = np.zeros(0, dtype=np.int32)
            kends = np.zeros(0, dtype=np.int32)
            kphrase = np.zeros(0, dtype=np.uint32)

        label = self.config.label
        span_counts = np.bincount(kdocs, minlength=n_docs) if n_docs else np.zeros(0)
        span_offsets = np.zeros(n_docs + 1, dtype=np.int32)
        if n_docs:
            span_offsets[1:] = np.cumsum(span_counts).astype(np.int32)
        struct_arr = pa.StructArray.from_arrays(
            [
                pa.array(kstarts, pa.int32()),
                pa.array(kends, pa.int32()),
                pa.array(kphrase, pa.uint32()),
                pa.array([label] * len(kstarts), pa.string()),
            ],
            fields=list(SPAN_TYPE),
        )
        spans_col = pa.ListArray.from_arrays(pa.array(span_offsets, pa.int32()), struct_arr)

        out = {self.id_col: batch[self.id_col]}
        if self.keep_tokens:
            out[self.tokens_col] = tokens
        out["spans"] = spans_col
        return pa.table(out)


def tag_corpus(
    ds,
    artifact_ref,
    config: TagConfig | None = None,
    concurrency=(1, 8),
    batch_size: int = 1024,
    num_cpus: float = 1,
    saturate_pool: bool = False,
    mode: str = "actors",
    **actor_kwargs,
):
    """Dataset(doc_id, tokens) → Dataset(doc_id, tokens, spans) via an
    actor pool. ``concurrency=(min,max)`` autoscaling; `batch_size` sized
    so an automaton scan amortizes per batch (SURVEY.md §4).

    ``saturate_pool``: the streaming executor fuses compatible upstream
    task stages INTO the actor pool, making one actor task per SOURCE
    block — which starves a large pool when the source has few blocks
    (e.g. one small parquet file expanded in-stream). Inserting a
    pass-through hop with a different resource request breaks that fusion
    so actor task granularity follows the upstream OUTPUT blocks instead.
    """
    if mode == "tasks":
        # Stateful TASK pool: the compiled artifact is still loaded once
        # per worker process (module-level cache keyed by the object ref),
        # but scheduling is ordinary tasks — no fixed CPU partition between
        # the pool and the task stages feeding it, no per-execution actor
        # ramp. Same load-once semantics as the actor pool; prefer it when
        # a job's stages contend for the same small CPU pool. The actor
        # pool remains the default (explicit placement, per-actor
        # resources, GPU pinning).
        cfg = config or TagConfig()

        def tag_batch(batch: pa.Table) -> pa.Table:
            tagger = _cached_tagger(artifact_ref, cfg, **actor_kwargs)
            return tagger(batch)

        if saturate_pool:
            # same fusion hazard as the actor pool: fused with an
            # expanding upstream, batch_size would count PRE-expansion rows
            ds = ds.map_batches(lambda b: b, batch_format="pyarrow", num_cpus=0.5)
        return ds.map_batches(
            tag_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=num_cpus,
        )
    if saturate_pool:
        ds = ds.map_batches(
            lambda b: b, batch_format="pyarrow", num_cpus=0.5
        )
    return ds.map_batches(
        TaggerActor,
        fn_constructor_kwargs=dict(
            artifact_ref=artifact_ref, config=config or TagConfig(), **actor_kwargs
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


# Small FIFO (mirrors score._BG_CACHE): two pipelines alternating
# artifacts in one worker (e.g. incremental + full KG runs interleaved in
# tasks mode) must each deserialize once per worker, not once per batch —
# a single slot thrashes exactly that pattern.
_TAGGER_CACHE: dict = {}
_TAGGER_CACHE_SLOTS = 8


def _cached_tagger(artifact_ref, config, **kwargs):
    key = (
        artifact_ref.hex() if hasattr(artifact_ref, "hex") else id(artifact_ref),
        repr(config),
        tuple(sorted(kwargs.items())),
    )
    inst = _TAGGER_CACHE.get(key)
    if inst is None:
        while len(_TAGGER_CACHE) >= _TAGGER_CACHE_SLOTS:
            _TAGGER_CACHE.pop(next(iter(_TAGGER_CACHE)))
        inst = TaggerActor(artifact_ref=artifact_ref, config=config, **kwargs)
        _TAGGER_CACHE[key] = inst
    return inst


def tag_stats(tagged_ds) -> dict:
    """Tagging statistics (reference phrasekit_tag.rs:67-72,222-268 /
    SURVEY.md A6) as Dataset aggregates — triggers execution."""

    def per_doc(batch: pa.Table) -> pa.Table:
        spans = batch["spans"].combine_chunks()
        offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets - offsets[0])
        return pa.table(
            {
                "docs": pa.array(np.ones(len(counts), dtype=np.int64)),
                "spans": pa.array(counts.astype(np.int64)),
                "docs_with_spans": pa.array((counts > 0).astype(np.int64)),
            }
        )

    t = tagged_ds.map_batches(per_doc, batch_format="pyarrow")
    docs = t.sum("docs") or 0
    total = t.sum("spans") or 0
    with_spans = t.sum("docs_with_spans") or 0
    return {
        "documents": int(docs),
        "total_spans": int(total),
        "documents_with_spans": int(with_spans),
        "avg_spans_per_document": (total / docs) if docs else 0.0,
    }
