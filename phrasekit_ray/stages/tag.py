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
import pyarrow.compute as pc

from phrasekit_ray.config import TagConfig, UNK_ID
from phrasekit_ray.core import normalize
from phrasekit_ray.core.artifact import MatcherArtifact
from phrasekit_ray.core.policy import Match, resolve_overlaps, truncate

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
        Python dict lookup runs once per UNIQUE token, not per token."""
        if self.lowercase:
            flat = normalize.lower_string_array(flat)
        dict_arr = flat.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
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

        # per-doc resolution in emission order (end asc, start asc)
        spans_per_doc: list[list[tuple[int, int, int]]] = [[] for _ in range(n_docs)]
        if len(docs):
            order = np.lexsort((starts, ends, docs))
            docs, starts, ends, pidx = (
                docs[order],
                starts[order],
                ends[order],
                pidx[order],
            )
            scores = self.artifact.salience_scores
            policy = self.config.policy
            max_spans = self.config.max_spans
            phrase_ids = self.artifact.phrase_ids
            bounds = np.searchsorted(docs, np.arange(n_docs + 1))
            for d in np.unique(docs):
                lo, hi = bounds[d], bounds[d + 1]
                off = offsets[d]
                ms = [
                    Match(int(s - off), int(e - off), int(p))
                    for s, e, p in zip(starts[lo:hi], ends[lo:hi], pidx[lo:hi])
                ]
                resolved = truncate(resolve_overlaps(ms, policy, scores), max_spans)
                spans_per_doc[d] = [
                    (m.start, m.end, int(phrase_ids[m.idx])) for m in resolved
                ]

        label = self.config.label
        span_offsets = np.zeros(n_docs + 1, dtype=np.int32)
        if n_docs:
            span_offsets[1:] = np.cumsum(
                np.fromiter((len(s) for s in spans_per_doc), dtype=np.int32, count=n_docs)
            )
        flat_spans = [s for doc in spans_per_doc for s in doc]
        struct_arr = pa.array(
            [
                {"start": s, "end": e, "phrase_id": p, "label": label}
                for s, e, p in flat_spans
            ],
            type=SPAN_TYPE,
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
    **actor_kwargs,
):
    """Dataset(doc_id, tokens) → Dataset(doc_id, tokens, spans) via an
    actor pool. ``concurrency=(min,max)`` autoscaling; `batch_size` sized
    so an automaton scan amortizes per batch (SURVEY.md §4)."""
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
