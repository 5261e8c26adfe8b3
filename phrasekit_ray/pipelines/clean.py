"""Training-corpus cleaning pipeline — the composition every LLM data
run executes before tokenization: quality gate ∧ exact-dedup
representative ∧ low within-doc repetition, emitting PII/blocklist-
redacted text plus per-doc audit columns.

Composition shape: the four signals (quality, repetition, redaction,
exact-dup representatives) each run as their own distributed operator
over the same documents Dataset; the per-doc signals then meet through
int-keyed ``lookup_join``s on doc_id and the dup-representative set
applies as a SEMI join (broadcast id set under the usual bound).
Re-reading the corpus once per signal is the deliberate 100-TB trade
(the alternative — one fused kernel — saves reads but loses operator
independence); pass ``materialize_input=True`` at bench scale to pin the
input instead.
"""

from __future__ import annotations

import pyarrow as pa

from phrasekit_ray.stages.agg import key_filter_join, lookup_join
from phrasekit_ray.stages.dedup import exact_dedup
from phrasekit_ray.stages.textstats import (
    quality_scores,
    redact_patterns,
    repetition_stats,
)


def clean_corpus(
    ds,
    max_dup_trigram_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_input: bool = False,
    num_partitions: int | None = None,
):
    """documents(doc_id, text, ...) → cleaned Dataset(doc_id,
    text_redacted, n_tokens, n_blocked) of the docs that pass ALL of:

    - ``quality_ok`` (length / alpha-ratio / mean-token-length gate,
      `textstats.quality_scores`);
    - ``dup_trigram_frac <= max_dup_trigram_frac`` (Gopher repetition
      rule, `textstats.repetition_stats`);
    - exact-duplicate representative (min doc_id per identical text,
      `dedup.exact_dedup`) — duplicate copies drop;

    with the surviving text PII/blocklist-scrubbed
    (`textstats.redact_patterns`).
    """
    if materialize_input:
        ds = ds.materialize()

    red = redact_patterns(ds, id_col=id_col, text_col=text_col)
    qual = quality_scores(ds, id_col=id_col, text_col=text_col)
    rep = repetition_stats(ds, id_col=id_col, text_col=text_col)
    reps = exact_dedup(ds, text_col=text_col, id_col=id_col)

    red_s = red.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                "text_redacted": b["text_redacted"],
                "n_blocked": b["n_blocked"],
            }
        ),
        batch_format="pyarrow",
    )
    qual_s = qual.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                "quality_ok": b["quality_ok"],
                "n_tokens": b["n_tokens"],
            }
        ),
        batch_format="pyarrow",
    )
    rep_s = rep.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                "dup_trigram_frac": b["dup_trigram_frac"],
            }
        ),
        batch_format="pyarrow",
    )

    # right_schema serves double duty here: it skips schema inference AND
    # tells lookup_join these sides are expensive pipeline-fed maps (full
    # text-stat passes over the corpus) — the gate then materializes each
    # ONCE and reuses the blocks whichever physical path wins, instead of
    # probing with limit() and re-running the whole stats pass on
    # fall-through for a corpus above the broadcast bound
    joined = lookup_join(
        lookup_join(
            red_s,
            qual_s,
            id_col,
            id_col,
            num_partitions,
            right_schema=pa.schema(
                [
                    (id_col, pa.int64()),
                    ("quality_ok", pa.bool_()),
                    ("n_tokens", pa.int64()),
                ]
            ),
        ),
        rep_s,
        id_col,
        id_col,
        num_partitions,
        right_schema=pa.schema(
            [(id_col, pa.int64()), ("dup_trigram_frac", pa.float64())]
        ),
    )
    kept = key_filter_join(
        joined, reps, id_col, id_col, anti=False, num_partitions=num_partitions
    )
    thr = float(max_dup_trigram_frac)

    def gate(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            b["quality_ok"], pc.less_equal(b["dup_trigram_frac"], thr)
        )
        out = b.filter(keep)
        return pa.table(
            {
                id_col: out[id_col],
                "text_redacted": out["text_redacted"],
                "n_tokens": out["n_tokens"].cast(pa.int64()),
                "n_blocked": out["n_blocked"].cast(pa.int64()),
            }
        )

    return kept.map_batches(gate, batch_format="pyarrow")
