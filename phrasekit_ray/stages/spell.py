"""Spell-correction stage (dependency-injected, reference M12).

Reference analog: lib/spellkit_stub.rb:53-73 + docs/SPELLKIT_INTEGRATION.md
— a fixed correction dict applied token-wise, with a protected-term set
that bypasses correction. "Integration by convention, not coupling": any
object with ``correct(token) -> token`` works (SURVEY.md §2.10).

Ray shape: stateless map_batches; the per-batch kernel dictionary-encodes
the flattened token column so the Python-level correction runs once per
UNIQUE token in the batch, not once per token.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from phrasekit_ray.runtime import SpellCorrectorStub


def correct_documents(
    ds,
    corrector=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    **map_kwargs,
):
    """documents(doc_id, text) → (doc_id, corrected_text): whitespace
    tokenize → per-token correct (protected terms bypass) → single-space
    rejoin. The SQL twin unnests, LEFT JOINs a corrections table and
    string_agg's back in position order."""
    corrector = corrector or SpellCorrectorStub()

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch[text_col].combine_chunks()
        tokens = pc.split_pattern(text, " ")
        flat = tokens.values
        dict_arr = flat.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
        corrected = pa.array([corrector.correct(t) for t in uniq], pa.string())
        new_flat = corrected.take(dict_arr.indices)
        # carry the validity bitmap: a null text row must stay null, not
        # collapse to corrected_text='' (the SQL twin emits no row for it)
        from phrasekit_ray.core.normalize import _list_from_arrays_like

        new_lists = _list_from_arrays_like(tokens, tokens.offsets, new_flat)
        joined = pc.binary_join(new_lists, " ")
        out = pa.table({id_col: batch[id_col], "corrected_text": joined})
        if joined.null_count:
            # SQL-twin parity: unnest of a NULL text yields no rows, so the
            # oracle emits no output row for that document at all
            out = out.filter(pc.is_valid(out["corrected_text"]))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)
