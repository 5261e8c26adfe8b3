"""Unigram language-model corpus scoring and conjunctive retrieval.

CCNet-style quality signal (reference has no LM scorer; this is one of
the LLM-training-data extensions): train an add-one-smoothed unigram LM
on the corpus itself, then score every document's negative log
likelihood — low-likelihood documents are gibberish/boilerplate
candidates, the same role KenLM perplexity plays in CCNet/RefinedWeb
filtering pipelines.

Scale shape:
- counts are ONE two-phase hash aggregate over exploded tokens (in-block
  combine before the shuffle, string keys hash to int32 partitions);
- the vocabulary is capped at ``max_vocab`` tokens by (count desc, token
  asc) — the standard LM vocab cap — so the broadcast log-prob table is
  bounded regardless of corpus size (OOV mass goes through the smoothing
  term exactly like any unseen token);
- scoring is stateless ``map_batches``: tokens dictionary-encode per
  batch, the broadcast table is probed once per UNIQUE token (the
  spell-correct pattern), per-doc sums are one vectorized cumsum
  difference over the list offsets.

Log-probs are fixed to integer MICRO-nats per token (round(ln(p)·1e6))
before summation so the result is addition-order-proof and
SQL-oracle-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.core import normalize


def _round_away_np(x):
    """Round half away from zero (DuckDB round() semantics; np.round is
    half-to-even, which diverges on exact .5 micro-unit values)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _split_space(arr):
    """SQL ``string_split(text, ' ')`` parity: split on the LITERAL single
    space, keeping empty tokens ('' → ['']) — unlike Python ``str.split()``
    used by the phrase-mining path, so LM/BM25 token counts match the
    DuckDB oracles even on leading/double-space or empty text."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pc.split_pattern(arr, " ")
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _explode_tokens(ds, text_col: str, lowercase: bool = False):
    def fn(b: pa.Table) -> pa.Table:
        toks = _split_space(b[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        if lowercase:
            flat = normalize.lower_string_array(flat)
        return pa.table({"tok": flat})

    return ds.map_batches(fn, batch_format="pyarrow")


def unigram_logprob_table(
    docs,
    text_col: str = "text",
    min_count: int = 2,
    max_vocab: int = 1_000_000,
    num_partitions: int | None = None,
):
    """Train the unigram LM: returns (vocab dict tok → lp_micro int,
    oov_lp_micro int, n_total int, vocab_size int).

    Vocab = tokens with count ≥ ``min_count``, capped at ``max_vocab`` by
    (count desc, token asc). lp(tok) = ln((c+1)/(N+V)) with N = total
    count over the kept vocab, V = kept vocab size; OOV uses c = 0. The
    table is collected to the driver ONCE (bounded by ``max_vocab``) for
    broadcast — everything upstream is distributed."""
    from phrasekit_ray.stages.agg import grouped_count

    counts = grouped_count(
        _explode_tokens(docs, text_col), "tok", count_col="c",
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_count)),
        batch_format="pyarrow",
    )
    vocab = counts.sort(["c", "tok"], descending=[True, False]).limit(max_vocab)
    toks: list[str] = []
    cs: list[np.ndarray] = []
    for b in vocab.iter_batches(batch_format="pyarrow"):
        toks.extend(b["tok"].to_pylist())
        cs.append(b["c"].to_numpy(zero_copy_only=False).astype(np.int64))
    c = np.concatenate(cs) if cs else np.zeros(0, np.int64)
    n_total = int(c.sum())
    v = len(toks)
    denom = np.float64(n_total + v)
    lp_micro = _round_away_np(np.log((c + 1.0) / denom) * 1e6).astype(np.int64)
    oov = int(_round_away_np(np.log(1.0 / denom) * 1e6)) if v else 0
    return dict(zip(toks, lp_micro.tolist())), oov, n_total, v


def unigram_nll_scores(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    max_vocab: int = 1_000_000,
    num_partitions: int | None = None,
):
    """Dataset(doc_id, text) → Dataset(doc_id, n_tokens, nll_micro):
    per-document unigram negative log likelihood in integer micro-nats
    (sum over tokens of −lp_micro; empty docs score 0)."""
    import ray

    table, oov, _, _ = unigram_logprob_table(
        docs, text_col, min_count, max_vocab, num_partitions
    )
    table_ref = ray.put(table)

    def score(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        lp_map = _get_broadcast(table_ref)
        toks = _split_space(b[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        enc = pc.dictionary_encode(flat)
        uniq = enc.dictionary.to_pylist() if len(flat) else []
        lp_uniq = np.fromiter(
            (lp_map.get(t, oov) for t in uniq), dtype=np.int64, count=len(uniq)
        )
        if len(flat):
            lp = lp_uniq[enc.indices.to_numpy(zero_copy_only=False)]
        else:
            lp = np.zeros(0, np.int64)
        csum = np.concatenate(([0], np.cumsum(lp)))
        doc_sum = csum[off[1:]] - csum[off[:-1]]
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": pa.array(np.diff(off), pa.int64()),
                "nll_micro": pa.array(-doc_sum, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def _explode_bigrams(ds, text_col: str):
    """(doc_id-less) flat bigram strings 'w1 w2' over within-doc adjacent
    token pairs — vectorized shift + mask on the list offsets."""

    def fn(b: pa.Table) -> pa.Table:
        toks = _split_space(b[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        n = len(flat)
        if n < 2:
            return pa.table({"tok": pa.array([], pa.string())})
        # position i starts a bigram unless it is a doc's last token
        is_last = np.zeros(n, dtype=bool)
        ends = off[1:][off[1:] > 0] - 1
        is_last[ends] = True
        keep = ~is_last[:-1]
        w1 = flat.slice(0, n - 1).filter(pa.array(keep))
        w2 = flat.slice(1, n - 1).filter(pa.array(keep))
        return pa.table(
            {"tok": pc.binary_join_element_wise(w1, w2, " ")}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def bigram_logprob_tables(
    docs,
    text_col: str = "text",
    min_count: int = 2,
    max_vocab: int = 1_000_000,
    max_bigrams: int = 1_000_000,
    num_partitions: int | None = None,
):
    """Train the conditional bigram LM. Returns (uni dict tok→count,
    big dict 'w1 w2'→count, V).

    p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V): add-one smoothing over the
    kept unigram vocabulary (count ≥ min_count, capped at ``max_vocab``
    by count desc / tok asc); the bigram table is capped the same way at
    ``max_bigrams`` — missing entries read as count 0, so both broadcast
    tables are bounded regardless of corpus size."""
    from phrasekit_ray.stages.agg import grouped_count

    def top_counts(ds_counts, cap):
        top = ds_counts.sort(["c", "tok"], descending=[True, False]).limit(cap)
        out = {}
        for b in top.iter_batches(batch_format="pyarrow"):
            out.update(zip(b["tok"].to_pylist(), b["c"].to_pylist()))
        return out

    uni_counts = grouped_count(
        _explode_tokens(docs, text_col), "tok", count_col="c",
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_count)),
        batch_format="pyarrow",
    )
    uni = top_counts(uni_counts, max_vocab)

    big_counts = grouped_count(
        _explode_bigrams(docs, text_col), "tok", count_col="c",
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_count)),
        batch_format="pyarrow",
    )
    big = top_counts(big_counts, max_bigrams)
    return uni, big, len(uni)


def bigram_nll_scores(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    max_vocab: int = 1_000_000,
    max_bigrams: int = 1_000_000,
    num_partitions: int | None = None,
):
    """Dataset(doc_id, text) → Dataset(doc_id, n_bigrams, nll_micro):
    per-document conditional bigram NLL in integer micro-nats, summed
    over within-doc adjacent token pairs (docs with < 2 tokens score 0).

    Same scale shape as the unigram scorer: two bounded broadcast count
    tables, stateless scoring scan, per-UNIQUE-bigram probing
    (dictionary encode), per-doc sums via one cumsum difference."""
    import ray

    uni, big, v = bigram_logprob_tables(
        docs, text_col, min_count, max_vocab, max_bigrams, num_partitions
    )
    tables_ref = ray.put((uni, big))

    def score(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        uni_map, big_map = _get_broadcast(tables_ref)
        toks = _split_space(b[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        n = len(flat)
        dl = np.diff(off)
        n_big = np.maximum(dl - 1, 0)
        if n < 2 or int(n_big.sum()) == 0:
            return pa.table(
                {
                    id_col: b[id_col],
                    "n_bigrams": pa.array(n_big, pa.int64()),
                    "nll_micro": pa.array(np.zeros(len(dl), np.int64), pa.int64()),
                }
            )
        is_last = np.zeros(n, dtype=bool)
        ends = off[1:][off[1:] > 0] - 1
        is_last[ends] = True
        keep = ~is_last[:-1]
        w1 = flat.slice(0, n - 1).filter(pa.array(keep))
        w2 = flat.slice(1, n - 1).filter(pa.array(keep))
        pairs = pc.binary_join_element_wise(w1, w2, " ")

        enc2 = pc.dictionary_encode(pairs)
        uniq2 = enc2.dictionary.to_pylist()
        c2_uniq = np.fromiter(
            (big_map.get(t, 0) for t in uniq2), dtype=np.int64, count=len(uniq2)
        )
        c2 = c2_uniq[enc2.indices.to_numpy(zero_copy_only=False)]
        enc1 = pc.dictionary_encode(w1)
        uniq1 = enc1.dictionary.to_pylist()
        c1_uniq = np.fromiter(
            (uni_map.get(t, 0) for t in uniq1), dtype=np.int64, count=len(uniq1)
        )
        c1 = c1_uniq[enc1.indices.to_numpy(zero_copy_only=False)]
        lp = _round_away_np(
            np.log((c2 + 1.0) / (c1 + np.float64(v))) * 1e6
        ).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(lp)))
        bnd = np.concatenate(([0], np.cumsum(n_big)))
        doc_sum = csum[bnd[1:]] - csum[bnd[:-1]]
        return pa.table(
            {
                id_col: b[id_col],
                "n_bigrams": pa.array(n_big, pa.int64()),
                "nll_micro": pa.array(-doc_sum, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def conjunctive_search(docs, query_tokens, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Dataset(doc_id, text) → Dataset(doc_id) of documents containing
    ALL ``query_tokens`` (whitespace tokens, exact match).

    For a single ad-hoc query the right distributed plan is a vectorized
    SCAN, not an index: per batch, one ``pc.is_in`` over the flat token
    values per query token + a segment-max per document — no shuffle, no
    state, prunes to one column at the read."""
    query_tokens = list(query_tokens)

    def fn(b: pa.Table) -> pa.Table:
        toks = _split_space(b[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        keep = np.ones(b.num_rows, dtype=bool)
        for qt in query_tokens:
            hit = pc.equal(flat, qt).to_numpy(zero_copy_only=False).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(hit)))
            keep &= (csum[off[1:]] - csum[off[:-1]]) > 0
        return pa.table({id_col: b[id_col].filter(pa.array(keep))})

    return docs.map_batches(fn, batch_format="pyarrow")


def top_tokens(docs, k: int = 2, text_col: str = "text", offset: int = 0,
               num_partitions: int | None = None) -> list[str]:
    """The k most frequent corpus tokens starting at rank ``offset``,
    ties broken by token asc — deterministic query-term selection for
    the retrieval oracles."""
    from phrasekit_ray.stages.agg import grouped_count

    counts = grouped_count(
        _explode_tokens(docs, text_col), "tok", count_col="c",
        num_partitions=num_partitions,
    )
    top = counts.sort(["c", "tok"], descending=[True, False]).limit(k + offset)
    out: list[str] = []
    for b in top.iter_batches(batch_format="pyarrow"):
        out.extend(b["tok"].to_pylist())
    return out[offset:offset + k]


def bm25_topk(
    docs,
    query_tokens,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """BM25-ranked retrieval: top-``topk`` documents for a bag-of-tokens
    query → Dataset(doc_id, bm25_micro), Lucene-style idf
    ln((N−df+0.5)/(df+0.5)+1).

    Scale shape — the corpus TEXT is read exactly once: pass A is a
    stateless scan producing the tiny int intermediate (doc_id, dl,
    tf_i, present_i per query term); N, Σdl and per-term document
    frequencies are single-row aggregates over that intermediate; pass B
    scores it with driver-computed scalar idfs (closure constants — a
    handful of floats, no broadcast object needed) and sorts for the
    top k. Per-term scores are fixed to integer micro-units BEFORE the
    sum so ranking is addition-order-proof and SQL-oracle-exact."""
    query_tokens = list(query_tokens)
    nq = len(query_tokens)

    def pass_a(bt: pa.Table) -> pa.Table:
        toks = _split_space(bt[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        cols = {
            id_col: bt[id_col],
            "dl": pa.array(np.diff(off), pa.int64()),
        }
        for qi, qt in enumerate(query_tokens):
            hit = pc.equal(flat, qt).to_numpy(zero_copy_only=False).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(hit)))
            tf = csum[off[1:]] - csum[off[:-1]]
            cols[f"tf{qi}"] = pa.array(tf, pa.int64())
            cols[f"p{qi}"] = pa.array((tf > 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    inter = docs.map_batches(pass_a, batch_format="pyarrow").materialize()
    n_docs = inter.count()
    if n_docs == 0:
        # Dataset.sum on an empty dataset returns None and avgdl would
        # be 0/0; the correct answer is simply "no results"
        import ray

        try:
            id_type = inter.schema().base_schema.field(id_col).type
        except Exception:
            id_type = pa.int64()
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], id_type),
                    "bm25_micro": pa.array([], pa.int64()),
                }
            )
        )
    sums = inter.sum(["dl"] + [f"p{qi}" for qi in range(nq)])
    avgdl = np.float64(sums["sum(dl)"]) / np.float64(n_docs)
    idf = [
        np.log(
            (n_docs - sums[f"sum(p{qi})"] + 0.5) / (sums[f"sum(p{qi})"] + 0.5)
            + 1.0
        )
        for qi in range(nq)
    ]
    tf_num = np.float64(k1 + 1.0)
    one_minus_b = np.float64(1.0 - b)

    def score(bt: pa.Table) -> pa.Table:
        dl = bt["dl"].combine_chunks().to_numpy().astype(np.float64)
        norm = np.float64(k1) * (one_minus_b + np.float64(b) * dl / avgdl)
        total = np.zeros(len(dl), dtype=np.int64)
        for qi in range(nq):
            tf = bt[f"tf{qi}"].combine_chunks().to_numpy().astype(np.float64)
            s = np.float64(idf[qi]) * (tf * tf_num) / (tf + norm)
            total += _round_away_np(s * 1e6).astype(np.int64)
        keep = total > 0
        return pa.table(
            {
                id_col: bt[id_col].filter(pa.array(keep)),
                "bm25_micro": pa.array(total[keep], pa.int64()),
            }
        )

    return (
        inter.map_batches(score, batch_format="pyarrow")
        .sort(["bm25_micro", id_col], descending=[True, False])
        .limit(topk)
    )


def kn_bigram_nll_scores(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    max_vocab: int = 1_000_000,
    max_bigrams: int = 1_000_000,
    discount: float = 0.75,
    num_partitions: int | None = None,
):
    """Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen
    & Goodman 1999 eq. 4.28, fixed discount D) — the standard n-gram
    smoothing a KenLM-style corpus-quality filter uses, next to the
    add-one :func:`bigram_nll_scores` baseline.

    Model statistics all derive from the KEPT bigram table (count ≥
    ``min_count``, capped at ``max_bigrams`` by count desc / pair asc —
    bounded broadcast regardless of corpus size):

    - c1(w1)  = Σ c over kept pairs with left w1 (left marginal),
    - fol(w1) = # kept pair types with left w1 (discount mass),
    - cont(w2)= # kept pair types with right w2 (continuation count),
    - T       = # kept pair types, U = kept unigram vocab size,
    - p_cont(w2) = (cont(w2)+1)/(T+U)  [add-one so unseen w2 has mass],
    - p(w2|w1) = (max(c12−D,0) + D·fol(w1)·p_cont(w2)) / c1(w1)
                 if c1(w1)>0 else p_cont(w2).

    Every input is an integer count and the float tail is one fixed
    expression, so micro-nat rounding is reproducible and the SQL twin
    exact. Scale shape: two two-phase aggregates to train, bounded
    broadcast model, stateless scoring scan with per-UNIQUE probing.

    Returns Dataset(doc_id, n_bigrams, kn_nll_micro).
    """
    import ray

    uni, big, _u = bigram_logprob_tables(
        docs, text_col, min_count, max_vocab, max_bigrams, num_partitions
    )
    U = len(uni)
    c1: dict = {}
    fol: dict = {}
    cont: dict = {}
    for pair, c in big.items():
        w1, w2 = pair.split(" ", 1)
        c1[w1] = c1.get(w1, 0) + c
        fol[w1] = fol.get(w1, 0) + 1
        cont[w2] = cont.get(w2, 0) + 1
    T = len(big)
    model_ref = ray.put((big, c1, fol, cont))
    D = float(discount)
    denom = float(T + U)

    def score(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        big_m, c1_m, fol_m, cont_m = _get_broadcast(model_ref)
        toks = _split_space(b[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        n = len(flat)
        dl = np.diff(off)
        n_big = np.maximum(dl - 1, 0)
        if n < 2 or int(n_big.sum()) == 0:
            return pa.table(
                {
                    id_col: b[id_col],
                    "n_bigrams": pa.array(n_big, pa.int64()),
                    "kn_nll_micro": pa.array(
                        np.zeros(len(dl), np.int64), pa.int64()
                    ),
                }
            )
        is_last = np.zeros(n, dtype=bool)
        ends = off[1:][off[1:] > 0] - 1
        is_last[ends] = True
        keep = ~is_last[:-1]
        w1 = flat.slice(0, n - 1).filter(pa.array(keep))
        w2 = flat.slice(1, n - 1).filter(pa.array(keep))
        pairs = pc.binary_join_element_wise(w1, w2, " ")

        def probe(arr, table):
            enc = pc.dictionary_encode(arr)
            uniq = enc.dictionary.to_pylist()
            vals = np.fromiter(
                (table.get(t, 0) for t in uniq), dtype=np.int64, count=len(uniq)
            )
            return vals[enc.indices.to_numpy(zero_copy_only=False)]

        c12 = probe(pairs, big_m).astype(np.float64)
        c1v = probe(w1, c1_m).astype(np.float64)
        folv = probe(w1, fol_m).astype(np.float64)
        contv = probe(w2, cont_m).astype(np.float64)
        # the SAME fixed expression as the SQL twin, term for term
        pcs = (contv + 1.0) / denom
        seen = c1v > 0
        p = np.where(
            seen,
            (np.maximum(c12 - D, 0.0) + D * folv * pcs)
            / np.where(seen, c1v, 1.0),
            pcs,
        )
        lp = _round_away_np(np.log(p) * 1e6).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(lp)))
        bnd = np.concatenate(([0], np.cumsum(n_big)))
        doc_sum = csum[bnd[1:]] - csum[bnd[:-1]]
        return pa.table(
            {
                id_col: b[id_col],
                "n_bigrams": pa.array(n_big, pa.int64()),
                "kn_nll_micro": pa.array(-doc_sum, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
