"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. Training-data extensions (no reference analog);
all stateless, fully in-block map_batches over Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.core import normalize

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "a", "is", "for", "was", "with", "on"},
    "de": {"der", "die", "das", "und", "ist", "zu", "den", "von", "mit", "für"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "se", "las", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une", "est"},
}


def token_counts(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """Dataset → (doc_id, n_tokens) — whitespace tokenizer count
    (SQL-oracle-expressible)."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = normalize.tokenize_string_array(
            batch[text_col].combine_chunks(), lowercase=False
        )
        sizes = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(sizes.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


def bpe_ish_token_counts(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """Sub-word-ish token count: whitespace pieces plus punctuation splits
    (a BPE-ish regex proxy for tokenizer budgeting)."""
    import re

    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = np.fromiter(
            (len(pat.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        return pa.table({id_col: batch[id_col], "n_bpe_tokens": pa.array(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


def language_id(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """Stopword-profile language heuristic → (doc_id, lang_pred, lang_score).

    lang_score = stopword hit ratio of the winning language; "und" when no
    profile scores > 0."""
    profiles = {k: frozenset(v) for k, v in STOPWORDS.items()}

    def fn(batch: pa.Table) -> pa.Table:
        toks_arr = normalize.tokenize_string_array(batch[text_col].combine_chunks())
        langs, scores = [], []
        for toks in toks_arr.to_pylist():
            if not toks:
                langs.append("und")
                scores.append(0.0)
                continue
            ts = toks
            best, best_score = "und", 0.0
            for lang, sw in profiles.items():
                hits = sum(1 for t in ts if t in sw)
                score = hits / len(ts)
                if score > best_score:
                    best, best_score = lang, score
            langs.append(best if best_score > 0 else "und")
            scores.append(best_score)
        return pa.table(
            {
                id_col: batch[id_col],
                "lang_pred": pa.array(langs, pa.string()),
                "lang_score": pa.array(
                    np.asarray(scores, dtype=np.float32), pa.float32()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


def quality_scores(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """Heuristic quality features per doc:
       n_chars, n_tokens, mean_token_len, alpha_ratio (alphabetic tokens /
       tokens), stopword_ratio (en), quality flag (simple gate).
    Vectorized with Arrow kernels where possible."""
    en_sw = STOPWORDS["en"]

    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_col].combine_chunks()
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = normalize.tokenize_string_array(text)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        offsets = offsets - base
        flat = toks.values.slice(base, int(offsets[-1]))
        sizes = np.diff(offsets)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        is_alpha = pc.utf8_is_alpha(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = offsets[:-1]
        n_tok = sizes.astype(np.int64)
        safe = np.maximum(n_tok, 1)
        # trailing zero-token docs have start == len(flat), which reduceat
        # rejects; clamp (their rows are zeroed by the n_tok mask below)
        starts_c = np.minimum(starts, max(len(flat) - 1, 0))
        is_sw = (
            pc.is_in(flat, value_set=pa.array(sorted(en_sw)))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sum_len = (
            np.add.reduceat(tok_len, starts_c) if len(flat) else np.zeros_like(n_tok)
        )
        sum_alpha = (
            np.add.reduceat(is_alpha, starts_c) if len(flat) else np.zeros_like(n_tok)
        )
        sw_hits = (
            np.add.reduceat(is_sw, starts_c) if len(flat) else np.zeros_like(n_tok)
        )
        sum_len = np.where(n_tok > 0, sum_len, 0)
        sum_alpha = np.where(n_tok > 0, sum_alpha, 0)
        sw_hits = np.where(n_tok > 0, sw_hits, 0)
        mean_len = (sum_len / safe).astype(np.float32)
        alpha_ratio = (sum_alpha / safe).astype(np.float32)
        sw_ratio = (sw_hits / safe).astype(np.float32)
        ok = (n_tok >= 5) & (alpha_ratio >= 0.5) & (mean_len >= 2) & (mean_len <= 15)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                # integer-exact components (SQL-oracle-checkable; the f32
                # ratios below derive from these)
                "sum_token_len": pa.array(sum_len.astype(np.int64), pa.int64()),
                "n_alpha_tokens": pa.array(sum_alpha.astype(np.int64), pa.int64()),
                "n_stopword_hits": pa.array(sw_hits, pa.int64()),
                "mean_token_len": pa.array(mean_len, pa.float32()),
                "alpha_ratio": pa.array(alpha_ratio, pa.float32()),
                "stopword_ratio": pa.array(sw_ratio, pa.float32()),
                "quality_ok": pa.array(ok, pa.bool_()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


def fingerprints(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """Polynomial rolling-hash 64-bit document fingerprint over lowercased
    UTF-8 bytes: h = Σ b_i · P^(n-1-i) (mod 2^64), P = FNV prime.
    Vectorized: one shared power table per batch, per-doc dot products."""

    prime = np.uint64(1099511628211)

    def fn(batch: pa.Table) -> pa.Table:
        texts = [(t or "").lower().encode("utf-8") for t in batch[text_col].to_pylist()]
        max_len = max((len(t) for t in texts), default=0)
        pows = np.ones(max(max_len, 1), dtype=np.uint64)
        if max_len > 1:
            pows[1:] = prime
            np.cumprod(pows, out=pows)  # uint64 wraps silently
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            n = len(t)
            if n:
                b = np.frombuffer(t, dtype=np.uint8).astype(np.uint64)
                out[i] = np.sum(b * pows[:n][::-1], dtype=np.uint64)
        return pa.table(
            {id_col: batch[id_col], "fingerprint": pa.array(out, pa.uint64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


def md5_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """md5 hex-digest document fingerprint — the oracle-checkable variant
    (SQL twin: DuckDB ``md5(text)``); ``fingerprints`` stays the cheap
    rolling-hash production path."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col],
                "fp_md5": pa.array(
                    [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """Gopher-style within-document repetition filters (Rae et al. 2021
    §A1.1 "repetition removal", re-expressed over whitespace tokens):
    per doc,

    - ``n_tokens``: whitespace token count;
    - ``top_bigram_count``: occurrence count of the doc's most frequent
      bigram (0 when the doc has < 2 tokens) — the "top n-gram
      concentration" signal;
    - ``dup_trigram_tokens``: number of token positions covered by
      trigrams occurring >= 2 times within the doc (union of the
      3-token windows) — the "fraction of text in duplicated n-grams"
      signal;
    - ``dup_trigram_frac``: dup_trigram_tokens / n_tokens (0.0 for empty
      docs; a single IEEE division, so oracle-exact).

    Fully in-block and vectorized: tokens dictionary-encode to int32
    ids, bigrams/trigrams pack into int64 keys via two rounds of
    np.unique pair-encoding (exact — no hashing), per-doc runs found
    with one lexsort over (doc, key), and duplicated-window coverage is
    a +1/-1 difference-array range-mark + cumsum. No shuffle.
    """

    def fn(batch: pa.Table) -> pa.Table:
        toks = normalize.tokenize_string_array(
            batch[text_col].combine_chunks(), lowercase=False
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        offsets = offsets - base
        flat = toks.values.slice(base, int(offsets[-1]))
        sizes = np.diff(offsets)
        n_docs = len(sizes)
        L = int(offsets[-1])

        dict_arr = flat.dictionary_encode()
        tok_id = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)

        top_bi = np.zeros(n_docs, dtype=np.int64)
        dup_cov = np.zeros(n_docs, dtype=np.int64)

        # bigram keys at positions where the window stays inside one doc
        if L >= 2:
            in_doc2 = doc_of[:-1] == doc_of[1:]
            b_pos = np.flatnonzero(in_doc2)
            if len(b_pos):
                bi_key = (tok_id[b_pos] << np.int64(32)) | tok_id[b_pos + 1]
                bi_doc = doc_of[b_pos]
                # per-(doc, key) run lengths via lexsort
                order = np.lexsort((bi_key, bi_doc))
                kd, kk = bi_doc[order], bi_key[order]
                new = np.ones(len(kd), dtype=bool)
                new[1:] = (kd[1:] != kd[:-1]) | (kk[1:] != kk[:-1])
                run_id = np.cumsum(new) - 1
                run_len = np.bincount(run_id)
                run_doc = kd[new]
                np.maximum.at(top_bi, run_doc, run_len)

                # trigram keys: re-encode (bigram_uniq_id, next_tok)
                if L >= 3:
                    in_doc3 = in_doc2[:-1] & (doc_of[:-2] == doc_of[2:])
                    t_pos = np.flatnonzero(in_doc3)
                    if len(t_pos):
                        bi_at = (tok_id[t_pos] << np.int64(32)) | tok_id[t_pos + 1]
                        uniq_bi, bi_inv = np.unique(bi_at, return_inverse=True)
                        tri_key = (bi_inv.astype(np.int64) << np.int64(32)) | tok_id[
                            t_pos + 2
                        ]
                        tri_doc = doc_of[t_pos]
                        order3 = np.lexsort((tri_key, tri_doc))
                        td, tk = tri_doc[order3], tri_key[order3]
                        new3 = np.ones(len(td), dtype=bool)
                        new3[1:] = (td[1:] != td[:-1]) | (tk[1:] != tk[:-1])
                        run_id3 = np.cumsum(new3) - 1
                        run_len3 = np.bincount(run_id3)
                        dup_occ = run_len3[run_id3] >= 2  # per sorted occurrence
                        dpos = t_pos[order3][dup_occ]  # window start positions
                        if len(dpos):
                            # range-mark [p, p+3) then clip at doc ends;
                            # windows never cross docs, so a diff array over
                            # the flat position axis suffices
                            diff = np.zeros(L + 3, dtype=np.int64)
                            np.add.at(diff, dpos, 1)
                            np.add.at(diff, dpos + 3, -1)
                            covered = np.cumsum(diff[:L]) > 0
                            dup_cov = np.bincount(
                                doc_of[covered], minlength=n_docs
                            ).astype(np.int64)

        frac = np.divide(
            dup_cov, sizes, out=np.zeros(n_docs, dtype=np.float64),
            where=sizes > 0,
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(sizes, pa.int64()),
                "top_bigram_count": pa.array(top_bi, pa.int64()),
                "dup_trigram_tokens": pa.array(dup_cov, pa.int64()),
                "dup_trigram_frac": pa.array(frac, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


# C4/CCNet-style scrubbing patterns: PII regexes + a demo word blocklist.
# RE2 syntax on purpose — pyarrow's re2 and DuckDB's regexp_* use the
# same engine, so the SQL oracle replays replacements byte-for-byte.
REDACT_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?\d[\d() -]{6,}\d"),
    ("blocked", r"\b(?:customer|dup)\b"),
]


def redact_patterns(
    ds,
    patterns: list[tuple[str, str]] | None = None,
    mask: str = "[MASKED]",
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
):
    """PII / blocklist scrubbing (the C4-style cleanup stage): Dataset →
    (doc_id, text_redacted, n_<name> per pattern).

    Patterns apply SEQUENTIALLY (each sees the previous pattern's
    output); counts are per-pattern non-overlapping match counts at that
    step. Fully vectorized — one pyarrow re2 kernel call per pattern per
    batch, no Python per row. Stateless map_batches; no shuffle.
    """
    pats = REDACT_PATTERNS if patterns is None else patterns

    def fn(batch: pa.Table) -> pa.Table:
        cur = batch[text_col].combine_chunks()
        out = {id_col: batch[id_col]}
        counts = {}
        for name, pat in pats:
            counts[f"n_{name}"] = pc.count_substring_regex(cur, pat)
            cur = pc.replace_substring_regex(cur, pat, mask)
        out["text_redacted"] = cur
        for k, v in counts.items():
            out[k] = v.cast(pa.int64())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


def nfc_normalize_texts(ds, text_col: str = "text", id_col: str = "doc_id", **kw):
    """Unicode NFC normalization of a text column — the canonical-form
    step upstream of any byte-identical-text invariant (SURVEY.md §1.4):
    Dataset → (doc_id, text_nfc, changed).

    ASCII fast path: rows proven ASCII by one vectorized
    ``string_is_ascii`` kernel pass through untouched; only the
    non-ASCII minority (web text is overwhelmingly ASCII at the byte
    level) goes through ``unicodedata.normalize`` (CPython's C
    implementation, which matches DuckDB's ``nfc_normalize`` exactly —
    pyarrow's own utf8_normalize does not compose and is NOT used).
    """
    import unicodedata

    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_col].combine_chunks()
        is_ascii = pc.string_is_ascii(text).to_numpy(zero_copy_only=False)
        vals = text.to_pylist()
        out = [
            v if a or v is None else unicodedata.normalize("NFC", v)
            for v, a in zip(vals, is_ascii)
        ]
        changed = pa.array(
            [o is not None and o != v for o, v in zip(out, vals)], pa.bool_()
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "text_nfc": pa.array(out, pa.string()),
                "changed": changed,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", **kw)


def json_extract_int(
    ds,
    col: str,
    key: str,
    out_col: str | None = None,
    **map_kwargs,
):
    """Semi-structured column access (X115): extract an integer field
    from a JSON-string column with ONE RE2 kernel per batch — the
    schema-on-read fast path for flat numeric payloads (event props,
    telemetry blobs). Rows where the key is absent or non-integer get
    NULL, matching SQL ``json_extract`` semantics for the same shapes.

    This is deliberately NOT a JSON parser: at corpus scale a
    ``json.loads`` per row is the hot-path Python loop this engine
    bans. For nested/escaped payloads, do targeted extraction with a
    regex per field like this one, or a dedicated actor-pool stage —
    and keep the blob column pruned out of every read that doesn't
    need it."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
        raise ValueError("json_extract_int: key must be a simple identifier")
    out = out_col or key
    # capture the WHOLE numeric token (incl. any fraction/exponent tail),
    # then accept only pure integers — RE2 has no lookahead, and an
    # integer-prefix match would silently truncate 12.5 → 12
    pat = f'"{key}"\\s*:\\s*(?P<v>-?\\d+(?:[.eE][-+0-9.eE]*)?)'

    def fn(batch: pa.Table) -> pa.Table:
        s = batch[col].combine_chunks().cast(pa.string())
        ex = pc.extract_regex(s, pat)
        v = pc.struct_field(ex, "v")
        is_int = pc.match_substring_regex(v, r"^-?\d+$")
        v = pc.if_else(
            pc.coalesce(is_int, False), v, pa.scalar(None, pa.string())
        )
        return batch.append_column(out, pc.cast(v, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)


def corpus_entropy_stats(ds, text_col: str = "text"):
    """Corpus diversity diagnostics (X123): unigram Shannon entropy and
    type-token ratio from the GLOBAL token-frequency distribution.
    Returns pa.Table(n_tokens, n_types, sum_clnc_micro) — one row;
    H = ln(N) − sum_clnc/N derives exactly from the three values.

    Scale shape: the exchange moves DISTINCT tokens only (in-block
    count combine → two-phase aggregate); the Σ c·ln(c) term is fixed
    to integer micro-units PER DISTINCT TOKEN before the final integer
    sum, so the result is bit-stable under any accumulation order and
    exactly re-expressible in SQL.
    """
    from phrasekit_ray.stages.agg import hash_aggregate

    def toks(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern(
                pc.fill_null(batch[text_col].combine_chunks(), ""), " "
            )
        )
        t = pa.table({"tok": flat}).group_by(["tok"]).aggregate(
            [([], "count_all")]
        )
        return t.select(["tok", "count_all"]).rename_columns(["tok", "n"])

    counts = hash_aggregate(
        ds.select_columns([text_col]).map_batches(
            toks, batch_format="pyarrow"
        ),
        ["tok"],
        [("n", "sum")],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        c = batch["n"].combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False
        )
        term = np.where(c > 0, c * np.log(c), 0.0)
        micro = np.where(
            term >= 0, np.floor(term * 1e6 + 0.5), np.ceil(term * 1e6 - 0.5)
        ).astype(np.int64)
        return pa.table(
            {
                "n_tokens": pa.array(
                    [int(c.sum())], pa.int64()
                ),
                "n_types": pa.array([len(c)], pa.int64()),
                "sum_clnc_micro": pa.array([int(micro.sum())], pa.int64()),
            }
        )

    import ray

    parts = [
        t
        for t in ray.get(
            counts.map_batches(finalize, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_columns and t.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "n_tokens": pa.array([0], pa.int64()),
                "n_types": pa.array([0], pa.int64()),
                "sum_clnc_micro": pa.array([0], pa.int64()),
            }
        )
    allp = pa.concat_tables(parts, promote_options="default")
    return pa.table(
        {
            "n_tokens": pa.array([int(pc.sum(allp["n_tokens"]).as_py())], pa.int64()),
            "n_types": pa.array([int(pc.sum(allp["n_types"]).as_py())], pa.int64()),
            "sum_clnc_micro": pa.array(
                [int(pc.sum(allp["sum_clnc_micro"]).as_py())], pa.int64()
            ),
        }
    )


def dsir_weights(
    ds,
    target_lang: str = "en",
    buckets: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    **kw,
):
    """DSIR-style importance weights (Xie et al. 2023 shape): hashed
    unigram bag-of-words, a unigram LM of the TARGET slice (lang ==
    ``target_lang``) vs the RAW corpus, per-document importance
    log-weight Σ_tok [ln p̂_target(b) − ln p̂_raw(b)] over the token's
    hash bucket b, add-1 smoothed over ``buckets`` buckets.

    Exactness: each ln is rounded to integer MICRO-nats independently
    (the q_lm_nll technique), so the per-doc sum is an order-independent
    int64 and the DuckDB twin (md5_number_upper % buckets) lands on the
    identical value.

    Scale shape: pass 1 streams the corpus once through a two-phase
    hash_aggregate keyed on bucket (≤ ``buckets`` rows out); the
    (bucket → weight) table is one ray.put broadcast of 8·buckets bytes;
    pass 2 streams the corpus once more, one int64 gather + segment-sum
    per batch. No shuffle wider than the bucket table.
    """
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.dedup import _token_hashes
    from phrasekit_ray.stages.lm import _round_away_np
    from phrasekit_ray.stages.score import _get_broadcast

    B = int(buckets)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        toks = normalize.tokenize_string_array(
            batch[text_col].combine_chunks(), lowercase=False
        )
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        b = (_token_hashes(toks.values) % np.uint64(B)).astype(np.int64)
        langs = batch[lang_col].to_pylist()
        is_tgt = np.repeat(
            np.fromiter((1 if l == target_lang else 0 for l in langs),
                        np.int64, count=len(langs)),
            np.diff(off),
        )
        order = np.argsort(b, kind="stable")
        bs = b[order]
        seg = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        return pa.table(
            {
                "bucket": pa.array(bs[seg], pa.int64()),
                "c_raw": pa.array(
                    np.diff(np.append(seg, len(bs))).astype(np.int64), pa.int64()
                ),
                "c_tgt": pa.array(
                    np.add.reduceat(is_tgt[order], seg)
                    if len(seg)
                    else np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    agg = pa.concat_tables(
        list(
            hash_aggregate(
                ds.map_batches(bucket_counts, batch_format="pyarrow"),
                ["bucket"],
                [("c_raw", "sum"), ("c_tgt", "sum")],
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="default",
    )
    cr = np.zeros(B, np.int64)
    ct = np.zeros(B, np.int64)
    bk = agg["bucket"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    cr[bk] = agg["c_raw"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    ct[bk] = agg["c_tgt"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    nr, nt = int(cr.sum()), int(ct.sum())
    lp_t = _round_away_np(
        np.log((ct + 1.0) / np.float64(nt + B)) * 1e6
    ).astype(np.int64)
    lp_r = _round_away_np(
        np.log((cr + 1.0) / np.float64(nr + B)) * 1e6
    ).astype(np.int64)
    w_ref = ray.put(lp_t - lp_r)

    def per_doc(batch: pa.Table) -> pa.Table:
        w = _get_broadcast(w_ref)
        toks = normalize.tokenize_string_array(
            batch[text_col].combine_chunks(), lowercase=False
        )
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        b = (_token_hashes(toks.values) % np.uint64(B)).astype(np.int64)
        tok_w = w[b]
        sums = np.add.reduceat(
            np.concatenate([tok_w, [0]]), off[:-1] - off[0]
        ) if len(off) > 1 else np.zeros(0, np.int64)
        sums = np.where(np.diff(off) == 0, 0, sums)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_toks": pa.array(np.diff(off).astype(np.int64), pa.int64()),
                "dsir_micro": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(per_doc, batch_format="pyarrow", **kw)


def ngram_novelty(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """Per-document n-gram novelty (the Heaps-law vocabulary-growth
    curve, bigram edition): for every distinct within-doc-adjacent
    bigram, its OWNER is the minimum doc_id containing it; a document's
    novelty is the number of bigram types it owns — the corpus-level
    "how much genuinely new text does each document add" diagnostic
    that complements the dup-n-gram signal (X101).

    Scale shape: one vectorized bigram explode (shift+mask on list
    offsets, doc ids attached by np.repeat), ONE two-phase MIN
    aggregate keyed by the gram string (duplicates collapse in-block
    first), ONE two-phase count by owner doc, then a zero-row union so
    documents owning nothing still report 0 — no driver state at any
    point.

    Returns Dataset(doc_id, new_ngrams).
    """
    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate
    from phrasekit_ray.stages.lm import _split_space

    def explode(b: pa.Table) -> pa.Table:
        toks = _split_space(b[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        n = len(flat)
        dl = np.diff(off)
        n_big = np.maximum(dl - 1, 0)
        ids = b[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if n < 2 or int(n_big.sum()) == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        is_last = np.zeros(n, dtype=bool)
        ends = off[1:][off[1:] > 0] - 1
        is_last[ends] = True
        keep = ~is_last[:-1]
        w1 = flat.slice(0, n - 1).filter(pa.array(keep))
        w2 = flat.slice(1, n - 1).filter(pa.array(keep))
        return pa.table(
            {
                "g": pc.binary_join_element_wise(w1, w2, " "),
                "doc_id": pa.array(np.repeat(ids, n_big), pa.int64()),
            }
        )

    owners = hash_aggregate(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["g"],
        [("doc_id", "min")],
        num_partitions=num_partitions,
    )
    nov = grouped_count(
        owners, "doc_id", count_col="new_ngrams",
        num_partitions=num_partitions,
    )
    zeros = docs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "new_ngrams": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    return hash_aggregate(
        nov.union(zeros), ["doc_id"], [("new_ngrams", "sum")],
        num_partitions=num_partitions,
    )


def winnowed_fingerprints(
    ds,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS plagiarism-detection selector): hash every
    token k-gram (engine-wide md5-lower-8-bytes-LE convention ==
    DuckDB ``md5_number_upper``), slide a ``window``-wide window over
    each doc's k-gram hash sequence and keep the window MINIMUM, ties to
    the RIGHTMOST position; the selected (doc, pos, hash) set is the
    fingerprint index. Guarantee: any shared substring of at least
    window + k − 1 tokens yields a shared fingerprint — position-aware
    coverage MinHash (X2) cannot promise. Docs with fewer than
    ``window`` k-grams contribute their single whole-doc minimum.

    Fully vectorized per batch: per-UNIQUE-k-gram md5, one
    sliding_window_view min with a reversed-argmin rightmost-tie pick,
    reduceat for the short-doc path; no per-row Python. Returns
    Dataset(doc_id, pos, h62) with 1-based k-gram positions and
    h62 = hash mod 2⁶² (int64-safe, same modulo in the SQL twin).
    """
    import hashlib

    if k < 1 or window < 1:
        raise ValueError("winnowed_fingerprints: k and window must be >= 1")
    w = int(window)

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "h62": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(off[-1]))
        sizes = np.diff(off)
        L = int(off[-1])
        m = L - k + 1
        if m <= 0:
            return empty
        doc_ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        doc_index = np.repeat(np.arange(len(sizes)), sizes)
        parts = [flat.slice(j, m) for j in range(k)]
        joined = pc.binary_join_element_wise(*parts, " ")
        valid = doc_index[:m] == doc_index[k - 1 :]
        if not valid.any():
            return empty
        joined = joined.filter(pa.array(valid))
        D = doc_index[:m][valid]
        enc = pc.dictionary_encode(joined)
        uniq = enc.dictionary.to_pylist()
        hu = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                for s in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        H = hu[enc.indices.to_numpy(zero_copy_only=False)]
        M = len(H)
        seg_start_mask = np.concatenate(([True], D[1:] != D[:-1]))
        seg_starts = np.flatnonzero(seg_start_mask)
        seg_id = np.cumsum(seg_start_mask) - 1
        P = np.arange(M, dtype=np.int64) - seg_starts[seg_id]  # 0-based

        picks = []
        if M >= w:
            hv = np.lib.stride_tricks.sliding_window_view(H, w)
            ok = D[: M - w + 1] == D[w - 1 :]
            if ok.any():
                arg = (w - 1) - np.argmin(hv[ok][:, ::-1], axis=1)
                picks.append(np.flatnonzero(ok) + arg)
        # short docs (fewer than w k-grams): single whole-doc window
        seg_sizes = np.diff(np.concatenate((seg_starts, [M])))
        short = seg_sizes < w
        if short.any():
            mins = np.minimum.reduceat(H, seg_starts)
            at_min = H == mins[seg_id]
            pos_or = np.where(at_min, np.arange(M, dtype=np.int64), -1)
            rmost = np.maximum.reduceat(pos_or, seg_starts)
            picks.append(rmost[short])
        if not picks:
            return empty
        sel = np.unique(np.concatenate(picks))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[D[sel]], pa.int64()),
                "pos": pa.array(P[sel] + 1, pa.int64()),
                "h62": pa.array(
                    (H[sel] % np.uint64(1 << 62)).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
