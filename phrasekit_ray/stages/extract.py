"""Extract stage: pages → tokenized documents (stateless map_batches).

Reference analog: the corpus reader + per-boundary lowercase
(phrasekit_mine.rs:109-153, phrasekit_tag.rs:128-155); the reference takes
pre-tokenized JSONL, we take Common-Crawl-style pages and define the
text→tokens mapping (SURVEY.md §1.4, M1/M2). The per-row invariant —
byte-identical extracted/normalized text per url — lives here.

Scale notes: batch_format="pyarrow" end to end (zero-copy from the object
store); the `html` binary column is dropped in the FIRST transform so wide
binary blocks never flow past this stage; html parsing only runs for rows
whose `text` is null.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.core import normalize


def _extract_batch(
    batch: pa.Table, id_col: str, lang_allow: tuple[str, ...] | None
) -> pa.Table:
    if lang_allow is not None and "lang" in batch.column_names:
        mask = pc.is_in(batch["lang"], value_set=pa.array(lang_allow))
        batch = batch.filter(mask)
    text = batch["text"].combine_chunks() if "text" in batch.column_names else None
    if text is None:
        html = batch["html"].combine_chunks()
        text = pa.array(
            [normalize.extract_text_from_html(h or b"") for h in html.to_pylist()],
            type=pa.string(),
        )
    elif text.null_count and "html" in batch.column_names:
        # Fill missing text from html: materialize ONLY the null-text rows
        # (html blobs are wide — touching the full column per batch is the
        # cost this stage exists to avoid), then patch them back in place.
        null_mask = pc.is_null(text)
        null_idx = pc.indices_nonzero(null_mask)
        null_htmls = batch["html"].take(null_idx).to_pylist()
        extracted = pa.array(
            [normalize.extract_text_from_html(h or b"") for h in null_htmls],
            type=pa.string(),
        )
        # replace_with_mask consumes replacements in mask order
        text = pc.replace_with_mask(text, null_mask, extracted)
    tokens = normalize.tokenize_string_array(text)
    out = {
        "doc_id": batch[id_col],
        "text": text,
        "tokens": tokens,
    }
    if "lang" in batch.column_names:
        out["lang"] = batch["lang"]
    return pa.table(out)


def extract_tokens(
    ds,
    id_col: str = "url",
    lang_allow: tuple[str, ...] | None = None,
    keep_text: bool = False,
    **map_kwargs,
):
    """pages Dataset → Dataset(doc_id, [text], tokens, [lang]).

    ``lang_allow``: optional language whitelist filter applied inside the
    same batch pass (vectorized predicate beats ds.filter(row_fn)).
    ``keep_text`` retains the extracted text column (needed when asserting
    the byte-identical-per-url invariant downstream).
    """
    def fn(batch: pa.Table) -> pa.Table:
        out = _extract_batch(batch, id_col, lang_allow)
        if not keep_text:
            out = out.drop_columns(["text"])
        return out

    return ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)


def tokenize_documents(ds, text_col: str = "text", id_col: str = "doc_id", **map_kwargs):
    """documents-table variant: (doc_id, text, ...) → (doc_id, tokens).

    Tokenization = lowercase whitespace split (TESTDATA.md / FIXTURES.md §9)
    — this is the mapping the DuckDB oracle mirrors in SQL.
    """
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch[id_col],
                "tokens": normalize.tokenize_string_array(
                    batch[text_col].combine_chunks()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)


def host_of(urls) -> pa.Array:
    """Vectorized URL → host (one RE2 kernel); null where no scheme/host."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ex = pc.extract_regex(urls, r"^[Hh][Tt][Tt][Pp][Ss]?://(?P<host>[^/?#]+)")
    return pc.struct_field(ex, "host")


def extract_links(
    ds,
    html_col: str = "html",
    url_col: str = "url",
    with_text: bool = False,
    **map_kwargs,
):
    """pages → (src_url, href): every absolute http(s) outlink per page.

    The web-graph half of KG construction: page html → outlink edges
    (feeds host-level link-graph aggregation and pagerank). Fully
    vectorized Arrow kernels — split on ``href="``, per-candidate close
    on ``"``, absolute-scheme filter, fragment strip — no Python per row
    and no HTML parser dependency (tolerant scan, the Common-Crawl
    convention for link extraction at scale). Relative, fragment-only,
    mailto: and unclosed hrefs are dropped; ``#fragment`` suffixes are
    stripped from kept links. html is large_string-cast so multi-GB
    binary batches can't overflow 32-bit list offsets.

    ``with_text=True`` adds an ``anchor_text`` column — the text between
    the anchor's first ``>`` and the next ``<`` (tolerant of extra
    attributes after the href) — the classic entity-alias evidence
    source for KG construction.
    """
    import numpy as np

    cols = ["src_url", "href"] + (["anchor_text"] if with_text else [])
    empty = pa.table({c: pa.array([], pa.string()) for c in cols})

    def _to_str(arr) -> pa.Array:
        """binary → string, exact cast on the (overwhelmingly common)
        valid-UTF8 path; lossy per-row decode ONLY when a batch's kept
        hrefs/anchors contain invalid bytes (short strings, rare)."""
        try:
            return arr.cast(pa.string())
        except pa.ArrowInvalid:
            return pa.array(
                [
                    None if v is None else v.decode("utf-8", "replace")
                    for v in arr.to_pylist()
                ],
                pa.string(),
            )

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        # stay in BINARY: real crawl payloads contain non-UTF8 bytes, a
        # validating string cast would abort the task (tolerant-scan
        # contract); only the final short href/anchor columns decode
        html = pc.fill_null(
            pc.cast(batch[html_col].combine_chunks(), pa.large_binary()),
            b"",
        )
        parts = pc.split_pattern(html, b'href="')
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        total = int(lens.sum())
        n_cand = total - batch.num_rows
        if n_cand <= 0:
            return empty
        # drop the first child of every list (text before the first href)
        mask = np.ones(total, dtype=bool)
        mask[np.cumsum(lens) - lens] = False
        cand = pc.list_flatten(parts).filter(pa.array(mask))
        src_idx = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), lens - 1
        )
        # href = candidate text up to the closing quote; unclosed → drop
        split2 = pc.split_pattern(cand, b'"', max_splits=1)
        closed = pc.greater(pc.list_value_length(split2), 1)
        href = pc.list_element(split2, 0)
        absolute = pc.or_(
            pc.starts_with(href, b"https://"),
            pc.starts_with(href, b"http://"),
        )
        keep = pc.and_(closed, absolute)
        href_kept = href.filter(keep)
        if len(href_kept) == 0:
            return empty
        nofrag = pc.list_element(
            pc.split_pattern(href_kept, b"#", max_splits=1), 0
        )
        kn = keep.to_numpy(zero_copy_only=False)
        src = batch[url_col].combine_chunks().take(pa.array(src_idx[kn]))
        out = {
            "src_url": src.cast(pa.string()),
            "href": _to_str(nofrag),
        }
        if with_text:
            # text between the tag's closing '>' and the next '<';
            # filter the list array BEFORE list_element (keep ⊆ closed,
            # so every surviving list is 2-long — an unclosed-quote
            # candidate would otherwise make index 1 out of bounds);
            # sentinel-append keeps the >/< splits 2-long the same way
            tail = pc.list_element(split2.filter(keep), 1)
            sgt = pa.scalar(b">", pa.large_binary())
            slt = pa.scalar(b"<", pa.large_binary())
            sep = pa.scalar(b"", pa.large_binary())
            rest = pc.list_element(
                pc.split_pattern(
                    pc.binary_join_element_wise(tail, sgt, sep),
                    b">",
                    max_splits=1,
                ),
                1,
            )
            body = pc.list_element(
                pc.split_pattern(
                    pc.binary_join_element_wise(rest, slt, sep),
                    b"<",
                    max_splits=1,
                ),
                0,
            )
            out["anchor_text"] = _to_str(body)
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)


def host_edges(links_ds, **map_kwargs):
    """(src_url, href) links → weighted host-level edge table
    Dataset(src_host, dst_host, n): the one shared definition of the
    links→host-graph step (CLI, host-graph query and host-pagerank all
    consume this, so edge semantics cannot diverge)."""
    import numpy as np

    from phrasekit_ray.stages.agg import hash_aggregate

    def hosts(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_host": host_of(b["src_url"]),
                "dst_host": host_of(b["href"]),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    return hash_aggregate(
        links_ds.map_batches(hosts, batch_format="pyarrow", **map_kwargs),
        ["src_host", "dst_host"],
        [("n", "sum")],
    )


def parse_urls(ds, url_col: str = "url", **map_kwargs):
    """pages → + (host, section): vectorized URL decomposition with one
    RE2 ``extract_regex`` kernel per batch (scheme://host/first-path-
    segment; rows that don't parse get empty strings). The Common-Crawl-
    style groupwork key for per-site aggregation — no Python per row."""
    import pyarrow.compute as pc

    pat = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/]+)(?:/(?P<seg>[^/?#]*))?"

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].combine_chunks()
        ex = pc.extract_regex(urls, pat)
        host = ex.field("host")
        seg = ex.field("seg")
        # non-matching rows → null struct → fill empty
        host = pc.coalesce(host, "")
        seg = pc.coalesce(seg, "")
        out = {c: batch[c] for c in batch.column_names}
        out["host"] = host
        out["section"] = seg
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canon_url", **map_kwargs):
    """URL canonicalization (X118) — the dedup-prep normalizer every
    web pipeline runs before URL-keyed joins. Spec (applied in order,
    all vectorized RE2/slice kernels, no Python per row):

      1. strip ``#fragment``
      2. lowercase scheme and host (path/query untouched)
      3. drop default ports (``:80`` for http, ``:443`` for https)
      4. drop ``utm_*`` tracking params — scoped to the QUERY part only
         (an ``&`` or ``utm_`` in the path is data, not a separator),
         re-fixing the leading ``?`` when the first param was removed
      5. collapse a bare trailing ``/`` path to empty

    Rows without a ``scheme://host`` head pass through unchanged.
    """
    head_pat = r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"

    def fn(batch: pa.Table) -> pa.Table:
        u = batch[url_col].combine_chunks().cast(pa.string())
        # 1. fragment
        u1 = pc.list_element(pc.split_pattern(u, "#", max_splits=1), 0)
        ex = pc.extract_regex(u1, head_pat)
        head = pc.struct_field(ex, "head")
        rest = pc.struct_field(ex, "rest")
        matched = pc.is_valid(head)
        head = pc.coalesce(head, "")
        rest = pc.coalesce(rest, "")
        # 2. lowercase scheme+host
        head = pc.utf8_lower(head)
        # 3. default ports
        head = pc.replace_substring_regex(head, r"^http://(.*):80$", r"http://\1")
        head = pc.replace_substring_regex(head, r"^https://(.*):443$", r"https://\1")
        # 4. utm params, QUERY part only (sentinel-append keeps the
        # '?' split 2-long): drop '&utm_...' params, collapse a removed
        # first param's separator, drop an all-utm query entirely
        sq = pa.scalar("?", pa.string())
        sep = pa.scalar("", pa.string())
        qsplit = pc.split_pattern(
            pc.binary_join_element_wise(rest, sq, sep), "?", max_splits=1
        )
        path = pc.list_element(qsplit, 0)
        qtail = pc.list_element(qsplit, 1)  # query + sentinel '?'
        had_q = pc.not_equal(qtail, "")
        query = pc.if_else(
            had_q,
            pc.binary_join_element_wise(
                pa.array(["?"] * len(path)),
                pc.replace_substring_regex(qtail, r"\?$", ""),
                "",
            ),
            qtail,
        )
        query = pc.replace_substring_regex(query, r"&utm_[^&]*", "")
        query = pc.replace_substring_regex(query, r"^\?utm_[^&]*&", "?")
        query = pc.replace_substring_regex(query, r"^\?utm_[^&]*$", "")
        rest = pc.binary_join_element_wise(path, query, "")
        # 5. bare trailing slash
        rest = pc.replace_substring_regex(rest, r"^/$", "")
        canon = pc.if_else(
            matched,
            pc.binary_join_element_wise(head, rest, ""),
            u1,
        )
        return batch.append_column(out_col, canon)

    return ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)
