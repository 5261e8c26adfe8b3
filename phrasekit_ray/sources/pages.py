"""Pages source: Common-Crawl-style Parquet pages and deterministic synthesis.

Pages schema (BASELINE.json input_hint):
    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

``synthesize_pages_table`` builds the deterministic fixture corpus of
FIXTURES.md §1 (the reference's 10-doc demo corpus from
examples/end_to_end_demo.rb:22-33 plus the 25-doc product corpus from
examples/mining/corpus.jsonl, replicated with seeded shuffling, plus
Unicode probe rows). ``pages_from_documents`` derives a pages table of the
exact hinted shape from the driver's read-only ``documents`` testdata table
(TESTDATA.md) so benchmarks/oracle queries run over real files.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

EPOCH_US = 1696896000_000_000  # 2023-10-10T00:00:00Z, fixed (deterministic)

# reference examples/end_to_end_demo.rb:22-33 (10 docs)
DEMO_CORPUS: list[tuple[str, str]] = [
    ("doc_1", "the rat cdk10 oligo was used in the experiment"),
    ("doc_2", "add protein assay buffer to the sample"),
    ("doc_3", "prepare lysis buffer according to protocol"),
    ("doc_4", "western blot analysis was performed"),
    ("doc_5", "the master mix contains rat cdk10 oligo"),
    ("doc_6", "protein assay buffer preparation is critical"),
    ("doc_7", "rat cdk10 protein expression levels"),
    ("doc_8", "for the western blot procedure"),
    ("doc_9", "master mix preparation guidelines"),
    ("doc_10", "in the lysis buffer add reagent"),
]

# reference examples/mining/corpus.jsonl (25 docs)
PRODUCT_CORPUS: list[tuple[str, str]] = [
    ("prod_001", "rat cdk10 oligo design kit for molecular biology"),
    ("prod_002", "mouse cdk10 protein assay buffer solution"),
    ("prod_003", "lysis buffer for cell culture applications"),
    ("prod_004", "pcr master mix v2 high fidelity dna polymerase"),
    ("prod_005", "rat cdk10 oligo probe set fluorescent label"),
    ("prod_006", "western blot transfer buffer 10x concentrate"),
    ("prod_007", "antibody purification kit protein a column"),
    ("prod_008", "cell culture medium dmem high glucose"),
    ("prod_009", "lysis buffer ripa formulation protease inhibitor"),
    ("prod_010", "dna extraction kit blood tissue samples"),
    ("prod_011", "rat cdk10 antibody monoclonal western blot"),
    ("prod_012", "pcr master mix standard taq polymerase"),
    ("prod_013", "protein assay kit bca method colorimetric"),
    ("prod_014", "cell culture flask t75 vented cap"),
    ("prod_015", "lysis buffer cytoplasmic extraction reagent"),
    ("prod_016", "mouse cdk10 elisa kit quantitative analysis"),
    ("prod_017", "western blot detection reagent chemiluminescent substrate"),
    ("prod_018", "dna ladder 100bp molecular weight marker"),
    ("prod_019", "antibody dilution buffer for immunofluorescence"),
    ("prod_020", "protein assay buffer compatible detergent free"),
    ("prod_021", "rat cdk10 recombinant protein e coli"),
    ("prod_022", "pcr tubes thin wall 0.2ml capacity"),
    ("prod_023", "cell lysis buffer mammalian cells gentle"),
    ("prod_024", "mouse cdk10 western blot positive control"),
    ("prod_025", "protein gel stain coomassie blue solution"),
]

# reference examples/demo_output/background_phrases.jsonl (5 rows)
DEMO_BACKGROUND: list[tuple[list[str], int]] = [
    (["for", "the"], 50000),
    (["in", "the"], 30000),
    (["to", "the"], 25000),
    (["lysis", "buffer"], 8),
    (["western", "blot"], 5),
]

# Unicode lowercase-parity probe rows (SURVEY.md §1.4, FIXTURES.md §1)
UNICODE_PROBES: list[tuple[str, str]] = [
    ("uni_1", "İstanbul STRASSE experiment"),
    ("uni_2", "ß protein assay"),
    ("uni_3", "ΑΣ western ΣΙΣΥΦΟΣ blot"),
    ("uni_4", "nbsp adjacent words here"),
]


def splitmix17(x: np.ndarray | int, seed: int = 17) -> np.ndarray | np.uint64:
    """The repo's shared seeded splitmix-style 64-bit hash (identical to
    the stratified-sample / weighted-sample rank hash and its DuckDB
    32-bit-split SQL twin): h1 = (x+seed)*0x9E3779B97F4A7C15 mod 2^64;
    (h1 ^ h1>>31)*0xBF58476D1CE4E5B9 mod 2^64."""
    h = (np.uint64(x) if np.isscalar(x) else x.astype(np.uint64)) + np.uint64(
        seed
    )
    with np.errstate(over="ignore"):
        h = h * np.uint64(0x9E3779B97F4A7C15)
        return (h ^ (h >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)


# deterministic outlink scheme for with_links pages (X104 link graph):
# every page embeds 1 + (splitmix17(8*doc_id+7) % 3) absolute outlinks;
# link slot j (1-based) targets virtual doc t = splitmix17(8*doc_id+j)
# % 100003 on host h{t % 16}.example.org. Slot 1 carries a "#top"
# fragment the extractor must strip. Three junk anchors (relative,
# fragment-only, mailto) must be dropped by extraction; ONLY those junk
# anchors have empty bodies. Real outlink anchors carry "e{t % 50}"
# alias bodies (the X117 anchor-text oracle depends on them), so page
# text extracted from with_links html INCLUDES those alias tokens and
# is NOT byte-identical to the bare text column (ADVICE r4).
_LINK_MOD = 100003
_JUNK_ANCHORS = (
    '<a href="/relative/path"></a><a href="#frag"></a>'
    '<a href="mailto:ab@example.org"></a>'
)


def _outlink_anchors(doc_id: np.ndarray) -> list[str]:
    """Per-row anchor-tag strings for the deterministic outlink scheme."""
    d = doc_id.astype(np.uint64)
    n_links = 1 + (splitmix17(d * np.uint64(8) + np.uint64(7)) % np.uint64(3))
    targets = [
        (splitmix17(d * np.uint64(8) + np.uint64(j)) % np.uint64(_LINK_MOD))
        for j in (1, 2, 3)
    ]
    out = []
    for i in range(len(d)):
        parts = [_JUNK_ANCHORS]
        for j in range(int(n_links[i])):
            t = int(targets[j][i])
            frag = "#top" if j == 0 else ""
            # anchor text e{t % 50}: deterministic alias evidence for the
            # anchor-text extraction oracle (X117)
            parts.append(
                f'<a href="https://h{t % 16}.example.org/doc/{t}{frag}">'
                f"e{t % 50}</a>"
            )
        out.append("".join(parts))
    return out


def _page_row(i: int, doc_id: str, text: str, lang: str = "en") -> dict:
    html = f"<html><body><p>{text}</p></body></html>".encode("utf-8")
    return {
        "url": f"https://example.org/{doc_id.split('_')[0]}/{doc_id}",
        "warc_ts": EPOCH_US + i * 1_000_000,
        "html": html,
        "text": text,
        "lang": lang,
    }


def synthesize_pages_table(
    repeat: int = 1, seed: int = 42, include_probes: bool = True
) -> pa.Table:
    """Deterministic pages fixture table (FIXTURES.md §1).

    ``repeat`` > 1 replicates the base corpus with seeded shuffling and
    unique urls (suffix) to reach target row counts for scale tests.
    """
    base = list(DEMO_CORPUS) + list(PRODUCT_CORPUS)
    rows: list[dict] = []
    rng = random.Random(seed)
    i = 0
    for r in range(repeat):
        docs = list(base)
        if r > 0:
            rng.shuffle(docs)
        for doc_id, text in docs:
            rid = doc_id if r == 0 else f"{doc_id}_r{r}"
            rows.append(_page_row(i, rid, text))
            i += 1
    if include_probes:
        for doc_id, text in UNICODE_PROBES:
            rows.append(_page_row(i, doc_id, text, lang="und"))
            i += 1
        # a few non-en rows for lang-filter tests
        rows.append(_page_row(i, "de_1", "das protein assay buffer", "de"))
        i += 1
    cols = {k: [r[k] for r in rows] for k in ("url", "warc_ts", "html", "text", "lang")}
    cols["warc_ts"] = pa.array(
        np.array(cols["warc_ts"], dtype="int64"), type=pa.timestamp("us")
    )
    return pa.table(cols, schema=PAGES_SCHEMA)


def background_table(which: str = "demo") -> pa.Table:
    """The reference's background phrase corpora as Arrow tables."""
    if which != "demo":
        raise ValueError(f"unknown background corpus {which!r} (only 'demo' exists)")
    rows = DEMO_BACKGROUND
    return pa.table(
        {
            "ngram": [" ".join(t) for t, _ in rows],
            "count": pa.array([c for _, c in rows], type=pa.uint32()),
        }
    )


def read_pages(path: str, columns: list[str] | None = None, **kwargs):
    """Column-pruned parquet read of a pages table (prune at the read:
    never load `html` for a text-only pipeline)."""
    import ray

    return ray.data.read_parquet(path, columns=columns, **kwargs)


def pages_from_documents(
    sf_dir: str,
    with_html: bool = False,
    repeat: int = 1,
    override_num_blocks: int | None = None,
    with_links: bool = False,
):
    """Derive a pages Dataset of the hinted shape from the driver's
    ``documents`` testdata table, deterministically (doc_id → url/warc_ts).

    ``with_html=False`` skips materializing the html column (the text
    column is authoritative for these rows) — at 100 TB you never carry
    a binary column you don't read.

    ``repeat`` > 1 replicates every row in-stream with distinct urls
    (suffix ``#r{i}``) — a deterministic scale-up knob for benchmarks; no
    extra storage reads, counts scale exactly ×repeat.

    ``with_links=True`` (implies html) embeds the deterministic outlink
    anchors of ``_outlink_anchors`` plus junk anchors, and moves the
    source into the url HOST (``https://{source}.example.org/{doc_id}``)
    so host-level link-graph queries see a non-degenerate src side.
    """
    import ray

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy()
        text = batch["text"]
        src = batch["source"]
        if with_links:
            urls = pa.array(
                [
                    f"https://{s}.example.org/{d}"
                    for s, d in zip(src.to_pylist(), doc_id)
                ]
            )
        else:
            urls = pa.array(
                [f"https://example.org/{s}/{d}" for s, d in zip(src.to_pylist(), doc_id)]
            )
        ts = pa.array(EPOCH_US + doc_id * 1_000_000, type=pa.timestamp("us"))
        cols: dict = {"url": urls, "warc_ts": ts}
        if with_links:
            anchors = _outlink_anchors(doc_id)
            cols["html"] = pa.array(
                [
                    f"<html><body><p>{t}</p>{a}</body></html>".encode()
                    for t, a in zip(text.to_pylist(), anchors)
                ],
                type=pa.binary(),
            )
        elif with_html:
            cols["html"] = pa.array(
                [
                    f"<html><body><p>{t}</p></body></html>".encode()
                    for t in text.to_pylist()
                ],
                type=pa.binary(),
            )
        else:
            cols["html"] = pa.nulls(len(batch), pa.binary())
        cols["text"] = text
        cols["lang"] = batch["lang"]
        return pa.table(cols)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        # task parallelism downstream is one task per block: a small input
        # file must be split into enough blocks to saturate the cluster
        override_num_blocks=override_num_blocks,
    )
    pages = ds.map_batches(to_pages, batch_format="pyarrow")
    if repeat > 1:

        def replicate(batch: pa.Table) -> pa.Table:
            out = [batch]
            for r in range(1, repeat):
                urls = pa.array(
                    [f"{u}#r{r}" for u in batch["url"].to_pylist()], pa.string()
                )
                out.append(batch.set_column(0, "url", urls))
            return pa.concat_tables(out)

        pages = pages.map_batches(replicate, batch_format="pyarrow")
    return pages
