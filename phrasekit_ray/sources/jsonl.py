"""Reference-format JSONL interop (sources/sinks S1-S4 of SURVEY.md §2.1).

The reference exchanges JSONL between stages ({doc_id, tokens} corpora,
{tokens, count} n-grams, scored phrases, tagged docs). Parquet is our
inter-stage format, but these readers/writers let a phrasekit user feed
their existing files in and diff outputs against the reference byte for
byte. Malformed-line policy matches the reference: mining-side readers
skip bad lines with a warning (phrasekit_mine.rs:125-138); the tag-side
reader aborts (phrasekit_tag.rs:140-146).
"""

from __future__ import annotations

import json

import pyarrow as pa


def _parse_lines(
    path: str, strict: bool, required: tuple[str, ...] = ()
) -> list[dict]:
    rows = []
    with open(path) as f:
        for line_num, line in enumerate(f, 1):
            if not line.strip():
                continue  # blank lines skipped (mine.rs:128-130)
            try:
                row = json.loads(line)
                # missing required fields are a deserialize failure in
                # the reference (serde missing-field error) and take the
                # same skip-with-warning path as unparseable JSON
                missing = [
                    k for k in required
                    if not isinstance(row, dict) or k not in row
                ]
                if missing:
                    raise ValueError(f"missing field(s) {missing}")
                rows.append(row)
            except (json.JSONDecodeError, ValueError) as e:
                if strict:
                    raise ValueError(f"Line {line_num}: failed to parse: {e}")
                import warnings

                warnings.warn(f"Line {line_num}: failed to parse: {e}")
    return rows


def read_corpus_jsonl(path: str, strict: bool = False):
    """{doc_id?, tokens} JSONL → Dataset(doc_id, tokens)."""
    import ray

    rows = _parse_lines(path, strict, required=("tokens",))
    table = pa.table(
        {
            "doc_id": pa.array(
                [r.get("doc_id", f"line_{i}") for i, r in enumerate(rows)],
                pa.string(),
            ),
            "tokens": pa.array(
                [r["tokens"] for r in rows], pa.list_(pa.string())
            ),
        }
    )
    return ray.data.from_arrow(table)


def read_ngrams_jsonl(path: str, strict: bool = False):
    """{tokens, count} JSONL → Dataset(ngram, count). Duplicate keys:
    last-wins, as the reference's HashMap insert does
    (phrasekit_score.rs:160-161)."""
    import ray

    rows = _parse_lines(path, strict, required=("tokens", "count"))
    dedup: dict[str, int] = {}
    for r in rows:
        key = " ".join(t.lower() for t in r["tokens"])
        dedup[key] = int(r["count"])
    return ray.data.from_arrow(
        pa.table(
            {
                "ngram": pa.array(list(dedup.keys()), pa.string()),
                "count": pa.array(list(dedup.values()), pa.uint64()),
            }
        )
    )


def write_ngrams_jsonl(table: pa.Table, path: str) -> int:
    """(ngram, count) → reference mine-output JSONL."""
    n = 0
    with open(path, "w") as f:
        for ng, c in zip(table["ngram"].to_pylist(), table["count"].to_pylist()):
            f.write(json.dumps({"tokens": ng.split(" "), "count": int(c)}) + "\n")
            n += 1
    return n


def write_scored_jsonl(table: pa.Table, path: str) -> int:
    """Scored phrases → reference score-output JSONL (phrase_id omitted
    when absent, matching serde skip_serializing_if — score.rs:50-51)."""
    n = 0
    has_id = "phrase_id" in table.column_names
    with open(path, "w") as f:
        for i in range(table.num_rows):
            row = {
                "tokens": table["ngram"][i].as_py().split(" "),
                "salience": table["salience"][i].as_py(),
            }
            if has_id and table["phrase_id"][i].is_valid:
                row["phrase_id"] = table["phrase_id"][i].as_py()
            row["domain_count"] = table["domain_count"][i].as_py()
            row["background_count"] = table["background_count"][i].as_py()
            f.write(json.dumps(row) + "\n")
            n += 1
    return n


def write_tagged_jsonl(table: pa.Table, path: str, id_col: str = "doc_id") -> int:
    """Tagged docs → reference tag-output JSONL (phrasekit_tag.rs:46-59)."""
    n = 0
    with open(path, "w") as f:
        for i in range(table.num_rows):
            spans = [
                {
                    "start": s["start"],
                    "end": s["end"],
                    "phrase_id": s["phrase_id"],
                    "label": s["label"],
                }
                for s in table["spans"][i].as_py()
            ]
            f.write(
                json.dumps(
                    {
                        "doc_id": table[id_col][i].as_py(),
                        "tokens": table["tokens"][i].as_py(),
                        "spans": spans,
                    }
                )
                + "\n"
            )
            n += 1
    return n


def read_corpus_jsonl_distributed(paths, strict: bool = False):
    """Distributed {doc_id?, tokens} JSONL corpus reader — the scale path
    for large corpora: lines stream through ``ray.data.read_text`` (block
    parallel, never the whole file on the driver) and parse inside
    map_batches with the reference's malformed-line policy (skip + warn,
    or raise when ``strict`` — reference phrasekit_mine.rs:125-138).

    Divergence from ``read_corpus_jsonl`` (documented): a distributed
    read has no global line numbers, so rows missing ``doc_id`` get a
    null doc_id instead of the driver reader's ``line_<i>`` synthetic —
    mining ignores doc_id entirely (phrasekit_mine.rs:6-11)."""
    import ray

    def parse(batch: pa.Table) -> pa.Table:
        ids: list = []
        toks: list = []
        for line in batch["text"].to_pylist():
            if not line.strip():
                continue  # blank lines skipped (mine.rs:128-130)
            try:
                r = json.loads(line)
                if not isinstance(r, dict) or "tokens" not in r:
                    # missing field = serde deserialize failure in the
                    # reference → same skip path as unparseable JSON
                    raise ValueError("missing field 'tokens'")
            except (json.JSONDecodeError, ValueError) as e:
                if strict:
                    raise ValueError(f"failed to parse JSONL line: {e}")
                import warnings

                warnings.warn(f"skipping malformed JSONL line: {e}")
                continue
            ids.append(r.get("doc_id"))
            toks.append(r["tokens"])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "tokens": pa.array(toks, pa.list_(pa.string())),
            }
        )

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")
