"""CSV corpus source (source-format breadth alongside the JSONL
readers, SURVEY.md §2.1 S1-family).

The reference exchanges JSONL only; web-scale corpora also arrive as
CSV/TSV dumps. This reader follows the same malformed-line policy shape
as `sources/jsonl.py` (reference phrasekit_mine.rs:125-138): lenient
mode SKIPS undecodable rows with a warning, strict mode raises — and is
distributed: `ray.data.read_text` shards the byte range across the
cluster and each block parses its own lines vectorized, so a TB-scale
dump never funnels through the driver.

Quoting: standard csv module semantics per line (quoted fields may
contain the delimiter). A field spanning a LINE BREAK inside quotes is
not supported on the distributed path (read_text splits on newlines —
the same caveat every line-sharded CSV reader has); such rows take the
malformed-line policy.
"""

from __future__ import annotations

import csv as _csv
import io

import pyarrow as pa


def _iter_files(paths):
    """Resolve each input (local path, URI, or directory) to
    (filesystem, file-path) pairs via pyarrow.fs — the same layer the
    distributed read uses, so header validation can't reject inputs
    the read itself would handle."""
    from pyarrow import fs as pafs

    for p in paths:
        try:
            fsys, rel = pafs.FileSystem.from_uri(p)
        except (pa.ArrowInvalid, ValueError):
            fsys, rel = pafs.LocalFileSystem(), p
        info = fsys.get_file_info(rel)
        if info.type == pafs.FileType.Directory:
            sel = pafs.FileSelector(rel, recursive=True)
            for fi in fsys.get_file_info(sel):
                if fi.type == pafs.FileType.File:
                    yield fsys, fi.path
        else:
            yield fsys, rel


def read_corpus_csv(
    paths,
    columns: list[str],
    delimiter: str = ",",
    header: bool = True,
    strict: bool = False,
):
    """CSV file(s) → Dataset with string columns ``columns``.

    ``columns`` names the fields IN FILE ORDER (extra trailing fields are
    ignored; short rows are malformed). With ``header=True`` the first
    line of EVERY input file is validated against ``columns`` (through
    pyarrow.fs, so remote URIs and directories work) and header lines
    are dropped by content equality inside the sharded parse — the one
    line-sharded-reader caveat being that a DATA row byte-identical to
    the header is dropped too (documented; impossible when any column is
    numeric). ``header=False`` never drops rows. Header validation
    failures always raise — a wrong schema is never a skippable row.
    """
    import ray

    if isinstance(paths, str):
        paths = [paths]
    ncol = len(columns)
    expected_header = list(columns)
    drop_header_lines = bool(header)

    def parse_block(batch: pa.Table) -> pa.Table:
        lines = batch["text"].to_pylist()
        out: list[list[str]] = [[] for _ in range(ncol)]
        for line in lines:
            if not line.strip():
                continue
            try:
                fields = next(
                    _csv.reader(io.StringIO(line), delimiter=delimiter)
                )
            except (StopIteration, _csv.Error) as e:
                if strict:
                    raise ValueError(f"failed to parse CSV line: {e}")
                import warnings

                warnings.warn(f"skipping malformed CSV line: {e}")
                continue
            if drop_header_lines and fields == expected_header:
                continue  # header line of some shard
            if len(fields) < ncol:
                if strict:
                    raise ValueError(
                        f"CSV row has {len(fields)} fields, need {ncol}"
                    )
                import warnings

                warnings.warn(
                    f"skipping short CSV row ({len(fields)} < {ncol} fields)"
                )
                continue
            for i in range(ncol):
                out[i].append(fields[i])
        return pa.table(
            {c: pa.array(out[i], pa.string()) for i, c in enumerate(columns)}
        )

    if header:
        # validate EVERY file's header on the driver (metadata-sized
        # reads through pyarrow.fs — remote URIs and directories work);
        # a schema mismatch in ANY shard must fail loudly, not ingest
        # the stray header as a data row
        for fsys, rel in _iter_files(paths):
            with fsys.open_input_stream(rel) as f:
                head = f.read(1 << 16).decode("utf-8", "replace")
            first = head.splitlines()[0] if head else ""
            got = next(_csv.reader(io.StringIO(first), delimiter=delimiter))
            if got != expected_header:
                raise ValueError(
                    f"CSV header mismatch in {rel}: expected "
                    f"{expected_header}, got {got}"
                )

    return ray.data.read_text(paths).map_batches(
        parse_block, batch_format="pyarrow"
    )
