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
    line of each file is validated against ``columns`` and dropped —
    header validation failures always raise (a wrong schema is never a
    skippable row).
    """
    import ray

    if isinstance(paths, str):
        paths = [paths]
    ncol = len(columns)
    expected_header = list(columns)

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
            if fields == expected_header:
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
        # validate the header once on the driver (first line of the
        # first file) — a schema mismatch must fail loudly, not skip
        with open(paths[0]) as f:
            first = f.readline()
        got = next(_csv.reader(io.StringIO(first), delimiter=delimiter))
        if got != expected_header:
            raise ValueError(
                f"CSV header mismatch: expected {expected_header}, got {got}"
            )

    return ray.data.read_text(paths).map_batches(
        parse_block, batch_format="pyarrow"
    )
