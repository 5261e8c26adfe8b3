"""ORC source: distributed reader for a format Ray Data doesn't ship.

Parallelism is per FILE via ``ray.data.read_binary_files`` → one decode
task per file (the layout both Hive-era warehouses and CC derivatives
use: many ~100 MB–1 GB ORC files). Column pruning happens INSIDE the
decode (``ORCFile.read(columns=...)``) so only requested columns
materialize as Arrow — the file bytes themselves must move once, which
is inherent to a format Ray has no native reader for; at 100 TB you
point this at the object store and let file sharding do the work.

``write_orc_file`` exists for fixtures and cross-format interop tests.
"""

from __future__ import annotations

import io

import pyarrow as pa


def read_orc(paths, columns: list[str] | None = None, **read_kwargs):
    """Directory/list of ``.orc`` files → Dataset with the files' schema
    (optionally pruned to ``columns``)."""
    import ray

    files = ray.data.read_binary_files(paths, **read_kwargs)

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        tabs = [
            orc.ORCFile(io.BytesIO(payload)).read(columns=columns)
            for payload in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tabs, promote_options="default")

    return files.map_batches(decode, batch_format="pyarrow")


def write_orc_file(path: str, table: pa.Table) -> None:
    """Write one Arrow table as an ORC file (fixture/interop helper)."""
    import pyarrow.orc as orc

    orc.write_table(table, path)
