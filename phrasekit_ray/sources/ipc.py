"""Arrow IPC / Feather v2 source: distributed reader for Ray-adjacent
interchange files (the zero-copy sibling of the ORC path in orc.py).

Arrow IPC is the format Ray's own object store speaks internally, and
Feather v2 IS Arrow IPC on disk — so this is the cheapest possible
interchange for corpus shards produced by other Arrow-native tools
(polars, pandas.to_feather, DataFusion). Parallelism is per FILE via
``ray.data.read_binary_files`` → one decode task per file; column
pruning happens INSIDE the decode (``feather.read_table(columns=...)``
reads only the selected columns' buffers — IPC is columnar, so pruning
skips bytes, unlike a row format). ``write_ipc_file`` exists for
fixtures and cross-format interop tests.
"""

from __future__ import annotations

import io

import pyarrow as pa


def read_ipc(paths, columns: list[str] | None = None, **read_kwargs):
    """Directory/list of ``.arrow``/``.feather`` files → Dataset with
    the files' schema (optionally pruned to ``columns``)."""
    import ray

    files = ray.data.read_binary_files(paths, **read_kwargs)

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.feather as feather

        tabs = [
            feather.read_table(io.BytesIO(payload), columns=columns)
            for payload in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tabs, promote_options="default")

    return files.map_batches(decode, batch_format="pyarrow")


def write_ipc_file(path: str, table: pa.Table, compression: str = "zstd") -> None:
    """Write one Arrow table as a Feather v2 (Arrow IPC) file."""
    import pyarrow.feather as feather

    feather.write_feather(table, path, compression=compression)
