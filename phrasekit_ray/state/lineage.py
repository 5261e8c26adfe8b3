"""Lineage manifests + resumable partitioned Parquet writes.

North-rule requirement: "checkpoints per-partition with lineage metadata
for resumable runs". The reference has no checkpoint/resume at all
(SURVEY.md §4); this module defines ours:

- Output is a directory per logical partition:
      {root}/{stage}/part={key}/data.parquet
      {root}/{stage}/part={key}/_manifest.json
- The manifest records the stage name, a fingerprint of the stage config,
  the row count, and completion; it is written LAST (atomic rename), so a
  crash mid-write leaves an incomplete partition that re-runs.
- On re-run with the same fingerprint, complete partitions are skipped:
  their rows are filtered out BEFORE the shuffle, so a resumed 100-TB job
  only moves the missing partitions' data.

The write itself is distributed: rows are hash-partitioned by key with a
``groupby(pkey).map_groups`` and each partition is written inside the
worker that owns it — no data funnels through the driver; the driver only
collects the per-partition manifest rows.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST_NAME = "_manifest.json"
PKEY = "__pkey"


def fingerprint(obj: Any) -> str:
    """Deterministic fingerprint of a JSON-able config/input descriptor."""
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def partition_dir(root: str, stage: str, key: int | str) -> str:
    if isinstance(key, int):
        key = f"{key:05d}"
    return os.path.join(root, stage, f"part={key}")


def manifest_path(root: str, stage: str, key: int | str) -> str:
    return os.path.join(partition_dir(root, stage, key), MANIFEST_NAME)


def partition_complete(root: str, stage: str, key: int | str, fp: str) -> bool:
    """True when this partition was already written under the same
    fingerprint (the resume skip-check)."""
    try:
        with open(manifest_path(root, stage, key)) as f:
            m = json.load(f)
        return m.get("fingerprint") == fp and m.get("complete") is True
    except (OSError, json.JSONDecodeError):
        return False


def write_partition(
    root: str,
    stage: str,
    key: int | str,
    table: pa.Table,
    fp: str,
    extra: dict | None = None,
) -> dict:
    """Write one partition's data then its manifest (manifest last)."""
    d = partition_dir(root, stage, key)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "data.parquet"))
    manifest = {
        "stage": stage,
        "partition": key if isinstance(key, str) else f"{key:05d}",
        "fingerprint": fp,
        "num_rows": table.num_rows,
        "schema": [f.name for f in table.schema],
        "complete": True,
    }
    if extra:
        manifest.update(extra)
    mp = manifest_path(root, stage, key)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mp)
    return manifest


def _hash_partition_ids(col: pa.ChunkedArray | pa.Array, num_partitions: int) -> np.ndarray:
    """Stable partition assignment from a key column (any type → hash)."""
    if pa.types.is_integer(col.type):
        v = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.uint64)
        # splitmix64-style scramble so sequential ids spread evenly
        v = (v ^ (v >> 30)) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> 27)) * np.uint64(0x94D049BB133111EB)
        v = v ^ (v >> 31)
        return (v % np.uint64(num_partitions)).astype(np.int64)
    # string/other: use Arrow-independent stable python hash (md5 prefix)
    vals = col.to_pylist()
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(s).encode()).digest()[:8], "little")
            % num_partitions
            for s in vals
        ),
        dtype=np.int64,
        count=len(vals),
    )


def write_dataset_resumable(
    ds,
    root: str,
    stage: str,
    config_desc: Any,
    partition_col: str,
    num_partitions: int = 16,
) -> dict:
    """Materialize a Dataset to resumable hash-partitioned Parquet.

    Returns a summary dict; per-partition manifests land next to the data.
    """
    fp = fingerprint({"stage": stage, "config": config_desc, "np": num_partitions})
    done = {
        i for i in range(num_partitions) if partition_complete(root, stage, i, fp)
    }
    if len(done) == num_partitions:
        return {
            "stage": stage,
            "skipped": len(done),
            "written": 0,
            "partitions": num_partitions,
            "fingerprint": fp,
        }

    done_arr = np.zeros(num_partitions, dtype=bool)
    for i in done:
        done_arr[i] = True

    def assign(batch: pa.Table) -> pa.Table:
        pk = _hash_partition_ids(batch[partition_col].combine_chunks(), num_partitions)
        batch = batch.append_column(PKEY, pa.array(pk, pa.int64()))
        # resume: drop rows belonging to already-complete partitions
        if done_arr.any():
            batch = batch.filter(pa.array(~done_arr[pk]))
        return batch

    def write_group(group: pa.Table) -> pa.Table:
        key = int(group[PKEY][0].as_py())
        table = group.drop_columns([PKEY])
        m = write_partition(root, stage, key, table, fp)
        return pa.table(
            {"partition": pa.array([key], pa.int64()),
             "num_rows": pa.array([m["num_rows"]], pa.int64())}
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    manifests = assigned.groupby(PKEY).map_groups(
        write_group, batch_format="pyarrow"
    )
    rows = manifests.take_all()  # small: one row per partition
    written = {int(r["partition"]) for r in rows}
    # partitions with zero rows still need (empty) manifests for resume
    for i in range(num_partitions):
        if i not in written and i not in done:
            write_partition(root, stage, i, pa.table({}), fp)
    return {
        "stage": stage,
        "skipped": len(done),
        "written": num_partitions - len(done),
        "partitions": num_partitions,
        "fingerprint": fp,
    }


def read_partitioned(root: str, stage: str):
    """Read a resumable-partitioned stage output back as a Dataset."""
    import ray

    paths = []
    first = None
    stage_dir = os.path.join(root, stage)
    for part in sorted(os.listdir(stage_dir)):
        p = os.path.join(stage_dir, part, "data.parquet")
        if os.path.exists(p):
            first = first or p
            if pq.ParquetFile(p).metadata.num_rows > 0:
                paths.append(p)
    if not paths:
        # a stage may legitimately produce zero rows everywhere;
        # read_parquet([]) raises, so fall back to one (empty) file
        if first is not None:
            return ray.data.read_parquet([first])
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(paths)


def bucketed_join(
    root_left: str,
    stage_left: str,
    root_right: str,
    stage_right: str,
    left_key: str,
    right_key: str,
    num_partitions: int,
):
    """SHUFFLE-FREE co-located join of two stage outputs that were
    written by ``write_dataset_resumable`` with the SAME partition key
    semantics and the SAME ``num_partitions`` — the storage-layout
    answer to "pick ONE partitioning key and reuse it": because both
    sides were hash-bucketed identically at write time, bucket i of the
    left can only match bucket i of the right, so the join runs as one
    independent Ray task per bucket pair (inner, unique-keyed right
    side, vectorized searchsorted) with NO all-to-all exchange at all.

    Returns a Dataset of left columns + right non-key columns. Raises if
    either side is missing buckets (layout mismatch = silent wrong
    answers; fail loudly instead).
    """
    import ray

    def bucket_rows(root, stage, i) -> int:
        mp = manifest_path(root, stage, i)
        if not os.path.exists(mp):
            raise FileNotFoundError(
                f"bucket {i} of {stage} missing a manifest under {root} — "
                f"not a complete {num_partitions}-bucket layout"
            )
        with open(mp) as f:
            return int(json.load(f).get("num_rows", 0))

    @ray.remote
    def join_bucket(lp: str, rp: str):
        import numpy as np

        lt = pq.read_table(lp)
        rt = pq.read_table(rp)
        lcol = lt[left_key].combine_chunks()
        rcol = rt[right_key].combine_chunks()
        if pa.types.is_integer(lcol.type) and pa.types.is_integer(rcol.type):
            lk = lcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
            rk = rcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            # string partition keys are first-class in the writer
            # (_hash_partition_ids md5 path); numpy unicode arrays sort
            # and searchsorted the same way
            lk = np.asarray(lcol.to_pylist(), dtype=np.str_)
            rk = np.asarray(rcol.to_pylist(), dtype=np.str_)
        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        pos = np.searchsorted(rk_s, lk)
        pos_c = np.minimum(pos, len(rk_s) - 1)
        hit = rk_s[pos_c] == lk
        take_l = np.flatnonzero(hit)
        take_r = order[pos_c[hit]]
        out = lt.take(pa.array(take_l))
        for name in rt.column_names:
            if name != right_key:
                out = out.append_column(
                    name, rt[name].combine_chunks().take(pa.array(take_r))
                )
        return out

    # manifests (tiny driver-side JSON) decide which bucket pairs can
    # match at all; the joined blocks themselves stay in the object
    # store as task-result refs — never pulled to the driver
    refs = []
    for i in range(num_partitions):
        if bucket_rows(root_left, stage_left, i) == 0:
            continue
        if bucket_rows(root_right, stage_right, i) == 0:
            continue
        refs.append(
            join_bucket.remote(
                os.path.join(partition_dir(root_left, stage_left, i), "data.parquet"),
                os.path.join(partition_dir(root_right, stage_right, i), "data.parquet"),
            )
        )
    import ray.data as rd

    if not refs:
        return rd.from_arrow(pa.table({}))
    return rd.from_arrow_refs(refs)


def write_zonemapped(
    ds,
    root: str,
    stage: str,
    zone_col: str,
    num_partitions: int = 16,
    config_desc: Any = None,
) -> dict:
    """Range-layout + zone-map write: sort by ``zone_col``, split into
    ``num_partitions`` equal ROW ranges (deterministic regardless of
    value skew — a skewed value just spans several zones), and record
    each partition's min/max of ``zone_col`` in its manifest. A later
    :func:`read_zonemapped` range query opens ONLY the overlapping
    partitions — the same file-skipping contract a lakehouse zone map /
    Parquet row-group index gives, expressed over this engine's own
    resumable-partition manifests (write_partition's manifest-last
    ordering keeps crash-resume semantics).

    Equal-row split uses the X19 metadata-only global row index; the
    sort is the only shuffle. Returns a summary dict with the zone
    table.
    """
    from phrasekit_ray.state.rowindex import with_row_index

    fp = fingerprint(
        {"stage": stage, "config": config_desc, "np": num_partitions,
         "zone_col": zone_col, "layout": "range"}
    )
    srt = ds.sort(zone_col)
    idx = with_row_index(srt, "_rn")
    total = idx.count()
    if total == 0:
        for i in range(num_partitions):
            write_partition(root, stage, i, pa.table({}), fp,
                            extra={"zone_min": None, "zone_max": None})
        return {"stage": stage, "partitions": num_partitions,
                "rows": 0, "fingerprint": fp, "zones": []}

    def assign(batch: pa.Table) -> pa.Table:
        rn = batch["_rn"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        pk = rn * num_partitions // total
        return batch.drop_columns(["_rn"]).append_column(
            PKEY, pa.array(pk, pa.int64())
        )

    def write_group(group: pa.Table) -> pa.Table:
        key = int(group[PKEY][0].as_py())
        table = group.drop_columns([PKEY])
        zmin = pc.min(table[zone_col]).as_py()
        zmax = pc.max(table[zone_col]).as_py()
        write_partition(root, stage, key, table, fp,
                        extra={"zone_min": zmin, "zone_max": zmax})
        return pa.table(
            {"partition": pa.array([key], pa.int64()),
             "num_rows": pa.array([table.num_rows], pa.int64())}
        )

    manifests = idx.map_batches(assign, batch_format="pyarrow").groupby(
        PKEY
    ).map_groups(write_group, batch_format="pyarrow")
    rows = manifests.take_all()  # small: one row per partition
    written = {int(r["partition"]) for r in rows}
    for i in range(num_partitions):
        if i not in written:
            write_partition(root, stage, i, pa.table({}), fp,
                            extra={"zone_min": None, "zone_max": None})
    return {"stage": stage, "partitions": num_partitions, "rows": total,
            "fingerprint": fp}


def read_zonemapped(root: str, stage: str, zone_col: str, lo, hi):
    """Range query over a :func:`write_zonemapped` layout: consult the
    (tiny) manifests, open ONLY partitions whose [zone_min, zone_max]
    overlaps [lo, hi], then apply the exact row filter. Returns
    (Dataset, partitions_scanned, partitions_total) so callers and
    tests can assert real pruning, not just correct answers."""
    import ray

    stage_dir = os.path.join(root, stage)
    paths, total = [], 0
    for part in sorted(os.listdir(stage_dir)):
        mp = os.path.join(stage_dir, part, MANIFEST_NAME)
        try:
            with open(mp) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        total += 1
        zmin, zmax = m.get("zone_min"), m.get("zone_max")
        if zmin is None or zmax is None:
            continue  # empty partition: nothing to scan
        if zmax < lo or zmin > hi:
            continue  # disjoint: pruned without opening the file
        paths.append(os.path.join(stage_dir, part, "data.parquet"))
    if not paths:
        return (
            ray.data.from_arrow(pa.table({zone_col: pa.array([], pa.int64())})),
            0,
            total,
        )
    ds = ray.data.read_parquet(paths)
    out = ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b[zone_col], lo),
                pc.less_equal(b[zone_col], hi),
            )
        ),
        batch_format="pyarrow",
    )
    return out, len(paths), total


def compact_zonemapped(
    root: str,
    stages: list[str],
    out_stage: str,
    zone_col: str,
    num_partitions: int = 16,
    config_desc: Any = None,
) -> dict:
    """LSM-style compaction of zonemapped layouts (X194): union N
    range-partitioned snapshot layouts (each internally sorted but
    OVERLAPPING each other — the state appended crawls leave behind)
    into ONE fresh :func:`write_zonemapped` layout. Reads go through
    the stored partitions (no re-derivation from source), the merge is
    write_zonemapped's single sort shuffle, and the output inherits its
    crash-resumable manifest-last contract.

    The maintenance win is pruning selectivity: a range query over K
    overlapping snapshots must open matching zones in EVERY snapshot;
    after compaction the same query opens only the compacted layout's
    overlapping slice (tests assert scanned_after <= scanned_before on
    real manifests, not just equal answers)."""
    ds = read_partitioned(root, stages[0])
    for s in stages[1:]:
        ds = ds.union(read_partitioned(root, s))
    return write_zonemapped(
        ds, root, out_stage, zone_col, num_partitions,
        config_desc={"compact_of": list(stages), "desc": config_desc},
    )
