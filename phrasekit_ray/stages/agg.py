"""Vectorized distributed aggregation primitives.

Ray Data's native ``groupby(key).sum()`` sort-shuffle aggregate combines
rows on a slow per-row path for string keys (~100 µs/row measured at
sf0.1 — it dominated the mine stage wall time). This module implements
the same semantics as a two-phase hash aggregate where every per-row
operation is a pyarrow C++ kernel:

  phase 1 (map_batches, stateless): ``Table.group_by`` partial combine
      within the block, plus an int32 ``_part = crc32(key) % P`` column —
      the only thing the shuffle ever sorts is a small-int column.
  phase 2 (groupby(_part).map_groups): per partition, one vectorized
      ``Table.group_by`` finalize.

Skew note (SURVEY.md §4): phase 1 collapses hot keys to ≤1 row per block
per key, so a Zipfian key distribution reaches phase 2 with at most
``num_blocks`` rows per key — the classic salted/partial-agg treatment.
``num_partitions`` bounds the shuffle width; at cluster scale set it to a
small multiple of total cores.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_AGG_FUNCS = {"sum", "min", "max"}


def round_away(arr):
    """Round half away from zero (DuckDB round() semantics; pyarrow defaults
    to half-to-even, which diverges on exact .5 cents values). The single
    shared definition for every oracle-facing rounding site."""
    return pc.round(arr, round_mode="half_towards_infinity")


def default_partitions(requested: int | None = None, floor: int = 32) -> int:
    """Shuffle width for the two-phase aggregate: explicit request wins;
    otherwise 2× the cluster's CPU count (never below ``floor``), so the
    finalize stage keeps every core busy on big clusters without a code
    change — the fixed default 32 under-partitions a 256-node cluster."""
    if requested is not None:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 16)) if ray.is_initialized() else 16
    return max(floor, cpus * 2)


_FNV = np.uint64(1099511628211)


def hash_string_array64(col) -> np.ndarray:
    """Deterministic uint64 hash per row of a string column, fully
    vectorized over the Arrow offsets/data buffers. Polynomial rolling
    hash h(s) = Σ (b_j + 1)·P^(L−1−j) mod 2^64 (FNV prime P), computed
    as a cumsum difference (wraparound-exact mod 2^64), then one
    avalanche mix. Nulls → fixed sentinel. 64-bit collision rate makes
    this usable as a node-id assignment for string keys (hosts,
    entities) at web scale, not just as a partitioner."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    is_null = pc.is_null(arr).to_numpy(zero_copy_only=False)
    n = len(arr)
    odtype = (
        np.int64
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    bufs = arr.buffers()
    raw_off = np.frombuffer(bufs[1], dtype=odtype)
    offsets = raw_off[arr.offset: arr.offset + n + 1].astype(np.int64)
    base = offsets[0]
    off = offsets - base
    lens = np.diff(off)
    total = int(off[-1])
    if total == 0:
        h64 = np.zeros(n, np.uint64)
    else:
        data_all = np.frombuffer(bufs[2], dtype=np.uint8)
        data = data_all[base: base + total].astype(np.uint64) + np.uint64(1)
        max_len = int(lens.max())
        pw = np.ones(max_len, np.uint64)
        if max_len > 1:
            pw[1:] = _FNV
            np.multiply.accumulate(pw, out=pw)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos = np.arange(total, dtype=np.int64) - off[row]
        contrib = data * pw[lens[row] - 1 - pos]
        csum = np.concatenate(([np.uint64(0)], np.cumsum(contrib, dtype=np.uint64)))
        h64 = csum[off[1:]] - csum[off[:-1]]
    # final avalanche so short strings spread across partitions
    with np.errstate(over="ignore"):
        h64 = (h64 ^ (h64 >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h64[is_null] = np.uint64(0x9E3779B97F4A7C15)
    return h64


def _hash_string_array(col) -> np.ndarray:
    """uint32 fold of ``hash_string_array64`` (shuffle partitioner).
    Null sentinel preserved bit-exactly from the original 32-bit
    implementation so partition layouts are unchanged."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    is_null = pc.is_null(arr).to_numpy(zero_copy_only=False)
    h64 = hash_string_array64(arr)
    h32 = ((h64 >> np.uint64(32)) ^ h64).astype(np.uint32)
    h32[is_null] = np.uint32(0x9E3779B9)
    return h32


def _part_column(tbl: pa.Table, keys: list[str], num_partitions: int) -> pa.Array:
    """int32 partition id from a vectorized hash of the concatenated key
    columns (runs once per combined row, post partial-combine)."""
    n = tbl.num_rows
    if n == 0:
        return pa.array([], pa.int32())
    acc = np.zeros(n, dtype=np.uint32)
    for k in keys:
        col = tbl[k]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # null keys are legal group keys (arrow group_by keeps them as
            # their own group); hash them to a fixed sentinel
            h = _hash_string_array(col)
        else:
            # fill_null BEFORE the numpy cast: a null otherwise becomes
            # NaN whose uint64 cast is platform-undefined — null rows
            # would land on arbitrary partitions and split their group
            h = (
                pc.fill_null(col.cast(pa.int64(), safe=False), -(2**63))
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            h = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)).astype(
                np.uint32
            )
        acc = acc * np.uint32(31) + h
    return pa.array((acc % np.uint32(num_partitions)).astype(np.int32))


def _group_ordinals(tbl: pa.Table, gk: list[str]) -> np.ndarray:
    """Row → group ordinal by mixing per-column dictionary codes — exact
    (no string concatenation, so no separator-collision merging of
    distinct groups); null keys get the ordinal past the dictionary."""
    gidx = np.zeros(tbl.num_rows, dtype=np.int64)
    for c in gk:
        e = tbl[c].combine_chunks().dictionary_encode()
        idxs = (
            pc.fill_null(e.indices, len(e.dictionary))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        gidx = gidx * np.int64(len(e.dictionary) + 1) + idxs
    return gidx


def _arrow_aggregate(
    tbl: pa.Table, keys: list[str], aggs: list[tuple[str, str]]
) -> pa.Table:
    """Table.group_by wrapper that restores plain output column names."""
    out = tbl.group_by(keys).aggregate(aggs)
    # arrow names results "<col>_<fn>" and keys keep their names; rename
    # aggregates back to the input column names (our aggs never collide)
    names = list(out.column_names)
    rename = {f"{c}_{fn}": c for c, fn in aggs}
    return out.rename_columns([rename.get(n, n) for n in names])


def hash_aggregate(
    ds,
    keys: str | list[str],
    aggs: list[tuple[str, str]],
    num_partitions: int | None = None,
    combine_batch_size: int = 262_144,
    **map_kwargs,
):
    """Dataset → Dataset grouped by ``keys`` with ``aggs`` = list of
    (column, fn) where fn ∈ {sum, min, max}. count(*) is expressible as
    sum over a ones column created upstream.

    Semantics match ``ds.groupby(keys).sum/min/max`` but every per-row op
    is a pyarrow kernel; the all-to-all shuffle key is an int32.

    ``combine_batch_size`` bundles input blocks into large partial-combine
    tasks, so the shuffle sees FEW, BIG blocks — a stream of 2 MB blocks
    otherwise fans into hundreds of millisecond-scale sort/reduce tasks
    whose scheduling overhead dwarfs the work (measured 15 s wall for
    1.4 s of compute at sf0.1×100).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = default_partitions(num_partitions)
    for _, fn in aggs:
        if fn not in _AGG_FUNCS:
            raise ValueError(f"unsupported aggregate fn: {fn}")
    out_cols = keys + [c for c, _ in aggs]

    def partial(batch: pa.Table) -> pa.Table:
        # level 1: combine within each incoming block (runs fused with the
        # producing stage, full task parallelism)
        return _arrow_aggregate(batch.select(out_cols), keys, aggs)

    def rebundle(batch: pa.Table) -> pa.Table:
        # level 2: re-combine across many small partial blocks (bundled to
        # ``combine_batch_size`` rows per task) and attach the shuffle key
        combined = _arrow_aggregate(batch, keys, aggs)
        return combined.append_column(
            "_part", _part_column(combined, keys, num_partitions)
        )

    def finalize(group: pa.Table) -> pa.Table:
        return _arrow_aggregate(group.drop_columns(["_part"]), keys, aggs).select(
            out_cols
        )

    partial_ds = ds.map_batches(partial, batch_format="pyarrow", **map_kwargs)
    # num_cpus differs from the default so rebundle does NOT fuse with the
    # partial stage — fused, its batch_size would bundle the RAW input and
    # collapse upstream task parallelism
    bundled = partial_ds.map_batches(
        rebundle,
        batch_format="pyarrow",
        batch_size=combine_batch_size,
        num_cpus=0.9,
    )
    return bundled.groupby("_part").map_groups(finalize, batch_format="pyarrow")


def join_partitions(requested: int) -> int:
    """Cap a join's ``num_partitions`` so its hash-shuffle aggregator
    actors (0.125 CPU each in Ray 2.49) can never reserve the whole
    cluster: a 32-partition join on a 4-CPU cluster requests exactly 4.0
    aggregator CPUs, starving the map stages that feed it — a deadlock.
    Cap = 2×cluster CPUs keeps the aggregator pool at ≤25% of the
    cluster while preserving the requested width on big clusters."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(requested, cpus * 2))


def grouped_count(ds, keys, count_col: str = "count", num_partitions: int | None = None):
    """count(*) per key group, vectorized (ones column + sum)."""
    keys_l = [keys] if isinstance(keys, str) else list(keys)

    def ones(batch: pa.Table) -> pa.Table:
        return batch.select(keys_l).append_column(
            count_col, pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )

    with_ones = ds.map_batches(ones, batch_format="pyarrow")
    return hash_aggregate(with_ones, keys_l, [(count_col, "sum")], num_partitions)


def lookup_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    num_partitions: int | None = None,
    left_schema=None,
    right_schema=None,
    broadcast_rows: int = 1_000_000,
):
    """Distributed inner equi-join of ``left_ds`` against a UNIQUE-keyed
    int lookup table ``right_ds`` (one row per key) — returns left columns
    + the right side's non-key columns.

    Two physical paths, chosen by the right side's row count:
    - ≤ ``broadcast_rows``: the key-sorted right table broadcasts once
      (``ray.put``) and every left batch attaches values with one
      vectorized searchsorted — ZERO shuffle (the classic broadcast hash
      join; dimension tables at any realistic scale take this path);
    - above it: a manual partitioned hash join — both sides get an int32
      ``_part`` column from the same key hash, are unioned under one
      conformed schema, and a single vectorized ``np.searchsorted`` per
      PARTITION attaches the right values — no per-key UDF calls, no
      driver traffic, and none of the native join operator's
      schema-broadcast fragility when chained (empty join partitions
      emit zero-column blocks that break a downstream join's aggregator
      in Ray 2.49).

    Keys must be integer-typed; right keys must be unique (it is a
    lookup, not a general join — use Dataset.join for m:n).

    Pass ``left_schema`` / ``right_schema`` (pa.Schema or ray Schema)
    when the side is LAZY and ends in an all-to-all: schema inference on
    such a dataset executes the whole upstream shuffle once just for the
    schema and again for the real run — double execution. right_schema
    also selects the broadcast-gate probe: with it the right side is
    materialized once and reused either way; without it a bounded
    ``limit(broadcast_rows+1)`` probe sizes the side and a too-large
    right side streams un-pinned through the partitioned path. Pass
    ``broadcast_rows=0`` to skip the gate for a known-large side."""
    import ray

    num_partitions = default_partitions(num_partitions)
    right_schema_given = right_schema is not None
    left_schema = left_schema or left_ds.schema(fetch_if_missing=True)
    right_schema = right_schema or right_ds.schema(fetch_if_missing=True)
    left_cols = [n for n in left_schema.names]
    right_val_cols = [n for n in right_schema.names if n != right_key]
    overlap = set(left_cols) & set(right_val_cols)
    if not overlap and broadcast_rows > 0:
        # Probe strategy for the broadcast gate, keyed on right_schema:
        # a caller passing right_schema is telling us the right side is
        # shuffle-fed (re-running it means a second all-to-all), so we
        # materialize once and reuse the blocks on fall-through. Without
        # the hint the side is read/map-fed: a bounded limit probe stops
        # early when the side is large, and the fall-through streams the
        # ORIGINAL dataset instead of pinning the full table in the
        # object store for the pipeline's lifetime.
        if right_schema_given:
            probe = right_ds.materialize()
            pinned_fallthrough = probe
        else:
            probe = right_ds.limit(broadcast_rows + 1).materialize()
            pinned_fallthrough = None
        if probe.count() <= broadcast_rows:
            rtbl = pa.concat_tables(
                [t for t in ray.get(probe.to_arrow_refs()) if t.num_rows]
            ) if probe.count() else None
            if rtbl is None:
                # empty right side → inner join result is empty
                return ray.data.from_arrow(
                    pa.table(
                        {
                            c: pa.array(
                                [],
                                dict(
                                    zip(left_schema.names, left_schema.types)
                                ).get(c)
                                or dict(
                                    zip(right_schema.names, right_schema.types)
                                )[c],
                            )
                            for c in left_cols + right_val_cols
                        }
                    )
                )
            rkeys = rtbl[right_key].combine_chunks().cast(pa.int64()).to_numpy()
            order = np.argsort(rkeys, kind="stable")
            vals = rtbl.select(right_val_cols).take(pa.array(order))
            bcast = ray.put((rkeys[order], vals))

            def attach(batch: pa.Table) -> pa.Table:
                from phrasekit_ray.stages.score import _get_broadcast

                keys_sorted, vtbl = _get_broadcast(bcast)
                lk = batch[left_key].cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                pos = np.minimum(
                    np.searchsorted(keys_sorted, lk),
                    max(len(keys_sorted) - 1, 0),
                )
                hit = keys_sorted[pos] == lk
                out_rows = batch.filter(pa.array(hit))
                take = pa.array(pos[hit])
                cols = {c: out_rows[c] for c in left_cols}
                for c in right_val_cols:
                    cols[c] = vtbl[c].take(take)
                return pa.table(cols)

            return left_ds.map_batches(attach, batch_format="pyarrow")
        if pinned_fallthrough is not None:
            right_ds = pinned_fallthrough  # shuffle-fed: don't re-execute
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_schema.names, right_schema.types))

    def conform_left(batch: pa.Table) -> pa.Table:
        key = batch[left_key].cast(pa.int64())
        cols = {"_jkey": key}
        for c in left_cols:
            cols[c] = batch[c]
        for c in right_val_cols:
            cols[c] = pa.nulls(batch.num_rows, right_types[c])
        cols["_isright"] = pa.array(
            np.zeros(batch.num_rows, dtype=np.int8), pa.int8()
        )
        t = pa.table(cols)
        return t.append_column("_part", _part_column(t, ["_jkey"], num_partitions))

    def conform_right(batch: pa.Table) -> pa.Table:
        key = batch[right_key].cast(pa.int64())
        cols = {"_jkey": key}
        for c in left_cols:
            cols[c] = pa.nulls(batch.num_rows, left_types[c])
        for c in right_val_cols:
            cols[c] = batch[c]
        cols["_isright"] = pa.array(
            np.ones(batch.num_rows, dtype=np.int8), pa.int8()
        )
        t = pa.table(cols)
        return t.append_column("_part", _part_column(t, ["_jkey"], num_partitions))

    both = left_ds.map_batches(conform_left, batch_format="pyarrow").union(
        right_ds.map_batches(conform_right, batch_format="pyarrow")
    )

    def join_partition(group: pa.Table) -> pa.Table:
        side = group["_isright"].to_numpy(zero_copy_only=False)
        keys = group["_jkey"].to_numpy(zero_copy_only=False)
        is_r = side == 1
        rkeys = keys[is_r]
        order = np.argsort(rkeys, kind="stable")
        rkeys_sorted = rkeys[order]
        lkeys = keys[~is_r]
        pos = np.searchsorted(rkeys_sorted, lkeys)
        pos_c = np.minimum(pos, max(len(rkeys_sorted) - 1, 0))
        hit = (
            rkeys_sorted[pos_c] == lkeys
            if len(rkeys_sorted)
            else np.zeros(len(lkeys), dtype=bool)
        )
        left_rows = np.flatnonzero(~is_r)[hit]
        right_rows = np.flatnonzero(is_r)[order[pos_c[hit]]]
        out = {}
        for c in left_cols:
            out[c] = group[c].combine_chunks().take(pa.array(left_rows))
        for c in right_val_cols:
            out[c] = group[c].combine_chunks().take(pa.array(right_rows))
        if not len(left_rows):
            return pa.table(
                {
                    c: pa.array([], left_types.get(c) or right_types[c])
                    for c in left_cols + right_val_cols
                }
            )
        return pa.table(out)

    return both.groupby("_part").map_groups(join_partition, batch_format="pyarrow")


def key_filter_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    anti: bool = False,
    num_partitions: int | None = None,
    broadcast_ids: int = 5_000_000,
    left_schema=None,
):
    """Distributed SEMI (``anti=False``) / ANTI (``anti=True``) join:
    keep the left rows whose int key does (not) appear in the right
    side's key column. Output = the left columns, filtered.

    Two physical paths, chosen by the right side's DISTINCT key count:
    - ≤ ``broadcast_ids``: the sorted key array broadcasts once
      (``ray.put``) and every left batch filters with one vectorized
      searchsorted — no shuffle at all (the classic broadcast semi-join);
    - above it: the same conformed-union + per-partition searchsorted
      shape as ``lookup_join`` — both sides shuffle by key hash, ONE
      vectorized UDF per partition, no driver traffic.
    """
    num_partitions = default_partitions(num_partitions)
    import ray

    def rkeys_only(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"_k": batch[right_key].cast(pa.int64()), }
        ).append_column("_n", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    distinct = hash_aggregate(
        right_ds.map_batches(rkeys_only, batch_format="pyarrow"),
        "_k",
        [("_n", "sum")],
        num_partitions,
    ).materialize()
    n_keys = distinct.count()

    if n_keys <= broadcast_ids:
        arrs = [
            b["_k"].to_numpy(zero_copy_only=False)
            for b in distinct.iter_batches(batch_format="pyarrow")
        ]
        keys = np.sort(np.concatenate(arrs)) if arrs else np.zeros(0, np.int64)
        keys_ref = ray.put(keys)

        def filter_batch(batch: pa.Table) -> pa.Table:
            from phrasekit_ray.stages.score import _get_broadcast

            allow = _get_broadcast(keys_ref)
            lk = batch[left_key].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if len(allow):
                pos = np.minimum(np.searchsorted(allow, lk), len(allow) - 1)
                hit = allow[pos] == lk
            else:
                hit = np.zeros(len(lk), dtype=bool)
            return batch.filter(pa.array(~hit if anti else hit))

        return left_ds.map_batches(filter_batch, batch_format="pyarrow")

    # partitioned path: conform both sides to one schema and resolve
    # membership per partition
    left_schema = left_schema or left_ds.schema(fetch_if_missing=True)
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))

    def conform_left(batch: pa.Table) -> pa.Table:
        cols = {"_jkey": batch[left_key].cast(pa.int64())}
        for c in left_cols:
            cols[c] = batch[c]
        cols["_isright"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8), pa.int8())
        t = pa.table(cols)
        return t.append_column("_part", _part_column(t, ["_jkey"], num_partitions))

    def conform_right(batch: pa.Table) -> pa.Table:
        cols = {"_jkey": batch["_k"]}
        for c in left_cols:
            cols[c] = pa.nulls(batch.num_rows, left_types[c])
        cols["_isright"] = pa.array(np.ones(batch.num_rows, dtype=np.int8), pa.int8())
        t = pa.table(cols)
        return t.append_column("_part", _part_column(t, ["_jkey"], num_partitions))

    both = left_ds.map_batches(conform_left, batch_format="pyarrow").union(
        distinct.map_batches(conform_right, batch_format="pyarrow")
    )

    def per_partition(group: pa.Table) -> pa.Table:
        side = group["_isright"].to_numpy(zero_copy_only=False)
        keys_arr = group["_jkey"].to_numpy(zero_copy_only=False)
        is_r = side == 1
        rkeys = np.sort(keys_arr[is_r])
        lmask = ~is_r
        lkeys = keys_arr[lmask]
        if len(rkeys):
            pos = np.minimum(np.searchsorted(rkeys, lkeys), len(rkeys) - 1)
            hit = rkeys[pos] == lkeys
        else:
            hit = np.zeros(len(lkeys), dtype=bool)
        keep_rows = np.flatnonzero(lmask)[~hit if anti else hit]
        if not len(keep_rows):
            return pa.table(
                {c: pa.array([], left_types[c]) for c in left_cols}
            )
        return pa.table(
            {
                c: group[c].combine_chunks().take(pa.array(keep_rows))
                for c in left_cols
            }
        )

    return both.groupby("_part").map_groups(per_partition, batch_format="pyarrow")


def grouped_count_distinct(
    ds, group_keys, value_col: str, count_col: str = "n_distinct",
    num_partitions: int | None = None,
):
    """COUNT(DISTINCT value) per group — two chained hash aggregates:
    distinct (group, value) pairs first (in-block combine collapses
    repeats before the shuffle), then a count per group. Both shuffles
    move only key columns."""
    gk = [group_keys] if isinstance(group_keys, str) else list(group_keys)

    def pairs(batch: pa.Table) -> pa.Table:
        t = batch.select(gk + [value_col])
        # SQL COUNT(DISTINCT) semantics: NULL is not a value
        import pyarrow.compute as _pc

        t = t.filter(_pc.is_valid(t[value_col]))
        # in-block distinct before the shuffle
        return t.group_by(gk + [value_col]).aggregate([])

    distinct_pairs = hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow").map_batches(
            lambda b: b.append_column(
                "_one", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        gk + [value_col],
        [("_one", "min")],
        num_partitions,
    )
    return grouped_count(distinct_pairs, gk, count_col=count_col,
                         num_partitions=num_partitions)


def approx_count_distinct(
    ds,
    group_keys,
    value_col: str,
    precision: int = 8,
    count_col: str = "approx_distinct",
    num_partitions: int | None = None,
):
    """Approximate COUNT(DISTINCT value) per group via HyperLogLog
    (Flajolet et al. 2007, public algorithm): m = 2^precision registers
    per group, register = max leading-zero rank of the hashed values
    routed to it.

    Scale shape: each block computes its groups' full register vectors
    (one vectorized np.maximum.at pass), registers ride the shuffle as m
    uint8 columns merged by hash_aggregate's elementwise ``max`` — the
    sketch is tiny and mergeable, so the shuffle moves O(groups × m)
    bytes regardless of corpus size. Exact twin:
    ``grouped_count_distinct`` (whose shuffle moves every distinct
    value). Standard error ≈ 1.04/sqrt(m) (~6.5% at precision 8).
    """
    import zlib as _zlib

    m = 1 << precision
    gk = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    reg_cols = [f"_r{i}" for i in range(m)]

    def partial(batch: pa.Table) -> pa.Table:
        if batch[value_col].null_count:
            # DISTINCT ignores NULL values (same convention as the exact
            # grouped_count_distinct and SQL count(DISTINCT ...))
            batch = batch.filter(pc.is_valid(batch[value_col]))
        vals = batch[value_col]
        if pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type):
            h = np.fromiter(
                (_zlib.crc32(s.encode()) for s in vals.to_pylist()),
                dtype=np.uint64,
                count=batch.num_rows,
            )
            # crc32 is 32-bit; widen deterministically
            h = h * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
        else:
            h = (
                vals.cast(pa.int64(), safe=False)
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(0x165667B19E3779F9)
            )
            h = h ^ (h >> np.uint64(29))
            h = h * np.uint64(0xBF58476D1CE4E5B9)
            h = h ^ (h >> np.uint64(32))
        reg = (h & np.uint64(m - 1)).astype(np.int64)
        rest = h >> np.uint64(precision)
        # rank = leading position of first set bit in the remaining
        # 64-precision bits (1-based), capped
        width = 64 - precision
        rank = np.zeros(len(h), dtype=np.uint8)
        nz = rest != 0
        # bit_length via log2 on uint64→float64 is unsafe near 2^53; use
        # a loop over 64 bits? No — use np.frexp on float is lossy. Use
        # integer method: count trailing? HLL uses position of leftmost
        # 1-bit of `rest` within `width` bits:
        bl = np.zeros(len(h), dtype=np.int64)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            bl[mask] += shift
            r[mask] >>= np.uint64(shift)
        # bl = floor(log2(rest)) for rest>0
        rank[nz] = (width - bl[nz]).astype(np.uint8)
        rank[~nz] = width + 1

        # group rows and take per-group register maxima in one pass.
        # Row→group ordinals: dictionary-encode each key column and mix
        # the per-column codes (exact — no string concat, no separator
        # collisions); output keys are first-occurrence rows taken from
        # the ORIGINAL columns, preserving their types.
        encs = [batch[c].combine_chunks().dictionary_encode() for c in gk]
        gidx = np.zeros(batch.num_rows, dtype=np.int64)
        for e in encs:
            # null group keys get the ordinal past the dictionary end
            # (a NaN-float cast would corrupt the group id)
            idxs = pc.fill_null(e.indices, len(e.dictionary)).to_numpy(
                zero_copy_only=False
            )
            gidx = gidx * np.int64(len(e.dictionary) + 1) + idxs
        _, gidx = np.unique(gidx, return_inverse=True)
        first = np.full(gidx.max() + 1 if len(gidx) else 0, batch.num_rows,
                        dtype=np.int64)
        np.minimum.at(first, gidx, np.arange(batch.num_rows))
        out_keys = {
            c: batch[c].combine_chunks().take(pa.array(first)) for c in gk
        }
        n_groups = len(first)
        regs = np.zeros((n_groups, m), dtype=np.uint8)
        np.maximum.at(regs, (gidx, reg), rank)
        cols = dict(out_keys)
        for i in range(m):
            cols[reg_cols[i]] = pa.array(regs[:, i], pa.uint8())
        return pa.table(cols)

    merged = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        gk,
        [(c, "max") for c in reg_cols],
        num_partitions,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        regs = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in reg_cols], axis=1
        ).astype(np.float64)
        am = 0.7213 / (1 + 1.079 / m)  # alpha_m for m >= 128
        est = am * m * m / np.power(2.0, -regs).sum(axis=1)
        zeros = (regs == 0).sum(axis=1)
        small = est <= 2.5 * m
        with np.errstate(divide="ignore"):
            lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
        est = np.where(small & (zeros > 0), lin, est)
        out = {c: batch[c] for c in gk}
        out[count_col] = pa.array(np.round(est).astype(np.int64), pa.int64())
        return pa.table(out)

    return merged.map_batches(finalize, batch_format="pyarrow")


def grouped_median_int(
    ds,
    group_keys,
    value_col: str,
    out_col: str = "median",
    num_partitions: int | None = None,
):
    """EXACT interpolated median (quantile_cont 0.5) of an integer column
    per group, at scale: rows first collapse to (group, value) COUNTS via
    the two-phase hash aggregate (the shuffle moves distinct values, not
    rows — bounded-domain ints compress enormously), then one small
    map_groups per group walks the cumulative counts. Matches DuckDB
    ``median`` on integers (average of the two middles when even)."""
    gk = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    num_partitions = default_partitions(num_partitions)

    counts = grouped_count(ds.map_batches(
        lambda b: b.select(gk + [value_col]), batch_format="pyarrow"
    ), gk + [value_col], count_col="_n", num_partitions=num_partitions)

    # ONE vectorized UDF per hash PARTITION of the group key (never one
    # Python call per group): all of a partition's groups are medianed in
    # a single lexsort + segmented-cumsum pass
    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", _part_column(batch, gk, num_partitions)
        )

    def medians_of_partition(group: pa.Table) -> pa.Table:
        v = group[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = group["_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        gids = _group_ordinals(group, gk)
        order = np.lexsort((v, gids))
        gids_s, v_s, n_s = gids[order], v[order], n[order]
        m = len(gids_s)
        if m == 0:
            out = {c: pa.array([], group[c].type) for c in gk}
            out[out_col] = pa.array([], pa.float64())
            return pa.table(out)
        seg = np.flatnonzero(
            np.concatenate(([True], gids_s[1:] != gids_s[:-1]))
        )
        seg_end = np.concatenate((seg[1:], [m]))
        cum = np.cumsum(n_s)
        seg_base = np.zeros(m, dtype=np.int64)
        seg_base[seg] = np.concatenate(([0], cum[seg[1:] - 1]))
        seg_base = np.maximum.accumulate(seg_base)
        within = cum - seg_base  # cumulative count within each group
        totals = within[seg_end - 1]
        # for each group pick value at rank k (0-based) via searchsorted
        # over its own cumulative slice — vectorized with one pass per
        # middle (two for even totals)
        odd = totals % 2 == 1
        k1 = np.where(odd, totals // 2, totals // 2 - 1)
        k2 = totals // 2
        # cum is globally nondecreasing, so one searchsorted resolves the
        # rank row for EVERY group at once: first row with
        # cum >= group_base + k + 1
        base = seg_base[seg]
        lo = v_s[np.searchsorted(cum, base + k1 + 1)]
        hi = v_s[np.searchsorted(cum, base + k2 + 1)]
        meds = np.where(odd, lo.astype(np.float64), (lo + hi) / 2.0)
        first_rows = order[seg]
        out = {
            c: group[c].combine_chunks().take(pa.array(first_rows)) for c in gk
        }
        out[out_col] = pa.array(meds, pa.float64())
        return pa.table(out)

    return (
        counts.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: medians_of_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def grouped_quantiles_int(
    ds,
    group_keys,
    value_col: str,
    quantiles: dict[str, float],
    num_partitions: int | None = None,
):
    """EXACT continuous quantiles (any set of q's at once) of an integer
    column per group, at scale — the generalization of
    ``grouped_median_int``: rows collapse to (group, value) COUNTS via the
    two-phase hash aggregate (the shuffle moves distinct values, not
    rows), then one vectorized UDF per hash PARTITION resolves every
    group's ranks with a single lexsort + segmented cumsum + one
    searchsorted per requested quantile.

    Interpolation replicates DuckDB ``quantile_cont`` bit-for-bit:
    ``rn = (n-1)*q``, answer = ``v[floor(rn)]*(ceil(rn)-rn) +
    v[ceil(rn)]*(rn-floor(rn))`` (the value itself when rn is integral) —
    all in float64, so the SQL oracle hash-matches.

    ``quantiles`` maps output column name → q in [0, 1].
    """
    gk = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    num_partitions = default_partitions(num_partitions)
    qitems = list(quantiles.items())

    counts = grouped_count(ds.map_batches(
        lambda b: b.select(gk + [value_col]), batch_format="pyarrow"
    ), gk + [value_col], count_col="_n", num_partitions=num_partitions)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", _part_column(batch, gk, num_partitions)
        )

    def quantiles_of_partition(group: pa.Table) -> pa.Table:
        v = group[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = group["_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        gids = _group_ordinals(group, gk)
        order = np.lexsort((v, gids))
        gids_s, v_s, n_s = gids[order], v[order], n[order]
        m = len(gids_s)
        if m == 0:
            out = {c: pa.array([], group[c].type) for c in gk}
            for name, _q in qitems:
                out[name] = pa.array([], pa.float64())
            return pa.table(out)
        seg = np.flatnonzero(
            np.concatenate(([True], gids_s[1:] != gids_s[:-1]))
        )
        seg_end = np.concatenate((seg[1:], [m]))
        cum = np.cumsum(n_s)
        seg_base = np.zeros(m, dtype=np.int64)
        seg_base[seg] = np.concatenate(([0], cum[seg[1:] - 1]))
        seg_base = np.maximum.accumulate(seg_base)
        totals = (cum - seg_base)[seg_end - 1]
        base = seg_base[seg]
        first_rows = order[seg]
        out = {
            c: group[c].combine_chunks().take(pa.array(first_rows)) for c in gk
        }
        for name, q in qitems:
            rn = (totals - 1).astype(np.float64) * float(q)
            frn = np.floor(rn).astype(np.int64)
            crn = np.ceil(rn).astype(np.int64)
            vlo = v_s[np.searchsorted(cum, base + frn + 1)].astype(np.float64)
            vhi = v_s[np.searchsorted(cum, base + crn + 1)].astype(np.float64)
            res = np.where(
                crn == frn, vlo, vlo * (crn - rn) + vhi * (rn - frn)
            )
            out[name] = pa.array(res, pa.float64())
        return pa.table(out)

    return (
        counts.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: quantiles_of_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def stratified_sample(
    ds,
    group_col: str,
    n_per_group: int,
    id_col: str,
    seed: int = 17,
    num_partitions: int | None = None,
):
    """Deterministic stratified sample: the ``n_per_group`` rows per group
    with the smallest seeded hash rank of their id — reproducible across
    runs and cluster layouts (rank is a pure function of (id, seed), not
    of partitioning). Grouped top-k shape: in-block top-n prune first, so
    the shuffle carries ≤ n_per_group × blocks rows per group."""
    num_partitions = default_partitions(num_partitions)

    def _topn_per_group(
        t: pa.Table, extra_drop: list[str], keep_rank: bool = False
    ) -> pa.Table:
        """Vectorized n-smallest-rank per group: lexsort (group, rank),
        positions within each group segment < n."""
        drop = extra_drop if keep_rank else ["_rank"] + extra_drop
        enc = t[group_col].cast(pa.string()).combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["_rank"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, codes))
        codes_s = codes[order]
        m = len(codes_s)
        if m == 0:
            return t.drop_columns(drop)
        seg = np.flatnonzero(
            np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        )
        sizes = np.diff(np.concatenate((seg, [m])))
        pos = np.arange(m) - np.repeat(seg, sizes)
        sel = order[pos < n_per_group]
        return t.take(pa.array(np.sort(sel))).drop_columns(drop)

    def rank_and_prune(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) + np.uint64(seed)) * np.uint64(
            0x9E3779B97F4A7C15
        )
        h = (h ^ (h >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)
        t = batch.append_column("_rank", pa.array(h.astype(np.uint64), pa.uint64()))
        # keep _rank through the prune — it is a pure function of
        # (id, seed), so rehashing the survivors would be wasted work
        pruned = _topn_per_group(t, [], keep_rank=True)
        return pruned.append_column(
            "_part", _part_column(pruned, [group_col], num_partitions)
        )

    pruned = ds.map_batches(rank_and_prune, batch_format="pyarrow")

    # final top-n: ONE vectorized call per hash PARTITION (all of its
    # groups at once), not one per group key
    return (
        pruned.groupby("_part")
        .map_groups(
            lambda g: _topn_per_group(g, ["_part"]),
            batch_format="pyarrow",
        )
    )


def exact_heavy_hitters(
    ds,
    col: str,
    k: int = 100,
    num_partitions: int | None = None,
) -> pa.Table:
    """EXACT φ=1/k heavy hitters of a flat column in two passes — items
    whose global count satisfies ``count * k > N`` (strict), with their
    exact counts: (key, count) sorted by count desc, key asc.

    Classic candidate-then-recount shape (the exact counterpart of a
    Misra-Gries sketch pipeline):

    1. **Candidates**: per block, exact in-block counts (dictionary
       encode + bincount), keep items with ``count_b * k > n_b``. By the
       averaging argument any global heavy hitter is a local heavy
       hitter in at least one block, so the union (≤ k per block,
       driver-bounded) is a superset of the answer — no false negatives.
    2. **Recount**: the candidate set broadcasts (ray.put, ids only) and
       every block emits exact counts for candidate members plus its row
       total under a sentinel group; one small two-phase aggregate and a
       strict ``count * k > N`` filter finish exactly.

    The shuffle only ever moves ≤ (k × blocks + blocks) candidate rows —
    the full key domain never shuffles (that's ``grouped_count``'s job).
    """
    import ray

    from phrasekit_ray.stages.score import _get_broadcast

    if k < 2:
        raise ValueError("k must be >= 2")
    num_partitions = default_partitions(num_partitions)

    def candidates(batch: pa.Table) -> pa.Table:
        enc = batch[col].combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        n = len(idx)
        if n == 0:
            return pa.table({"key": pa.array([], pa.string())})
        counts = np.bincount(idx, minlength=len(enc.dictionary))
        keep = np.flatnonzero(counts * k > n)
        return pa.table({"key": enc.dictionary.take(pa.array(keep))})

    cand_set: set[str] = set()
    for b in ds.map_batches(candidates, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        cand_set.update(b["key"].to_pylist())
    if not cand_set:
        return pa.table(
            {"key": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
        )
    cand_ref = ray.put(sorted(cand_set))

    def recount(batch: pa.Table) -> pa.Table:
        cand = _get_broadcast(cand_ref)
        enc = batch[col].combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        n = len(idx)
        uniq = enc.dictionary.to_pylist()
        counts = np.bincount(idx, minlength=len(uniq)) if n else np.zeros(0, np.int64)
        pos = {u: i for i, u in enumerate(uniq)}
        keys = [c for c in cand if c in pos]
        cnts = [int(counts[pos[c]]) for c in keys]
        return pa.table(
            {
                "key": pa.array(keys + [""], pa.string()),
                "cnt": pa.array(cnts + [n], pa.int64()),
                "is_total": pa.array([0] * len(keys) + [1], pa.int8()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(recount, batch_format="pyarrow"),
        ["key", "is_total"],
        [("cnt", "sum")],
        num_partitions=num_partitions,
    )
    parts = []
    total = 0
    for b in agg.iter_batches(batch_format="pyarrow"):
        parts.append(b)
        m = b.filter(pc.equal(b["is_total"], 1))
        if m.num_rows:
            total += int(pc.sum(m["cnt"]).as_py())
    t = pa.concat_tables(parts) if parts else pa.table(
        {"key": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
         "is_total": pa.array([], pa.int8())}
    )
    t = t.filter(pc.equal(t["is_total"], 0))
    keep = pc.greater(pc.multiply(t["cnt"].cast(pa.int64()), k), total)
    t = t.filter(keep)
    out = pa.table({"key": t["key"], "count": t["cnt"].cast(pa.int64())})
    return out.sort_by([("count", "descending"), ("key", "ascending")])


def profile_table(ds, columns: list[str] | None = None, schema=None) -> pa.Table:
    """ANALYZE-style column profiler: per column, (column, n_rows,
    n_null, n_distinct, min, max) with min/max rendered as strings (one
    row per column, mixed types conform).

    Distributed shape: ONE pass over the data computes every column's
    in-block partials (non-null count, DISTINCT values via
    ``Table.group_by``, min/max) and emits them under a conformed
    (column, value, cnt) schema; a single two-phase ``hash_aggregate``
    over (column, value) merges block-level distincts, and the driver
    reduces only per-column scalars + the already-distinct (column,
    value) stream's counts — never raw rows. Exact, not sketched (use
    ``approx_count_distinct`` for the HLL variant when the value domain
    itself is too wide to shuffle).

    ``min_str``/``max_str`` are LEXICOGRAPHIC bounds of the string
    rendering (a profiling aid — for numeric extrema aggregate the
    native column); the integer fields (n_rows, n_null, n_distinct) are
    exact and oracle-checked.
    """
    schema = schema or ds.schema(fetch_if_missing=True)
    names = list(columns) if columns else list(schema.names)

    def partials(batch: pa.Table) -> pa.Table:
        cols_out, vals_out, cnts_out, kind_out = [], [], [], []
        for c in names:
            col = batch[c]
            n = len(col)
            nn = n - col.null_count
            # row-count + null partials ride as special kinds
            cols_out += [c, c]
            vals_out += ["", ""]
            cnts_out += [n, nn]
            kind_out += ["rows", "nonnull"]
            # distinct values within the block (drop nulls)
            t = pa.table({"v": col})
            t = t.filter(pc.is_valid(t["v"]))
            if t.num_rows:
                uniq = t.group_by(["v"]).aggregate([])
                vs = uniq["v"].cast(pa.string()).to_pylist()
                cols_out += [c] * len(vs)
                vals_out += vs
                cnts_out += [1] * len(vs)
                kind_out += ["val"] * len(vs)
        return pa.table(
            {
                "column": pa.array(cols_out, pa.string()),
                "value": pa.array(vals_out, pa.string()),
                "cnt": pa.array(cnts_out, pa.int64()),
                "kind": pa.array(kind_out, pa.string()),
            }
        )

    merged = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["column", "kind", "value"],
        [("cnt", "sum")],
    )
    stats: dict[str, dict] = {
        c: {"n_rows": 0, "n_null": 0, "n_distinct": 0, "min": None, "max": None}
        for c in names
    }
    for b in merged.iter_batches(batch_format="pyarrow"):
        for c, k, v, n in zip(
            b["column"].to_pylist(), b["kind"].to_pylist(),
            b["value"].to_pylist(), b["cnt"].to_pylist(),
        ):
            s = stats[c]
            if k == "rows":
                s["n_rows"] += n
            elif k == "nonnull":
                s["n_null"] -= n  # resolved against n_rows below
            else:
                s["n_distinct"] += 1
                if s["min"] is None or v < s["min"]:
                    s["min"] = v
                if s["max"] is None or v > s["max"]:
                    s["max"] = v
    for s in stats.values():
        s["n_null"] += s["n_rows"]
    return pa.table(
        {
            "column": pa.array(names, pa.string()),
            "n_rows": pa.array([stats[c]["n_rows"] for c in names], pa.int64()),
            "n_null": pa.array([stats[c]["n_null"] for c in names], pa.int64()),
            "n_distinct": pa.array(
                [stats[c]["n_distinct"] for c in names], pa.int64()
            ),
            "min_str": pa.array([stats[c]["min"] for c in names], pa.string()),
            "max_str": pa.array([stats[c]["max"] for c in names], pa.string()),
        }
    )


def _empty_grand_total(src, keys: list[str], value_col: str, agg_fn: str = "sum"):
    """One all-NULL-keys, NULL-aggregate row — what SQL CUBE / ROLLUP /
    GROUPING SETS (with the () set) emit for an EMPTY input table, where
    the grouped levels emit zero rows but the global-aggregate level
    still produces its single row (sum over empty = NULL). ``src`` is the
    pre-aggregation input (an empty aggregate has no schema of its own);
    the NULL aggregate is emitted in the type the NON-empty path's Arrow
    grouped aggregate would produce (sum widens int→int64/uint→uint64 and
    float32→float64; min/max keep the input type), so empty and non-empty
    inputs of the same query have identical output schemas."""
    import ray

    schema = src.schema(fetch_if_missing=True)
    vtype = pa.int64()
    if schema is not None:
        vtype = dict(zip(schema.names, schema.types)).get(value_col, vtype)
    if not isinstance(vtype, pa.DataType):
        vtype = pa.int64()
    if agg_fn == "sum":
        if pa.types.is_unsigned_integer(vtype):
            vtype = pa.uint64()
        elif pa.types.is_integer(vtype):
            vtype = pa.int64()
        elif pa.types.is_floating(vtype):
            vtype = pa.float64()
    types = dict(zip(schema.names, schema.types)) if schema is not None else {}
    cols = {
        k: pa.array([None], types.get(k, pa.string())) for k in keys
    }
    cols[value_col] = pa.array([None], vtype)
    return ray.data.from_arrow(pa.table(cols))


def grouped_cube(
    ds,
    keys: list[str],
    value_col: str,
    agg_fn: str = "sum",
    num_partitions: int | None = None,
):
    """SQL ``GROUP BY CUBE(keys...)`` — aggregates at EVERY key subset
    (2^k levels), absent keys NULL-filled.

    Same distributed shape as ``grouped_rollup``: the raw data is
    aggregated exactly once at the finest level (two-phase hash
    aggregate); every coarser subset re-aggregates that group-count-sized
    result, so 2^k levels cost one corpus pass + (2^k - 1) tiny passes.
    Decomposable aggregates only (sum/min/max).

    Returns one Dataset with all levels unioned; ``keys`` columns are
    cast to string (NULL = rolled up) so every level conforms.
    """
    if agg_fn not in _AGG_FUNCS:
        raise ValueError(f"unsupported cube aggregate: {agg_fn}")
    if len(keys) > 6:
        raise ValueError("cube over >6 keys (64+ levels) — use rollup or prune")
    num_partitions = default_partitions(num_partitions)

    def to_str_keys(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k].cast(pa.string()) for k in keys}
        cols[value_col] = batch[value_col]
        return pa.table(cols)

    finest = hash_aggregate(
        ds.map_batches(to_str_keys, batch_format="pyarrow"),
        keys,
        [(value_col, agg_fn)],
        num_partitions=num_partitions,
    ).materialize()
    if finest.count() == 0:
        # SQL parity on empty input: only the () grouping set emits its
        # (NULL-aggregate) grand-total row; every grouped level is empty
        return _empty_grand_total(ds, keys, value_col, agg_fn)

    levels = [finest]
    n = len(keys)
    for mask in range((1 << n) - 2, -1, -1):
        kept = tuple(k for i, k in enumerate(keys) if mask & (1 << i))

        def project(batch: pa.Table, _kept=kept) -> pa.Table:
            cols = {k: batch[k] for k in _kept}
            cols[value_col] = batch[value_col]
            if not _kept:
                cols["_g"] = pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                )
            return pa.table(cols)

        gkeys = list(kept) if kept else ["_g"]
        lvl = hash_aggregate(
            finest.map_batches(project, batch_format="pyarrow"),
            gkeys,
            [(value_col, agg_fn)],
            num_partitions=min(num_partitions, 8),
        )

        def conform(batch: pa.Table, _kept=kept) -> pa.Table:
            cols = {}
            for k in keys:
                if k in _kept:
                    cols[k] = batch[k]
                else:
                    cols[k] = pa.array([None] * batch.num_rows, pa.string())
            cols[value_col] = batch[value_col]
            return pa.table(cols)

        levels.append(lvl.map_batches(conform, batch_format="pyarrow"))

    out = levels[0]
    for other in levels[1:]:
        out = out.union(other)
    return out


def grouped_sets(
    ds,
    keys: list[str],
    sets: list[list[str]],
    value_col: str,
    agg_fn: str = "sum",
    num_partitions: int | None = None,
):
    """SQL ``GROUP BY GROUPING SETS (...)`` — aggregates at each requested
    key subset; ROLLUP and CUBE are special cases of this. Same shape as
    grouped_cube: ONE corpus-level aggregate over the union of all
    requested keys, then each set re-aggregates that group-sized result.
    Decomposable aggregates only (sum/min/max). Every set must be a
    subset of ``keys``; output conforms all sets to the full key schema
    (absent keys NULL, cast to string)."""
    if agg_fn not in _AGG_FUNCS:
        raise ValueError(f"unsupported grouping-sets aggregate: {agg_fn}")
    seen = set()
    for s in sets:
        extra = set(s) - set(keys)
        if extra:
            raise ValueError(f"grouping set {s} has keys outside {keys}: {extra}")
        t = tuple(sorted(s))
        if t in seen:
            raise ValueError(f"duplicate grouping set: {s}")
        seen.add(t)
    num_partitions = default_partitions(num_partitions)

    def to_str_keys(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k].cast(pa.string()) for k in keys}
        cols[value_col] = batch[value_col]
        return pa.table(cols)

    finest = hash_aggregate(
        ds.map_batches(to_str_keys, batch_format="pyarrow"),
        keys,
        [(value_col, agg_fn)],
        num_partitions=num_partitions,
    ).materialize()
    if finest.count() == 0 and any(len(s) == 0 for s in sets):
        # SQL parity: the requested () set still emits its grand-total
        # row on an empty input; all other sets are empty
        return _empty_grand_total(ds, keys, value_col, agg_fn)

    levels = []
    for s in sets:
        kept = tuple(k for k in keys if k in s)

        if kept == tuple(keys):
            lvl = finest
        else:
            def project(batch: pa.Table, _kept=kept) -> pa.Table:
                cols = {k: batch[k] for k in _kept}
                cols[value_col] = batch[value_col]
                if not _kept:
                    cols["_g"] = pa.array(
                        np.zeros(batch.num_rows, np.int64), pa.int64()
                    )
                return pa.table(cols)

            gkeys = list(kept) if kept else ["_g"]
            lvl = hash_aggregate(
                finest.map_batches(project, batch_format="pyarrow"),
                gkeys,
                [(value_col, agg_fn)],
                num_partitions=min(num_partitions, 8),
            )

        def conform(batch: pa.Table, _kept=kept) -> pa.Table:
            cols = {}
            for k in keys:
                if k in _kept:
                    cols[k] = batch[k]
                else:
                    cols[k] = pa.array([None] * batch.num_rows, pa.string())
            cols[value_col] = batch[value_col]
            return pa.table(cols)

        levels.append(lvl.map_batches(conform, batch_format="pyarrow"))

    out = levels[0]
    for other in levels[1:]:
        out = out.union(other)
    return out


def grouped_rollup(
    ds,
    keys: list[str],
    value_col: str,
    agg_fn: str = "sum",
    num_partitions: int | None = None,
):
    """SQL ``GROUP BY ROLLUP(keys...)`` — aggregates at every key prefix
    level (finest → grand total), coarser keys NULL-filled.

    The classic rollup optimization, distributed: the RAW data is
    aggregated exactly once (two-phase hash aggregate at the finest
    level); every coarser level re-aggregates the PREVIOUS level's
    already-aggregated rows (group-count-sized inputs, not corpus-sized)
    — k levels cost one corpus pass + (k-1) tiny passes. Works for the
    decomposable aggregates (sum/min/max).

    Returns one Dataset with all levels unioned; ``keys`` columns are
    cast to string (NULL = rolled up) so every level conforms to one
    schema.
    """
    if agg_fn not in _AGG_FUNCS:
        raise ValueError(f"unsupported rollup aggregate: {agg_fn}")
    num_partitions = default_partitions(num_partitions)

    def to_str_keys(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k].cast(pa.string()) for k in keys}
        cols[value_col] = batch[value_col]
        return pa.table(cols)

    finest = hash_aggregate(
        ds.map_batches(to_str_keys, batch_format="pyarrow"),
        keys,
        [(value_col, agg_fn)],
        num_partitions=num_partitions,
    ).materialize()
    if finest.count() == 0:
        # SQL parity on empty input: ROLLUP's () level still emits its
        # (NULL-aggregate) grand-total row
        return _empty_grand_total(ds, keys, value_col, agg_fn)

    levels = [finest]
    prev = finest
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]

        def drop_last(batch: pa.Table, _kept=tuple(kept)) -> pa.Table:
            cols = {k: batch[k] for k in _kept}
            cols[value_col] = batch[value_col]
            if not _kept:
                # grand total: constant key so the aggregate has a group
                cols["_g"] = pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                )
            return pa.table(cols)

        gkeys = list(kept) if kept else ["_g"]
        lvl = hash_aggregate(
            prev.map_batches(drop_last, batch_format="pyarrow"),
            gkeys,
            [(value_col, agg_fn)],
            num_partitions=min(num_partitions, 8),
        ).materialize()

        def conform(batch: pa.Table, _kept=tuple(kept)) -> pa.Table:
            cols = {}
            for k in keys:
                if k in _kept:
                    cols[k] = batch[k]
                else:
                    cols[k] = pa.array([None] * batch.num_rows, pa.string())
            cols[value_col] = batch[value_col]
            return pa.table(cols)

        levels.append(lvl.map_batches(conform, batch_format="pyarrow"))
        prev = lvl

    out = levels[0]
    for other in levels[1:]:
        out = out.union(other)
    return out


def grouped_corr(
    ds,
    key: str,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
):
    """SQL ``corr(x, y)`` / ``covar_pop(x, y)`` GROUP BY key →
    (key, n, corr_micro, covar_pop_micro).

    The textbook decomposable-moment treatment: x/y are fixed to integer
    cents in the map stage, so the shuffled state per group is five
    EXACT int64 sums (n, Σx, Σy, Σxy, Σx², Σy²) that any accumulation
    order reproduces bit-identically; one tiny finalize computes the
    floating formula and fixes it to micro-units. No corpus-sized float
    accumulation → no order-dependent drift vs the oracle.
    """
    num_partitions = default_partitions(num_partitions)

    def moments(batch: pa.Table) -> pa.Table:
        x = (
            round_away(pc.multiply(batch[x_col].cast(pa.float64()), 100.0))
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy()
        )
        y = (
            round_away(pc.multiply(batch[y_col].cast(pa.float64()), 100.0))
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy()
        )
        return pa.table(
            {
                key: batch[key],
                "n": pa.array(np.ones(len(x), np.int64), pa.int64()),
                "sx": pa.array(x, pa.int64()),
                "sy": pa.array(y, pa.int64()),
                "sxy": pa.array(x * y, pa.int64()),
                "sxx": pa.array(x * x, pa.int64()),
                "syy": pa.array(y * y, pa.int64()),
            }
        )

    sums = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow"),
        key,
        [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")],
        num_partitions=num_partitions,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n"].combine_chunks().to_numpy().astype(np.float64)
        sx = batch["sx"].combine_chunks().to_numpy().astype(np.float64)
        sy = batch["sy"].combine_chunks().to_numpy().astype(np.float64)
        sxy = batch["sxy"].combine_chunks().to_numpy().astype(np.float64)
        sxx = batch["sxx"].combine_chunks().to_numpy().astype(np.float64)
        syy = batch["syy"].combine_chunks().to_numpy().astype(np.float64)
        # cents → original units: covar scales by 1e-4
        cov = (sxy - sx * sy / n) / n * 1e-4
        varx = sxx - sx * sx / n
        vary = syy - sy * sy / n
        denom = np.sqrt(varx * vary)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = np.where(denom > 0, (sxy - sx * sy / n) / denom, np.nan)
        def micro(a):
            # round_away, not np.round, for consistency with every other
            # oracle-facing rounding site (ENGINEERING_NOTES "Rounding
            # parity with DuckDB oracles"). Caveat: exact-.5 landings are
            # not a parity guarantee either way — DuckDB's streaming
            # co-moment accumulation differs from these exact int sums in
            # the last ulp near ties (measured: engineered tie 5762.5 here
            # vs 5762.4999999999998 in DuckDB), so tie-adjacent values are
            # inherently oracle-fragile at micro precision regardless of
            # rounding mode.
            rounded = round_away(pa.array(np.where(np.isnan(a), 0.0, a) * 1e6))
            out = pc.cast(rounded, pa.int64()).to_numpy()
            return pa.array(out, pa.int64(), mask=np.isnan(a))
        return pa.table(
            {
                key: batch[key],
                "n": batch["n"],
                "corr_micro": micro(corr),
                "covar_pop_micro": micro(cov),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow")


def _tagged_distinct(ds, cols: list[str], tag: str):
    def prep(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        t = t.append_column(
            "in_a", pa.array(np.full(t.num_rows, 1 if tag == "a" else 0, np.int64))
        )
        t = t.append_column(
            "in_b", pa.array(np.full(t.num_rows, 1 if tag == "b" else 0, np.int64))
        )
        # in-block distinct BEFORE the shuffle
        return _arrow_aggregate(t, cols, [("in_a", "max"), ("in_b", "max")])

    return ds.map_batches(prep, batch_format="pyarrow")


def _set_op(a, b, cols, keep, num_partitions):
    num_partitions = default_partitions(num_partitions)
    both = _tagged_distinct(a, cols, "a").union(_tagged_distinct(b, cols, "b"))
    merged = hash_aggregate(
        both, cols, [("in_a", "max"), ("in_b", "max")],
        num_partitions=num_partitions,
    )

    def filt(batch: pa.Table) -> pa.Table:
        ia = batch["in_a"].combine_chunks().to_numpy()
        ib = batch["in_b"].combine_chunks().to_numpy()
        return batch.select(cols).filter(pa.array(keep(ia, ib)))

    return merged.map_batches(filt, batch_format="pyarrow")


def intersect_distinct(a, b, cols: list[str], num_partitions: int | None = None):
    """SQL ``SELECT cols FROM a INTERSECT SELECT cols FROM b`` —
    distinct rows present on BOTH sides. Shape: per-side in-block
    distinct + presence flags, ONE shared hash aggregate (max of flags),
    stateless filter — each side's rows shuffle exactly once."""
    return _set_op(a, b, cols, lambda ia, ib: (ia > 0) & (ib > 0), num_partitions)


def except_distinct(a, b, cols: list[str], num_partitions: int | None = None):
    """SQL ``SELECT cols FROM a EXCEPT SELECT cols FROM b`` — distinct
    rows of a absent from b. Same single-shuffle shape as
    intersect_distinct."""
    return _set_op(a, b, cols, lambda ia, ib: (ia > 0) & (ib == 0), num_partitions)


def pivot_sum(
    ds,
    key: str,
    cat_col: str,
    value_col: str,
    categories: list[str],
    num_partitions: int | None = None,
):
    """SQL conditional-aggregate pivot:

        SELECT key, sum(CASE WHEN cat = c THEN v END) AS <c>_sum, ...
        GROUP BY key

    → one wide row per key with an int64 sum column per category
    (``<c>_sum``), NULL where the (key, category) cell has no rows —
    Arrow's grouped sum skips nulls and yields null for all-null groups,
    matching SQL, so the masked columns flow through the standard
    two-phase aggregate unchanged.

    Scale shape: the category list must be SMALL and KNOWN (it defines
    the output schema — classic pivot precondition); the data makes ONE
    pass building |categories| masked columns per batch and then ONE
    two-phase hash aggregate keyed on ``key``. No shuffle per category,
    no second pass to discover categories (use grouped_count on
    ``cat_col`` first if the category set is unknown).
    """
    if not categories:
        raise ValueError("pivot_sum: categories must be a non-empty list")
    out_cols = [f"{c}_sum" for c in categories]

    def mask_cols(batch: pa.Table) -> pa.Table:
        cat = batch[cat_col].combine_chunks()
        val = batch[value_col].combine_chunks()
        cols = {key: batch[key]}
        for c, out in zip(categories, out_cols):
            cols[out] = pc.if_else(
                pc.equal(cat, c), val, pa.scalar(None, val.type)
            )
        return pa.table(cols)

    return hash_aggregate(
        ds.map_batches(mask_cols, batch_format="pyarrow"),
        key,
        [(c, "sum") for c in out_cols],
        num_partitions,
    )


def unpivot(
    ds,
    id_cols: list[str],
    value_cols: list[str],
    cat_name: str = "name",
    value_name: str = "value",
    drop_null: bool = True,
):
    """SQL ``UNPIVOT`` (melt): wide columns → (id_cols..., name, value)
    rows. ``drop_null=True`` matches SQL UNPIVOT's EXCLUDE NULLS default
    (a NULL cell emits no row); pass False for INCLUDE NULLS.

    Scale shape: stateless per-batch reshape — id columns repeat
    |value_cols| times via zero-copy-ish Arrow concat, no shuffle, no
    state. The inverse of ``pivot_sum`` up to aggregation.
    """
    if not value_cols:
        raise ValueError("unpivot: value_cols must be a non-empty list")

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vtype = batch[value_cols[0]].type
        cols = {}
        for c in id_cols:
            arr = batch[c].combine_chunks()
            cols[c] = pa.concat_arrays([arr] * len(value_cols))
        cols[cat_name] = pa.concat_arrays(
            [
                pa.array([vc] * n, pa.string())
                for vc in value_cols
            ]
        )
        cols[value_name] = pa.concat_arrays(
            [batch[vc].combine_chunks().cast(vtype) for vc in value_cols]
        )
        out = pa.table(cols)
        if drop_null:
            out = out.filter(pc.is_valid(out[value_name]))
        return out

    return ds.map_batches(melt, batch_format="pyarrow")


# --- round-4 operators: argmax-per-group, string_agg, bloom semi join ------


def grouped_argmax(
    ds,
    key_col: str,
    order_cols: list[str],
    payload_cols: list[str],
    num_partitions: int | None = None,
):
    """ARGMAX per group: for each ``key_col`` value, the single row with
    the LARGEST ``order_cols`` tuple (lexicographic; all int64-castable —
    the (ts, id) shape), i.e. SQL

        SELECT ... QUALIFY row_number() OVER (
          PARTITION BY key ORDER BY o1 DESC, o2 DESC ...) = 1

    Scale shape: two-phase. Each input block reduces to ONE candidate
    row per key it contains (vectorized lexsort + segment-last take —
    the in-block combiner), so the shuffle moves at most
    blocks × distinct-keys-per-block rows; the per-partition finalize
    runs the identical kernel on the survivors. No Python loops, no
    driver state.
    """
    num_partitions = default_partitions(num_partitions)
    cols_needed = [key_col, *order_cols, *payload_cols]

    def reduce_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.select(cols_needed)
        key = batch[key_col].combine_chunks().cast(pa.int64()).to_numpy()
        orders = [
            batch[c].combine_chunks().cast(pa.int64()).to_numpy()
            for c in order_cols
        ]
        # lexsort: last key is primary → (order_cols reversed..., key)
        order = np.lexsort((*reversed(orders), key))
        key_s = key[order]
        # last row of each key segment = argmax of the order tuple
        seg_last = np.concatenate((key_s[1:] != key_s[:-1], [True]))
        take = pa.array(order[np.flatnonzero(seg_last)])
        return batch.select(cols_needed).take(take)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", _part_column(batch, [key_col], num_partitions)
        )

    reduced = ds.map_batches(reduce_block, batch_format="pyarrow").map_batches(
        add_part, batch_format="pyarrow"
    )
    return reduced.groupby("_part").map_groups(
        lambda g: reduce_block(g.drop_columns(["_part"])),
        batch_format="pyarrow",
    )


def grouped_topk(
    ds,
    key_col: str,
    sort_keys: list[tuple[str, str]],
    k: int,
    num_partitions: int | None = None,
):
    """Top-k rows per group under an arbitrary Arrow sort order — the
    k-row generalization of ``grouped_argmax`` (SQL
    ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY ...) <= k``).

    ``sort_keys`` is a pyarrow ``sort_indices`` spec
    (``[("score", "descending"), ("tok", "ascending")]``) — mixed
    int/string columns are fine because the kernel sorts through Arrow,
    not numpy. The order must be TOTAL per key (add a unique tiebreak
    column) for a deterministic result.

    Scale shape: two-phase and lossless. Per-key top-k of a union is
    contained in the union of per-block top-ks, so phase 1 reduces each
    input block to ≤ k rows per key it contains (one Arrow sort + one
    vectorized segment-rank mask), and only those survivors shuffle;
    phase 2 runs the identical kernel per key partition. No Python
    loops, no driver state.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    num_partitions = default_partitions(num_partitions)
    spec = [(key_col, "ascending"), *sort_keys]

    def reduce_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        t = batch.take(pc.sort_indices(batch, sort_keys=spec))
        key = t[key_col].combine_chunks()
        if pa.types.is_integer(key.type):
            keyn = key.cast(pa.int64()).to_numpy(zero_copy_only=False)
            new = np.concatenate(([True], keyn[1:] != keyn[:-1]))
        else:
            keyn = key.to_numpy(zero_copy_only=False)
            new = np.concatenate(([True], keyn[1:] != keyn[:-1]))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(keyn)))
        rank = np.arange(len(keyn)) - np.repeat(starts, sizes)
        return t.filter(pa.array(rank < k))

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", _part_column(batch, [key_col], num_partitions)
        )

    reduced = ds.map_batches(reduce_block, batch_format="pyarrow").map_batches(
        add_part, batch_format="pyarrow"
    )
    return reduced.groupby("_part").map_groups(
        lambda g: reduce_block(g.drop_columns(["_part"])),
        batch_format="pyarrow",
    )


def grouped_string_agg(
    ds,
    key_col: str,
    val_col: str,
    sep: str = ",",
    distinct: bool = True,
    out_col: str = "agg",
    num_partitions: int | None = None,
):
    """SQL ``string_agg(DISTINCT val, sep ORDER BY val)`` per key →
    (key, out_col). Deterministic: values sorted ascending within each
    key (the only order both engines reproduce exactly).

    Scale shape: in-block DISTINCT (group_by) first so the shuffle
    moves unique (key, val) pairs only, hash-partition by key, then ONE
    vectorized UDF per partition: Arrow sort, segment offsets →
    ListArray → ``pc.binary_join`` (no per-group Python). A group's
    concatenated string must fit a batch row — callers aggregate
    bounded-cardinality columns (tags, types, langs), not free text.
    """
    num_partitions = default_partitions(num_partitions)

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": batch[key_col].combine_chunks().cast(pa.int64()),
                "v": batch[val_col].combine_chunks().cast(pa.string()),
            }
        )
        # SQL string_agg SKIPS NULL values; a null reaching binary_join
        # would NULL-poison its whole group (and the null-aware Arrow
        # compare below would crash the distinct path)
        t = t.filter(pc.is_valid(t["v"]))
        if distinct:
            t = t.group_by(["k", "v"]).aggregate([])
        return t.append_column("_part", _part_column(t, ["k"], num_partitions))

    def per_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.string()),
                }
            )
        order = pc.sort_indices(
            group, sort_keys=[("k", "ascending"), ("v", "ascending")]
        )
        k_s = group["k"].take(order).combine_chunks()
        v_s = group["v"].take(order).combine_chunks()
        kn = k_s.to_numpy()
        if distinct:
            keep = np.concatenate(
                (
                    [True],
                    (kn[1:] != kn[:-1])
                    | pc.not_equal(
                        v_s.slice(1), v_s.slice(0, len(v_s) - 1)
                    ).to_numpy(zero_copy_only=False),
                )
            )
            if not keep.all():
                mask = pa.array(keep)
                k_s, v_s = k_s.filter(mask), v_s.filter(mask)
                kn = kn[keep]
        new_seg = np.concatenate(([True], kn[1:] != kn[:-1]))
        starts = np.flatnonzero(new_seg)
        offsets = np.concatenate((starts, [len(kn)])).astype(np.int32)
        if isinstance(v_s, pa.ChunkedArray):
            v_s = v_s.combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), v_s)
        joined = pc.binary_join(lists, sep)
        return pa.table(
            {
                key_col: pa.array(kn[starts], pa.int64()),
                out_col: joined,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


_BLOOM_H1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_H2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_positions(keys: np.ndarray, i: int, m_bits: int) -> np.ndarray:
    """i-th double-hash position for each key (Kirsch–Mitzenmacher:
    h_i = h1 + i*h2 mod m — standard public construction)."""
    k = keys.astype(np.uint64)
    h1 = (k * _BLOOM_H1) >> np.uint64(17)
    h2 = (k * _BLOOM_H2) >> np.uint64(15) | np.uint64(1)
    return ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


def bloom_semi_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    bits_per_key: int = 12,
    num_hashes: int = 4,
    num_partitions: int | None = None,
    max_bloom_bytes: int = 256 * 1024 * 1024,
):
    """EXACT semi join with a broadcast Bloom prefilter: keep the left
    rows whose key appears in the right side. Identical results to
    ``key_filter_join`` (the Bloom only prefilters; survivors are
    verified exactly), but the broadcast is ~``bits_per_key`` bits per
    distinct right key instead of 64 — at 12 bits/key (~0.3% FP) a
    2-billion-key build side fits a 3 GB filter where the sorted-array
    broadcast would need 16 GB, and the exact verify join then shuffles
    only the ~matching fraction of the probe side instead of all of it.

    Falls back to plain ``key_filter_join`` when the filter would exceed
    ``max_bloom_bytes``.
    """
    import ray

    num_partitions = default_partitions(num_partitions)

    def rkeys_only(batch: pa.Table) -> pa.Table:
        t = pa.table({"_k": batch[right_key].cast(pa.int64())})
        return t.group_by(["_k"]).aggregate([])

    distinct = hash_aggregate(
        right_ds.map_batches(rkeys_only, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "_n", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        "_k",
        [("_n", "sum")],
        num_partitions,
    ).materialize()
    n_keys = max(distinct.count(), 1)
    m_bits = n_keys * bits_per_key
    if m_bits > max_bloom_bytes * 8:
        # reuse the distinct keys just computed — don't rescan right_ds
        return key_filter_join(
            left_ds, distinct, left_key, "_k",
            num_partitions=num_partitions,
        )

    size = (m_bits + 7) // 8

    def _bitmap_of(ks: np.ndarray) -> np.ndarray:
        """Vectorized bitmap: after np.unique each (byte, bit) pair is
        distinct, so a weighted bincount of 2^bit per byte EQUALS the
        bitwise OR — no per-element np.bitwise_or.at scatter (measured
        ~50× slower at filter scale)."""
        pos = np.unique(
            np.concatenate(
                [_bloom_positions(ks, i, m_bits) for i in range(num_hashes)]
            )
        )
        return np.bincount(
            pos >> 3,
            weights=(np.uint8(1) << (pos & 7).astype(np.uint8)).astype(
                np.float64
            ),
            minlength=size,
        ).astype(np.uint8)

    refs = distinct.to_arrow_refs()
    if size <= 64 * 1024 * 1024:
        # distributed build: one partial bitmap task per distinct-key
        # block, OR-merged on the driver — the build side never funnels
        # its keys through one core (review finding, round 4)
        @ray.remote
        def _partial(tbl: pa.Table) -> np.ndarray:
            return _bitmap_of(
                tbl["_k"].to_numpy(zero_copy_only=False)
                if tbl.num_rows
                else np.zeros(0, np.int64)
            )

        # OR-merge incrementally with ray.wait — fetch ONE ready partial
        # at a time so driver residency stays O(size), not
        # O(blocks × size); unconsumed partials live in the object store
        # where they can spill (ADVICE r4)
        bloom = np.zeros(size, dtype=np.uint8)
        pending = [_partial.remote(r) for r in refs]
        while pending:
            done, pending = ray.wait(pending, num_returns=1)
            np.bitwise_or(bloom, ray.get(done[0]), out=bloom)
    else:
        # filter too large to ship per-task: pull key blocks ONE at a
        # time (same O(size)+O(block) driver bound) and build with the
        # same vectorized kernel (array OR per block, no .at)
        bloom = np.zeros(size, dtype=np.uint8)
        pending = list(refs)
        while pending:
            done, pending = ray.wait(pending, num_returns=1)
            tbl = ray.get(done[0])
            if tbl.num_rows:
                np.bitwise_or(
                    bloom,
                    _bitmap_of(tbl["_k"].to_numpy(zero_copy_only=False)),
                    out=bloom,
                )
    bloom_ref = ray.put(bloom)

    def prefilter(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        bits = _get_broadcast(bloom_ref)
        lk = batch[left_key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hit = np.ones(len(lk), dtype=bool)
        for i in range(num_hashes):
            pos = _bloom_positions(lk, i, m_bits)
            hit &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 > 0
        return batch.filter(pa.array(hit))

    candidates = left_ds.map_batches(prefilter, batch_format="pyarrow")
    # exact verify pass removes Bloom false positives (≈0.3% at 12/4);
    # verify against the ALREADY-computed distinct key table so the
    # build side is scanned once, not twice
    return key_filter_join(
        candidates, distinct, left_key, "_k", num_partitions=num_partitions
    )


def histogram_quantiles(
    ds,
    value_col: str,
    fractions: list[float],
    num_buckets: int = 1024,
    scale: float = 100.0,
):
    """Approximate quantiles via a DETERMINISTIC fixed-width integer
    histogram — the mergeable-sketch shape for 100 TB quantiles where
    the exact count-compressed shuffle (grouped_quantiles) is too wide.

    Two cheap passes: (1) global min/max aggregate over
    round(value·scale) ints; (2) bucket-count aggregate with width
    w = ceil((max−min+1)/B) — bucket counts ADD across blocks/nodes, so
    the shuffle moves ≤ B rows per block. The estimate for fraction f is
    the LOWER EDGE of the bucket holding the ceil(f·N)-th value —
    deterministic integer math end to end (error ≤ one bucket width,
    i.e. (max−min)/B), so a SQL twin reproduces it bit-exactly; the
    driver holds only the B-row histogram.

    Returns (fraction_pct: int64, est_cents: int64), one row per
    requested fraction."""
    import ray

    def to_cents(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "cents": round_away(
                    pc.multiply(
                        batch[value_col].combine_chunks().cast(pa.float64()),
                        scale,
                    )
                ).cast(pa.int64())
            }
        )
        return t.filter(pc.is_valid(t["cents"]))  # SQL quantiles skip NULLs

    cents_mat = ds.map_batches(to_cents, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max, Min

    mm = cents_mat.aggregate(Min("cents"), Max("cents"))  # ONE pass
    lo, hi = mm.get("min(cents)"), mm.get("max(cents)")
    if lo is None:
        return pa.table(
            {
                "fraction_pct": pa.array([], pa.int64()),
                "est_cents": pa.array([], pa.int64()),
            }
        )
    lo, hi = int(lo), int(hi)
    width = max(1, -(-(hi - lo + 1) // num_buckets))

    def bucketize(batch: pa.Table) -> pa.Table:
        c = batch["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        b = (c - lo) // width
        t = pa.table({"bucket": pa.array(b, pa.int64())})
        return (
            t.group_by(["bucket"])
            .aggregate([("bucket", "count")])
            .rename_columns(["bucket", "n"])
        )

    hist = hash_aggregate(
        cents_mat.map_batches(bucketize, batch_format="pyarrow"),
        "bucket",
        [("n", "sum")],
    )
    tbl = pa.concat_tables(
        ray.get(hist.materialize().to_arrow_refs())
    ).sort_by([("bucket", "ascending")])
    buckets = tbl["bucket"].to_numpy()
    counts = tbl["n"].to_numpy()
    csum = np.cumsum(counts)
    total = int(csum[-1])
    fr, est = [], []
    for f in fractions:
        rank = max(1, min(total, -(-int(round(f * 1000)) * total // 1000)))
        i = int(np.searchsorted(csum, rank))
        fr.append(int(round(f * 100)))
        est.append(lo + int(buckets[i]) * width)
    return pa.table(
        {
            "fraction_pct": pa.array(fr, pa.int64()),
            "est_cents": pa.array(est, pa.int64()),
        }
    )


def grouped_mode(
    ds,
    key_col: str,
    val_col: str,
    count_col: str = "n",
    num_partitions: int | None = None,
):
    """MODE per group: for each ``key_col`` (int) the most frequent
    ``val_col`` value, deterministic tie-break = smallest value. SQL

        SELECT key, val, count(*) AS n FROM t GROUP BY key, val
        QUALIFY row_number() OVER (
          PARTITION BY key ORDER BY n DESC, val ASC) = 1

    Scale shape: phase 1 is the existing two-phase ``grouped_count`` on
    (key, val) — in-block combine collapses repeats before the only
    all-to-all. Phase 2 reduces (key, val, n) to one row per key with an
    in-block Arrow-sort + segment-first combiner and the identical
    kernel per hash partition, so the second exchange moves at most
    blocks × keys-per-block candidate rows. ``val_col`` may be any
    Arrow-orderable type (string included); ``key_col`` must be
    int64-castable (it is the shuffle hash key).
    """
    num_partitions = default_partitions(num_partitions)
    counts = grouped_count(
        ds.select_columns([key_col, val_col]),
        [key_col, val_col],
        count_col=count_col,
        num_partitions=num_partitions,
    )

    def reduce_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                (key_col, "ascending"),
                (count_col, "descending"),
                (val_col, "ascending"),
            ],
        )
        srt = batch.take(idx)
        key = srt[key_col].combine_chunks().cast(pa.int64()).to_numpy()
        firsts = np.concatenate(([True], key[1:] != key[:-1]))
        return srt.filter(pa.array(firsts))

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", _part_column(batch, [key_col], num_partitions)
        )

    reduced = counts.map_batches(reduce_block, batch_format="pyarrow").map_batches(
        add_part, batch_format="pyarrow"
    )
    return reduced.groupby("_part").map_groups(
        lambda g: reduce_block(g.drop_columns(["_part"])),
        batch_format="pyarrow",
    )


def grouped_zscore(
    ds,
    key_col: str,
    val_col: str,
    scale: float = 100.0,
    out_col: str = "zscore_micro",
    num_partitions: int | None = None,
):
    """Per-group standardization: attach to every row the z-score of its
    value within its group, as micro-units (round-half-away int64), plus
    the fixed-point value ``v`` the score was computed from. Population
    std (÷N). Groups where std == 0 get NULL.

    Float-determinism contract (same recipe as ``grouped_corr``): values
    quantize to int64 fixed-point first (``round_away(value·scale)``),
    moment sums travel the shuffle as EXACT int64s, and the finalize
    computes mean/std/z through one pinned float64 expression tree —
    so an oracle that mirrors the tree reproduces the result bit-for-bit
    regardless of either engine's summation order.

    Scale shape: one two-phase aggregate builds the per-group moment
    table (rows = distinct groups), which re-attaches via ``lookup_join``
    — broadcast (zero shuffle) while the group table stays under the
    broadcast bound, partitioned searchsorted join above it. The corpus
    is never collected, never re-sorted.
    """
    num_partitions = default_partitions(num_partitions)
    schema = ds.schema(fetch_if_missing=True)
    passthrough = [n for n in schema.names if n not in (key_col, val_col)]
    # "v" is the operator's reserved fixed-point column; a passthrough
    # column of the same name would be silently shadowed in quantize and
    # then re-read by finalize — refuse, like lookup_join does on overlap
    reserved = {"v", "sv", "svv", "cnt", out_col}
    # key_col rides through quantize/moments dict literals, so a key
    # named after an internal column silently collapses the dict (or
    # dies later with an unrelated duplicate-column error) — refuse it
    # here with the same clear message as a passthrough clash
    clash = (
        sorted(reserved & set(passthrough))
        + ([key_col] if key_col in {"v", "sv", "svv", "cnt", out_col} else [])
        + ([out_col] if out_col in (key_col, val_col, "v") else [])
    )
    if clash:
        raise ValueError(
            f"grouped_zscore: reserved column collision: {clash} "
            "(rename the input column or pass a different out_col)"
        )

    def quantize(batch: pa.Table) -> pa.Table:
        v = round_away(
            pc.multiply(batch[val_col].combine_chunks().cast(pa.float64()), scale)
        ).cast(pa.int64())
        cols = {key_col: batch[key_col].combine_chunks().cast(pa.int64()), "v": v}
        for c in passthrough:
            cols[c] = batch[c].combine_chunks()
        return pa.table(cols)

    quant = ds.map_batches(quantize, batch_format="pyarrow")

    def moments(batch: pa.Table) -> pa.Table:
        v = batch["v"].combine_chunks().to_numpy()
        return pa.table(
            {
                key_col: batch[key_col].combine_chunks(),
                "sv": pa.array(v, pa.int64()),
                "svv": pa.array(v * v, pa.int64()),
                "cnt": pa.array(np.ones(len(v), np.int64)),
            }
        )

    stats = hash_aggregate(
        quant.select_columns([key_col, "v"]).map_batches(
            moments, batch_format="pyarrow"
        ),
        [key_col],
        [("sv", "sum"), ("svv", "sum"), ("cnt", "sum")],
        num_partitions=num_partitions,
    )

    joined = lookup_join(
        quant,
        stats,
        key_col,
        key_col,
        num_partitions=num_partitions,
        # stats ends in hash_aggregate's all-to-all: hand the join its
        # statically-known schema so schema inference doesn't execute
        # the whole moment shuffle once for the schema and again for
        # the real run
        right_schema=pa.schema(
            [
                (key_col, pa.int64()),
                ("sv", pa.int64()),
                ("svv", pa.int64()),
                ("cnt", pa.int64()),
            ]
        ),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        v = batch["v"].combine_chunks().cast(pa.float64()).to_numpy()
        sv = batch["sv"].combine_chunks().cast(pa.float64()).to_numpy()
        svv = batch["svv"].combine_chunks().cast(pa.float64()).to_numpy()
        n = batch["cnt"].combine_chunks().cast(pa.float64()).to_numpy()
        # pinned float64 tree: mean = sv/n; var = svv/n - mean*mean
        mean = sv / n
        std = np.sqrt(svv / n - mean * mean)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - mean) / std
        # non-finite z (std == 0) is NULLed below; keep the cast safe
        z = np.where(np.isfinite(z), z, 0.0)
        micro = round_away(pa.array(z * 1e6, pa.float64()))
        out = pa.table(
            {
                key_col: batch[key_col].combine_chunks(),
                "v": batch["v"].combine_chunks(),
                out_col: micro.cast(pa.int64(), safe=False),
            }
        )
        for c in passthrough:
            out = out.append_column(c, batch[c].combine_chunks())
        # std == 0 (or a 1-row group) → NULL, matching SQL NULLIF
        bad = pa.array(~(std > 0))
        return out.set_column(
            out.column_names.index(out_col),
            out_col,
            pc.if_else(bad, pa.scalar(None, pa.int64()), out[out_col]),
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def quantile_filter(
    ds,
    value_col: str,
    q: float,
    num_partitions: int | None = None,
):
    """Keep rows whose integer ``value_col`` is ≥ the GLOBAL continuous
    q-quantile of that column (the classic "drop the bottom tail"
    corpus gate, e.g. q=0.25 drops the shortest quarter of documents).

    Scale shape: the threshold comes from ``grouped_quantiles_int``
    under a constant group key — rows collapse to (value → count) in the
    in-block combine, so the exchange moves DISTINCT VALUES, not rows;
    the driver holds exactly one float64 scalar, which re-enters the
    stream as a closure constant for one stateless filter pass.
    Interpolation replicates DuckDB ``quantile_cont`` bit-for-bit, so
    an int-vs-threshold comparison can never straddle engines.

    ``ds`` is consumed twice (threshold pass + filter pass) — pass a
    materialized/cheap-to-recompute dataset, or materialize upstream if
    the producer is expensive.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("quantile_filter: q must be in [0, 1]")
    num_partitions = default_partitions(num_partitions)

    def const_key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_g": pa.array(np.zeros(batch.num_rows, np.int64)),
                value_col: batch[value_col].combine_chunks().cast(pa.int64()),
            }
        )

    qtbl = grouped_quantiles_int(
        ds.select_columns([value_col]).map_batches(
            const_key, batch_format="pyarrow"
        ),
        "_g",
        value_col,
        {"thr": q},
        num_partitions=num_partitions,
    )
    rows = list(qtbl.iter_batches(batch_format="pyarrow"))
    nonempty = [t for t in rows if t.num_rows]
    if not nonempty:
        return ds  # empty input: nothing to filter
    thr = float(pa.concat_tables(nonempty)["thr"][0].as_py())

    def keep(batch: pa.Table) -> pa.Table:
        v = batch[value_col].combine_chunks().cast(pa.float64())
        return batch.filter(pc.greater_equal(v, thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(
    ds,
    k: int,
    weight_col: str,
    id_col: str,
    seed: int = 17,
):
    """Global weighted sample WITHOUT replacement: the classic
    importance-subsampling pass over a training corpus (keep k documents
    with probability proportional to a quality/length weight).

    Algorithm: Efraimidis–Spirakis A-ES (Inf. Process. Lett. 97(5),
    2006) — every row draws u ∈ (0,1) and competes with the exponential
    race key ``-ln(u)/w``; the k SMALLEST keys win. u comes from the same
    seeded splitmix-style hash of ``id_col`` as ``stratified_sample``, so
    the sample is a pure function of (id, weight, seed): reproducible
    across runs, partitionings and cluster sizes, and re-expressible in
    SQL for the DuckDB oracle. Rows with weight ≤ 0 or NULL never win
    (selection probability 0). Ties are impossible on the continuous key;
    (key, id) ordering pins the boundary deterministically anyway.

    Scale shape: one stateless pass computes keys and prunes to the
    in-block top-k, so the exchange ships ≤ k rows PER BLOCK — never the
    corpus; a single final reduce (the only non-parallel step, bounded at
    k × blocks rows, i.e. driver-scalar-sized for any sane k) picks the
    global winners. No sort, no shuffle of the input.
    """
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")

    def _keys(ids: np.ndarray, w: np.ndarray) -> np.ndarray:
        from phrasekit_ray.sources.pages import splitmix17

        h = splitmix17(ids, seed)
        # u ∈ (0,1): +0.5 keeps u strictly positive when the hash is 0
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        with np.errstate(divide="ignore", invalid="ignore"):
            key = -np.log(u) / w
        # w <= 0 / NULL-filled rows race at +inf: they never win
        key[~(w > 0)] = np.inf
        return key

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_key", pa.array([], pa.float64()))
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (
            batch[weight_col]
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        key = _keys(ids, np.nan_to_num(w, nan=0.0))
        t = batch.append_column("_key", pa.array(key, pa.float64()))
        if t.num_rows > k:
            sel = np.argpartition(key, k - 1)[:k]
            t = t.take(pa.array(np.sort(sel), pa.int64()))
        return t.filter(pc.is_finite(t["_key"]))

    import ray

    cand = ds.map_batches(prune, batch_format="pyarrow").materialize()
    # final reduce: ≤ k × blocks candidate rows — small by construction
    tables = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
    if not tables:
        return cand.drop_columns(["_key"])
    allc = pa.concat_tables(tables, promote_options="default")
    idx = pc.sort_indices(
        allc, sort_keys=[("_key", "ascending"), (id_col, "ascending")]
    )
    win = allc.take(idx.slice(0, min(k, allc.num_rows))).drop_columns(["_key"])
    return ray.data.from_arrow(win)


def percent_rank_column(
    ds,
    value_col: str,
    num_partitions: int | None = None,
    out_col: str = "pr_micro",
    scale: int = 1_000_000,
):
    """Global percentile-rank normalization (X112): attach
    ``⌊scale · rank_strictly_less / (N−1)⌋`` for each row's integer
    ``value_col`` — SQL ``(rank() OVER (ORDER BY v) − 1) / (N − 1)``
    in exact integer micro-units (the corpus-calibration transform for
    quality signals: scores become comparable across corpora without
    assuming a distribution).

    Scale shape: one two-phase (value → count) aggregate moves DISTINCT
    VALUES only (never rows); the compressed distribution lands on the
    driver (bounded by value cardinality — integer quality signals are
    low-cardinality by construction; at higher cardinality bucket the
    values upstream), cumulates in one numpy pass, broadcasts once via
    the closure, and re-attaches with ONE searchsorted per batch.
    ``ds`` is consumed twice (distribution pass + attach pass).
    """
    num_partitions = default_partitions(num_partitions)

    def vrows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_v": batch[value_col].combine_chunks().cast(pa.int64()),
                "_n": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.select_columns([value_col]).map_batches(
            vrows, batch_format="pyarrow"
        ),
        ["_v"],
        [("_n", "sum")],
        num_partitions=num_partitions,
    )
    import ray

    tabs = [t for t in ray.get(counts.materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        def empty_attach(batch: pa.Table) -> pa.Table:
            return batch.append_column(out_col, pa.nulls(batch.num_rows, pa.int64()))

        return ds.map_batches(empty_attach, batch_format="pyarrow")
    dist = pa.concat_tables(tabs)
    vals = dist["_v"].to_numpy(zero_copy_only=False)
    cnts = dist["_n"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals)
    vals = vals[order]
    cnts = cnts[order]
    less = np.concatenate(([0], np.cumsum(cnts)[:-1]))  # strictly-less counts
    total = int(cnts.sum())
    denom = max(total - 1, 1)

    def attach(batch: pa.Table) -> pa.Table:
        v = batch[value_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        idx = np.searchsorted(vals, v)
        pr = (np.int64(scale) * less[idx]) // denom
        return batch.append_column(out_col, pa.array(pr, pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def cms_token_topk(
    ds,
    text_col: str = "text",
    k: int = 20,
    width: int = 1024,
    depth: int = 4,
):
    """Count-min-sketch top-k tokens (X116 — Cormode & Muthukrishnan
    2005): per-block LOCAL (depth × width) count matrices ride the
    exchange as ≤ depth·width (cell, n) rows each (mergeable by plain
    SUM, like the HLL registers), the global sketch is driver-bounded
    (depth·width ints), and per-token estimates = min over depth cells
    attach to the distinct-token stream with vectorized lookups + an
    in-block top-k prune (global estimates are partition-invariant, so
    the prune is lossless). CMS never underestimates: est ≥ exact,
    within εN w.h.p.

    Cell hash: the engine's md5 token hash + row salt through the
    shared splitmix chain — deterministic and re-expressible in the
    DuckDB oracle, so even the APPROXIMATE sketch is bit-exact checked.
    Returns pa.Table(tok, est_count) top-k by (est desc, tok asc).
    """
    import ray

    from phrasekit_ray.sources.pages import splitmix17
    from phrasekit_ray.stages.dedup import _token_hashes

    dw = depth * width

    def local_sketch(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(batch[text_col].combine_chunks(), " ")
        )
        if len(toks) == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        h = _token_hashes(toks)
        flat = np.zeros(dw, np.int64)
        for j in range(depth):
            c = (splitmix17(h + np.uint64(j)) % np.uint64(width)).astype(
                np.int64
            )
            flat[j * width :(j + 1) * width] += np.bincount(c, minlength=width)
        nz = np.flatnonzero(flat)
        return pa.table(
            {
                "cell": pa.array(nz, pa.int64()),
                "n": pa.array(flat[nz], pa.int64()),
            }
        )

    sk = hash_aggregate(
        ds.select_columns([text_col]).map_batches(
            local_sketch, batch_format="pyarrow"
        ),
        ["cell"],
        [("n", "sum")],
    )
    flat = np.zeros(dw, np.int64)
    for t in ray.get(sk.materialize().to_arrow_refs()):
        if t.num_rows:
            flat[t["cell"].to_numpy(zero_copy_only=False)] = t[
                "n"
            ].to_numpy(zero_copy_only=False)

    def estimate(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(batch[text_col].combine_chunks(), " ")
        )
        empty = pa.table(
            {
                "tok": pa.array([], pa.string()),
                "est_count": pa.array([], pa.int64()),
            }
        )
        if len(toks) == 0:
            return empty
        uniq = pc.unique(toks)
        h = _token_hashes(uniq)
        est = np.full(len(uniq), np.iinfo(np.int64).max)
        for j in range(depth):
            c = (splitmix17(h + np.uint64(j)) % np.uint64(width)).astype(
                np.int64
            )
            est = np.minimum(est, flat[j * width + c])
        t = pa.table(
            {"tok": uniq.cast(pa.string()), "est_count": pa.array(est, pa.int64())}
        )
        if t.num_rows > k:  # lossless: estimates are global values
            idx = pc.sort_indices(
                t,
                sort_keys=[("est_count", "descending"), ("tok", "ascending")],
            )
            t = t.take(idx.slice(0, k))
        return t

    cand_tabs = [
        t
        for t in ray.get(
            ds.select_columns([text_col])
            .map_batches(estimate, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not cand_tabs:
        return pa.table(
            {"tok": pa.array([], pa.string()), "est_count": pa.array([], pa.int64())}
        )
    allc = pa.concat_tables(cand_tabs, promote_options="default")
    # dedupe candidate tokens (same global estimate everywhere); select
    # BY NAME — group_by output column order differs across pyarrow
    # versions (keys-first vs aggregates-first)
    allc = (
        allc.group_by(["tok"])
        .aggregate([("est_count", "min")])
        .select(["tok", "est_count_min"])
        .rename_columns(["tok", "est_count"])
    )
    idx = pc.sort_indices(
        allc, sort_keys=[("est_count", "descending"), ("tok", "ascending")]
    )
    return allc.take(idx.slice(0, min(k, allc.num_rows)))


def weighted_stratified_sample(
    ds,
    group_col: str,
    n_per_group: int,
    weight_col: str,
    id_col: str,
    seed: int = 17,
    num_partitions: int | None = None,
):
    """Per-GROUP weighted sample without replacement (X127 — the
    per-language/per-source form of ``weighted_sample``): within each
    group, keep the ``n_per_group`` rows winning the Efraimidis–Spirakis
    race ``-ln(u(id))/w``. Pure function of (id, weight, seed) →
    partition-invariant and SQL-exact; weight ≤ 0 / NULL rows never win.

    Scale shape: identical to ``stratified_sample`` — in-block top-n
    prune per group first, so the exchange ships ≤ n_per_group × blocks
    rows per group; one vectorized per-PARTITION finalize.
    """
    from phrasekit_ray.sources.pages import splitmix17

    num_partitions = default_partitions(num_partitions)

    def _topn(t: pa.Table, extra_drop: list[str], keep_rank=False) -> pa.Table:
        drop = extra_drop if keep_rank else ["_race"] + extra_drop
        enc = t[group_col].cast(pa.string()).combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["_race"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t[id_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False), r, codes))
        codes_s = codes[order]
        m = len(codes_s)
        if m == 0:
            return t.drop_columns(drop)
        seg = np.flatnonzero(
            np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        )
        sizes = np.diff(np.concatenate((seg, [m])))
        pos = np.arange(m) - np.repeat(seg, sizes)
        sel = order[pos < n_per_group]
        return t.take(pa.array(np.sort(sel))).drop_columns(drop)

    def rank_and_prune(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (
            batch[weight_col]
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        w = np.nan_to_num(w, nan=0.0)
        h = splitmix17(ids, seed)
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        with np.errstate(divide="ignore", invalid="ignore"):
            race = -np.log(u) / w
        race[~(w > 0)] = np.inf
        t = batch.append_column("_race", pa.array(race, pa.float64()))
        t = t.filter(pc.is_finite(t["_race"]))
        pruned = _topn(t, [], keep_rank=True)
        return pruned.append_column(
            "_part", _part_column(pruned, [group_col], num_partitions)
        )

    pruned = ds.map_batches(rank_and_prune, batch_format="pyarrow")
    return pruned.groupby("_part").map_groups(
        lambda g: _topn(g, ["_part"]), batch_format="pyarrow"
    )


def _skyline_mask(d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2D skyline (maximize d1, minimize d2) —
    dominance is q.d1 ≥ p.d1 ∧ q.d2 ≤ p.d2 with strict inequality
    somewhere; ties on BOTH dims are mutually non-dominating, so every
    duplicate of a frontier point survives. One lexsort + one cummin:
    group positions into d1 levels (sorted desc); a point survives iff
    it ties its level's min d2 AND that min is STRICTLY below the best
    d2 of every greater level."""
    n = len(d1)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((d2, -d1))  # d1 desc, d2 asc
    s1, s2 = d1[order], d2[order]
    new_level = np.empty(n, bool)
    new_level[0] = True
    new_level[1:] = s1[1:] != s1[:-1]
    lvl = np.cumsum(new_level) - 1  # level index per position
    level_min = s2[new_level]  # first position of each level = its min d2
    prev_best = np.concatenate(
        ([np.iinfo(np.int64).max], np.minimum.accumulate(level_min)[:-1])
    )
    keep_sorted = (s2 == level_min[lvl]) & (s2 < prev_best[lvl])
    out = np.zeros(n, bool)
    out[order] = keep_sorted
    return out


def skyline_2d(ds, id_col: str, max_col: str, min_col: str,
               num_partitions: int | None = None):
    """Distributed 2D skyline (Pareto frontier): rows not dominated by
    any other row under (maximize ``max_col``, minimize ``min_col``).

    Two phases, both exact: per-block LOCAL skyline (one lexsort + one
    cummin per block — a row dominated within its block is dominated
    globally, so local pruning is lossless), then the surviving
    candidates coalesce into ONE task for the final exact pass (the 2D
    frontier is tiny relative to the input — at 100 TB the candidate
    union is bounded by blocks × per-block frontier, still a single-task
    table; no driver materialization either way).

    Returns Dataset(id_col, max_col, min_col) of frontier rows.
    """

    def local(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                max_col: batch[max_col].cast(pa.int64()),
                min_col: batch[min_col].cast(pa.int64()),
            }
        )
        d1 = t[max_col].combine_chunks().to_numpy(zero_copy_only=False)
        d2 = t[min_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_skyline_mask(d1, d2)))

    candidates = ds.map_batches(local, batch_format="pyarrow")
    return candidates.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None
    )


def kmv_distinct(
    docs,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 64,
):
    """KMV (k-minimum-values) distinct-token sketch per group (Bar-Yossef
    et al. 2002): keep the k smallest DISTINCT 64-bit token hashes per
    group; estimate D̂ = (k−1)·2⁶⁴ / h₍ₖ₎, or the exact distinct count
    when a group has fewer than k. Unlike HLL (X36, rows-only ±4σ
    check) every step here is a deterministic function of the input —
    the hash is the engine-wide md5_number_upper convention and the
    estimate one fixed float64 expression — so the SQL twin is EXACT.

    Scale shape: per-block per-group k-min prune over UNIQUE hashes
    (one lexsort per batch), so the shuffle carries ≤ k·groups·blocks
    8-byte values; the per-group merge re-runs the identical prune.
    Mergeability is the point: partials at any partitioning give the
    same final sketch.

    Returns pa.Table(group_col, est_distinct) sorted by group — the
    group cardinality is the #distinct group keys (bounded, e.g.
    languages), not the corpus.
    """
    import hashlib

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "h": pa.array([], pa.uint64()),
                }
            )
        if "h" in batch.column_names:  # merge phase: already hashed
            gv = batch[group_col].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            h = batch["h"].combine_chunks().to_numpy(zero_copy_only=False)
        else:
            toks = pc.split_pattern(batch[text_col], " ")
            n_tok = pc.list_value_length(toks).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            gv = np.repeat(
                batch[group_col].combine_chunks().to_numpy(
                    zero_copy_only=False
                ),
                n_tok,
            )
            flat = pc.list_flatten(toks).combine_chunks()
            enc = pc.dictionary_encode(flat)
            uniq = enc.dictionary.to_pylist()
            hu = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(t.encode()).digest()[:8], "little"
                    )
                    for t in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            h = hu[enc.indices.to_numpy(zero_copy_only=False)]
        gv = np.asarray(gv, dtype=object)
        order = np.lexsort((h, gv))
        gs, hs = gv[order], h[order]
        # distinct (group, h) then first k per group
        first = np.ones(len(gs), bool)
        first[1:] = (gs[1:] != gs[:-1]) | (hs[1:] != hs[:-1])
        gs, hs = gs[first], hs[first]
        new_g = np.ones(len(gs), bool)
        new_g[1:] = gs[1:] != gs[:-1]
        pos_in_group = np.arange(len(gs)) - np.maximum.accumulate(
            np.where(new_g, np.arange(len(gs)), 0)
        )
        keep = pos_in_group < k
        return pa.table(
            {
                group_col: pa.array(gs[keep].tolist(), pa.string()),
                "h": pa.array(hs[keep], pa.uint64()),
            }
        )

    def estimate(group: pa.Table) -> pa.Table:
        t = prune(group)
        h = np.sort(t["h"].to_numpy(zero_copy_only=False))
        name = group[group_col][0].as_py()
        if len(h) < k:
            est = len(h)
        else:
            hk = np.float64(h[k - 1])
            est = int(
                np.sign(1.0)
                * np.floor(np.abs((k - 1.0) * 18446744073709551616.0 / hk) + 0.5)
            )
        return pa.table(
            {
                group_col: pa.array([name], pa.string()),
                "est_distinct": pa.array([est], pa.int64()),
            }
        )

    partials = docs.map_batches(prune, batch_format="pyarrow")
    out_ds = partials.groupby(group_col).map_groups(
        estimate, batch_format="pyarrow"
    )
    parts = [b for b in out_ds.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(parts, promote_options="default")
    return t.take(pc.sort_indices(t, sort_keys=[(group_col, "ascending")]))
