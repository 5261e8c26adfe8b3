"""Windowed / time-ordered operators over event streams.

No reference analog (phrasekit is pure batch, SURVEY.md §2.9); these are
the custom time-series operators a training-data pipeline needs (task
brief: "as-of join, windowed aggregate"), built per SURVEY.md's
custom-operator recipe.

Scale shape (all three operators): the shuffle key is a DERIVED int
partition id (``user_id`` hashed mod P), so each ``map_groups`` UDF call
processes one PARTITION — all of its users at once with vectorized
segment kernels (lexsort + boundary masks / pandas groupby-cummax, both
C paths) — never one Python call per user key. With 10⁸ users that is P
UDF invocations, not 10⁸. Partitioning assumption (documented per the
custom-operator rule): one partition = the full history of every user
hashed into it; no single PARTITION may exceed a worker's heap — the
default auto-sizes to 2× cluster CPUs (``agg.default_partitions``), and
at scale you should pass ``num_partitions`` ≳ corpus_bytes /
target_partition_bytes explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.stages.agg import default_partitions

_I64_MIN = np.int64(np.iinfo(np.int64).min)


from phrasekit_ray.stages.agg import round_away as _round_away  # noqa: E402


def _user_part(uid: np.ndarray, num_partitions: int) -> np.ndarray:
    h = (uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
    return (h % np.uint64(num_partitions)).astype(np.int32)


def sessionize(
    ds,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int | None = None,
):
    """events(user_id, ts, ...) → (user_id, n_sessions, n_events).

    A session breaks when the gap to the previous event of the same user
    exceeds ``gap_minutes`` (the classic sessionization window). One
    vectorized UDF call per PARTITION: rows are lexsorted (user, ts),
    session breaks found with one np.diff over the whole partition, and
    per-user totals come from np.add.reduceat over segment starts.
    """
    num_partitions = default_partitions(num_partitions)
    gap_us = np.int64(gap_minutes * 60_000_000)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        n = len(uid)
        brk = np.ones(n, dtype=np.int64)
        if n > 1:
            same_user = uid[1:] == uid[:-1]
            brk[1:] = (~same_user) | (ts[1:] - ts[:-1] > gap_us)
        seg_starts = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1])) if n else np.zeros(0, bool)
        )
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        n_sessions = np.add.reduceat(brk, seg_starts)
        sizes = np.diff(np.concatenate((seg_starts, [n])))
        return pa.table(
            {
                "user_id": pa.array(uid[seg_starts], pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "n_events": pa.array(sizes.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def asof_last_event(
    ds,
    mark_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """As-of lookup: for every event, the timestamp of the same user's
    most recent STRICTLY EARLIER event of ``mark_type`` (ties broken by
    event_id order, matching the SQL window `ORDER BY ts, event_id ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`).

    Returns (event_id, last_<mark_type>_us: int64 epoch-µs, null if none).
    One vectorized UDF call per PARTITION: lexsort (user, ts, event_id),
    then a segmented prefix-max of marked timestamps via pandas
    groupby-cummax (a single Cython call over the whole partition),
    shifted by one row with per-user reset.
    """
    num_partitions = default_partitions(num_partitions)
    out_col = f"last_{mark_type}_us"

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "is_mark": pc.equal(batch[type_col], mark_type),
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        import pandas as pd

        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        is_mark = group["is_mark"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    out_col: pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, is_mark = uid[order], ts[order], eid[order], is_mark[order]
        seg_id = np.concatenate(([0], np.cumsum(uid[1:] != uid[:-1])))
        marked_ts = np.where(is_mark, ts, _I64_MIN)
        # segmented prefix-max: one C call over the whole partition
        prefix = (
            pd.Series(marked_ts).groupby(seg_id).cummax().to_numpy()
        )
        shifted = np.empty_like(prefix)
        shifted[0] = _I64_MIN
        shifted[1:] = prefix[:-1]
        seg_starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        shifted[seg_starts] = _I64_MIN
        valid = shifted != _I64_MIN
        vals = pa.array(shifted, pa.int64())
        vals = pc.if_else(pa.array(valid), vals, pa.scalar(None, pa.int64()))
        return pa.table({"event_id": pa.array(eid, pa.int64()), out_col: vals})

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def tumbling_window_agg(
    ds,
    window_minutes: float = 60.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """events(user_id, ts, value) → per (user, window) aggregate rows
    (window_start_us, n_events, sum_value_cents) — the tumbling-window
    aggregate. A pure two-phase grouped aggregate: the window id is a
    derived column (epoch // size), so no per-group UDF and no ordering
    assumption; shuffle key is the (user, window) int pair.
    """
    from phrasekit_ray.stages.agg import hash_aggregate

    win_us = np.int64(window_minutes * 60_000_000)

    def derive(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        win = (ts // win_us) * win_us
        cents = pc.cast(
            _round_away(pc.multiply(batch[value_col], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "user_id": batch[user_col].cast(pa.int64()),
                "window_start_us": pa.array(win, pa.int64()),
                "n_events": pa.array(np.ones(len(ts), dtype=np.int64)),
                "sum_value_cents": cents,
            }
        )

    return hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["user_id", "window_start_us"],
        [("n_events", "sum"), ("sum_value_cents", "sum")],
    )


def hopping_window_agg(
    ds,
    window_minutes: float = 60.0,
    hop_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Hopping (sliding) window aggregate: each event lands in every
    window of length ``window_minutes`` that starts at a multiple of
    ``hop_minutes`` and covers it — i.e. window/hop overlapping windows
    per event. Pure flat-map + two-phase aggregate: the window starts
    are DERIVED columns (vectorized np.repeat expansion, window/hop
    rows per event), so no ordering assumption and no per-group UDF;
    shuffle key is the (user, window_start) int pair.

    ``window_minutes`` must be an integer multiple of ``hop_minutes``.
    """
    from phrasekit_ray.stages.agg import hash_aggregate

    win_us = np.int64(window_minutes * 60_000_000)
    hop_us = np.int64(hop_minutes * 60_000_000)
    if win_us % hop_us != 0:
        raise ValueError("window_minutes must be a multiple of hop_minutes")
    k = int(win_us // hop_us)  # windows covering each event

    def derive(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        cents = (
            pc.cast(_round_away(pc.multiply(batch[value_col], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(ts)
        # latest window start covering ts, then k-1 earlier hops
        last_start = (ts // hop_us) * hop_us
        offs = (np.arange(k, dtype=np.int64) * hop_us)[None, :]
        starts = (last_start[:, None] - offs).ravel()
        keep = starts + win_us > np.repeat(ts, k)  # guard (always true)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(uid, k), pa.int64()),
                "window_start_us": pa.array(starts, pa.int64()),
                "n_events": pa.array(np.ones(n * k, dtype=np.int64)),
                "sum_value_cents": pa.array(np.repeat(cents, k), pa.int64()),
            }
        ).filter(pa.array(keep))

    return hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["user_id", "window_start_us"],
        [("n_events", "sum"), ("sum_value_cents", "sum")],
    )


def asof_join(
    left_ds,
    right_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_value_col: str = "value",
    left_id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Two-dataset AS-OF join: for every left row, attach the right row
    with the greatest timestamp ≤ the left timestamp for the same key
    (DuckDB `ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts`; inner —
    left rows with no earlier-or-equal right row are dropped).

    Scale shape: both sides tagged with a side marker under one
    conformed schema, shuffled by key hash, ONE vectorized kernel per
    PARTITION — lexsort by (key, ts, side DESC so a right row at ts==t
    sorts BEFORE left rows at t), then a segmented forward-fill of the
    last-seen right row index (pandas groupby-ffill, C path) picks each
    left row's match. No per-key Python calls, no driver traffic.

    Returns (left_id, <right_value_col>_asof, matched_ts_us).
    """
    num_partitions = default_partitions(num_partitions)
    out_val = f"{right_value_col}_asof"

    def conform_left(batch: pa.Table) -> pa.Table:
        uid = batch[key_col].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "k": pa.array(uid, pa.int64()),
                "t": batch[ts_col].combine_chunks().cast(pa.int64()),
                "lid": batch[left_id_col].combine_chunks().cast(pa.int64()),
                "rv": pa.nulls(len(uid), pa.float64()),
                "side": pa.array(np.ones(len(uid), dtype=np.int8), pa.int8()),
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def conform_right(batch: pa.Table) -> pa.Table:
        uid = batch[key_col].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "k": pa.array(uid, pa.int64()),
                "t": batch[ts_col].combine_chunks().cast(pa.int64()),
                "lid": pa.nulls(len(uid), pa.int64()),
                "rv": batch[right_value_col].combine_chunks().cast(pa.float64()),
                "side": pa.array(np.zeros(len(uid), dtype=np.int8), pa.int8()),
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    both = left_ds.map_batches(conform_left, batch_format="pyarrow").union(
        right_ds.map_batches(conform_right, batch_format="pyarrow")
    )

    def per_partition(group: pa.Table) -> pa.Table:
        import pandas as pd

        k = group["k"].combine_chunks().to_numpy()
        t = group["t"].combine_chunks().to_numpy()
        side = group["side"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(k)
        empty = pa.table(
            {
                left_id_col: pa.array([], pa.int64()),
                out_val: pa.array([], pa.float64()),
                "matched_ts_us": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        # right rows (side=0) before left rows (side=1) at equal (k, t):
        # a right row AT the left timestamp is an eligible match (ts <=)
        order = np.lexsort((side, t, k))
        k_s, t_s, side_s = k[order], t[order], side[order]
        seg_id = np.concatenate(([0], np.cumsum(k_s[1:] != k_s[:-1])))
        row_pos = np.arange(n, dtype=np.float64)
        # forward-fill the index of the last right row within each key
        last_right = np.where(side_s == 0, row_pos, np.nan)
        filled = (
            pd.Series(last_right).groupby(seg_id).ffill().to_numpy()
        )
        is_left = side_s == 1
        src = filled[is_left]
        matched = ~np.isnan(src)
        li = np.flatnonzero(is_left)[matched]
        ri = src[matched].astype(np.int64)
        # arrow-native takes: the nullable lid column must NOT round-trip
        # through numpy (nulls force float64, corrupting ids >= 2^53)
        lids = group["lid"].combine_chunks().take(pa.array(order[li], pa.int64()))
        rvs = group["rv"].combine_chunks().take(pa.array(order[ri], pa.int64()))
        return pa.table(
            {
                left_id_col: lids.cast(pa.int64()),
                out_val: rvs.cast(pa.float64()),
                "matched_ts_us": pa.array(t_s[ri], pa.int64()),
            }
        )

    return (
        both.groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def numbered_events(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """events → (event_id, user_id, seq, gap_us): per-user event sequence
    number (1-based, ordered by ts with id tiebreak) and microsecond gap
    to the user's previous event (-1 for the first) — the row_number() /
    lag() window pair, partition-shaped.

    One vectorized UDF per hash PARTITION of the user key: lexsort
    (user, ts, id), sequence = arange minus segment base, gap = one
    np.diff masked at segment starts. Never one Python call per user.
    """
    num_partitions = default_partitions(num_partitions)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "seq": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s, eid_s = uid[order], ts[order], eid[order]
        new_user = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        idx = np.arange(n, dtype=np.int64)
        seg_base = np.zeros(n, dtype=np.int64)
        seg_base[new_user] = idx[new_user]
        seg_base = np.maximum.accumulate(seg_base)
        seq = idx - seg_base + 1
        gap = np.full(n, -1, dtype=np.int64)
        if n > 1:
            d = ts_s[1:] - ts_s[:-1]
            cont = ~new_user[1:]
            gap[1:][cont] = d[cont]
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "seq": pa.array(seq, pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def assign_sessions(
    ds,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Per-EVENT session assignment: events → (event_id, user_id,
    session_seq) where session_seq is the user's 1-based session index
    (a new session starts when the gap to the previous event exceeds
    ``gap_minutes``) — the row-level counterpart of ``sessionize``'s
    per-user summary, i.e. SQL's
    ``1 + SUM(gap > g) OVER (PARTITION BY user ORDER BY ts, id)``.

    Same partition shape as the other window ops: hash-partition by
    user, ONE vectorized kernel per partition (lexsort + break-flag
    cumsum with per-user reset via segment bases).
    """
    num_partitions = default_partitions(num_partitions)
    gap_us = np.int64(gap_minutes * 60_000_000)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "session_seq": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s, eid_s = uid[order], ts[order], eid[order]
        new_user = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (~new_user[1:]) & (ts_s[1:] - ts_s[:-1] > gap_us)
        cum = np.cumsum(brk)
        idx = np.arange(n, dtype=np.int64)
        seg_base = np.zeros(n, dtype=np.int64)
        seg_base[new_user] = cum[new_user]
        seg_base = np.maximum.accumulate(seg_base)
        seq = cum - seg_base + 1
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "session_seq": pa.array(seq, pa.int64()),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def range_window_stats(
    ds,
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_partitions: int | None = None,
):
    """Per-event trailing RANGE window: for each event, the count and
    integer-cent sum of the SAME user's events with ``ts`` in
    ``[ts - window_us, ts]`` — SQL ``RANGE BETWEEN <w> PRECEDING AND
    CURRENT ROW`` semantics (all peers of an equal timestamp are in each
    other's frames).

    Scale shape: a range-window self-join executed with ZERO joins — one
    vectorized UDF per hash partition of the user key. Within a
    partition, rows are lexsorted (user, ts, id) and every user segment
    is shifted into a disjoint integer band (band width > ts-range +
    window), so a SINGLE ``np.searchsorted`` over the banded key answers
    the window boundary for every row of every user at once; window sums
    come from one prefix-cumsum difference. When segment-count × band
    would overflow int64, segments are processed in bounded chunks (the
    same two searchsorted calls per chunk — still never per-key Python).

    Partitioning assumption: one partition holds the full history of
    every user hashed into it (same contract as ``sessionize``).
    """
    num_partitions = default_partitions(num_partitions)
    w = np.int64(window_us)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        cents = pc.cast(
            _round_away(pc.multiply(batch[value_col].combine_chunks(), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "cents": cents,
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        cents = group["cents"].combine_chunks().to_numpy()
        n = len(uid)
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "n_win": pa.array([], pa.int64()),
                "sum_cents_win": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s, eid_s, cents_s = uid[order], ts[order], eid[order], cents[order]
        new_user = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        sid = np.cumsum(new_user) - 1  # dense segment index per row
        tsn = ts_s - ts_s.min()
        band = np.int64(tsn.max()) + w + np.int64(2)
        # segments per chunk bounded so (local segment idx) * band < 2^62
        segs_per_chunk = max(1, int((np.int64(1) << 62) // band))
        n_segs = int(sid[-1]) + 1
        n_out = np.empty(n, dtype=np.int64)
        sum_out = np.empty(n, dtype=np.int64)
        for s0 in range(0, n_segs, segs_per_chunk):
            rows = slice(
                np.searchsorted(sid, s0, "left"),
                np.searchsorted(sid, s0 + segs_per_chunk, "left"),
            )
            key = tsn[rows] + (sid[rows] - s0) * band
            left = np.searchsorted(key, key - w, "left")
            right = np.searchsorted(key, key, "right")
            n_out[rows] = right - left
            cs = np.concatenate(([0], np.cumsum(cents_s[rows])))
            sum_out[rows] = cs[right] - cs[left]
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "n_win": pa.array(n_out, pa.int64()),
                "sum_cents_win": pa.array(sum_out, pa.int64()),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def lead_lag(
    ds,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """SQL ``LAG(v) / LEAD(v) OVER (PARTITION BY user ORDER BY ts, id)``
    → (event_id, lag_value_cents, lead_value_cents; nulls at partition
    edges). The value is fixed to integer cents before shifting so the
    result is float-order-proof and SQL-oracle-exact.

    Scale shape: the standard partition-run treatment (sessionize/asof) —
    hash-partition by user (a user never straddles partitions), ONE
    vectorized UDF per partition: lexsort (user, ts, id), shift by one
    with per-user edge masking. No corpus-wide sort.
    """
    from phrasekit_ray.stages.agg import round_away

    num_partitions = default_partitions(num_partitions)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        cents = round_away(
            pc.multiply(batch[value_col].combine_chunks().cast(pa.float64()), 100.0)
        ).cast(pa.int64())
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "cents": cents,
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        # NULL values must propagate through the shift like SQL LAG/LEAD
        # (a zero-copy to_numpy() raises on any null); key columns are
        # assumed non-null per the events data contract.
        c_arr = group["cents"].combine_chunks()
        c_null = pc.is_null(c_arr).to_numpy(zero_copy_only=False)
        cents = pc.fill_null(c_arr, 0).to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "lag_value_cents": pa.array([], pa.int64()),
                    "lead_value_cents": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s, c_s = uid[order], eid[order], cents[order]
        null_s = c_null[order]
        same_prev = np.concatenate(([False], uid_s[1:] == uid_s[:-1]))
        same_next = np.concatenate((uid_s[1:] == uid_s[:-1], [False]))
        lag = np.concatenate(([0], c_s[:-1]))
        lead = np.concatenate((c_s[1:], [0]))
        lag_null = ~same_prev | np.concatenate(([False], null_s[:-1]))
        lead_null = ~same_next | np.concatenate((null_s[1:], [False]))
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "lag_value_cents": pa.array(lag, pa.int64(), mask=lag_null),
                "lead_value_cents": pa.array(lead, pa.int64(), mask=lead_null),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def running_total(
    ds,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """SQL ``SUM(v) OVER (PARTITION BY user ORDER BY ts, id)`` →
    (event_id, running_cents). Values are fixed to integer cents before
    accumulating so the running sum is float-order-proof; NULL values
    contribute nothing (SQL sum skips nulls) and the prefix is NULL
    until the partition has seen its first non-null value.

    Scale shape: identical to sessionize/lead_lag — hash-partition by
    user (a user never straddles partitions), ONE vectorized UDF per
    partition: lexsort (user, ts, id), then a segmented cumulative sum
    (global cumsum minus the per-user base, no Python loop).
    """
    from phrasekit_ray.stages.agg import round_away

    num_partitions = default_partitions(num_partitions)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        cents = round_away(
            pc.multiply(batch[value_col].combine_chunks().cast(pa.float64()), 100.0)
        ).cast(pa.int64())
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "cents": cents,
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        c_arr = group["cents"].combine_chunks()
        c_null = pc.is_null(c_arr).to_numpy(zero_copy_only=False)
        cents = pc.fill_null(c_arr, 0).to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "running_cents": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s = uid[order], eid[order]
        c_s, null_s = cents[order], c_null[order]
        csum = np.cumsum(c_s)
        nn_csum = np.cumsum(~null_s)
        # per-user base: value of the cumsums just before each segment
        new_seg = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)
        base = np.where(seg_start > 0, csum[seg_start - 1], 0)
        nn_base = np.where(seg_start > 0, nn_csum[seg_start - 1], 0)
        running = csum - base[seg_id]
        seen_nonnull = (nn_csum - nn_base[seg_id]) > 0
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "running_cents": pa.array(
                    running, pa.int64(), mask=~seen_nonnull
                ),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def rank_window(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    ntile_k: int = 4,
    num_partitions: int | None = None,
):
    """SQL ranking windows over (PARTITION BY user ORDER BY ts, id):
    ``ROW_NUMBER()``, ``NTILE(k)`` and ``percent_rank()`` →
    (event_id, rn, ntile, pr_micro). percent_rank is returned in integer
    micro-units (the order key (ts, id) is unique per the events data
    contract, so rank == row_number and (rn-1)/(n-1) is an exact small
    rational both engines compute identically in float64; single-row
    partitions get 0 like SQL).

    Scale shape: the standard partition-run treatment — ONE vectorized
    UDF per hash partition; row numbers and partition sizes come from
    segment boundaries (no per-user Python), NTILE uses the SQL sizing
    rule (first n mod k buckets get the extra row) as a closed-form
    vector expression.
    """
    from phrasekit_ray.stages.agg import round_away

    if ntile_k < 1:
        raise ValueError("rank_window: ntile_k must be >= 1")
    num_partitions = default_partitions(num_partitions)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                    "ntile": pa.array([], pa.int64()),
                    "pr_micro": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s = uid[order], eid[order]
        new_seg = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)
        sizes = np.diff(np.concatenate((seg_start, [n])))
        pos = np.arange(n, dtype=np.int64) - seg_start[seg_id]  # 0-based
        sz = sizes[seg_id]
        # NTILE(k): first n%k buckets have ceil(n/k) rows (SQL sizing)
        k = np.int64(ntile_k)
        base, rem = sz // k, sz % k
        big = rem * (base + 1)  # rows covered by the bigger buckets
        in_big = pos < big
        with np.errstate(divide="ignore", invalid="ignore"):
            nt = np.where(
                in_big,
                pos // np.maximum(base + 1, 1),
                rem + (pos - big) // np.maximum(base, 1),
            ) + 1
        # percent_rank: (rn-1)/(n-1), 0 for single-row partitions
        pr = np.where(sz > 1, pos / np.maximum(sz - 1, 1), 0.0)
        pr_micro = pc.cast(round_away(pa.array(pr * 1e6)), pa.int64())
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "rn": pa.array(pos + 1, pa.int64()),
                "ntile": pa.array(nt.astype(np.int64), pa.int64()),
                "pr_micro": pr_micro,
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


# --- round-4 operators: ROWS-frame moving sum, bounded range self-join -----


def rows_window_sum(
    ds,
    preceding: int = 3,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """SQL ROWS-frame window aggregate

        SUM(v)   OVER (PARTITION BY user ORDER BY ts, id
                       ROWS BETWEEN <preceding> PRECEDING AND CURRENT ROW),
        COUNT(v) OVER (same frame)

    → (event_id, win_sum_cents, win_n). Values fix to integer cents
    before summing (float-order-proof); SQL null semantics (sum skips
    NULLs, NULL when the frame has no non-null value; count counts
    non-nulls only).

    Scale shape: identical to running_total — hash-partition by user,
    ONE vectorized UDF per partition: lexsort (user, ts, id), prefix
    sums, frame sum = pcsum[i+1] - pcsum[lo] with
    lo = max(i - preceding, segment_start) (one np.maximum, no loop).
    """
    from phrasekit_ray.stages.agg import round_away

    num_partitions = default_partitions(num_partitions)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        cents = round_away(
            pc.multiply(batch[value_col].combine_chunks().cast(pa.float64()), 100.0)
        ).cast(pa.int64())
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "cents": cents,
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "win_sum_cents": pa.array([], pa.int64()),
                "win_n": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        c_arr = group["cents"].combine_chunks()
        c_null = pc.is_null(c_arr).to_numpy(zero_copy_only=False)
        cents = pc.fill_null(c_arr, 0).to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s = uid[order], eid[order]
        c_s, null_s = cents[order], c_null[order]
        pcsum = np.concatenate(([0], np.cumsum(c_s)))
        pnn = np.concatenate(([0], np.cumsum(~null_s)))
        new_seg = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)
        idx = np.arange(n)
        lo = np.maximum(idx - preceding, seg_start[seg_id])
        win_sum = pcsum[idx + 1] - pcsum[lo]
        win_n = pnn[idx + 1] - pnn[lo]
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "win_sum_cents": pa.array(win_sum, pa.int64(), mask=win_n == 0),
                "win_n": pa.array(win_n, pa.int64()),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def _range_pair_positions(key_s, ts_s, horizon, side_s=None,
                          tie_run_cap: int = 100_000):
    """Positions (i, j), i < j, with key_s[i] == key_s[j] and
    0 < ts_s[j] − ts_s[i] <= horizon, over arrays SORTED by (key, ts).
    With ``side_s`` given, only cross-side pairs (side i == 0, side j ==
    1) are emitted — the two-table join filter.

    Stride loop over neighbor offsets k = 1, 2, ... with SURVIVOR
    COMPACTION: a row leaves the active set the first time its k-th
    successor crosses the segment boundary or the horizon (both are
    monotone in k on sorted input), so pass k scans only rows that still
    have a within-horizon k-th successor — total work is O(emitted pairs
    + Σ run²) where runs are EQUAL-(key, ts) tie runs (they stay active
    but emit nothing under the strict inequality). ``tie_run_cap``
    refuses degenerate inputs (> cap rows of one key at one identical
    timestamp) rather than grinding quadratically."""
    n = len(key_s)
    if n > 1:
        tie_break = np.concatenate(
            ([True], (key_s[1:] != key_s[:-1]) | (ts_s[1:] != ts_s[:-1]))
        )
        tie_runs = np.bincount(np.cumsum(tie_break) - 1)
        if (tie_runs > tie_run_cap).any():
            raise ValueError(
                f"range join: {int(tie_runs.max())} rows share one "
                f"(key, ts) (> tie_run_cap {tie_run_cap})"
            )
    out_i, out_j = [], []
    active = np.arange(max(n - 1, 0))
    k = 1
    while len(active):
        j = active + k
        live = j < n
        if not live.all():
            active, j = active[live], j[live]
        keep = (key_s[active] == key_s[j]) & (ts_s[j] - ts_s[active] <= horizon)
        if not keep.all():
            active, j = active[keep], j[keep]
        if not len(active):
            break
        ok = ts_s[j] > ts_s[active]
        if side_s is not None:
            ok &= (side_s[active] == 0) & (side_s[j] == 1)
        if ok.any():
            out_i.append(active[ok])
            out_j.append(j[ok])
        k += 1
    if not out_i:
        z = np.zeros(0, np.int64)
        return z, z
    return np.concatenate(out_i), np.concatenate(out_j)


def _range_join_impl(left_ds, right_ds, key_col, ts_col, id_col, horizon,
                     num_partitions, hot_key_cap, op_name):
    """Shared machinery for range_self_join (right_ds None) and the
    two-table range_join: key-hash shuffle of (k, ts, id[, side]) then
    one vectorized _range_pair_positions call per partition."""
    num_partitions = default_partitions(num_partitions)
    two_sided = right_ds is not None

    def derive(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[key_col].combine_chunks().cast(pa.int64()).to_numpy()
            cols = {
                "k": pa.array(key, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "id": batch[id_col].combine_chunks().cast(pa.int64()),
            }
            if two_sided:
                cols["side"] = pa.array(
                    np.full(len(key), side, dtype=np.int8), pa.int8()
                )
            cols["_part"] = pa.array(
                _user_part(key, num_partitions), pa.int32()
            )
            return pa.table(cols)

        return fn

    left_name, right_name = f"left_{id_col}", f"right_{id_col}"

    def per_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                left_name: pa.array([], pa.int64()),
                right_name: pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        key = group["k"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["id"].combine_chunks().to_numpy()
        if two_sided:
            side = group["side"].combine_chunks().to_numpy()
            order = np.lexsort((eid, side, ts, key))
            side_s = side[order]
        else:
            order = np.lexsort((eid, ts, key))
            side_s = None
        key_s, ts_s, id_s = key[order], ts[order], eid[order]
        seg_len = np.bincount(
            np.cumsum(np.concatenate(([True], key_s[1:] != key_s[:-1]))) - 1
        ) if n else np.zeros(0, np.int64)
        if (seg_len > hot_key_cap).any():
            raise ValueError(
                f"{op_name}: a key has {int(seg_len.max())} rows "
                f"(> hot_key_cap {hot_key_cap})"
            )
        i, j = _range_pair_positions(key_s, ts_s, horizon, side_s)
        if not len(i):
            return empty
        return pa.table(
            {
                left_name: pa.array(id_s[i], pa.int64()),
                right_name: pa.array(id_s[j], pa.int64()),
            }
        )

    tagged = left_ds.map_batches(derive(0), batch_format="pyarrow")
    if two_sided:
        tagged = tagged.union(
            right_ds.map_batches(derive(1), batch_format="pyarrow")
        )
    return tagged.groupby("_part").map_groups(
        lambda g: per_partition(g.drop_columns(["_part"])),
        batch_format="pyarrow",
    )


def range_self_join(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    horizon: int,
    num_partitions: int | None = None,
    hot_key_cap: int = 1_000_000,
):
    """Bounded-horizon range SELF-join: all ordered pairs (a, b) sharing
    ``key_col`` with ``0 < ts_b - ts_a <= horizon`` (ts in its int64
    unit, e.g. µs) → (left_<id>, right_<id>). The SQL shape:

        FROM t a JOIN t b ON a.key = b.key
          AND b.ts > a.ts AND b.ts <= a.ts + horizon

    Scale shape: hash-partition by key (a key never straddles
    partitions), per partition one vectorized ``_range_pair_positions``
    call (survivor-compacted stride kernel — see its docstring for the
    work bound); ``hot_key_cap`` bounds a pathological key's row count.
    """
    return _range_join_impl(
        ds, None, key_col, ts_col, id_col, horizon,
        num_partitions, hot_key_cap, "range_self_join",
    )


def range_join(
    left_ds,
    right_ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    horizon: int,
    num_partitions: int | None = None,
    hot_key_cap: int = 1_000_000,
):
    """Bounded-horizon TWO-TABLE range join (stream-stream attribution):
    all pairs (l, r) with equal ``key_col`` and ``0 < ts_r − ts_l <=
    horizon`` → (left_<id>, right_<id>). The SQL shape:

        FROM left l JOIN right r ON l.key = r.key
          AND r.ts > l.ts AND r.ts <= l.ts + horizon

    Scale shape: both sides get a side tag and hash-partition by key
    (conformed union — ONE shuffle); per partition one vectorized
    ``_range_pair_positions`` call keeping only left→right cross-side
    pairs. Equal-ts pairs are excluded by the strict inequality
    regardless of side order, so side position within a tie run cannot
    change the result."""
    return _range_join_impl(
        left_ds, right_ds, key_col, ts_col, id_col, horizon,
        num_partitions, hot_key_cap, "range_join",
    )


def time_weighted_sum(
    ds,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Per-key time-weighted value integral: for each user, the
    step-function integral Σ cents_i · (ts_{i+1} − ts_i) over consecutive
    events ((ts, id)-ordered; the last event carries no width — the SQL
    ``sum(cents * (lead(ts) OVER w − ts))`` convention) plus the observed
    span → (user_id, twa_num_us, span_us). Integer µs × integer cents
    keeps it float-order-proof; the caller divides for the average.
    NULL values contribute nothing (SQL sum skips NULL products).

    Scale shape: the sessionize/running_total partition-run treatment —
    hash-partition by user, ONE vectorized UDF per partition (lexsort,
    shifted diff, segment sums via np.add.at on segment ids)."""
    from phrasekit_ray.stages.agg import round_away

    num_partitions = default_partitions(num_partitions)

    def derive(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy()
        cents = round_away(
            pc.multiply(batch[value_col].combine_chunks().cast(pa.float64()), 100.0)
        ).cast(pa.int64())
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": batch[ts_col].combine_chunks().cast(pa.int64()),
                "event_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "cents": cents,
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "twa_num_us": pa.array([], pa.int64()),
                "span_us": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        uid = group["user_id"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        eid = group["event_id"].combine_chunks().to_numpy()
        c_arr = group["cents"].combine_chunks()
        c_null = pc.is_null(c_arr).to_numpy(zero_copy_only=False)
        cents = pc.fill_null(c_arr, 0).to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        c_s, null_s = cents[order], c_null[order]
        same_next = np.concatenate((uid_s[1:] == uid_s[:-1], [False]))
        dt = np.zeros(n, dtype=np.int64)
        dt[:-1] = ts_s[1:] - ts_s[:-1]
        live = same_next & ~null_s
        # int64 arithmetic wraps SILENTLY on overflow — refuse rather
        # than emit a wrong (possibly negative) integral; the caller
        # rescales (coarser time unit or value scale) if this trips.
        # Checked on float64 SEGMENT sums (guards the accumulation too;
        # 2^62 leaves 2x margin over float64's ~512-ulp error there).
        new_seg = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        m = int(seg_id[-1]) + 1
        approx = np.abs(c_s.astype(np.float64)) * np.where(live, dt, 0)
        seg_abs = np.zeros(m)
        np.add.at(seg_abs, seg_id, approx)
        if seg_abs.size and float(seg_abs.max()) > 2**62:
            raise ValueError(
                "time_weighted_sum: cents x dt_us integral would "
                "overflow int64 — rescale the value or timestamp unit"
            )
        w = np.where(live, c_s * dt, 0)
        num = np.zeros(m, dtype=np.int64)
        np.add.at(num, seg_id, w)
        starts = np.flatnonzero(new_seg)
        ends = np.concatenate((starts[1:], [n])) - 1
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "twa_num_us": pa.array(num, pa.int64()),
                "span_us": pa.array(ts_s[ends] - ts_s[starts], pa.int64()),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def funnel_counts(
    ds,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_partitions: int | None = None,
):
    """Ordered multi-step funnel over an event stream: for each step k,
    how many users completed steps[0..k] IN ORDER — step k counts only
    if it happens STRICTLY AFTER the user's (earliest-chain) completion
    of step k-1. The chain is the classic sequential-funnel greedy one:
    t0 = min ts of steps[0]; t_k = min ts of a steps[k] event with
    ts > t_{k-1}. Returns (step_idx:int64, step:string, users:int64),
    one row per step.

    Scale shape: events are filtered to the funnel's K types at the
    read (everything else never leaves the scan), hash-partitioned by
    user, and each partition resolves ALL of its users with K vectorized
    passes (lexsort once, then per step one mask + segment-first take —
    no per-user Python). Partial per-step counts are K rows per
    partition; the final reduce is a K-row sum on the driver-side
    aggregate. No state outlives a partition call.
    """
    from phrasekit_ray.stages.agg import hash_aggregate

    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_counts: steps must be distinct")
    num_partitions = default_partitions(num_partitions)
    step_set = pa.array(steps, pa.string())
    k_steps = len(steps)

    def derive(batch: pa.Table) -> pa.Table:
        sidx = pc.index_in(batch[type_col].combine_chunks(), step_set)
        keep = pc.is_valid(sidx)
        uid = (
            batch[user_col].combine_chunks().filter(keep).cast(pa.int64()).to_numpy()
        )
        return pa.table(
            {
                "uid": pa.array(uid, pa.int64()),
                "step_idx": sidx.filter(keep).cast(pa.int64()),
                "ts": batch[ts_col].combine_chunks().filter(keep).cast(pa.int64()),
                "_part": pa.array(_user_part(uid, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["uid"].combine_chunks().to_numpy()
        sid = group["step_idx"].combine_chunks().to_numpy()
        ts = group["ts"].combine_chunks().to_numpy()
        order = np.lexsort((ts, uid))
        uid, sid, ts = uid[order], sid[order], ts[order]
        _, uinv = np.unique(uid, return_inverse=True)
        n_users = int(uinv[-1]) + 1 if len(uid) else 0
        reached = np.zeros(n_users, dtype=bool)
        t_prev = np.zeros(n_users, dtype=np.int64)
        counts = np.zeros(k_steps, dtype=np.int64)
        for k in range(k_steps):
            if k == 0:
                elig = sid == 0
            else:
                elig = (sid == k) & reached[uinv] & (ts > t_prev[uinv])
            # rows are (user, ts)-sorted, so the FIRST eligible row per
            # user is that user's earliest qualifying event
            eu = uinv[elig]
            firsts = np.flatnonzero(
                np.concatenate(([True], eu[1:] != eu[:-1])) if len(eu) else
                np.zeros(0, bool)
            )
            nxt_reached = np.zeros(n_users, dtype=bool)
            nxt_reached[eu[firsts]] = True
            nxt_t = np.zeros(n_users, dtype=np.int64)
            nxt_t[eu[firsts]] = ts[elig][firsts]
            reached, t_prev = nxt_reached, nxt_t
            counts[k] = len(firsts)
        return pa.table(
            {
                "step_idx": pa.array(np.arange(k_steps, dtype=np.int64)),
                "users": pa.array(counts, pa.int64()),
            }
        )

    partial = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
    # a K-row zero baseline guarantees the one-row-per-step contract even
    # when no event matches any step (per_partition only runs for
    # partitions that received rows, so an all-miss input would otherwise
    # yield ZERO rows while the SQL twin's VALUES list always yields K)
    import ray

    zeros = ray.data.from_arrow(
        pa.table(
            {
                "step_idx": pa.array(np.arange(k_steps, dtype=np.int64)),
                "users": pa.array(np.zeros(k_steps, np.int64)),
            }
        )
    )
    total = hash_aggregate(partial.union(zeros), ["step_idx"], [("users", "sum")])

    def attach_name(batch: pa.Table) -> pa.Table:
        si = batch["step_idx"].combine_chunks().to_numpy()
        names = pa.array([steps[int(i)] for i in si], pa.string())
        return pa.table(
            {
                "step_idx": batch["step_idx"].combine_chunks(),
                "step": names,
                "users": batch["users"].combine_chunks(),
            }
        )

    return total.map_batches(attach_name, batch_format="pyarrow")
