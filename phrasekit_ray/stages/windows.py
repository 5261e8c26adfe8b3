"""Windowed / time-ordered operators over event streams.

No reference analog (phrasekit is pure batch, SURVEY.md §2.9); these are
the custom time-series operators a training-data pipeline needs (task
brief: "as-of join, windowed aggregate"), built as compositions of
map_batches + groupby(key).map_groups per SURVEY.md's custom-operator
recipe. Partitioning assumption: one group = one key's full history; at
100 TB scale key cardinality (users) must exceed cluster cores and no
single key's history may exceed a worker's heap — both hold for web-style
event data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(
    ds,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """events(user_id, ts, ...) → (user_id, n_sessions, n_events).

    A session breaks when the gap to the previous event of the same user
    exceeds ``gap_minutes`` (the classic sessionization window). One
    vectorized UDF call per user group; the shuffle key is the int user
    id.
    """
    gap_us = np.int64(gap_minutes * 60_000_000)

    def per_user(group: pa.Table) -> pa.Table:
        ts = group[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        ts = np.sort(ts)
        breaks = int((np.diff(ts) > gap_us).sum()) + 1 if len(ts) else 0
        return pa.table(
            {
                "user_id": pa.array([group[user_col][0].as_py()], pa.int64()),
                "n_sessions": pa.array([breaks], pa.int64()),
                "n_events": pa.array([len(ts)], pa.int64()),
            }
        )

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")


def asof_last_event(
    ds,
    mark_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
):
    """As-of lookup: for every event, the timestamp of the same user's
    most recent STRICTLY EARLIER event of ``mark_type`` (ties broken by
    event_id order, matching the SQL window `ORDER BY ts, event_id ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`).

    Returns (event_id, last_<mark_type>_us: int64 epoch-µs, null if none).
    Implementation: groupby(user).map_groups, per group a vectorized
    prefix-maximum over the marked rows — the standard as-of-join kernel
    once rows are key-partitioned and time-sorted.
    """
    out_col = f"last_{mark_type}_us"

    def per_user(group: pa.Table) -> pa.Table:
        ts = group[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        eid = group[id_col].to_numpy(zero_copy_only=False)
        is_mark = pc.equal(group[type_col], mark_type).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid, is_mark = ts[order], eid[order], is_mark[order]
        # prefix max of marked ts over rows [0, i-1]
        marked_ts = np.where(is_mark, ts, np.int64(np.iinfo(np.int64).min))
        prefix = np.maximum.accumulate(marked_ts)
        shifted = np.empty_like(prefix)
        shifted[0] = np.iinfo(np.int64).min
        shifted[1:] = prefix[:-1]
        valid = shifted != np.iinfo(np.int64).min
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                out_col: pa.array(
                    [int(v) if ok else None for v, ok in zip(shifted, valid)],
                    pa.int64(),
                ),
            }
        )

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")


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
            pc.round(pc.multiply(batch[value_col], 100.0)), pa.int64()
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
