"""Windowed/time-ordered operators (sessionize, as-of lookup)."""

import numpy as np
import pyarrow as pa
import pytest


def _events_table():
    # user 1: events at 0, 10m, 50m, 51m  → sessions: {0,10}, {50,51} = 2
    # user 2: single event → 1 session
    # user 2 purchase at t=5m; user 1 purchases at 10m and 50m
    us = 60_000_000  # 1 minute in µs
    rows = [
        # (event_id, user_id, minutes, type)
        (1, 1, 0, "view"),
        (2, 1, 10, "purchase"),
        (3, 1, 50, "purchase"),
        (4, 1, 51, "click"),
        (5, 2, 5, "purchase"),
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] * us for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_sessionize(ray_session):
    import ray

    from phrasekit_ray.stages.windows import sessionize

    ds = ray.data.from_arrow(_events_table())
    out = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize(ds, gap_minutes=30).iter_rows()
    }
    assert out == {1: (2, 4), 2: (1, 1)}


def test_asof_last_purchase(ray_session):
    import ray

    from phrasekit_ray.stages.windows import asof_last_event

    us = 60_000_000
    ds = ray.data.from_arrow(_events_table())
    out = {
        r["event_id"]: r["last_purchase_us"]
        for r in asof_last_event(ds, mark_type="purchase").iter_rows()
    }
    # strictly-earlier semantics: the purchase at its own row not counted
    assert out[1] is None
    assert out[2] is None  # first purchase sees nothing earlier
    assert out[3] == 10 * us
    assert out[4] == 50 * us
    assert out[5] is None


def test_hopping_window_overlap(ray_session):
    """Each event lands in window/hop overlapping windows; counts and
    sums aggregate per (user, window_start)."""
    import ray

    from phrasekit_ray.stages import windows

    us = 60_000_000
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1], pa.int64()),
            # event at minute 45 → windows starting at minute 0 and 30
            "ts": pa.array([45 * us, 100 * us], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    out = {
        (r["user_id"], r["window_start_us"]): (r["n_events"], r["sum_value_cents"])
        for r in windows.hopping_window_agg(
            ray.data.from_arrow(tbl), window_minutes=60, hop_minutes=30
        ).iter_rows()
    }
    assert out == {
        (1, 0): (1, 100),
        (1, 30 * us): (1, 100),
        (1, 60 * us): (1, 200),
        (1, 90 * us): (1, 200),
    }


def test_hopping_rejects_nonmultiple(ray_session):
    import pytest
    import ray

    from phrasekit_ray.stages import windows

    tbl = pa.table({"user_id": pa.array([1], pa.int64()),
                    "ts": pa.array([0], pa.timestamp("us")),
                    "value": pa.array([1.0], pa.float64())})
    with pytest.raises(ValueError):
        windows.hopping_window_agg(ray.data.from_arrow(tbl),
                                   window_minutes=60, hop_minutes=45)


def test_asof_join_basic_semantics(ray_session):
    """Inner as-of: match = greatest right ts <= left ts per key; equal
    timestamps match; left rows with no earlier right row are dropped."""
    import ray

    from phrasekit_ray.stages import windows

    left = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array([5, 10, 20, 7], pa.int64()),
                "event_id": pa.array([100, 101, 102, 103], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "ts": pa.array([10, 15, 9], pa.int64()),
                "value": pa.array([1.5, 2.5, 9.0], pa.float64()),
            }
        )
    )
    out = {
        r["event_id"]: (r["value_asof"], r["matched_ts_us"])
        for r in windows.asof_join(left, right).iter_rows()
    }
    # event 100 (ts 5): no right <= 5 → dropped
    # event 101 (ts 10): right ts 10 matches (equality eligible)
    # event 102 (ts 20): right ts 15 wins
    # event 103 (user 2, ts 7): right ts 9 > 7 → dropped
    assert out == {101: (1.5, 10), 102: (2.5, 15)}


def test_asof_join_preserves_large_int_ids(ray_session):
    """Left ids above 2^53 must survive intact — the nullable id column
    must not round-trip through float64 (review finding)."""
    import ray

    from phrasekit_ray.stages.windows import asof_join

    big = (1 << 60) + 12345
    left = pa.table(
        {
            "user_id": pa.array([7], pa.int64()),
            "ts": pa.array([100], pa.int64()),
            "event_id": pa.array([big], pa.int64()),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([7], pa.int64()),
            "ts": pa.array([50], pa.int64()),
            "value": pa.array([3.5], pa.float64()),
        }
    )
    out = pa.concat_tables(
        list(
            asof_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right)
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="default",
    )
    assert out["event_id"].to_pylist() == [big]
    assert out["value_asof"].to_pylist() == [3.5]


def test_assign_sessions_consistent_with_sessionize(ray_session):
    import numpy as np
    import ray

    from phrasekit_ray.stages.windows import assign_sessions, sessionize

    rng = np.random.default_rng(31)
    n = 600
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 20, n), pa.int64()),
            "ts": pa.array(
                np.sort(rng.integers(0, 10**12, n)).astype("datetime64[us]")
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    per_event = assign_sessions(ds, gap_minutes=30.0).to_pandas()
    per_user = {
        r["user_id"]: r["n_sessions"]
        for r in sessionize(ds, gap_minutes=30.0).iter_rows()
    }
    got = per_event.groupby("user_id")["session_seq"].max().to_dict()
    assert got == per_user
    # session_seq is nondecreasing in time order per user
    ts_map = dict(zip(t["event_id"].to_pylist(), t["ts"].to_pylist()))
    per_event["ts"] = per_event["event_id"].map(ts_map)
    for _, grp in per_event.groupby("user_id"):
        seqs = grp.sort_values(["ts", "event_id"])["session_seq"].to_numpy()
        assert (np.diff(seqs) >= 0).all()


def _naive_range_window(rows, w):
    """Per-user O(n^2) reference for range_window_stats."""
    out = {}
    for eid, uid, ts, cents in rows:
        n = s = 0
        for eid2, uid2, ts2, cents2 in rows:
            if uid2 == uid and ts - w <= ts2 <= ts:
                n += 1
                s += cents2
        out[eid] = (n, s)
    return out


def test_range_window_stats_vs_naive(ray_session):
    import ray

    from phrasekit_ray.stages.windows import range_window_stats

    rng = np.random.default_rng(7)
    n = 400
    uid = rng.integers(0, 12, n)
    ts = rng.integers(0, 10_000, n) * 1_000_000
    vals = rng.integers(-500, 500, n)
    rows = [
        (i, int(uid[i]), int(ts[i]), int(vals[i]))
        for i in range(n)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts, pa.int64()),
                "value": pa.array(vals / 100.0, pa.float64()),
            }
        )
    ).repartition(5)
    w = 600 * 1_000_000
    got = range_window_stats(ds, w, num_partitions=3).to_pandas()
    want = _naive_range_window(rows, w)
    assert len(got) == n
    for _, r in got.iterrows():
        wn, ws = want[r.event_id]
        assert (r.n_win, r.sum_cents_win) == (wn, ws), r.event_id


def test_range_window_stats_banded_chunk_path(ray_session):
    """ts spread so wide that segment bands must be processed in chunks
    (the int64-overflow guard) — results must match the naive reference."""
    import ray

    from phrasekit_ray.stages.windows import range_window_stats

    rng = np.random.default_rng(11)
    n = 120
    uid = rng.integers(0, 16, n)
    # ~5e17 span: band ≈ 5e17 → only ~9 segments per chunk
    ts = rng.integers(0, 5 * 10**17, n)
    vals = rng.integers(-500, 500, n)
    rows = [(i, int(uid[i]), int(ts[i]), int(vals[i])) for i in range(n)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts, pa.int64()),
                "value": pa.array(vals / 100.0, pa.float64()),
            }
        )
    )
    w = 10**17
    got = range_window_stats(ds, w, num_partitions=2).to_pandas()
    want = _naive_range_window(rows, w)
    assert len(got) == n
    for _, r in got.iterrows():
        wn, ws = want[r.event_id]
        assert (r.n_win, r.sum_cents_win) == (wn, ws), r.event_id


def test_lead_lag_partition_edges(ray_session):
    import ray
    import pyarrow as pa

    from phrasekit_ray.stages.windows import lead_lag

    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "ts": pa.array([10, 20, 30, 10, 10], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.005, 4.0, 5.0]),
        }
    )
    out = (
        lead_lag(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # user 1: chain of three; users 2/3: singletons → both edges null
    assert out.loc[0, "lag_value_cents"] is None or bool(
        out.loc[0:0, "lag_value_cents"].isna().all()
    )
    assert out.loc[1, "lag_value_cents"] == 100
    assert out.loc[1, "lead_value_cents"] == 301  # 3.005 → half-away 301
    assert out.loc[2, "lead_value_cents"] is None or bool(
        out.loc[2:2, "lead_value_cents"].isna().all()
    )
    assert bool(out.loc[3:4, ["lag_value_cents", "lead_value_cents"]].isna().values.all())


def test_lead_lag_propagates_null_values(ray_session):
    """Review fix: a NULL value must propagate through the shift like SQL
    LAG/LEAD (previously the zero-copy to_numpy() raised ArrowInvalid on
    any null, aborting the query)."""
    import ray
    import pyarrow as pa

    from phrasekit_ray.stages.windows import lead_lag

    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array([10, 20, 30], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "value": pa.array([1.0, None, 3.0], pa.float64()),
        }
    )
    out = (
        lead_lag(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # SQL: LAG/LEAD carry the neighbor's (null) value, not a crash
    assert out.loc[1, "lag_value_cents"] == 100
    assert out.loc[1, "lead_value_cents"] == 300
    assert bool(out.loc[0:0, "lead_value_cents"].isna().all())  # neighbor null
    assert bool(out.loc[2:2, "lag_value_cents"].isna().all())  # neighbor null
    assert bool(out.loc[0:0, "lag_value_cents"].isna().all())  # edge
    assert bool(out.loc[2:2, "lead_value_cents"].isna().all())  # edge


def test_running_total_null_prefix_and_segments(ray_session):
    """running_total: SQL SUM OVER skips nulls, and the prefix stays NULL
    until the partition's first non-null value; segments reset per user."""
    import ray
    import pyarrow as pa

    from phrasekit_ray.stages.windows import running_total

    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array([10, 20, 30, 40, 10, 20], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "value": pa.array([None, 2.0, None, 3.0, 5.0, 1.0], pa.float64()),
        }
    )
    out = (
        running_total(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert bool(out.loc[0:0, "running_cents"].isna().all())  # null prefix
    assert out.loc[1, "running_cents"] == 200
    assert out.loc[2, "running_cents"] == 200  # null skipped, sum carries
    assert out.loc[3, "running_cents"] == 500
    assert out.loc[4, "running_cents"] == 500  # new user resets
    assert out.loc[5, "running_cents"] == 600


def test_rank_window_ntile_sizing_and_single_row(ray_session):
    """NTILE SQL sizing (first n mod k buckets get the extra row) and
    percent_rank 0 for single-row partitions."""
    import ray
    import pyarrow as pa

    from phrasekit_ray.stages.windows import rank_window

    # user 1: 6 rows into 4 tiles -> sizes 2,2,1,1; user 2: single row
    t = pa.table(
        {
            "event_id": pa.array(list(range(7)), pa.int64()),
            "ts": pa.array([10, 20, 30, 40, 50, 60, 10], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1, 1, 1, 2], pa.int64()),
        }
    )
    out = (
        rank_window(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out["rn"].tolist() == [1, 2, 3, 4, 5, 6, 1]
    assert out["ntile"].tolist() == [1, 1, 2, 2, 3, 4, 1]
    assert out.loc[0, "pr_micro"] == 0
    assert out.loc[5, "pr_micro"] == 1_000_000
    assert out.loc[1, "pr_micro"] == 200_000  # 1/5
    assert out.loc[6, "pr_micro"] == 0  # single-row partition
