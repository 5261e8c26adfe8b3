"""Unit/differential tests for the round-4 operators (X86–X90):

- range_self_join: bounded-horizon range self-join vs brute force
  (including equal-ts ties, which the strict > must exclude).
- grouped_argmax: lexicographic (ts, id) argmax with tiebreaks and the
  in-block-combiner path (multi-block input).
- rows_window_sum: ROWS-frame sum/count with NULLs vs DuckDB.
- bloom_semi_join: identical to the exact semi join, including the
  size-cap fallback and an empty build side.
- grouped_string_agg: distinct sorted concat vs DuckDB string_agg.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def test_range_self_join_matches_bruteforce_with_ties(ray_session):
    import ray

    from phrasekit_ray.stages.windows import range_self_join

    rng = np.random.default_rng(7)
    n = 400
    key = rng.integers(0, 12, n)
    ts = rng.integers(0, 50, n)  # dense → many ties
    eid = np.arange(n)
    t = pa.table(
        {
            "k": pa.array(key, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "id": pa.array(eid, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    got = _collect(
        range_self_join(ds, key_col="k", ts_col="ts", id_col="id", horizon=5)
    )
    got_pairs = set(zip(got["left_id"].to_pylist(), got["right_id"].to_pylist()))
    want = {
        (int(eid[i]), int(eid[j]))
        for i in range(n)
        for j in range(n)
        if key[i] == key[j] and 0 < ts[j] - ts[i] <= 5
    }
    assert got_pairs == want
    # the cap trips
    with pytest.raises(ValueError, match="hot_key_cap"):
        _collect(
            range_self_join(
                ds, key_col="k", ts_col="ts", id_col="id", horizon=5,
                hot_key_cap=3,
            )
        )


def test_grouped_argmax_tiebreaks_and_multiblock(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_argmax

    # user 1: same ts twice → higher id wins; user 2: later ts wins
    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([10, 10, 5, 7, 9], pa.int64()),
            "id": pa.array([100, 101, 102, 200, 201], pa.int64()),
            "tag": pa.array(["a", "b", "c", "d", "e"]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)  # forces the combiner path
    got = _collect(grouped_argmax(ds, "u", ["ts", "id"], ["tag"]))
    rows = {
        r["u"]: (r["ts"], r["id"], r["tag"])
        for r in got.to_pylist()
    }
    assert rows == {1: (10, 101, "b"), 2: (9, 201, "e")}


def test_rows_window_sum_nulls_match_duckdb(ray_session):
    import ray

    from phrasekit_ray.stages.windows import rows_window_sum

    rng = np.random.default_rng(3)
    n = 300
    uid = rng.integers(0, 9, n)
    ts = rng.permutation(n)
    vals = rng.uniform(-5, 5, n)
    null_mask = rng.random(n) < 0.2
    value = pa.array(
        [None if m else float(v) for v, m in zip(vals, null_mask)], pa.float64()
    )
    t = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "value": value,
        }
    )
    got = _collect(
        rows_window_sum(ray.data.from_arrow(t).repartition(3), preceding=2)
    ).sort_by("event_id")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """
        SELECT event_id,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) OVER w AS BIGINT)
                 AS win_sum_cents,
               count(value) OVER w AS win_n
        FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    ).fetch_arrow_table()
    assert got.select(["event_id", "win_sum_cents", "win_n"]).equals(
        want.cast(got.select(["event_id", "win_sum_cents", "win_n"]).schema)
    )


def test_bloom_semi_join_equals_exact_semi_join(ray_session):
    import ray

    from phrasekit_ray.stages.agg import bloom_semi_join, key_filter_join

    rng = np.random.default_rng(11)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 5000, 4000), pa.int64()),
            "payload": pa.array(np.arange(4000), pa.int64()),
        }
    )
    right = pa.table({"rk": pa.array(rng.integers(0, 5000, 600), pa.int64())})
    lds = ray.data.from_arrow(left).repartition(4)
    rds = ray.data.from_arrow(right).repartition(2)

    def norm(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return t.take(
            pc_.sort_indices(
                t, sort_keys=[("payload", "ascending")]
            )
        )

    got = norm(_collect(bloom_semi_join(lds, rds, "k", "rk")))
    want = norm(_collect(key_filter_join(lds, rds, "k", "rk")))
    assert got.equals(want)
    assert got.num_rows > 0

    # size-cap fallback path gives the same answer
    got_fb = norm(
        _collect(bloom_semi_join(lds, rds, "k", "rk", max_bloom_bytes=1))
    )
    assert got_fb.equals(want)

    # empty build side → empty result
    empty = ray.data.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    got_e = _collect(bloom_semi_join(lds, empty, "k", "rk"))
    assert got_e.num_rows == 0


def test_grouped_string_agg_matches_duckdb(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_string_agg

    rng = np.random.default_rng(5)
    n = 500
    k = rng.integers(0, 20, n)
    words = np.array(["ant", "bee", "cat", "dog", "elk", "fox"])
    v = words[rng.integers(0, len(words), n)]
    t = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v)})
    got = _collect(
        grouped_string_agg(
            ray.data.from_arrow(t).repartition(4), "k", "v", sep="|",
            out_col="agg",
        )
    ).sort_by("k")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT k, string_agg(DISTINCT v, '|' ORDER BY v) AS agg "
        "FROM t GROUP BY k ORDER BY k"
    ).fetch_arrow_table()
    assert got.equals(want.cast(got.schema))


def test_time_weighted_sum_matches_duckdb_with_ties_and_nulls(ray_session):
    import ray

    from phrasekit_ray.stages.windows import time_weighted_sum

    rng = np.random.default_rng(9)
    n = 250
    uid = rng.integers(0, 8, n)
    ts = rng.integers(0, 40, n)  # dense → equal-ts ties
    vals = rng.uniform(0, 50, n)
    null_mask = rng.random(n) < 0.15
    t = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "value": pa.array(
                [None if m else float(v) for v, m in zip(vals, null_mask)],
                pa.float64(),
            ),
        }
    )
    got = _collect(
        time_weighted_sum(ray.data.from_arrow(t).repartition(3))
    ).sort_by("user_id")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """
        WITH w AS (
          SELECT user_id, CAST(round(value * 100.0) AS BIGINT) AS cents, ts,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   - ts AS dt
          FROM t)
        SELECT user_id,
               CAST(coalesce(sum(cents * dt), 0) AS BIGINT) AS twa_num_us,
               CAST(max(ts) - min(ts) AS BIGINT) AS span_us
        FROM w GROUP BY user_id ORDER BY user_id
        """
    ).fetch_arrow_table()
    assert got.equals(want.cast(got.schema))


def test_histogram_quantiles_error_bound_vs_exact(ray_session):
    import ray

    from phrasekit_ray.stages.agg import histogram_quantiles

    rng = np.random.default_rng(13)
    vals = rng.lognormal(3, 1, 20_000)
    t = pa.table({"value": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(t).repartition(6)
    fr = [0.25, 0.5, 0.75, 0.99]
    got = histogram_quantiles(ds, "value", fr, num_buckets=1024)
    cents = np.sort(np.round(vals * 100).astype(np.int64))
    width = max(1, -(-(int(cents[-1]) - int(cents[0]) + 1) // 1024))
    for f, est in zip(
        got["fraction_pct"].to_pylist(), got["est_cents"].to_pylist()
    ):
        rank = max(1, min(len(cents), -(-round(f / 100 * 1000) * len(cents) // 1000)))
        exact = int(cents[rank - 1])
        assert abs(est - exact) <= width, (f, est, exact, width)


def test_histogram_quantiles_constant_column(ray_session):
    import ray

    from phrasekit_ray.stages.agg import histogram_quantiles

    t = pa.table({"value": pa.array([7.5] * 100, pa.float64())})
    got = histogram_quantiles(ray.data.from_arrow(t), "value", [0.5])
    assert got["est_cents"].to_pylist() == [750]


def test_range_join_two_table_matches_bruteforce(ray_session):
    import ray

    from phrasekit_ray.stages.windows import range_join

    rng = np.random.default_rng(17)
    nl, nr = 250, 220
    lk = rng.integers(0, 10, nl)
    lt = rng.integers(0, 60, nl)
    rk = rng.integers(0, 10, nr)
    rt = rng.integers(0, 60, nr)
    left = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "ts": pa.array(lt, pa.int64()),
            "id": pa.array(np.arange(nl), pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(rk, pa.int64()),
            "ts": pa.array(rt, pa.int64()),
            "id": pa.array(np.arange(1000, 1000 + nr), pa.int64()),
        }
    )
    got = _collect(
        range_join(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right).repartition(4),
            key_col="k", ts_col="ts", id_col="id", horizon=7,
        )
    )
    got_pairs = set(zip(got["left_id"].to_pylist(), got["right_id"].to_pylist()))
    want = {
        (int(i), int(1000 + j))
        for i in range(nl)
        for j in range(nr)
        if lk[i] == rk[j] and 0 < rt[j] - lt[i] <= 7
    }
    assert got_pairs == want


# --- round-4 code-review regression fixes ---------------------------------


def test_grouped_string_agg_skips_nulls(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_string_agg

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "v": pa.array(["b", None, "a", None, "z"], pa.string()),
        }
    )
    got = _collect(
        grouped_string_agg(ray.data.from_arrow(t), "k", "v", out_col="agg")
    ).sort_by("k")
    assert got["agg"].to_pylist() == ["a,b", "z"]  # SQL skips NULLs
    # non-distinct path must not NULL-poison the group either
    got2 = _collect(
        grouped_string_agg(
            ray.data.from_arrow(t), "k", "v", distinct=False, out_col="agg"
        )
    ).sort_by("k")
    assert got2["agg"].to_pylist() == ["a,b", "z"]


def test_range_join_tie_run_cap_refuses_degenerate_input(ray_session):
    import ray

    from phrasekit_ray.stages.windows import _range_pair_positions, range_self_join

    # kernel-level: equal-(key, ts) run above the cap raises
    key = np.zeros(50, np.int64)
    ts = np.zeros(50, np.int64)
    with pytest.raises(ValueError, match="tie_run_cap"):
        _range_pair_positions(key, ts, horizon=10, tie_run_cap=10)
    # below the cap: emits nothing (strict >) but completes
    i, j = _range_pair_positions(key, ts, horizon=10, tie_run_cap=100)
    assert len(i) == 0

    # operator level still fine with moderate ties
    t = pa.table(
        {
            "k": pa.array([1] * 20, pa.int64()),
            "ts": pa.array([5] * 10 + [6] * 10, pa.int64()),
            "id": pa.array(np.arange(20), pa.int64()),
        }
    )
    got = _collect(
        range_self_join(
            ray.data.from_arrow(t), key_col="k", ts_col="ts", id_col="id",
            horizon=2,
        )
    )
    assert got.num_rows == 100  # 10 ts=5 rows × 10 ts=6 successors


def test_time_weighted_sum_refuses_int64_overflow(ray_session):
    import ray

    from phrasekit_ray.stages.windows import time_weighted_sum

    t = pa.table(
        {
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([0, 4 * 10**12], pa.int64()),  # ~46 days in µs
            "event_id": pa.array([0, 1], pa.int64()),
            "value": pa.array([4e7, 1.0], pa.float64()),  # 4e9 cents
        }
    )
    with pytest.raises(Exception, match="overflow"):
        _collect(time_weighted_sum(ray.data.from_arrow(t)))


def test_decode_jpeg_rejects_huge_declared_dimensions():
    import struct as _struct

    from phrasekit_ray.core import jpeg

    enc = bytearray(jpeg.encode_jpeg(np.zeros((16, 16), np.uint8), 75))
    i = enc.find(b"\xff\xc0")
    enc[i + 5:i + 9] = _struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        jpeg.decode_jpeg(bytes(enc))


def test_lookup_join_broadcast_equals_partitioned(ray_session):
    import ray

    from phrasekit_ray.stages.agg import lookup_join

    rng = np.random.default_rng(23)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 300, 2000), pa.int64()),
            "x": pa.array(np.arange(2000), pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(np.arange(0, 250), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(250)]),
        }
    )
    lds = ray.data.from_arrow(left).repartition(4)
    rds = ray.data.from_arrow(right).repartition(2)

    def norm(t):
        import pyarrow.compute as pc_

        return t.take(pc_.sort_indices(t, sort_keys=[("x", "ascending")]))

    got_b = norm(_collect(lookup_join(lds, rds, "k", "rk")))
    got_p = norm(
        _collect(lookup_join(lds, rds, "k", "rk", broadcast_rows=0))
    )
    assert got_b.equals(got_p)
    assert got_b.num_rows > 0

    # empty right side: both paths produce an empty, correctly-typed table
    empty = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "name": pa.array([], pa.string())})
    )
    for br in (1_000_000, 0):
        out = _collect(lookup_join(lds, empty, "k", "rk", broadcast_rows=br))
        assert out.num_rows == 0


# --- round-4 batch 3: funnel, mode, zscore, chunk_windows, dup_ngram ---


def test_funnel_strict_order_and_ties(ray_session):
    import ray

    from phrasekit_ray.stages.windows import funnel_counts

    rows = [
        # user 1: full ordered chain
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: click BEFORE view → stops after view
        (2, "click", 5), (2, "view", 10),
        # user 3: click at the SAME ts as view → strict > excludes it
        (3, "view", 10), (3, "click", 10),
        # user 4: purchase without click → counts only step 0
        (4, "view", 1), (4, "purchase", 2),
        # user 5: no view at all → counts nowhere
        (5, "click", 1), (5, "purchase", 2),
        # user 6: chain via the SECOND click (first is too early)
        (6, "click", 1), (6, "view", 2), (6, "click", 3), (6, "purchase", 4),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    got = _collect(
        funnel_counts(
            ray.data.from_arrow(t).repartition(4),
            ["view", "click", "purchase"],
        )
    ).sort_by("step_idx")
    assert got["step"].to_pylist() == ["view", "click", "purchase"]
    # step0: users 1,2,3,4,6 ; step1: 1,2(click after view? no: user2's
    # only click is BEFORE its view) → 1,6 ; step2: 1,6
    assert got["users"].to_pylist() == [5, 2, 2]


def test_funnel_validates_steps(ray_session):
    import ray

    from phrasekit_ray.stages.windows import funnel_counts

    t = pa.table({"user_id": pa.array([1], pa.int64()),
                  "event_type": pa.array(["a"]),
                  "ts": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        funnel_counts(ray.data.from_arrow(t), [])
    with pytest.raises(ValueError):
        funnel_counts(ray.data.from_arrow(t), ["a", "a"])


def test_grouped_mode_tiebreak_smallest(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_mode

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            # group 1: b×2, a×2 → tie → 'a'; group 2: z×2 wins
            "v": pa.array(["b", "b", "a", "a", "z", "z"]),
        }
    )
    got = _collect(
        grouped_mode(ray.data.from_arrow(t).repartition(3), "k", "v")
    ).sort_by("k")
    assert got["v"].to_pylist() == ["a", "z"]
    assert got["n"].to_pylist() == [2, 2]


def test_grouped_zscore_constant_group_null(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_zscore

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "id": pa.array([10, 11, 12, 20, 21], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 7.0, 7.0], pa.float64()),
        }
    )
    got = _collect(
        grouped_zscore(ray.data.from_arrow(t).repartition(2), "k", "value")
    )
    by_id = {i: z for i, z in zip(got["id"].to_pylist(),
                                  got["zscore_micro"].to_pylist())}
    # group 1: mean 200, std sqrt(2/3)*100 ≈ 81.6497 → z ≈ ±1.224745
    assert by_id[10] == -1224745 and by_id[12] == 1224745 and by_id[11] == 0
    # group 2: std 0 → NULL
    assert by_id[20] is None and by_id[21] is None


def test_chunk_windows_edges(ray_session):
    import ray

    from phrasekit_ray.stages.chunk import chunk_windows

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "",                       # "" splits to one empty token
                    "a b c",                  # n == window → exactly 1 chunk
                    "a b c d e",              # window 3 stride 2 → 2 chunks
                    "a b c d",                # tail coverage: starts 0,2
                ]
            ),
        }
    )
    got = _collect(
        chunk_windows(ray.data.from_arrow(t).repartition(2), window=3, stride=2)
    )
    rows = sorted(
        zip(got["doc_id"].to_pylist(), got["chunk_idx"].to_pylist(),
            got["chunk_text"].to_pylist(), got["n_tokens"].to_pylist())
    )
    assert rows == [
        (1, 0, "", 1),
        (2, 0, "a b c", 3),
        (3, 0, "a b c", 3), (3, 1, "c d e", 3),
        (4, 0, "a b c", 3), (4, 1, "c d", 2),
    ]


def test_dup_ngram_docs_within_doc_repeat_counts_once(ray_session):
    import ray

    from phrasekit_ray.stages.dedup import dup_ngram_docs

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "x y x y x y",   # internal repeats of "x y x" — no other doc
                    "p q r s t",     # shares "p q r" 3-gram with doc 3
                    "z p q r s w",   # shares "p q r s"→ two 3-grams with doc 2
                    "a b",           # shorter than k → emits nothing
                ]
            ),
        }
    )
    got = _collect(
        dup_ngram_docs(ray.data.from_arrow(t).repartition(2), k=3)
    ).sort_by("doc_id")
    # doc1's repeated internal shingles never pair with another doc
    assert got["doc_id"].to_pylist() == [2, 3]
    # docs 2,3 share "p q r" and "q r s" (distinct shingles per doc)
    assert got["dup_shingles"].to_pylist() == [2, 2]


def test_quantile_filter_threshold_and_edges(ray_session):
    import ray

    from phrasekit_ray.stages.agg import quantile_filter

    t = pa.table(
        {
            "id": pa.array(list(range(8)), pa.int64()),
            "n": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    # p25 of 1..8 (quantile_cont) = 2.75 → keep n >= 2.75 → 3..8
    got = _collect(quantile_filter(ds, "n", 0.25))
    assert sorted(got["n"].to_pylist()) == [3, 4, 5, 6, 7, 8]
    # q=0 keeps everything; q=1 keeps only the max
    assert _collect(quantile_filter(ds, "n", 0.0)).num_rows == 8
    assert sorted(
        _collect(quantile_filter(ds, "n", 1.0))["n"].to_pylist()
    ) == [8]
    with pytest.raises(ValueError):
        quantile_filter(ds, "n", 1.5)


def test_chunk_windows_stride_gt_window_no_phantom_chunk(ray_session):
    # review finding: stride > window used to append a start at/past the
    # end of the doc, emitting a phantom (chunk_text="", n_tokens=0) row
    import ray

    from phrasekit_ray.stages.chunk import chunk_windows

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["t0 t1 t2 t3 t4 t5 t6 t7"]),
        }
    )
    got = _collect(chunk_windows(ray.data.from_arrow(t), window=2, stride=5))
    rows = sorted(
        zip(got["chunk_idx"].to_pylist(), got["chunk_text"].to_pylist(),
            got["n_tokens"].to_pylist())
    )
    # starts 0 and 5 only — start 10 is past the 8-token doc
    assert rows == [(0, "t0 t1", 2), (1, "t5 t6", 2)]
    assert all(n > 0 for _, _, n in rows)


def test_grouped_zscore_rejects_reserved_key_col(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_zscore

    t = pa.table(
        {
            "v": pa.array([1, 1, 2], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    with pytest.raises(ValueError, match="reserved column collision"):
        grouped_zscore(ray.data.from_arrow(t), key_col="v", val_col="value")


def _es_reference(ids, weights, k, seed=17):
    """Driver-side A-ES reference: full-key sort, no pruning."""
    h = (ids.astype(np.uint64) + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)
    u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
    with np.errstate(divide="ignore"):
        key = -np.log(u) / weights
    key[~(weights > 0)] = np.inf
    order = np.lexsort((ids, key))
    order = order[np.isfinite(key[order])]
    return set(ids[order[:k]].tolist())


def test_weighted_sample_matches_reference_and_partitioning(ray_session):
    import ray

    from phrasekit_ray.stages.agg import weighted_sample

    rng = np.random.default_rng(3)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 1000, n).astype(np.float64)
    w[::17] = 0.0  # zero-weight rows must never be selected
    t = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    want = _es_reference(ids, w, 100)
    for parts in (1, 7):
        got = _collect(
            weighted_sample(
                ray.data.from_arrow(t).repartition(parts), 100, "w", "doc_id"
            )
        )
        assert set(got["doc_id"].to_pylist()) == want
        assert not (set(got["doc_id"].to_pylist()) & set(ids[::17].tolist()))


def test_weighted_sample_weight_proportionality(ray_session):
    # heavy rows (w=50) must dominate light rows (w=1) in the sample
    import ray

    from phrasekit_ray.stages.agg import weighted_sample

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids < 200, 50.0, 1.0)  # 200 heavy, 1800 light
    t = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    got = _collect(weighted_sample(ray.data.from_arrow(t), 100, "w", "doc_id"))
    heavy = sum(1 for d in got["doc_id"].to_pylist() if d < 200)
    # E[heavy] ≈ 77 of 100 under sequential ∝-weight draws; even a loose
    # bound separates it decisively from the unweighted E ≈ 10
    assert heavy > 40


def test_weighted_sample_k_exceeds_population(ray_session):
    import ray

    from phrasekit_ray.stages.agg import weighted_sample

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "w": pa.array([1.0, 0.0, 2.0, None], pa.float64()),
        }
    )
    got = _collect(weighted_sample(ray.data.from_arrow(t), 10, "w", "doc_id"))
    # only the two positive-weight rows qualify
    assert sorted(got["doc_id"].to_pylist()) == [1, 3]


def test_extract_links_edge_cases(ray_session):
    import ray

    from phrasekit_ray.stages.extract import extract_links, host_of

    html = [
        # junk (relative/fragment/mailto) dropped, fragment stripped, two kept
        b'<a href="/rel"></a><a href="#x"></a><a href="mailto:a@b.c"></a>'
        b'<a href="https://a.org/p#frag"></a><a href="http://b.org/q"></a>',
        None,  # null html -> no links
        b"no anchors at all",
        b'<a href="https://unclosed.org/tail',  # no closing quote -> drop
        b'text <a href="HTTPS://upper.org/x"></a>',  # scheme is case-exact here
        b'<a href="https://c.org/r"></a>',
    ]
    t = pa.table(
        {
            "url": pa.array([f"https://s{i}.org/{i}" for i in range(len(html))]),
            "html": pa.array(html, pa.binary()),
        }
    )
    got = _collect(extract_links(ray.data.from_arrow(t)))
    pairs = sorted(zip(got["src_url"].to_pylist(), got["href"].to_pylist()))
    assert pairs == [
        ("https://s0.org/0", "http://b.org/q"),
        ("https://s0.org/0", "https://a.org/p"),
        ("https://s5.org/5", "https://c.org/r"),
    ]
    # host_of: case-insensitive scheme, port kept, no-match -> null
    h = host_of(
        pa.array(
            ["https://X.org:8443/a", "HTTP://y.io/b", "ftp://z", "relative/p"]
        )
    )
    assert h.to_pylist() == ["X.org:8443", "y.io", None, None]


def test_extract_links_matches_re_reference(ray_session):
    import re

    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links

    pages_t = pa.concat_tables(
        ray.get(
            pages_from_documents("/root/testdata/sf0.001", with_links=True)
            .materialize()
            .to_arrow_refs()
        )
    )
    pat = re.compile(r'href="([^"]*)"')
    want = []
    for u, h in zip(pages_t["url"].to_pylist(), pages_t["html"].to_pylist()):
        for m in pat.findall(h.decode()):
            if m.startswith(("https://", "http://")):
                want.append((u, m.split("#", 1)[0]))
    got = _collect(
        extract_links(ray.data.from_arrow(pages_t).repartition(5))
    )
    assert sorted(zip(got["src_url"].to_pylist(), got["href"].to_pylist())) == sorted(
        want
    )
    assert len(want) > 0


def test_host_pagerank_agrees_with_reference(ray_session):
    from phrasekit_ray.pipelines.queries_ext import EXT_QUERIES

    t = EXT_QUERIES["q_host_pagerank"]("/root/testdata/sf0.001")
    assert t.num_rows == 20
    assert all(h.endswith(".example.org") for h in t["host"].to_pylist())
    # in-band agreement metric vs the independent numpy power iteration
    assert t["max_abs_delta_e12"][0].as_py() < 1000  # i.e. ≤ 1e-9
    r = t["rank_e9"].to_pylist()
    assert r == sorted(r, reverse=True) and r[0] > 0


def test_mix_corpora_semantics(ray_session):
    import ray

    from phrasekit_ray.stages.mix import mix_corpora

    n = 4000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array(
                ["keep_half", "as_is", "double", "x2_5"][0:1] * 0
                + [["keep_half", "as_is", "double", "x2_5"][i % 4] for i in range(n)]
            ),
        }
    )
    rates = {"keep_half": 0.5, "as_is": 1.0, "double": 2.0, "x2_5": 2.5}
    for parts in (1, 9):
        got = _collect(
            mix_corpora(
                ray.data.from_arrow(t).repartition(parts),
                "source",
                rates,
                "doc_id",
            )
        )
        per = {
            s: sum(1 for x in got["source"].to_pylist() if x == s)
            for s in rates
        }
        assert per["as_is"] == 1000  # rate 1.0 is exact
        assert per["double"] == 2000  # integer rate -> exact copies
        assert 400 <= per["keep_half"] <= 600  # hash-gated ~50%
        assert 2300 <= per["x2_5"] <= 2700  # ~2.5x
        # copy indices are dense 0..c-1 per id
        import collections

        by_id = collections.Counter(got["doc_id"].to_pylist())
        copies = collections.defaultdict(list)
        for d, c in zip(got["doc_id"].to_pylist(), got["copy"].to_pylist()):
            copies[d].append(c)
        assert all(sorted(v) == list(range(len(v))) for v in copies.values())
    # determinism across partitionings was asserted by the loop re-check
    with pytest.raises(ValueError, match="rates must be >= 0"):
        mix_corpora(ray.data.from_arrow(t), "source", {"a": -1.0}, "doc_id")


def test_mix_corpora_rate_zero_and_default(ray_session):
    import ray

    from phrasekit_ray.stages.mix import mix_corpora

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": pa.array(["drop", "drop", "unlisted", "unlisted"]),
        }
    )
    got = _collect(
        mix_corpora(ray.data.from_arrow(t), "source", {"drop": 0.0}, "doc_id")
    )
    assert sorted(got["doc_id"].to_pylist()) == [3, 4]  # default rate 1.0


def test_contamination_fraction_hand_case(ray_session):
    import ray

    from phrasekit_ray.stages.dedup import contamination_fraction

    train = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            # doc 1: shingles {a b c, b c d} — one shared with bench
            # doc 2: no overlap
            "tokens": pa.array(
                [["a", "b", "c", "d"], ["x", "y", "z", "w"]],
                pa.list_(pa.string()),
            ),
        }
    )
    bench = pa.table(
        {
            "doc_id": pa.array([9], pa.int64()),
            "tokens": pa.array([["a", "b", "c", "q"]], pa.list_(pa.string())),
        }
    )
    got = _collect(
        contamination_fraction(
            ray.data.from_arrow(train), ray.data.from_arrow(bench), k=3
        )
    )
    assert got.num_rows == 1
    row = got.to_pylist()[0]
    assert row["doc_id"] == 1 and row["n_shared"] == 1 and row["n_total"] == 2
    assert row["contam_bp"] == 5000


def test_excise_duplicate_spans_hand_case(ray_session):
    import ray

    from phrasekit_ray.stages.dedup import excise_duplicate_spans

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f g",      # shares "a b c d e" with doc 2
                    "x a b c d e q",
                    "p p p p p p p p p p",  # within-doc repeated 5-gram
                    "short doc",            # < k tokens: untouched
                ]
            ),
        }
    )
    for parts in (1, 3):
        got = _collect(
            excise_duplicate_spans(
                ray.data.from_arrow(t).repartition(parts), k=5
            )
        )
        rows = {r["doc_id"]: r for r in got.to_pylist()}
        assert rows[1]["clean_text"] == "f g" and rows[1]["n_removed"] == 5
        assert rows[2]["clean_text"] == "x q" and rows[2]["n_removed"] == 5
        assert rows[3]["clean_text"] == "" and rows[3]["n_removed"] == 10
        assert rows[4]["clean_text"] == "short doc"
        assert rows[4]["n_removed"] == 0
        assert len(rows) == 4


def test_random_projection_preserves_similarity_order(ray_session):
    """JL sanity: sign-agreement of the r=64 sketch correlates with
    cosine — near-identical vectors agree on almost all signs, random
    pairs on ~half."""
    import ray

    from phrasekit_ray.stages.similarity import random_projection_sketch

    rng = np.random.default_rng(5)
    base = rng.normal(size=64)
    near = base + rng.normal(scale=0.01, size=64)
    far = rng.normal(size=64)
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [base.tolist(), near.tolist(), far.tolist()],
                pa.list_(pa.float32()),
            ),
        }
    )
    got = _collect(random_projection_sketch(ray.data.from_arrow(t), r=64))
    proj = np.array(got["proj"].to_pylist()).reshape(3, 64)
    agree_near = np.mean(np.sign(proj[0]) == np.sign(proj[1]))
    agree_far = np.mean(np.sign(proj[0]) == np.sign(proj[2]))
    assert agree_near > 0.9
    assert 0.2 < agree_far < 0.8
    # ragged input rejected
    bad = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 2.0], [1.0]], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(Exception, match="ragged"):
        _collect(random_projection_sketch(ray.data.from_arrow(bad), r=4))


def test_percent_rank_column_semantics(ray_session):
    import ray

    from phrasekit_ray.stages.agg import percent_rank_column

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array([10, 20, 20, 30, 40], pa.int64()),
        }
    )
    for parts in (1, 4):
        got = _collect(
            percent_rank_column(ray.data.from_arrow(t).repartition(parts), "v")
        )
        pr = dict(zip(got["id"].to_pylist(), got["pr_micro"].to_pylist()))
        # N=5, denom=4; strictly-less counts: 10→0, 20→1, 30→3, 40→4
        assert pr == {1: 0, 2: 250000, 3: 250000, 4: 750000, 5: 1000000}
    # single row: denom clamps to 1, pr = 0
    one = pa.table({"id": pa.array([1], pa.int64()), "v": pa.array([7], pa.int64())})
    got = _collect(percent_rank_column(ray.data.from_arrow(one), "v"))
    assert got["pr_micro"].to_pylist() == [0]


def test_k_core_matches_driver_peeling(ray_session):
    import collections

    import ray

    from phrasekit_ray.stages.kg import k_core

    # small graph: a 4-clique (3-core) + a pendant chain (peels away)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 6)]  # self-loop must be ignored
    t = pa.table(
        {
            "subj": pa.array([e[0] for e in edges], pa.int64()),
            "obj": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    for parts in (1, 3):
        got = _collect(
            k_core(ray.data.from_arrow(t).repartition(parts), k=3)
        )
        res = dict(zip(got["node"].to_pylist(), got["degree"].to_pylist()))
        assert res == {1: 3, 2: 3, 3: 3, 4: 3}
    # k larger than max degree: fully peeled
    got = _collect(k_core(ray.data.from_arrow(t), k=10))
    assert got.num_rows == 0
    with pytest.raises(ValueError, match="k must be >= 1"):
        k_core(ray.data.from_arrow(t), k=0)


def test_q_graph_kcore_inband_agreement(ray_session):
    from phrasekit_ray.pipelines.queries_ext import EXT_QUERIES

    t = EXT_QUERIES["q_graph_kcore"]("/root/testdata/sf0.001")
    if t.num_rows:
        assert t["ref_mismatches"][0].as_py() == 0


def test_json_extract_int_edge_cases(ray_session):
    import ray

    from phrasekit_ray.stages.textstats import json_extract_int

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "props": pa.array(
                [
                    '{"k": 87}',
                    '{"k": -3, "other": 1}',
                    '{"other": 5}',       # key absent -> null
                    '{"k": "text"}',      # non-integer -> null
                    None,                  # null blob -> null
                ]
            ),
        }
    )
    got = _collect(json_extract_int(ray.data.from_arrow(t), "props", "k"))
    by = dict(zip(got["id"].to_pylist(), got["k"].to_pylist()))
    assert by == {1: 87, 2: -3, 3: None, 4: None, 5: None}
    with pytest.raises(ValueError, match="simple identifier"):
        json_extract_int(ray.data.from_arrow(t), "props", 'k"evil')


def test_cms_never_underestimates(ray_session):
    import collections

    import ray

    from phrasekit_ray.stages.agg import cms_token_topk

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(200)]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for _ in range(300)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(300), pa.int64()), "text": pa.array(docs)}
    )
    exact = collections.Counter(tok for d in docs for tok in d.split(" "))
    for parts in (1, 5):
        got = cms_token_topk(
            ray.data.from_arrow(t).repartition(parts), k=50, width=256, depth=4
        )
        ests = dict(zip(got["tok"].to_pylist(), got["est_count"].to_pylist()))
        assert all(ests[tok] >= exact[tok] for tok in ests)  # CMS invariant
        # with 200 tokens in 1024 cells, the top est should be near exact
        top_tok = got["tok"][0].as_py()
        assert ests[top_tok] <= exact[top_tok] + sum(exact.values()) // 64


def test_extract_links_anchor_text(ray_session):
    import ray

    from phrasekit_ray.stages.extract import extract_links

    t = pa.table(
        {
            "url": pa.array(["https://s.org/1"]),
            "html": pa.array(
                [
                    b'<a href="https://a.org/p" rel="nofollow">Alias One</a>'
                    b'<a href="https://b.org/q"></a>'
                    b'<a href="https://c.org/r">unclosed tag'
                    b'<a href="/rel">junk</a>'
                ],
                pa.binary(),
            ),
        }
    )
    got = _collect(extract_links(ray.data.from_arrow(t), with_text=True))
    rows = {r["href"]: r["anchor_text"] for r in got.to_pylist()}
    assert rows == {
        "https://a.org/p": "Alias One",  # extra attribute tolerated
        "https://b.org/q": "",           # empty body
        "https://c.org/r": "unclosed tag",  # stops at the next '<'
    }


def test_canonicalize_urls_hand_cases(ray_session):
    import ray

    from phrasekit_ray.stages.extract import canonicalize_urls

    cases = {
        "HTTPS://WWW.Ex.ORG:443/p?utm_a=1&q=2#frag": "https://www.ex.org/p?q=2",
        "http://Site.org:80/": "http://site.org",
        "http://site.org:8080/a": "http://site.org:8080/a",  # non-default kept
        "https://h.org/p?q=1&utm_x=9": "https://h.org/p?q=1",
        "https://h.org/?utm_only=1": "https://h.org",
        "not a url #x": "not a url ",  # headless: fragment strip only
    }
    t = pa.table(
        {
            "id": pa.array(range(len(cases)), pa.int64()),
            "url": pa.array(list(cases.keys())),
        }
    )
    got = _collect(canonicalize_urls(ray.data.from_arrow(t)))
    res = dict(zip(got["url"].to_pylist(), got["canon_url"].to_pylist()))
    assert res == cases


def test_snapshot_diff_hand_case(ray_session):
    import ray

    from phrasekit_ray.stages.dedup import snapshot_diff

    old = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
        }
    )
    new = pa.table(
        {
            "doc_id": pa.array([2, 3, 4, 5], pa.int64()),
            "text": pa.array(["b", "CHANGED", "d", "e"]),
        }
    )
    got = _collect(
        snapshot_diff(ray.data.from_arrow(old), ray.data.from_arrow(new))
    )
    res = sorted(zip(got["doc_id"].to_pylist(), got["status"].to_pylist()))
    assert res == [(1, "removed"), (3, "changed"), (5, "added")]


def test_bench_pack_names_are_registered():
    """Every bench-pack query must exist in the driver registry with the
    right contract (catches pack typos before the driver does)."""
    import bench
    from phrasekit_ray.pipelines.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERY_NAMES if n not in QUERIES]
    assert missing == []
    assert len(set(bench.BENCH_QUERY_NAMES)) == len(bench.BENCH_QUERY_NAMES)


def test_driver_first_names_are_registered():
    import __ray_entry__ as e
    from phrasekit_ray.pipelines.queries import QUERIES

    missing = [n for n in e._DRIVER_FIRST if n not in QUERIES]
    assert missing == []


def test_extract_links_review_fixes(ray_session):
    """Round-4 review regressions: unclosed-quote candidates must not
    crash the with_text path, and non-UTF8 html bytes must be tolerated
    (lossy-decoded hrefs), per the tolerant-scan contract."""
    import ray

    from phrasekit_ray.stages.extract import extract_links

    t = pa.table(
        {
            "url": pa.array(["https://s.org/1", "https://s.org/2"]),
            "html": pa.array(
                [
                    # unclosed quote candidate + one good anchor
                    b'<a href="https://u.org/tail<a href="https://a.org/p">ok</a>',
                    # invalid UTF-8 inside html AND inside a kept href
                    b'\xff\xfe<a href="https://b.org/\xff">x</a>',
                ],
                pa.binary(),
            ),
        }
    )
    got = _collect(extract_links(ray.data.from_arrow(t), with_text=True))
    rows = sorted(
        zip(
            got["src_url"].to_pylist(),
            got["href"].to_pylist(),
            got["anchor_text"].to_pylist(),
        )
    )
    assert ("https://s.org/1", "https://a.org/p", "ok") in rows
    # the non-UTF8 href survives lossy-decoded, task does not crash
    assert any(h.startswith("https://b.org/") for _, h, _ in rows)


def test_k_core_raises_on_round_exhaustion(ray_session):
    import ray

    from phrasekit_ray.stages.kg import k_core

    # path graph: peels two endpoints per round -> needs ~n/2 rounds
    n = 20
    t = pa.table(
        {
            "subj": pa.array(list(range(n - 1)), pa.int64()),
            "obj": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        k_core(ray.data.from_arrow(t), k=2, max_rounds=3)
    # with enough rounds the 2-core of a path is empty
    got = _collect(k_core(ray.data.from_arrow(t), k=2, max_rounds=32))
    assert got.num_rows == 0


def test_excise_tolerates_null_text(ray_session):
    import ray

    from phrasekit_ray.stages.dedup import excise_duplicate_spans

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c d e f", None]),
        }
    )
    got = _collect(excise_duplicate_spans(ray.data.from_arrow(t), k=3))
    rows = {r["doc_id"]: r for r in got.to_pylist()}
    assert rows[2]["clean_text"] == "" and rows[2]["n_removed"] == 0
    assert rows[1]["clean_text"] == "a b c d e f"


def test_json_extract_int_rejects_float_prefix(ray_session):
    import ray

    from phrasekit_ray.stages.textstats import json_extract_int

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "props": pa.array(['{"k": 12.5}', '{"k": 1e5}', '{"k": 7}']),
        }
    )
    got = _collect(json_extract_int(ray.data.from_arrow(t), "props", "k"))
    by = dict(zip(got["id"].to_pylist(), got["k"].to_pylist()))
    assert by == {1: None, 2: None, 3: 7}


def test_canonicalize_preserves_path_ampersands(ray_session):
    import ray

    from phrasekit_ray.stages.extract import canonicalize_urls

    cases = {
        "https://h.org/a&b?c=1": "https://h.org/a&b?c=1",  # path '&' kept
        "https://h.org/a&utm_x/b?q=1": "https://h.org/a&utm_x/b?q=1",
        "https://h.org/p?utm_a=1&q=2": "https://h.org/p?q=2",
        "https://h.org/p?q=1&x=2": "https://h.org/p?q=1&x=2",
    }
    t = pa.table({"url": pa.array(list(cases.keys()))})
    got = _collect(canonicalize_urls(ray.data.from_arrow(t)))
    assert dict(zip(got["url"].to_pylist(), got["canon_url"].to_pylist())) == cases


def test_warc_subsecond_timestamps(ray_session, tmp_path):
    from phrasekit_ray.sources.warc import parse_warc_bytes, write_warc_file

    p = str(tmp_path / "frac.warc")
    write_warc_file(
        p,
        [
            {
                "url": "https://x.org/1",
                "warc_ts": 1696896000_500_250,
                "html": b"<p>x</p>",
            }
        ],
    )
    recs = parse_warc_bytes(open(p, "rb").read())
    assert recs[0]["warc_ts"] == 1696896000_500_250


def test_k_core_checkpoint_resume(ray_session, tmp_path):
    import os

    import ray

    from phrasekit_ray.stages.kg import k_core

    # path graph of 14 nodes: k=2 peels 2 endpoints/round, ~7 rounds
    n = 14
    t = pa.table(
        {
            "subj": pa.array(list(range(n - 1)), pa.int64()),
            "obj": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    ckpt = str(tmp_path / "kcore")
    # run 1 "crashes" after 3 rounds (max_rounds exhaustion raises)
    with pytest.raises(RuntimeError):
        k_core(
            ray.data.from_arrow(t), k=2, max_rounds=3, checkpoint_dir=ckpt,
            checkpoint_partitions=4,
        )
    assert os.path.isdir(os.path.join(ckpt, "kcore_round"))
    # run 2 resumes from the checkpoint and converges to the empty core
    got = _collect(
        k_core(
            ray.data.from_arrow(t), k=2, max_rounds=32, checkpoint_dir=ckpt,
            checkpoint_partitions=4,
        )
    )
    assert got.num_rows == 0
    # resumed run continued past round 3 (new round markers exist)
    rounds = sorted(os.listdir(os.path.join(ckpt, "kcore_round")))
    assert len(rounds) > 3


def test_registry_complete_under_both_import_orders():
    """Importing queries_ext FIRST must not drop late-registered queries
    (review finding: the mid-module self-register hook copied a partial
    map; the final hook re-pushes the complete one)."""
    import subprocess
    import sys

    code = (
        "import phrasekit_ray.pipelines.queries_ext\n"
        "from phrasekit_ray.pipelines.queries import QUERIES\n"
        "import bench\n"
        "missing = [n for n in bench.BENCH_QUERY_NAMES if n not in QUERIES]\n"
        "assert not missing, missing\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-1000:]


def test_csv_header_fixes(ray_session, tmp_path):
    """Review regressions: header=False must not drop header-identical
    data rows; every file's header validates (not just the first);
    directory inputs validate through pyarrow.fs."""
    from phrasekit_ray.sources.csv import read_corpus_csv

    d = tmp_path / "csvs"
    d.mkdir()
    (d / "a.csv").write_text("doc_id,text\n1,hello\n")
    (d / "b.csv").write_text("docid,body\n2,world\n")  # WRONG header
    with pytest.raises(ValueError, match="header mismatch"):
        read_corpus_csv(
            [str(d / "a.csv"), str(d / "b.csv")], ["doc_id", "text"]
        )
    # directory input works for validation
    (d / "b.csv").write_text("doc_id,text\n2,world\n")
    ds = read_corpus_csv(str(d), ["doc_id", "text"])
    got = _collect(ds)
    assert sorted(got["doc_id"].to_pylist()) == ["1", "2"]
    # header=False: a row equal to the would-be header is DATA
    p = tmp_path / "nohdr.csv"
    p.write_text("doc_id,text\n1,hello\n")
    got = _collect(read_corpus_csv(str(p), ["doc_id", "text"], header=False))
    assert sorted(got["doc_id"].to_pylist()) == ["1", "doc_id"]


def test_weighted_stratified_sample_partition_invariance(ray_session):
    import ray

    from phrasekit_ray.stages.agg import weighted_stratified_sample

    rng = np.random.default_rng(7)
    n = 3000
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "g": pa.array([f"g{i % 5}" for i in range(n)]),
            "w": pa.array(rng.integers(0, 100, n).astype(np.float64)),
        }
    )
    results = []
    for parts in (1, 7):
        got = _collect(
            weighted_stratified_sample(
                ray.data.from_arrow(t).repartition(parts), "g", 8, "w", "id"
            )
        )
        rows = sorted(zip(got["g"].to_pylist(), got["id"].to_pylist()))
        results.append(rows)
        # 8 per group, zero-weight rows excluded
        import collections

        per = collections.Counter(g for g, _ in rows)
        assert all(v == 8 for v in per.values())
        wmap = dict(zip(t["id"].to_pylist(), t["w"].to_pylist()))
        assert all(wmap[i] > 0 for _, i in rows)
    assert results[0] == results[1]
