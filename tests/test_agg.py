"""hash_aggregate: vectorized two-phase aggregate == native groupby."""

import numpy as np
import pyarrow as pa
import pandas as pd


def test_hash_aggregate_sum_min_max_matches_arrow(ray_session):
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate

    rng = np.random.default_rng(0)
    n = 10_000
    keys = rng.integers(0, 500, size=n)
    vals = rng.integers(0, 1000, size=n)
    names = np.array(["k%03d" % k for k in keys])
    tbl = pa.table(
        {
            "name": pa.array(names),
            "v": pa.array(vals, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(13)
    out = pa.concat_tables(
        list(
            hash_aggregate(
                ds, "name", [("v", "sum")], num_partitions=7
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="default",
    )
    want = tbl.group_by("name").aggregate([("v", "sum")])
    got = dict(zip(out["name"].to_pylist(), out["v"].to_pylist()))
    exp = dict(zip(want["name"].to_pylist(), want["v_sum"].to_pylist()))
    assert got == exp


def test_hash_aggregate_multikey_min(ray_session):
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate

    tbl = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 1], pa.int64()),
            "b": pa.array(["x", "x", "y", "y", "z"]),
            "v": pa.array([5, 3, 9, 7, 1], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = pa.concat_tables(
        list(
            hash_aggregate(ds, ["a", "b"], [("v", "min")]).iter_batches(
                batch_format="pyarrow"
            )
        ),
        promote_options="default",
    )
    got = {
        (a, b): v
        for a, b, v in zip(
            out["a"].to_pylist(), out["b"].to_pylist(), out["v"].to_pylist()
        )
    }
    assert got == {(1, "x"): 3, (2, "y"): 7, (1, "z"): 1}


def test_with_row_index_uses_metadata_path(ray_session):
    """Pin the primary (metadata-only) enumeration path: a Ray upgrade
    that breaks iter_internal_ref_bundles must fail THIS test rather than
    silently downgrading every enumeration to the fallback."""
    import ray

    from phrasekit_ray.state import rowindex

    ds = ray.data.from_items([{"v": i} for i in range(100)]).repartition(4)
    out = rowindex.with_row_index(ds.sort("v"), col="idx")
    assert rowindex.LAST_PATH == "bundles"
    rows = sorted(out.iter_rows(), key=lambda r: r["v"])
    assert [r["idx"] for r in rows] == list(range(100))


def test_with_row_index_fallback_is_distributed(ray_session, monkeypatch):
    """Force the fallback and check it still enumerates correctly (block
    refs via public to_arrow_refs, counts in remote tasks)."""
    import ray

    from phrasekit_ray.state import rowindex

    def boom(mat):
        raise RuntimeError("bundle API unavailable")

    ds = ray.data.from_items([{"v": i} for i in range(50)]).repartition(3)
    monkeypatch.setattr(rowindex, "_bundle_refs_and_counts", boom)
    out = rowindex.with_row_index(ds.sort("v"), col="idx", start=10)
    assert rowindex.LAST_PATH == "arrow_refs"
    rows = sorted(out.iter_rows(), key=lambda r: r["v"])
    assert [r["idx"] for r in rows] == list(range(10, 60))


def test_key_filter_join_semi_and_anti_both_paths(ray_session):
    import ray

    from phrasekit_ray.stages.agg import key_filter_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "v": pa.array(["a", "b", "c", "d", "e"]),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 4, 4, 9], pa.int64())})
    )
    for bcast in (5_000_000, 0):  # broadcast path, then partitioned path
        semi = sorted(
            r["k"]
            for r in key_filter_join(
                left, right, "k", "rk", anti=False, broadcast_ids=bcast
            ).iter_rows()
        )
        anti = sorted(
            r["k"]
            for r in key_filter_join(
                left, right, "k", "rk", anti=True, broadcast_ids=bcast
            ).iter_rows()
        )
        assert semi == [2, 4], f"broadcast_ids={bcast}"
        assert anti == [1, 3, 5], f"broadcast_ids={bcast}"


def test_grouped_count_distinct(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_count_distinct

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["x", "x", "x", "y", "y"]),
                "v": pa.array(["a", "a", "b", "a", "a"]),
            }
        )
    )
    out = {
        r["g"]: r["n_distinct"]
        for r in grouped_count_distinct(ds, "g", "v").iter_rows()
    }
    assert out == {"x": 2, "y": 1}


def test_approx_count_distinct_within_error(ray_session):
    import ray

    from phrasekit_ray.stages.agg import approx_count_distinct

    rng = np.random.default_rng(3)
    n = 20_000
    groups = ["g1"] * n + ["g2"] * n
    # g1: 5000 distinct values; g2: 500 distinct
    v1 = rng.integers(0, 5000, size=n)
    v2 = rng.integers(0, 500, size=n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(groups),
                "v": pa.array(np.concatenate([v1, v2]), pa.int64()),
            }
        )
    ).repartition(8)
    out = {
        r["g"]: r["approx_distinct"]
        for r in approx_count_distinct(ds, "g", "v", precision=8).iter_rows()
    }
    # HLL standard error at m=256 is ~6.5%; allow 4 sigma
    true1 = len(np.unique(v1))
    true2 = len(np.unique(v2))
    assert abs(out["g1"] - true1) / true1 < 0.26
    assert abs(out["g2"] - true2) / true2 < 0.26


def test_approx_distinct_tracks_exact_on_documents(ray_session, sf_dir):
    """The HLL query's estimate stays within 4σ of the exact distinct
    count on the real documents table."""
    import __ray_entry__ as entrymod

    approx = {
        r["lang"]: r["approx_distinct"]
        for r in entrymod.queries()["q_approx_unique_tokens_per_lang"](sf_dir)
        .to_pylist()
    }
    exact = {
        r["lang"]: r["n_unique_tokens"]
        for r in entrymod.queries()["q_unique_tokens_per_lang"](sf_dir)
        .to_pylist()
    }
    assert set(approx) == set(exact)
    for lang, e in exact.items():
        assert abs(approx[lang] - e) / max(e, 1) < 0.26, (lang, approx[lang], e)


def test_grouped_median_int_matches_numpy(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_median_int

    rng = np.random.default_rng(5)
    g1 = rng.integers(0, 1000, size=1001)  # odd count
    g2 = rng.integers(0, 1000, size=400)   # even count
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["a"] * 1001 + ["b"] * 400),
                "v": pa.array(np.concatenate([g1, g2]), pa.int64()),
            }
        )
    ).repartition(6)
    out = {
        r["g"]: r["median"]
        for r in grouped_median_int(ds, "g", "v").iter_rows()
    }
    assert out["a"] == float(np.median(g1))
    assert out["b"] == float(np.median(g2))


def test_stratified_sample_counts_and_determinism(ray_session):
    import ray

    from phrasekit_ray.stages.agg import stratified_sample

    tbl = pa.table(
        {
            "id": pa.array(range(1000), pa.int64()),
            "grp": pa.array(["x" if i % 3 else "y" for i in range(1000)]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    a = sorted(
        (r["grp"], r["id"])
        for r in stratified_sample(ds, "grp", 10, "id").iter_rows()
    )
    b = sorted(
        (r["grp"], r["id"])
        for r in stratified_sample(ds, "grp", 10, "id").iter_rows()
    )
    assert a == b  # deterministic across runs/partitionings
    from collections import Counter

    c = Counter(g for g, _ in a)
    assert c == {"x": 10, "y": 10}
    # different seed → different sample
    c2 = sorted(
        (r["grp"], r["id"])
        for r in stratified_sample(ds, "grp", 10, "id", seed=99).iter_rows()
    )
    assert c2 != a


def test_grouped_count_distinct_ignores_nulls(ray_session):
    """SQL COUNT(DISTINCT v): NULL is not a value (review finding)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count_distinct

    tbl = pa.table(
        {
            "g": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            "v": pa.array([1, None, 1, None, None], pa.int64()),
        }
    )
    out = pa.concat_tables(
        list(
            grouped_count_distinct(
                ray.data.from_arrow(tbl), "g", "v", num_partitions=2
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="default",
    )
    got = dict(zip(out["g"].to_pylist(), out["n_distinct"].to_pylist()))
    # group b has only nulls -> no row at all (matches SQL GROUP BY over
    # the filtered pairs); group a counts the single non-null value
    assert got == {"a": 1}


def test_approx_count_distinct_multikey_preserves_types(ray_session):
    """Multi-key HLL must return the ORIGINAL key columns/types, not
    stringified reconstructions (review finding)."""
    import ray

    from phrasekit_ray.stages.agg import approx_count_distinct

    tbl = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 1, 2], pa.int64()),
            "b": pa.array(["x", "x", "y", "y", "x", "y"], pa.string()),
            "v": pa.array([10, 11, 10, 10, 10, 12], pa.int64()),
        }
    )
    out = pa.concat_tables(
        list(
            approx_count_distinct(
                ray.data.from_arrow(tbl).repartition(2),
                ["a", "b"],
                "v",
                num_partitions=2,
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="default",
    )
    assert out.schema.field("a").type == pa.int64()
    assert out.schema.field("b").type == pa.string()
    got = {
        (a, b): n
        for a, b, n in zip(
            out["a"].to_pylist(),
            out["b"].to_pylist(),
            out["approx_distinct"].to_pylist(),
        )
    }
    # tiny cardinalities are exact under HLL linear counting
    assert got == {(1, "x"): 2, (2, "y"): 2}


def test_hash_aggregate_hot_key_exact(ray_session):
    """A 90%-hot key must aggregate exactly (partial combine collapses it
    to <=1 row per block before the shuffle)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count

    n = 50_000
    keys = np.where(np.arange(n) % 10 < 9, 1, np.arange(n) % 97 + 2)
    tbl = pa.table({"k": pa.array(keys, pa.int64())})
    out = pa.concat_tables(
        list(
            grouped_count(
                ray.data.from_arrow(tbl).repartition(16), "k"
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="default",
    )
    got = dict(zip(out["k"].to_pylist(), out["count"].to_pylist()))
    vals, cnts = np.unique(keys, return_counts=True)
    assert got == dict(zip(vals.tolist(), cnts.tolist()))
    assert got[1] == int((np.arange(n) % 10 < 9).sum())


def test_grouped_quantiles_int_matches_duckdb(ray_session):
    import duckdb
    import ray

    from phrasekit_ray.stages.agg import grouped_quantiles_int

    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table(
        {
            "g": pa.array(rng.integers(0, 7, n), pa.int64()),
            "v": pa.array(rng.integers(-50, 50, n), pa.int64()),  # heavy ties
        }
    )
    got = (
        grouped_quantiles_int(
            ray.data.from_arrow(t), "g", "v",
            {"p10": 0.1, "p50": 0.5, "p99": 0.99},
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT g, quantile_cont(v, 0.1) AS p10, quantile_cont(v, 0.5) AS p50, "
        "quantile_cont(v, 0.99) AS p99 FROM t GROUP BY 1 ORDER BY g"
    ).fetch_df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "p10", "p50", "p99"]], want,
                                  check_dtype=False)


def test_exact_heavy_hitters_matches_exact_counts(ray_session):
    import collections

    import ray

    from phrasekit_ray.stages.agg import exact_heavy_hitters

    rng = np.random.default_rng(9)
    # zipfish stream in 4 explicit blocks; 'hot' is heavy overall but
    # diluted per block, 'warm' is borderline, the tail is noise
    blocks = []
    allv = []
    for i in range(4):
        v = (["hot"] * 60 + ["warm"] * 25
             + [f"t{j}" for j in rng.integers(0, 200, 120)])
        rng.shuffle(v)
        allv.extend(v)
        blocks.append(pa.table({"tok": pa.array(v)}))
    ds = ray.data.from_arrow(blocks)
    k = 10
    got = exact_heavy_hitters(ds, "tok", k=k)
    counts = collections.Counter(allv)
    n = len(allv)
    want = sorted(
        ((c, t) for t, c in counts.items() if c * k > n),
        key=lambda x: (-x[0], x[1]),
    )
    assert got["key"].to_pylist() == [t for _, t in want]
    assert got["count"].to_pylist() == [c for c, _ in want]
    assert "hot" in got["key"].to_pylist()


def test_profile_table_with_nulls(ray_session):
    import ray

    from phrasekit_ray.stages.agg import profile_table

    t = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 3], pa.int64()),
            "b": pa.array(["x", None, None, "y", "x"]),
        }
    )
    out = profile_table(ray.data.from_arrow(t)).to_pandas().set_index("column")
    assert out.loc["a", "n_rows"] == 5 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 3
    assert out.loc["b", "n_null"] == 2 and out.loc["b", "n_distinct"] == 2
    assert out.loc["b", "min_str"] == "x" and out.loc["b", "max_str"] == "y"


def test_grouped_rollup_levels(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_rollup

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"], pa.string()),
            "b": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([10, 20, 5], pa.int64()),
        }
    )
    out = grouped_rollup(ray.data.from_arrow(t), ["a", "b"], "v").to_pandas()
    rows = {
        (r["a"], r["b"]): r["v"] for _, r in out.iterrows()
    }
    assert rows[("x", "1")] == 10 and rows[("x", "2")] == 20
    assert rows[("y", "1")] == 5
    assert rows[("x", None)] == 30 and rows[("y", None)] == 5
    assert rows[(None, None)] == 35
    assert len(rows) == 6


def test_grouped_count_null_string_key(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_count

    t = pa.table(
        {
            "k": pa.array(["a", None, "a", None, "b"], pa.string()),
            "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    out = grouped_count(ray.data.from_arrow(t), "k").to_pandas()
    got = {row.k: row.count for row in out.itertuples()}
    assert got["a"] == 2 and got["b"] == 1
    # the null key forms its own group and is not dropped
    nulls = out[out.k.isna()]
    assert len(nulls) == 1 and nulls["count"].iloc[0] == 2


def test_grouped_count_null_int_key(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_count

    t = pa.table(
        {
            "k": pa.array([1, None, 1, None], pa.int64()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = grouped_count(ray.data.from_arrow(t), "k").to_pandas()
    assert sorted(out["count"].tolist()) == [2, 2]


def test_grouped_median_separator_keys_stay_distinct(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_median_int

    # these two key pairs concatenate identically under any separator
    # scheme ('a\x1f' + '\x1f' + 'b' == 'a' + '\x1f' + '\x1fb')
    t = pa.table(
        {
            "k1": pa.array(["a\x1f", "a\x1f", "a", "a"], pa.string()),
            "k2": pa.array(["b", "b", "\x1fb", "\x1fb"], pa.string()),
            "v": pa.array([10, 20, 100, 200], pa.int64()),
        }
    )
    out = grouped_median_int(
        ray.data.from_arrow(t), ["k1", "k2"], "v"
    ).to_pandas()
    assert len(out) == 2
    assert sorted(out["median"].tolist()) == [15.0, 150.0]


def test_approx_count_distinct_ignores_null_values(ray_session):
    import ray

    from phrasekit_ray.stages.agg import approx_count_distinct

    t = pa.table(
        {
            "g": pa.array(["x"] * 4, pa.string()),
            "v": pa.array(["p", None, "q", None], pa.string()),
        }
    )
    out = approx_count_distinct(ray.data.from_arrow(t), "g", "v").to_pandas()
    # HLL at this cardinality is exact: 2 distinct non-null values
    assert out["approx_distinct"].iloc[0] == 2


def test_grouped_cube_levels(ray_session):
    """CUBE = every key subset: finest, (a), (b), grand total."""
    import ray

    from phrasekit_ray.stages.agg import grouped_cube

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"], pa.string()),
            "b": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([10, 20, 5], pa.int64()),
        }
    )
    out = grouped_cube(ray.data.from_arrow(t), ["a", "b"], "v").to_pandas()
    rows = {(r["a"], r["b"]): r["v"] for _, r in out.iterrows()}
    # finest
    assert rows[("x", "1")] == 10 and rows[("x", "2")] == 20 and rows[("y", "1")] == 5
    # rollup-style (a) levels
    assert rows[("x", None)] == 30 and rows[("y", None)] == 5
    # the (b)-only level rollup lacks
    assert rows[(None, "1")] == 15 and rows[(None, "2")] == 20
    # grand total
    assert rows[(None, None)] == 35
    assert len(rows) == 8


def test_grouped_cube_rejects_wide_keysets(ray_session):
    import pytest
    import ray

    from phrasekit_ray.stages.agg import grouped_cube

    t = pa.table({c: pa.array(["x"], pa.string()) for c in "abcdefg"} | {"v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        grouped_cube(ray.data.from_arrow(t), list("abcdefg"), "v")


def test_grouped_sets_arbitrary_subsets(ray_session):
    """GROUPING SETS over ((a,b), (b), ()): finest rows, the b-only level,
    and the grand total — and nothing else (no (a) level)."""
    import pytest
    import ray

    from phrasekit_ray.stages.agg import grouped_sets

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"], pa.string()),
            "b": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([10, 20, 5], pa.int64()),
        }
    )
    out = grouped_sets(
        ray.data.from_arrow(t), ["a", "b"], [["a", "b"], ["b"], []], "v"
    ).to_pandas()
    rows = {(r["a"], r["b"]): r["v"] for _, r in out.iterrows()}
    assert rows[("x", "1")] == 10 and rows[("x", "2")] == 20 and rows[("y", "1")] == 5
    assert rows[(None, "1")] == 15 and rows[(None, "2")] == 20
    assert rows[(None, None)] == 35
    assert ("x", None) not in rows  # the (a) level was not requested
    assert len(rows) == 6
    with pytest.raises(ValueError):
        grouped_sets(ray.data.from_arrow(t), ["a", "b"], [["c"]], "v")
    with pytest.raises(ValueError):
        grouped_sets(ray.data.from_arrow(t), ["a", "b"], [["b"], ["b"]], "v")


def test_grouped_corr_matches_numpy(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_corr

    rng = np.random.default_rng(3)
    n = 5000
    k = rng.integers(0, 3, n)
    x = np.round(rng.normal(50, 10, n), 2)
    y = np.round(x * 0.5 + rng.normal(0, 5, n), 2)
    t = pa.table(
        {
            "k": pa.array([f"g{i}" for i in k]),
            "x": pa.array(x),
            "y": pa.array(y),
        }
    )
    out = (
        grouped_corr(ray.data.from_arrow(t).repartition(7), "k", "x", "y")
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for g in ("g0", "g1", "g2"):
        m = k == int(g[1])
        want_corr = np.corrcoef(x[m], y[m])[0, 1]
        want_cov = np.cov(x[m], y[m], bias=True)[0, 1]
        assert out.loc[g, "n"] == int(m.sum())
        assert abs(out.loc[g, "corr_micro"] - round(want_corr * 1e6)) <= 1
        assert abs(out.loc[g, "covar_pop_micro"] - round(want_cov * 1e6)) <= 1


def test_set_ops_match_python_sets(ray_session):
    import ray

    from phrasekit_ray.stages.agg import except_distinct, intersect_distinct

    a_rows = [(1, 10), (1, 10), (2, 20), (3, 30)]
    b_rows = [(2, 20), (4, 40), (3, 31)]

    def ds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array([r[0] for r in rows], pa.int64()),
                    "d": pa.array([r[1] for r in rows], pa.int64()),
                }
            )
        ).repartition(2)

    inter = intersect_distinct(ds(a_rows), ds(b_rows), ["u", "d"]).to_pandas()
    assert set(map(tuple, inter.values)) == {(2, 20)}
    exc = except_distinct(ds(a_rows), ds(b_rows), ["u", "d"]).to_pandas()
    assert set(map(tuple, exc.values)) == {(1, 10), (3, 30)}


def test_pivot_sum_empty_cells_null_and_validation(ray_session):
    import ray

    from phrasekit_ray.stages.agg import pivot_sum

    t = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "cat": pa.array(["a", "b", "a"]),
            "v": pa.array([10, 20, 30], pa.int64()),
        }
    )
    out = (
        pivot_sum(ray.data.from_arrow(t).repartition(2), "k", "cat", "v", ["a", "b"])
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert out.loc[1, "a_sum"] == 10 and out.loc[1, "b_sum"] == 20
    assert out.loc[2, "a_sum"] == 30
    assert bool(out.loc[2:2, "b_sum"].isna().all())  # empty cell → SQL NULL
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        pivot_sum(ray.data.from_arrow(t), "k", "cat", "v", [])


def test_unpivot_null_handling_and_validation(ray_session):
    import ray

    from phrasekit_ray.stages.agg import unpivot

    t = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "a": pa.array([10, None], pa.int64()),
            "b": pa.array([None, 20], pa.int64()),
        }
    )
    # EXCLUDE NULLS (SQL default): null cells emit no row
    out = (
        unpivot(ray.data.from_arrow(t), ["k"], ["a", "b"])
        .to_pandas().sort_values(["k", "name"]).reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.loc[0].tolist() == [1, "a", 10]
    assert out.loc[1].tolist() == [2, "b", 20]
    # INCLUDE NULLS keeps every cell
    out2 = unpivot(
        ray.data.from_arrow(t), ["k"], ["a", "b"], drop_null=False
    ).to_pandas()
    assert len(out2) == 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        unpivot(ray.data.from_arrow(t), ["k"], [])
