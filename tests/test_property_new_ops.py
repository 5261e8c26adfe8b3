"""Property tests (hypothesis) for the round-2 operator kernels:
randomized inputs compared against straight-line Python references."""

import collections

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from phrasekit_ray.stages import textstats

TOKENS = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=30
)


def _naive_repetition(tokens: list[str]):
    n = len(tokens)
    bigrams = collections.Counter(
        tuple(tokens[i : i + 2]) for i in range(n - 1)
    )
    top_bi = max(bigrams.values()) if bigrams else 0
    tris = collections.Counter(tuple(tokens[i : i + 3]) for i in range(n - 2))
    covered = set()
    for i in range(n - 2):
        if tris[tuple(tokens[i : i + 3])] >= 2:
            covered.update((i, i + 1, i + 2))
    return n, top_bi, len(covered)


@settings(max_examples=30, deadline=None)
@given(st.lists(TOKENS, min_size=1, max_size=8))
def test_repetition_stats_equals_naive(ray_session, docs):
    import ray

    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(d) for d in docs]),
        }
    )
    got = (
        textstats.repetition_stats(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for i, d in enumerate(docs):
        # the engine tokenizer: whitespace split; empty text → no tokens
        text = " ".join(d)
        toks = text.split() if text else []
        n, top_bi, cov = _naive_repetition(toks)
        assert got.loc[i, "n_tokens"] == n
        assert got.loc[i, "top_bigram_count"] == top_bi
        assert got.loc[i, "dup_trigram_tokens"] == cov


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.sampled_from(["t1", "t2", "t3", "hot", "x", "y"]),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=2, max_value=8),
)
def test_exact_heavy_hitters_equals_counter(ray_session, vals, k):
    import ray

    from phrasekit_ray.stages.agg import exact_heavy_hitters

    t = pa.table({"tok": pa.array(vals)})
    got = exact_heavy_hitters(ray.data.from_arrow(t), "tok", k=k)
    counts = collections.Counter(vals)
    n = len(vals)
    want = sorted(
        ((c, v) for v, c in counts.items() if c * k > n),
        key=lambda x: (-x[0], x[1]),
    )
    assert got["key"].to_pylist() == [v for _, v in want]
    assert got["count"].to_pylist() == [c for c, _ in want]


def test_grouped_cube_equals_naive(ray_session):
    """grouped_cube over seeded random (a, b, v) rows equals the
    brute-force per-subset groupby-sum (all four grouping sets of a
    2-key cube). Seeded loop, not hypothesis: each example executes a
    full 4-aggregate Ray pipeline, too heavy for example fuzzing."""
    import ray

    from phrasekit_ray.stages.agg import grouped_cube

    rng = np.random.RandomState(7)
    for _ in range(3):
        n = int(rng.randint(1, 40))
        rows = [
            ("xyz"[rng.randint(3)], int(rng.randint(0, 4)), int(rng.randint(-100, 101)))
            for _ in range(n)
        ]
        t = pa.table(
            {
                "a": pa.array([r[0] for r in rows], pa.string()),
                "b": pa.array([r[1] for r in rows], pa.int64()),
                "v": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        out = grouped_cube(ray.data.from_arrow(t), ["a", "b"], "v").to_pandas()
        got = {(r["a"], r["b"]): r["v"] for _, r in out.iterrows()}

        want: dict = {}
        for a, b, v in rows:
            for key in [(a, str(b)), (a, None), (None, str(b)), (None, None)]:
                want[key] = want.get(key, 0) + v
        assert got == want


_EV_VALUES = st.one_of(st.none(), st.integers(min_value=-500, max_value=500))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # user
            st.integers(min_value=0, max_value=5),   # ts
            _EV_VALUES,                              # cents (pre-scaled)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_running_total_equals_pandas_cumsum(ray_session, rows):
    import pandas as pd
    import ray

    from phrasekit_ray.stages.windows import running_total

    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "value": pa.array(
                [None if r[2] is None else r[2] / 100.0 for r in rows],
                pa.float64(),
            ),
        }
    )
    got = (
        running_total(ray.data.from_arrow(t).repartition(3))
        .to_pandas().set_index("event_id").sort_index()
    )
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "cents": pd.array([r[2] for r in rows], dtype="Float64"),
        }
    ).sort_values(["user", "ts", "event_id"])
    # SQL SUM OVER: a NULL row carries the prior non-null sum; the prefix
    # is NULL only before the partition's first non-null value
    run = df.groupby("user")["cents"].transform(
        lambda s: s.fillna(0).cumsum()
    )
    seen = df.groupby("user")["cents"].transform(
        lambda s: s.notna().cumsum() > 0
    )
    for eid, want, ok in zip(df["event_id"], run, seen):
        if not ok:
            assert got.loc[eid, "running_cents"] is None or bool(
                pd.isna(got.loc[eid, "running_cents"])
            )
        else:
            assert got.loc[eid, "running_cents"] == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),               # key
            st.sampled_from(["a", "b", "c"]),                    # category
            st.integers(min_value=-100, max_value=100),          # value
        ),
        min_size=1,
        max_size=40,
    )
)
def test_pivot_sum_columns_reconcile_with_total(ray_session, rows):
    import pandas as pd
    import ray

    from phrasekit_ray.stages.agg import pivot_sum

    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "cat": pa.array([r[1] for r in rows]),
            "v": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    got = (
        pivot_sum(
            ray.data.from_arrow(t).repartition(3), "k", "cat", "v",
            ["a", "b", "c"],
        )
        .to_pandas().set_index("k").sort_index()
    )
    df = pd.DataFrame(rows, columns=["k", "cat", "v"])
    # per-cell parity and whole-row reconciliation against pandas
    cells = df.pivot_table(
        index="k", columns="cat", values="v", aggfunc="sum"
    )
    for k in df["k"].unique():
        for c in ["a", "b", "c"]:
            want = cells[c][k] if c in cells.columns and not pd.isna(
                cells.get(c, pd.Series(dtype=float)).get(k, float("nan"))
            ) else None
            cell = got.loc[k, f"{c}_sum"]
            if want is None:
                assert pd.isna(cell)
            else:
                assert cell == want
        row_total = got.loc[k, ["a_sum", "b_sum", "c_sum"]].dropna().sum()
        assert row_total == df[df["k"] == k]["v"].sum()


def _naive_excise(docs: list[list[str]], k: int):
    """Brute-force duplicate-span excision reference."""
    occ = collections.Counter()
    for toks in docs:
        for i in range(len(toks) - k + 1):
            occ[tuple(toks[i : i + k])] += 1
    out = []
    for toks in docs:
        covered = [False] * len(toks)
        for i in range(len(toks) - k + 1):
            if occ[tuple(toks[i : i + k])] >= 2:
                for j in range(i, i + k):
                    covered[j] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        out.append((" ".join(kept), sum(covered)))
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=16),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_excise_duplicate_spans_equals_naive(ray_session, docs, k):
    import ray

    from phrasekit_ray.stages.dedup import excise_duplicate_spans

    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(d) for d in docs]),
        }
    )
    got = excise_duplicate_spans(
        ray.data.from_arrow(t).repartition(3), k=k
    )
    import ray as _r

    # skip the zero-column empty blocks repartition can emit
    gt = pa.concat_tables(
        [
            t
            for t in _r.get(got.materialize().to_arrow_refs())
            if t.num_columns
        ],
        promote_options="default",
    ).sort_by("doc_id")
    # NOTE: "" splits to [""], one empty token — the naive reference
    # must see the same tokenization (split-on-space, not str.split())
    ref = _naive_excise([(" ".join(d)).split(" ") for d in docs], k)
    assert gt["clean_text"].to_pylist() == [r[0] for r in ref]
    assert gt["n_removed"].to_pylist() == [r[1] for r in ref]


def _naive_mix(ids, sources, rates, default=1.0, seed=17):
    out = []
    for i, s in zip(ids, sources):
        r = rates.get(s, default)
        h = (np.uint64(i) + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)
        u = (np.float64(h) + 0.5) / 2.0**64
        n = int(np.floor(r)) + (1 if u < r - np.floor(r) else 0)
        out.extend((i, c) for c in range(n))
    return sorted(out)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.fixed_dictionaries(
        {
            "a": st.sampled_from([0.0, 0.5, 1.0, 2.5]),
            "b": st.sampled_from([0.25, 1.0, 3.0]),
        }
    ),
)
def test_mix_corpora_equals_naive(ray_session, rows, rates):
    import ray
    import warnings

    from phrasekit_ray.stages.mix import mix_corpora

    with np.errstate(over="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = _naive_mix(
            [r[0] for r in rows], [r[1] for r in rows], rates
        )
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows]),
        }
    )
    got = mix_corpora(ray.data.from_arrow(t).repartition(3), "source", rates, "doc_id")
    import ray as _r

    tabs = [
        x
        for x in _r.get(got.materialize().to_arrow_refs())
        if x.num_columns and x.num_rows
    ]
    if not tabs:
        assert want == []
        return
    gt = pa.concat_tables(tabs, promote_options="default")
    assert sorted(zip(gt["doc_id"].to_pylist(), gt["copy"].to_pylist())) == want
