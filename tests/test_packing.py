"""pack_sequences: FFD bin packing invariants + driver-reference
differential + input-partitioning invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


def _run(ray, doc_ids, tokens, capacity, parts=1, num_partitions=4):
    from phrasekit_ray.stages.packing import pack_sequences

    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(tokens, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return _collect(pack_sequences(ds, capacity, num_partitions=num_partitions))


def test_pack_invariants_and_partitioning_invariance(ray_session):
    import ray

    rng = np.random.default_rng(11)
    n = 400
    ids = list(range(n))
    toks = rng.integers(1, 900, n).tolist()
    cap = 2048
    out1 = _run(ray, ids, toks, cap, parts=1)
    out7 = _run(ray, ids, toks, cap, parts=7)

    df = out1.to_pandas()
    # every doc assigned exactly once
    assert sorted(df["doc_id"]) == ids
    # bin capacity respected
    tok_by_id = dict(zip(ids, toks))
    df["tok"] = df["doc_id"].map(tok_by_id)
    fills = df.groupby("bin_id")["tok"].sum()
    assert (fills <= cap).all()
    assert not df["oversize"].any()
    # deterministic across INPUT partitionings (partition = hash(doc_id))
    a = df.sort_values("doc_id").reset_index(drop=True)
    b = out7.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "bin_id", "oversize"]].equals(
        b[["doc_id", "bin_id", "oversize"]]
    )


def test_pack_oversized_docs_get_dedicated_bins(ray_session):
    import ray

    out = _run(
        ray, [1, 2, 3, 4], [5000, 10, 20, 7000], capacity=100, num_partitions=1
    ).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "oversize"]) and bool(out.loc[4, "oversize"])
    # each oversized doc is alone in its bin
    counts = out.groupby("bin_id").size()
    assert counts[out.loc[1, "bin_id"]] == 1
    assert counts[out.loc[4, "bin_id"]] == 1
    # the two small docs share one bin (10+20 <= 100)
    assert out.loc[2, "bin_id"] == out.loc[3, "bin_id"]


def test_pack_matches_ffd_reference(ray_session):
    import ray

    rng = np.random.default_rng(3)
    ids = list(range(60))
    toks = rng.integers(1, 80, 60).tolist()
    cap = 128
    out = _run(ray, ids, toks, cap, num_partitions=1).to_pandas()

    # driver FFD on the same (tokens desc, id asc) order
    order = sorted(ids, key=lambda i: (-toks[i], i))
    bins, assign = [], {}
    for i in order:
        t = toks[i]
        for b, fill in enumerate(bins):
            if fill + t <= cap:
                bins[b] += t
                assign[i] = b
                break
        else:
            assign[i] = len(bins)
            bins.append(t)
    got = dict(zip(out["doc_id"], out["bin_id"]))
    assert got == assign  # partition 0 → bin_id == local bin


def test_pack_validation(ray_session):
    import ray

    from phrasekit_ray.stages.packing import pack_sequences

    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(
            ray.data.from_arrow(
                pa.table({"doc_id": pa.array([1], pa.int64()),
                          "n_tokens": pa.array([1], pa.int64())})
            ),
            0,
        )


def test_pack_zero_token_docs_never_join_oversize_bins(ray_session):
    """Review fix: a 0-token doc must not slip into an oversized doc's
    dedicated (full) bin; negative token counts are rejected."""
    import ray

    out = _run(
        ray, [1, 2], [5000, 0], capacity=100, num_partitions=1
    ).to_pandas().set_index("doc_id")
    assert out.loc[1, "bin_id"] != out.loc[2, "bin_id"]
    assert bool(out.loc[1, "oversize"]) and not bool(out.loc[2, "oversize"])

    from phrasekit_ray.stages.packing import pack_sequences

    neg = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "n_tokens": pa.array([-3], pa.int64())})
    )
    with pytest.raises(Exception, match="negative"):
        _collect(pack_sequences(neg, 100))


def test_ffd_tree_matches_scan_exactly():
    """The segment-tree probe must produce IDENTICAL placements to the
    linear-scan probe on any input (both are exact first-fit): random
    weight regimes, heavy ties, all-equal, capacity-sized docs, and the
    dispatch threshold boundary."""
    from phrasekit_ray.stages.packing import (
        _ffd_pack,
        _ffd_pack_scan,
        _ffd_pack_tree,
    )

    rng = np.random.default_rng(7)
    cases = [
        np.sort(rng.integers(1, 80, 5000))[::-1],          # generic
        np.sort(rng.integers(1, 129, 3000))[::-1],         # includes t == cap
        np.full(4000, 17, np.int64),                        # all ties
        np.sort(rng.zipf(1.5, 6000).clip(1, 128))[::-1],    # skewed
        np.array([128, 1], np.int64),                       # tiny
        np.array([], np.int64),                             # empty
    ]
    for toks in cases:
        toks = np.ascontiguousarray(toks, np.int64)
        a, na = _ffd_pack_scan(toks, 128)
        b, nb = _ffd_pack_tree(toks, 128)
        assert na == nb
        assert np.array_equal(a, b)

    # production entry point == tree == scan
    toks = np.sort(rng.integers(1, 60, 2048))[::-1].astype(np.int64)
    a, _ = _ffd_pack(toks, 64)
    b, _ = _ffd_pack_scan(toks, 64)
    assert np.array_equal(a, b)

    # tree-growth path: force many bins (every doc nearly fills a bin)
    toks = np.full(9000, 100, np.int64)
    a, na = _ffd_pack_tree(toks, 128)
    b, nb = _ffd_pack_scan(toks, 128)
    assert na == nb == 9000 and np.array_equal(a, b)


def test_ffd_cohort_matches_scan_exactly():
    """The cohort-vectorized production kernel (r5, VERDICT item 6) must
    produce IDENTICAL placements to the linear-scan reference on any
    input: random regimes, heavy ties, all-equal, capacity-sized docs,
    quota-cut boundaries (cohort exactly exhausting / overflowing the
    eligible bins), and bin-array growth."""
    from phrasekit_ray.stages.packing import (
        _ffd_pack,
        _ffd_pack_cohort,
        _ffd_pack_scan,
    )

    rng = np.random.default_rng(11)
    cases = [
        np.sort(rng.integers(1, 80, 5000))[::-1],
        np.sort(rng.integers(1, 129, 3000))[::-1],   # includes t == cap
        np.full(4000, 17, np.int64),                  # one giant cohort
        np.sort(rng.zipf(1.5, 6000).clip(1, 128))[::-1],
        np.array([128, 1], np.int64),
        np.array([1], np.int64),
        np.array([], np.int64),
        np.repeat([64, 32, 16, 8, 4, 2, 1], 300),     # power-of-two quotas
    ]
    for toks in cases:
        toks = np.ascontiguousarray(
            np.sort(np.asarray(toks, np.int64))[::-1]
        )
        a, na = _ffd_pack_scan(toks, 128)
        b, nb = _ffd_pack_cohort(toks, 128)
        assert na == nb
        assert np.array_equal(a, b)

    # randomized fuzz over shapes and capacities
    for _ in range(60):
        n = int(rng.integers(1, 1500))
        cap = int(rng.integers(2, 512))
        toks = np.sort(rng.integers(1, cap + 1, n))[::-1].astype(np.int64)
        a, na = _ffd_pack_scan(toks, cap)
        b, nb = _ffd_pack_cohort(toks, cap)
        assert na == nb and np.array_equal(a, b), (n, cap)

    # production entry point dispatches to the cohort kernel
    toks = np.sort(rng.integers(1, 60, 2048))[::-1].astype(np.int64)
    a, _ = _ffd_pack(toks, 64)
    b, _ = _ffd_pack_cohort(toks, 64)
    assert np.array_equal(a, b)

    # growth path: many new bins in one cohort (R array doubles)
    toks = np.full(9000, 100, np.int64)
    a, na = _ffd_pack_cohort(toks, 128)
    b, nb = _ffd_pack_scan(toks, 128)
    assert na == nb == 9000 and np.array_equal(a, b)
