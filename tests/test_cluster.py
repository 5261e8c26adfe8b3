"""Distributed k-means + SemDeDup semantic dedup (stages/cluster.py).

The SQL-oracle equivalence is covered by the parametrized harness in
test_queries_oracle.py (q_kmeans / q_semantic_dedup); these tests pin
the algorithmic properties a SQL twin can't express: exactness vs a
single-process numpy reference, keep-first semantics, the hot-cluster
cap's one-sided (miss-only) contract, and the int64-overflow guard.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from phrasekit_ray.stages.cluster import (
    _assign_to_centroids,
    kmeans_cluster_stats,
    kmeans_fit,
    quantize_codes,
    semantic_dedup,
)


def _emb_table(sf_dir):
    return pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _ref_kmeans(tbl: pa.Table, k=8, iters=3, scale=512.0):
    """Single-process Lloyd on the identical exact-int state machine."""
    ids = np.asarray(tbl["vec_id"], np.int64)
    codes = quantize_codes(tbl, "embedding", scale)
    order = np.argsort(ids, kind="stable")[:k]
    sums = codes[order].copy()
    counts = np.ones(len(order), np.int64)
    for _ in range(iters):
        lab = _assign_to_centroids(codes, sums, counts)
        new_sums, new_counts = sums.copy(), counts.copy()
        for j in range(len(counts)):
            m = lab == j
            if m.any():
                new_sums[j] = codes[m].sum(axis=0)
                new_counts[j] = int(m.sum())
        sums, counts = new_sums, new_counts
    return sums, counts, _assign_to_centroids(codes, sums, counts)


def test_kmeans_matches_numpy_reference(ray_session, sf_dir):
    import ray

    tbl = _emb_table(sf_dir)
    sums_r, counts_r, lab_r = _ref_kmeans(tbl)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sums, counts, _ = kmeans_fit(ds, k=8, iters=3)
    # the distributed int-sum state must be BIT-identical to the
    # single-process reference (order-independence of int64 sums)
    assert np.array_equal(sums, sums_r)
    assert np.array_equal(counts, counts_r)
    stats = kmeans_cluster_stats(ds, k=8, iters=3)
    n_by_cluster = dict(
        zip(stats["cluster"].to_pylist(), stats["n"].to_pylist())
    )
    ref_sizes = {
        int(j): int((lab_r == j).sum())
        for j in np.unique(lab_r)
    }
    assert n_by_cluster == ref_sizes
    # inertia is nonnegative and finite
    assert all(v >= 0 for v in stats["inertia_micro"].to_pylist())


def test_kmeans_runs_are_deterministic(ray_session, sf_dir):
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    a = kmeans_cluster_stats(ds, k=8, iters=3)
    b = kmeans_cluster_stats(ds, k=8, iters=3)
    assert a.equals(b)


def _dedup_table(ds, **kw):
    t = pa.concat_tables(
        list(
            semantic_dedup(ds, n_seeds=8, **kw).iter_batches(
                batch_format="pyarrow"
            )
        ),
        promote_options="default",
    )
    return t.sort_by("vec_id")


def test_semantic_dedup_keep_first_semantics(ray_session, sf_dir):
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = _dedup_table(ds)
    tbl = _emb_table(sf_dir)
    ids = np.asarray(tbl["vec_id"], np.int64)
    codes = quantize_codes(tbl, "embedding", 512.0)
    order = np.argsort(ids, kind="stable")
    ids, codes = ids[order], codes[order]
    o_ids = np.asarray(out["vec_id"], np.int64)
    assert np.array_equal(o_ids, ids)
    cluster = np.asarray(out["cluster"], np.int64)
    is_dup = np.asarray(out["is_dup"], np.int64)
    n2 = (codes * codes).sum(axis=1)
    # exact reference: i dup iff exists j<i in same cluster passing the
    # int64 test 400·dp² ≥ 361·n2ᵢ·n2ⱼ with dp>0
    for i in range(len(ids)):
        hit = False
        for j in range(i):
            if cluster[j] != cluster[i]:
                continue
            dp = int(codes[i] @ codes[j])
            if dp > 0 and 400 * dp * dp >= 361 * int(n2[i]) * int(n2[j]):
                hit = True
                break
        assert bool(is_dup[i]) == hit, f"vec {ids[i]}"


def test_semantic_dedup_cap_only_misses(ray_session, sf_dir):
    """cluster_cap may only MISS duplicates (cross-salt pairs), never
    invent one — capped dups ⊆ uncapped dups."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    full = _dedup_table(ds)
    capped = _dedup_table(ds, cluster_cap=3)
    dup_full = {
        v for v, d in zip(full["vec_id"].to_pylist(), full["is_dup"].to_pylist()) if d
    }
    dup_cap = {
        v
        for v, d in zip(capped["vec_id"].to_pylist(), capped["is_dup"].to_pylist())
        if d
    }
    assert dup_cap <= dup_full
    # clusters are unchanged by the cap
    assert capped["cluster"].to_pylist() == full["cluster"].to_pylist()


def test_semantic_dedup_overflow_guard(ray_session, sf_dir):
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="int64"):
        # scale² ·dim blows the exact-arithmetic bound
        pa_table = semantic_dedup(ds, scale=1 << 20)
        del pa_table
    with pytest.raises(ValueError, match="rational"):
        semantic_dedup(ds, threshold_num=21, threshold_den=20)


def _ref_pq(tbl: pa.Table, m_sub=8, k=16, iters=3, scale=512.0):
    """Single-process PQ: per-subspace Lloyd on the same exact-int state."""
    ids = np.asarray(tbl["vec_id"], np.int64)
    codes = quantize_codes(tbl, "embedding", scale)
    dim = codes.shape[1]
    sub = dim // m_sub
    order = np.argsort(ids, kind="stable")[:k]
    sums = codes[order].reshape(k, m_sub, sub).transpose(1, 0, 2).copy()
    counts = np.ones((m_sub, k), np.int64)
    codes_r = codes.reshape(-1, m_sub, sub)

    def assign(s, c):
        dots = np.einsum("nms,mks->nmk", codes_r, s)
        cf = c.astype(np.float64)
        ss = (s * s).sum(axis=2)
        f = (-2.0 * dots.astype(np.float64)) / cf + ss / (cf * cf)
        return np.argmin(f, axis=2)

    for _ in range(iters):
        lab = assign(sums, counts)
        new_s, new_c = sums.copy(), counts.copy()
        for m in range(m_sub):
            for j in range(k):
                msk = lab[:, m] == j
                if msk.any():
                    new_s[m, j] = codes_r[msk, m].sum(axis=0)
                    new_c[m, j] = int(msk.sum())
        sums, counts = new_s, new_c
    return sums, counts, assign(sums, counts)


def test_pq_train_matches_numpy_reference(ray_session, sf_dir):
    import ray

    from phrasekit_ray.stages.cluster import pq_train

    tbl = _emb_table(sf_dir)
    ref_s, ref_c, _ = _ref_pq(tbl)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got_s, got_c = pq_train(ds, m_subspaces=8, k_codes=16, iters=3)
    assert np.array_equal(got_s, ref_s)
    assert np.array_equal(got_c, ref_c)
    # parallelism-independence: same exact state at a different block count
    got_s2, got_c2 = pq_train(
        ds.repartition(7), m_subspaces=8, k_codes=16, iters=3
    )
    assert np.array_equal(got_s2, ref_s)
    assert np.array_equal(got_c2, ref_c)


def test_pq_encode_structure_and_labels(ray_session, sf_dir):
    import ray

    from phrasekit_ray.stages.cluster import pq_encode

    tbl = _emb_table(sf_dir)
    _, _, ref_lab = _ref_pq(tbl)
    ids = np.asarray(tbl["vec_id"], np.int64)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = pa.concat_tables(
        list(pq_encode(ds, 8, 16, 3).iter_batches(batch_format="pyarrow")),
        promote_options="default",
    )
    assert out.num_rows == len(ids) * 8
    got = {}
    for v, m, c, e in zip(
        out["vec_id"].to_pylist(),
        out["m"].to_pylist(),
        out["code"].to_pylist(),
        out["sub_err_micro"].to_pylist(),
    ):
        got[(v, m)] = (c, e)
        assert 0 <= c < 16
        assert e >= 0
    order = np.argsort(ids, kind="stable")
    for row, v in zip(order, ids[order]):
        for m in range(8):
            assert got[(int(v), m)][0] == int(ref_lab[row, m])


def test_pq_train_rejects_bad_dim(ray_session, sf_dir):
    import ray

    from phrasekit_ray.stages.cluster import pq_train

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="divisible"):
        pq_train(ds, m_subspaces=7)


def _ref_adc(tbl: pa.Table, nq=8, k=10, m_sub=8, kk=16, iters=3, scale=512.0):
    """Full (no top-k pruning) single-process ADC scan on the trained
    codebooks — the exact reference for pq_search's distributed
    partial-top-k + heap merge."""
    from phrasekit_ray.stages.cluster import _round_away

    ids = np.asarray(tbl["vec_id"], np.int64)
    codes_r = quantize_codes(tbl, "embedding", scale).reshape(
        len(ids), m_sub, -1
    )
    sums, counts, lab = _ref_pq(tbl, m_sub=m_sub, k=kk, iters=iters)
    qrows = np.argsort(ids, kind="stable")[:nq]
    cf = counts.astype(np.float64)
    ss = (sums * sums).sum(axis=2)
    out = {}
    for qi in qrows:
        q = codes_r[qi]
        qdot = np.einsum("ms,mks->mk", q, sums)
        qxx = (q * q).sum(axis=1)
        err = (
            qxx[:, None].astype(np.float64)
            - 2.0 * qdot.astype(np.float64) / cf
            + ss.astype(np.float64) / (cf * cf)
        ) / (scale * scale)
        lut = _round_away(err * 1e6).astype(np.int64)
        adc = lut[np.arange(m_sub)[None, :], lab].sum(axis=1)
        top = sorted(zip(adc.tolist(), ids.tolist()))[:k]
        out[int(ids[qi])] = top
    return out


def test_pq_search_matches_full_adc_scan(ray_session, sf_dir):
    import ray

    from phrasekit_ray.stages.cluster import pq_search

    tbl = _emb_table(sf_dir)
    ref = _ref_adc(tbl)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = pq_search(ds, n_queries=8, k=10).to_pandas()
    assert len(got) == 8 * 10
    for qid, top in ref.items():
        g = got[got.query_id == qid].sort_values("rank")
        assert list(zip(g.adc_micro, g.vec_id)) == top
    # parallelism-independence: identical table at a different block count
    got2 = pq_search(ds.repartition(7), n_queries=8, k=10).to_pandas()
    assert got.equals(got2)


def test_pq_search_recall_floor(ray_session, sf_dir):
    """ADC with M=8 x K=16 codebooks is coarse but must beat chance by
    a wide margin: mean recall@10 vs exact L2 >= 0.2 (measured 0.39 at
    sf0.001; chance is 10/N ~ 0.02)."""
    import ray

    from phrasekit_ray.stages.cluster import pq_search

    tbl = _emb_table(sf_dir)
    ids = np.asarray(tbl["vec_id"], np.int64)
    order = np.argsort(ids, kind="stable")
    V = np.stack(
        [np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()]
    )[order]
    ids = ids[order]
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = pq_search(ds, n_queries=8, k=10).to_pandas()
    recalls = []
    for qi in range(8):
        d2 = ((V - V[qi]) ** 2).sum(axis=1)
        exact = set(ids[np.argsort(d2, kind="stable")[:10]].tolist())
        approx = set(got[got.query_id == ids[qi]].vec_id.tolist())
        recalls.append(len(exact & approx) / 10)
    assert float(np.mean(recalls)) >= 0.2
