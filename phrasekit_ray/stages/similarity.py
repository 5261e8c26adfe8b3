"""Similarity search over an embedding column (list<float>).

Training-data extension: brute-force cosine top-k as the exact baseline
(per-batch numpy matmul against a broadcast query matrix — the corpus
streams, queries are the small side), plus an LSH-bucketed approximate
variant as the scale path (shares the random-hyperplane bucketing with
dedup.embedding_near_dup_pairs).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _matrix(emb_col: pa.ListArray) -> np.ndarray:
    offsets = emb_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base = offsets[0]
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return (
        emb_col.values.slice(base, int(offsets[-1] - base))
        .to_numpy(zero_copy_only=False)
        .reshape(len(emb_col), dim)
        .astype(np.float32)
    )


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _empty_topk_table(id_col: str) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float32()),
            "rank": pa.array([], pa.int32()),
        }
    )


def _merge_topk(parts, qids, k, exclude_self, id_col) -> pa.Table:
    """Driver-side merge of per-batch candidate rows (qi, id, cosine)
    into ranked top-k per query — shared by the brute-force and IVF
    paths so the heap/tie-break/rank logic cannot diverge."""
    heaps: dict[int, list] = {i: [] for i in range(len(qids))}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for qi, vid, cs in zip(
            b["qi"].to_pylist(), b[id_col].to_pylist(), b["cosine"].to_pylist()
        ):
            if exclude_self and vid == qids[qi]:
                continue
            h = heaps[qi]
            item = (cs, -vid)  # tie-break: smaller vec_id wins
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    out_q, out_v, out_s, out_r = [], [], [], []
    for qi, h in heaps.items():
        ranked = sorted(h, key=lambda x: (-x[0], -x[1]))
        for rank, (cs, negv) in enumerate(ranked, 1):
            out_q.append(qids[qi])
            out_v.append(-negv)
            out_s.append(cs)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_v, pa.int64()),
            "cosine": pa.array(np.asarray(out_s, dtype=np.float32), pa.float32()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )


def brute_force_topk(
    ds,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact cosine top-k: Dataset(vec_id, embedding) × query matrix →
    pyarrow Table(query_id, vec_id, cosine, rank).

    The corpus streams through map_batches emitting per-batch top-k
    (k·|queries| rows per batch); the driver merges the per-batch heaps —
    driver traffic is O(batches · q · k), never the corpus.
    """
    import ray

    qmat = _normalize_rows(np.asarray(queries, dtype=np.float32))
    qids = list(query_ids)
    if not qids:
        # zero queries: skip the corpus scan entirely (the per-batch
        # np.concatenate over zero query rows would crash)
        return _empty_topk_table(id_col)
    q_ref = ray.put(qmat)

    def partial(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        q = _get_broadcast(q_ref)
        mat = _normalize_rows(_matrix(batch[vec_col].combine_chunks()))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sims = q @ mat.T  # (nq, nb)
        nq, nb = sims.shape
        kk = min(k + (1 if exclude_self else 0), nb)
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(nq):
            rows_q.append(np.full(kk, qi, dtype=np.int64))
            rows_v.append(ids[idx[qi]])
            rows_s.append(sims[qi, idx[qi]])
        return pa.table(
            {
                "qi": pa.array(np.concatenate(rows_q), pa.int64()),
                id_col: pa.array(np.concatenate(rows_v), pa.int64()),
                "cosine": pa.array(
                    np.concatenate(rows_s).astype(np.float32), pa.float32()
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return _merge_topk(parts, qids, k, exclude_self, id_col)


def exact_near_dup_pairs(
    ds,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact all-pairs cosine near-dup: every (i<j) pair with cosine ≥
    threshold. The FULL (normalized) matrix is broadcast and each batch
    compares its rows against it — O(N·dim) broadcast state, so this is
    the oracle/verification variant for bounded tables; at corpus scale
    use dedup.embedding_near_dup_pairs (LSH-bucketed)."""
    import ray

    rows = []
    ids_all = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        rows.append(_matrix(b[vec_col].combine_chunks()).astype(np.float64))
        ids_all.append(np.asarray(b[id_col].to_pylist(), dtype=np.int64))
    full = _normalize_rows(np.vstack(rows)) if rows else np.zeros((0, 0), np.float64)
    fids = np.concatenate(ids_all) if ids_all else np.zeros(0, np.int64)
    ref = ray.put((full, fids))
    thr = np.float64(threshold)

    def fn(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        fmat, fid = _get_broadcast(ref)
        mat = _normalize_rows(
            _matrix(batch[vec_col].combine_chunks()).astype(np.float64)
        )
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sims = mat @ fmat.T
        bi, fj = np.nonzero(sims >= thr)
        li, rj = ids[bi], fid[fj]
        keep = li < rj  # dedupe + drop self
        return pa.table(
            {
                "left": pa.array(li[keep], pa.int64()),
                "right": pa.array(rj[keep], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def lsh_topk(
    ds,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    probes: int = 1,
    num_tables: int = 1,
    seed: int = 11,
):
    """Approximate top-k: candidates limited to vectors whose
    random-hyperplane sign-bucket is among each query's ``probes``
    multi-probe buckets — the home bucket plus flip-masks in increasing
    Hamming distance (all distance-1 flips by bit index, then distance-2
    pairs, ...), the standard multi-probe LSH schedule — in ANY of
    ``num_tables`` independent hash tables (the classic L-tables OR:
    per-table miss probabilities multiply, so recall approaches 1
    exponentially in L while candidate cost grows only linearly).
    ``probes`` = buckets probed per query PER TABLE (1 = home bucket
    only). Same output schema as brute_force_topk; recall < 1 by
    construction (scale path) — raise ``probes`` / ``num_tables`` (or
    lower ``num_planes``) to trade compute for recall."""
    import ray

    if not list(query_ids):
        # zero queries ⇒ empty allow-set; the prefilter's searchsorted
        # against an empty array would index allow[-1]
        return _empty_topk_table(id_col)

    qmat = _normalize_rows(np.asarray(queries, dtype=np.float32))
    dim = qmat.shape[1]
    rng = np.random.default_rng(seed)
    num_tables = max(1, num_tables)
    planes = rng.standard_normal((num_tables, dim, num_planes)).astype(np.float32)

    def bucket_of(mat: np.ndarray, t: int) -> np.ndarray:
        signs = (mat @ planes[t]) > 0
        return (signs.astype(np.uint64) << np.arange(num_planes, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )

    # flip masks ordered by (hamming weight, value): mask 0 = home bucket
    all_masks = np.arange(1 << num_planes, dtype=np.uint64)
    popcnt = np.array([bin(m).count("1") for m in range(1 << num_planes)])
    masks = all_masks[np.lexsort((all_masks, popcnt))][: max(1, probes)]

    allowed_per_table = []
    for t in range(num_tables):
        qbuckets = bucket_of(qmat, t)
        allowed: set[int] = set()
        for qb in qbuckets:
            for m in masks:
                allowed.add(int(qb ^ m))
        allowed_per_table.append(np.asarray(sorted(allowed), dtype=np.uint64))
    a_ref = ray.put(allowed_per_table)

    def prefilter(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        allows = _get_broadcast(a_ref)
        mat = _normalize_rows(_matrix(batch[vec_col].combine_chunks()))
        keep = np.zeros(len(mat), dtype=bool)
        for t, allow in enumerate(allows):
            rest = ~keep
            if not rest.any():
                break
            bk = bucket_of(mat[rest], t)
            pos = np.minimum(np.searchsorted(allow, bk), len(allow) - 1)
            keep[np.flatnonzero(rest)[allow[pos] == bk]] = True
        return batch.filter(pa.array(keep))

    cand = ds.map_batches(prefilter, batch_format="pyarrow")
    return brute_force_topk(cand, qmat, query_ids, k, id_col, vec_col)


def ivf_topk(
    ds,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 5,
    sample_size: int = 4096,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """IVF (inverted-file) approximate top-k — the scale path for ANN:

      1. train: k-means centroids on a bounded sample (deterministic seed,
         cosine space — vectors L2-normalized, centroids renormalized);
      2. assign: one map_batches pass tags every vector with its nearest
         centroid (cell id);
      3. probe: each query searches only its ``nprobe`` closest cells —
         per-batch the scan masks rows to probed cells, so compute drops
         by ~num_centroids/nprobe vs brute force while recall stays high.

    Returns pyarrow Table(query_id, vec_id, cosine, rank) like
    ``brute_force_topk`` (which is the recall oracle for this operator).
    """
    import ray

    qmat = _normalize_rows(np.asarray(queries, dtype=np.float32))
    qids = list(query_ids)

    # 1. train on a sample (bounded driver memory)
    sample = []
    seen = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        sample.append(_normalize_rows(_matrix(b[vec_col].combine_chunks())))
        seen += len(b)
        if seen >= sample_size:
            break
    if not sample or seen == 0 or not qids:
        # empty corpus or zero queries: empty result, stable schema
        return _empty_topk_table(id_col)
    X = np.concatenate(sample)[:sample_size]
    rng = np.random.default_rng(seed)
    ncent = min(num_centroids, len(X))
    cents = X[rng.choice(len(X), size=ncent, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(X @ cents.T, axis=1)
        for c in range(ncent):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    cents_ref = ray.put(cents)

    # which cells each query probes
    probe_cells = np.argsort(-(qmat @ cents.T), axis=1)[:, : min(nprobe, ncent)]
    probed_ref = ray.put(probe_cells)
    q_ref = ray.put(qmat)

    def partial(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        cmat = _get_broadcast(cents_ref)
        q = _get_broadcast(q_ref)
        probes = _get_broadcast(probed_ref)
        mat = _normalize_rows(_matrix(batch[vec_col].combine_chunks()))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        cells = np.argmax(mat @ cmat.T, axis=1)  # 2. assign
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(len(q)):  # 3. probe
            mask = np.isin(cells, probes[qi])
            if not mask.any():
                continue
            sub = mat[mask]
            sub_ids = ids[mask]
            sims = sub @ q[qi]
            kk = min(k + 1, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.append(np.full(kk, qi, dtype=np.int64))
            rows_v.append(sub_ids[idx])
            rows_s.append(sims[idx])
        if not rows_q:
            return pa.table(
                {
                    "qi": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float32()),
                }
            )
        return pa.table(
            {
                "qi": pa.array(np.concatenate(rows_q), pa.int64()),
                id_col: pa.array(np.concatenate(rows_v), pa.int64()),
                "cosine": pa.array(
                    np.concatenate(rows_s).astype(np.float32), pa.float32()
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return _merge_topk(parts, qids, k, exclude_self, id_col)


def grouped_vector_mean(
    ds,
    group_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    num_partitions: int | None = None,
):
    """Centroid (mean vector) per group over a list<float> column —
    Dataset(group, n, centroid: list<double>).

    Scale shape: each block reduces its rows to per-group vector SUMS in
    one np.add.reduceat pass (sort by group, segment-reduce the whole
    (rows × dim) matrix), the sums ride the shuffle as ``dim`` float64
    columns + a count merged by hash_aggregate sum — O(groups × dim)
    bytes shuffled regardless of corpus size; the division happens once
    per group at finalize."""
    from phrasekit_ray.stages.agg import hash_aggregate

    sum_cols = [f"_s{i}" for i in range(dim)]

    def partial(batch: pa.Table) -> pa.Table:
        mat = _matrix(batch[vec_col].combine_chunks()).astype(np.float64)
        if mat.shape[1] != dim:
            raise ValueError(f"expected dim {dim}, got {mat.shape[1]}")
        labels = batch[group_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(labels, kind="stable")
        lab_s = labels[order]
        seg = np.flatnonzero(np.concatenate(([True], lab_s[1:] != lab_s[:-1])))
        sums = np.add.reduceat(mat[order], seg, axis=0)
        counts = np.diff(np.concatenate((seg, [len(lab_s)])))
        cols = {
            group_col: pa.array(lab_s[seg], pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
        for i in range(dim):
            cols[sum_cols[i]] = pa.array(sums[:, i], pa.float64())
        return pa.table(cols)

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col,
        [("n", "sum")] + [(c, "sum") for c in sum_cols],
        num_partitions,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sums = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in sum_cols], axis=1
        )
        cent = sums / n[:, None]
        return pa.table(
            {
                group_col: batch[group_col],
                "n": batch["n"],
                "centroid": pa.array(list(cent), pa.list_(pa.float64())),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def scalar_quantize_embeddings(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
    num_partitions: int | None = None,
):
    """INT8-style scalar quantization of an embedding column — the
    classic memory-reduction step before ANN at scale (4× smaller
    vectors, distance in uint8 space).

    Two passes, both distributed:
    1. per-dimension global min/max: each block reduces its matrix to
       one (dim, mn, mx) row per dimension, a two-phase hash_aggregate
       merges them (dim-sized shuffle);
    2. the dim-sized min/max table broadcasts (ray.put) and each block
       encodes ``code = floor((v - mn)/(mx - mn)·(levels-1) + 0.5)`` in
       float64 (explicit half-up floor — bit-reproducible in SQL, unlike
       round()'s half-even/half-away divergence), constant dims → 0.

    Returns Dataset(vec_id, codes: list<uint8>). Exact integer output —
    the DuckDB oracle replays the same arithmetic.
    """
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate

    def dim_minmax(batch: pa.Table) -> pa.Table:
        mat = _matrix(batch[vec_col].combine_chunks()).astype(np.float64)
        if mat.size == 0:
            return pa.table(
                {"dim": pa.array([], pa.int32()),
                 "mn": pa.array([], pa.float64()),
                 "mx": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "dim": pa.array(np.arange(mat.shape[1], dtype=np.int32)),
                "mn": pa.array(mat.min(axis=0), pa.float64()),
                "mx": pa.array(mat.max(axis=0), pa.float64()),
            }
        )

    mm = hash_aggregate(
        ds.map_batches(dim_minmax, batch_format="pyarrow"),
        ["dim"],
        [("mn", "min"), ("mx", "max")],
        num_partitions=num_partitions,
    )
    rows = sorted(
        (r["dim"], r["mn"], r["mx"]) for b in mm.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    mn = np.asarray([r[1] for r in rows], np.float64)
    mx = np.asarray([r[2] for r in rows], np.float64)
    ref = ray.put((mn, mx))
    lv = float(levels - 1)

    def encode(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        lo, hi = _get_broadcast(ref)
        mat = _matrix(batch[vec_col].combine_chunks()).astype(np.float64)
        span = hi - lo
        safe = np.where(span > 0, span, 1.0)
        codes = np.floor((mat - lo) / safe * lv + 0.5)
        codes = np.where(span > 0, codes, 0.0).astype(np.uint8)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "codes": pa.array(list(codes), pa.list_(pa.uint8())),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def random_projection_sketch(
    ds,
    r: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 32768.0,
    seed: int = 17,
):
    """Signed random projection (X110 — Johnson–Lindenstrauss sketch
    with a ±1 Rademacher matrix, Achlioptas 2003): embeddings →
    ``r`` int64 projections, exploded to (id, j, proj) rows.

    EXACT integer arithmetic end to end so the DuckDB oracle
    hash-matches: components quantize to ``round-away(v·scale)`` int64
    codes, the sign matrix is ±1 from the shared splitmix hash of
    ``j·1024 + dim`` (pure function of (j, dim, seed) — identical on
    every worker with zero broadcast), and the projection is one int64
    matmul per batch. The standard cheap dim-reduction front-end for
    ANN / clustering at corpus scale; sign(proj) is a SimHash over the
    embedding space."""
    import pyarrow.compute as pc  # noqa: F401

    from phrasekit_ray.sources.pages import splitmix17

    if r < 1 or r > 1024:
        raise ValueError("random_projection_sketch: r must be in [1, 1024]")

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "proj": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        emb = batch[vec_col].combine_chunks()
        offsets = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.diff(offsets - offsets[0])
        if len(sizes) == 0:
            return empty
        d = int(sizes[0])
        if not (sizes == d).all():
            raise ValueError("random_projection_sketch: ragged embedding dim")
        if d > 1024:
            raise ValueError("random_projection_sketch: dim > 1024 (sign-hash grid)")
        flat = (
            emb.values.slice(offsets[0], int(sizes.sum()))
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        x = flat.reshape(-1, d) * scale
        codes = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
            np.int64
        )
        jj, dd = np.meshgrid(
            np.arange(r, dtype=np.uint64),
            np.arange(d, dtype=np.uint64),
            indexing="ij",
        )
        # bit 32, not bit 0: the chain's last op is a multiply, so low
        # bits are weakly mixed (measured sign bias on structured grids)
        sgn = np.where(
            (splitmix17(jj * np.uint64(1024) + dd, seed) >> np.uint64(32))
            % np.uint64(2)
            == 0,
            1,
            -1,
        ).astype(np.int64)  # (r, d)
        proj = codes @ sgn.T  # (n, r) exact int64
        n = codes.shape[0]
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, r), pa.int64()),
                "j": pa.array(np.tile(np.arange(r, dtype=np.int64), n)),
                "proj": pa.array(proj.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _popcount64(v: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array (numpy 1.x has no
    bitwise_count); exact for all 2⁶⁴ values."""
    v = v.copy()
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    v -= (v >> np.uint64(1)) & m1
    v = (v & m2) + ((v >> np.uint64(2)) & m2)
    v = (v + (v >> np.uint64(4))) & m4
    return ((v * h01) >> np.uint64(56)).astype(np.int64)


def hamming_topk(
    ds,
    n_queries: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Sign-quantized binary ANN (Charikar 2002 family): every vector
    collapses to dim sign bits (x_d > 0), packed 64-per-uint64; the
    ``n_queries`` smallest ids are the queries and ranking is exact
    integer Hamming distance (XOR + SWAR popcount per doc — ~1 ns/dim,
    the cheapest ANN in the family next to float cosine X6, integer
    ADC X137). Deterministic end to end, so the SQL twin reproduces
    every distance and the (hamming ASC, vec_id ASC) ranking exactly.

    Per-batch partial top-k + driver heap merge (the pq_search shape):
    driver traffic O(batches · Q · k).

    Returns pa.Table(query_id, vec_id, hamming, rank).
    """
    import heapq

    import ray

    from phrasekit_ray.stages.score import _get_broadcast

    def pack_bits(batch: pa.Table):
        mat = _matrix(batch[vec_col].combine_chunks())
        bits = (mat > 0).astype(np.uint8)
        dim = bits.shape[1]
        pad = (-dim) % 64
        if pad:
            bits = np.concatenate(
                [bits, np.zeros((len(bits), pad), np.uint8)], axis=1
            )
        # packbits is big-endian within bytes; view as uint64 — any fixed
        # bijection works since only XOR distances matter
        packed = np.packbits(bits, axis=1).view(np.uint64)
        return packed

    # query codes: the n_queries smallest ids (engine-wide convention)
    qtbl = (
        ds.map_batches(
            lambda b: pa.table(
                {id_col: b[id_col].cast(pa.int64()), vec_col: b[vec_col]}
            ),
            batch_format="pyarrow",
        )
        .sort(id_col)
        .limit(n_queries)
    )
    qparts = [
        b for b in qtbl.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if not qparts:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int32()),
            }
        )
    qt = pa.concat_tables(qparts, promote_options="default")
    qids = [int(x) for x in qt[id_col].to_pylist()]
    qcodes = pack_bits(qt)  # (Q, W) uint64
    Q = len(qids)
    qref = ray.put(qcodes)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "qi": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        qc = _get_broadcast(qref)
        codes = pack_bits(batch)  # (n, W)
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ids)
        # (Q, n) distances: XOR word-wise, popcount, sum words
        d = np.zeros((Q, n), np.int64)
        for w in range(codes.shape[1]):
            d += _popcount64(qc[:, w][:, None] ^ codes[None, :, w])
        kk = min(k, n)
        idx = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        return pa.table(
            {
                "qi": pa.array(
                    np.repeat(np.arange(Q, dtype=np.int64), kk), pa.int64()
                ),
                id_col: pa.array(ids[idx].ravel(), pa.int64()),
                "hamming": pa.array(
                    np.take_along_axis(d, idx, axis=1).ravel(), pa.int64()
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    heaps: dict[int, list] = {i: [] for i in range(Q)}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for qi, vid, dm in zip(
            b["qi"].to_pylist(),
            b[id_col].to_pylist(),
            b["hamming"].to_pylist(),
        ):
            h = heaps[qi]
            item = (-dm, -vid)
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    out_q, out_v, out_d, out_r = [], [], [], []
    for qi in range(Q):
        ranked = sorted(heaps[qi], key=lambda x: (-x[0], -x[1]))
        for rank, (negd, negv) in enumerate(ranked, 1):
            out_q.append(qids[qi])
            out_v.append(-negv)
            out_d.append(-negd)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_v, pa.int64()),
            "hamming": pa.array(out_d, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )


def mutual_nn_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_fn=None,
):
    """Mutual-nearest-neighbor embedding alignment (the bitext-mining /
    cross-crawl doc-alignment primitive, Artetxe & Schwenk 2019 shape):
    split the table into groups A / B (default: id parity, the two-crawl
    stand-in), find each A-vector's best B match and vice versa by
    float64 cosine (ties to the smaller id), and keep the pairs that are
    best BOTH ways — the high-precision alignment criterion.

    Returns pa.Table(src, dst, cos_micro) with src ∈ A, dst ∈ B, sorted
    by src; cos_micro = round-half-away(10⁶·cosine) in int64.

    Scale contract (the exact_near_dup_pairs convention): group A is
    collected and broadcast once (ray.put) and B STREAMS through
    map_batches — one (|A|×dim) broadcast, per-batch float64 matmul,
    driver merge traffic O(batches·|A|), never |B|. This is the exact
    oracle/verification variant for a bounded side; at corpus scale seed
    candidates with the ANN stages (lsh_topk / ivf_topk) and verify the
    mutual-best property on the candidate set the same way.
    """
    import ray

    from phrasekit_ray.stages.agg import round_away

    if group_fn is None:
        def group_fn(ids):
            return ids % 2 == 0

    a_ids_l, a_rows = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        in_a = group_fn(ids)
        if in_a.any():
            a_ids_l.append(ids[in_a])
            a_rows.append(
                _matrix(b[vec_col].combine_chunks()).astype(np.float64)[in_a]
            )
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "cos_micro": pa.array([], pa.int64()),
        }
    )
    if not a_ids_l:
        return empty
    a_ids = np.concatenate(a_ids_l)
    amat = np.vstack(a_rows)
    order = np.argsort(a_ids)
    a_ids, amat = a_ids[order], amat[order]
    anorm = np.linalg.norm(amat, axis=1)
    ref = ray.put((a_ids, amat, anorm))
    gfn = group_fn

    def partial(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        aid, am, an = _get_broadcast(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        in_b = ~gfn(ids)
        if not in_b.any():
            return pa.table(
                {
                    "a_idx": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                    "kind": pa.array([], pa.int8()),
                }
            )
        bm = _matrix(batch[vec_col].combine_chunks()).astype(np.float64)[in_b]
        b_ids = ids[in_b]
        bn = np.linalg.norm(bm, axis=1)
        sims = (am @ bm.T) / np.maximum(an[:, None] * bn[None, :], 1e-300)
        big = np.iinfo(np.int64).max
        # per-B exact best A (kind=1): max cos, ties to the smaller a_id
        mx_b = sims.max(axis=0)
        best_a = np.where(sims == mx_b[None, :], aid[:, None], big).min(axis=0)
        # per-A best B within this batch (kind=0): partial, merged driver-side
        mx_a = sims.max(axis=1)
        best_b = np.where(sims == mx_a[:, None], b_ids[None, :], big).min(axis=1)
        return pa.table(
            {
                "a_idx": pa.array(
                    np.concatenate(
                        (np.arange(len(aid), dtype=np.int64), best_a)
                    ),
                    pa.int64(),
                ),
                "b_id": pa.array(np.concatenate((best_b, b_ids)), pa.int64()),
                "cos": pa.array(np.concatenate((mx_a, mx_b)), pa.float64()),
                "kind": pa.array(
                    np.concatenate(
                        (
                            np.zeros(len(aid), np.int8),
                            np.ones(len(b_ids), np.int8),
                        )
                    ),
                    pa.int8(),
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    batches = list(parts.iter_batches(batch_format="pyarrow"))
    if not batches:
        return empty
    rows = pa.concat_tables(batches)
    kind = rows["kind"].to_numpy(zero_copy_only=False)
    # exact best-A-per-B rows (kind=1): a_idx column holds the A ID
    ba_b = rows["b_id"].to_numpy(zero_copy_only=False)[kind == 1]
    ba_a = rows["a_idx"].to_numpy(zero_copy_only=False)[kind == 1]
    # merge per-batch best-B-per-A partials (kind=0)
    pa_idx = rows["a_idx"].to_numpy(zero_copy_only=False)[kind == 0]
    pa_bid = rows["b_id"].to_numpy(zero_copy_only=False)[kind == 0]
    pa_cos = rows["cos"].to_numpy(zero_copy_only=False)[kind == 0]
    if len(ba_b) == 0 or len(pa_idx) == 0:
        return empty
    na = len(a_ids)
    best_cos = np.full(na, -np.inf)
    np.maximum.at(best_cos, pa_idx, pa_cos)
    big = np.iinfo(np.int64).max
    best_bid = np.full(na, big, dtype=np.int64)
    at_max = pa_cos == best_cos[pa_idx]
    np.minimum.at(best_bid, pa_idx[at_max], pa_bid[at_max])
    valid = best_bid != big
    ab_pairs = {
        (int(a_ids[i]), int(best_bid[i])): float(best_cos[i])
        for i in np.flatnonzero(valid)
    }
    ba_set = set(zip(ba_b.tolist(), ba_a.tolist()))  # (b_id, best a_id)
    mutual = sorted(
        (a, b, c) for (a, b), c in ab_pairs.items() if (b, a) in ba_set
    )
    cm = pc.cast(
        round_away(pa.array([c * 1e6 for _, _, c in mutual], pa.float64())),
        pa.int64(),
    )
    return pa.table(
        {
            "src": pa.array([a for a, _, _ in mutual], pa.int64()),
            "dst": pa.array([b for _, b, _ in mutual], pa.int64()),
            "cos_micro": cm,
        }
    )
