"""Distributed clustering over an embedding column: exact-arithmetic
Lloyd k-means and SemDeDup-style semantic deduplication.

Training-data extensions (no reference analog — phrasekit is text-only;
cited for context: the reference's closest notion of grouping is the
salience scorer's domain/background split, `docs/SALIENCE.md`).

Both operators run on QUANTIZED integer codes (`round(x*scale)` as
int64) so every reduction is an order-independent integer sum and every
derived float is computed from the SAME exact int64s on this engine and
on the DuckDB oracle — the technique proven by q_centroid_confusion
(X121). With ``scale=512`` and unit-bounded inputs every intermediate
(dot products, squared norms, the 10000·dp² ≥ 9025·n²·m² cosine test)
fits comfortably in int64.

Scale shape:

- ``kmeans_fit``: per iteration, ONE broadcast of the (k×dim int sums,
  k counts) centroid state via ray.put + ONE two-phase hash_aggregate
  producing k rows. The corpus streams; driver residency is O(k·dim).
  Iteration count is fixed (deterministic, SQL-unrollable), not
  convergence-gated — the 100 TB run picks T by budget, same as here.
- ``semantic_dedup``: assignment is the same broadcast-argmax pass;
  the intra-cluster pairwise check runs per cluster inside map_groups
  (SemDeDup is inherently O(|cluster|²) — the knob is the number of
  clusters; a ``cluster_cap`` guards hot clusters by splitting them on
  an id-hash salt, which can only MISS duplicate pairs across the salt
  boundary, never invent them — the cap is off in oracle-checked runs
  and documented as the 100 TB pressure valve).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from phrasekit_ray.stages.similarity import _matrix

DEFAULT_SCALE = 512.0


def _round_away(x: np.ndarray) -> np.ndarray:
    # DuckDB round() semantics: half away from zero (np.round is half-even)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def quantize_codes(batch: pa.Table, vec_col: str, scale: float) -> np.ndarray:
    """list<float> column → (n, dim) int64 code matrix, the exact value
    DuckDB computes as CAST(round(CAST(x AS DOUBLE)*scale) AS BIGINT)."""
    v = batch[vec_col].combine_chunks()
    off = v.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    dim = int(off[1] - off[0]) if len(off) > 1 else 0
    flat = (
        v.values.slice(off[0], int(off[-1] - off[0]))
        .cast(pa.float64())
        .to_numpy(zero_copy_only=False)
    )
    return _round_away(flat.reshape(-1, dim) * scale).astype(np.int64)


def seed_codes(ds, k: int, id_col: str, vec_col: str, scale: float):
    """Codes of the k smallest-id rows — the deterministic, SQL-
    expressible init (seeds are data, not RNG state). Per-block bottom-k
    prune → driver merge of ≤ k rows per block."""

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    parts = []
    for b in ds.map_batches(bottomk, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        parts.append(pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b)
    cand = pa.concat_tables(parts) if parts else None
    if cand is None or cand.num_rows == 0:
        return np.zeros((0,), np.int64), np.zeros((0, 0), np.int64)
    ids = cand[id_col].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    order = np.argsort(ids, kind="stable")[:k]
    cand = cand.take(pa.array(order))
    return (
        cand[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False),
        quantize_codes(cand, vec_col, scale),
    )


def _assign_to_centroids(
    codes: np.ndarray, sums: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """argmin_j ||x − S_j/C_j||², dropping the j-free x·x term:
    f_j(x) = −2·(x·S_j)/C_j + (S_j·S_j)/C_j², every term a float64 cast
    of an exact int64 (identical to the SQL twin's expression; ties →
    smallest j via argmin-first-wins)."""
    dots = codes @ sums.T  # (n, k) exact int64
    c = counts.astype(np.float64)
    ss = (sums * sums).sum(axis=1)  # exact int64 per centroid
    f = (-2.0 * dots.astype(np.float64)) / c + ss.astype(np.float64) / (c * c)
    return np.argmin(f, axis=1).astype(np.int64)


def kmeans_fit(
    ds,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = DEFAULT_SCALE,
):
    """Distributed Lloyd's k-means with EXACT arithmetic: centroids are
    carried as (int64 sum vector, int64 count) so the distributed sum
    order cannot perturb them; assignment compares float64 expressions
    computed from those exact ints (IEEE-identical on any engine).

    Init: centroid j = the code vector of the (j+1)-th smallest id.
    Empty clusters keep their previous (sums, count) state.

    Returns (sums, counts, assign_fn) where assign_fn(batch)->labels
    reproduces the final assignment for any batch.
    """
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.score import _get_broadcast

    _, seeds = seed_codes(ds, k, id_col, vec_col, scale)
    if seeds.shape[0] == 0:
        raise ValueError("kmeans_fit: empty input dataset")
    k = seeds.shape[0]  # fewer rows than k: every row its own centroid
    dim = seeds.shape[1]
    sums = seeds.copy()
    counts = np.ones(k, np.int64)  # seed state: centroid == the seed code

    sum_cols = [f"_s{i}" for i in range(dim)]

    for _ in range(iters):
        state_ref = ray.put((sums, counts))

        def partial(batch: pa.Table, _ref=state_ref) -> pa.Table:
            s, c = _get_broadcast(_ref)
            codes = quantize_codes(batch, vec_col, scale)
            lab = _assign_to_centroids(codes, s, c)
            order = np.argsort(lab, kind="stable")
            lab_s = lab[order]
            seg = np.flatnonzero(
                np.concatenate(([True], lab_s[1:] != lab_s[:-1]))
            )
            gsum = np.add.reduceat(codes[order], seg, axis=0)
            gcnt = np.diff(np.append(seg, len(lab_s)))
            cols = {
                "cluster": pa.array(lab_s[seg], pa.int64()),
                "_n": pa.array(gcnt.astype(np.int64), pa.int64()),
            }
            for i, name in enumerate(sum_cols):
                cols[name] = pa.array(gsum[:, i], pa.int64())
            return pa.table(cols)

        agg = hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["cluster"],
            [("_n", "sum")] + [(c, "sum") for c in sum_cols],
        )
        rows = pa.concat_tables(
            list(agg.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        new_sums = sums.copy()  # empty cluster: keep previous state
        new_counts = counts.copy()
        cl = rows["cluster"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = rows["_n"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        gs = np.stack(
            [
                rows[c].combine_chunks().cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                for c in sum_cols
            ],
            axis=1,
        ) if rows.num_rows else np.zeros((0, dim), np.int64)
        new_sums[cl] = gs
        new_counts[cl] = n
        sums, counts = new_sums, new_counts

    final_sums, final_counts = sums, counts

    def assign_fn(batch: pa.Table) -> np.ndarray:
        return _assign_to_centroids(
            quantize_codes(batch, vec_col, scale), final_sums, final_counts
        )

    return final_sums, final_counts, assign_fn


def kmeans_cluster_stats(
    ds,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = DEFAULT_SCALE,
) -> pa.Table:
    """k-means fit + one labeling pass → per-cluster (cluster, n,
    inertia_micro): inertia_j = Σ_{x∈j} ||x − μ_j||² computed from the
    exact int64 aggregates Σx·x, Σ(x·S_j) and n_j as
        Σx·x − 2·(Σx·S_j)/C_j + n_j·(S_j·S_j)/C_j²
    then scaled by scale⁻² and rounded to integer micro-units — the
    whole float tail is a fixed expression over exact ints, so the SQL
    twin lands on the identical value."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.score import _get_broadcast

    sums, counts, _ = kmeans_fit(ds, k, iters, id_col, vec_col, scale)
    state_ref = ray.put((sums, counts))

    def partial(batch: pa.Table) -> pa.Table:
        s, c = _get_broadcast(state_ref)
        codes = quantize_codes(batch, vec_col, scale)
        lab = _assign_to_centroids(codes, s, c)
        xx = (codes * codes).sum(axis=1)  # exact int64 per row
        xs = np.take_along_axis(
            codes @ s.T, lab[:, None], axis=1
        ).ravel()  # exact x·S_lab
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        seg = np.flatnonzero(np.concatenate(([True], lab_s[1:] != lab_s[:-1])))
        return pa.table(
            {
                "cluster": pa.array(lab_s[seg], pa.int64()),
                "n": pa.array(
                    np.diff(np.append(seg, len(lab_s))).astype(np.int64),
                    pa.int64(),
                ),
                "_sxx": pa.array(
                    np.add.reduceat(xx[order], seg), pa.int64()
                ),
                "_sxs": pa.array(
                    np.add.reduceat(xs[order], seg), pa.int64()
                ),
            }
        )

    agg = pa.concat_tables(
        list(
            hash_aggregate(
                ds.map_batches(partial, batch_format="pyarrow"),
                ["cluster"],
                [("n", "sum"), ("_sxx", "sum"), ("_sxs", "sum")],
            ).iter_batches(batch_format="pyarrow")
        ),
        promote_options="default",
    )
    cl = agg["cluster"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    n = agg["n"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    sxx = agg["_sxx"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    sxs = agg["_sxs"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    c = counts[cl].astype(np.float64)
    ss = (sums[cl] * sums[cl]).sum(axis=1).astype(np.float64)
    inertia = (
        sxx.astype(np.float64)
        - 2.0 * sxs.astype(np.float64) / c
        + n.astype(np.float64) * ss / (c * c)
    ) / (scale * scale)
    order = np.argsort(cl, kind="stable")
    return pa.table(
        {
            "cluster": pa.array(cl[order], pa.int64()),
            "n": pa.array(n[order], pa.int64()),
            "inertia_micro": pa.array(
                _round_away(inertia * 1e6).astype(np.int64)[order], pa.int64()
            ),
        }
    )


def semantic_dedup(
    ds,
    n_seeds: int = 8,
    threshold_num: int = 19,
    threshold_den: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = DEFAULT_SCALE,
    cluster_cap: int = 0,
    num_partitions: int | None = None,
):
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023 shape):
    assign every vector to its nearest seed by cosine (seeds = the
    ``n_seeds`` smallest-id vectors), then inside each cluster mark row
    i a duplicate iff some EARLIER row j (j.id < i.id) has
    cos(i, j) ≥ threshold_num/threshold_den — keep-first, deterministic.

    The cosine test runs ENTIRELY in int64 on the quantized codes:
        dp > 0  AND  den²·dp² ≥ num²·(Σi²)·(Σj²)
    The threshold is a small rational (default 19/20 = 0.95) so with
    scale=512, dim≤64 and unit-bounded values every product < 2⁶³
    (asserted at runtime), and the DuckDB twin computes the identical
    BIGINT comparisons — no float appears anywhere in the decision.

    Returns a Dataset(vec_id, cluster, is_dup) — the full audit table;
    survivors are the is_dup == 0 rows.

    100 TB notes: assignment is one broadcast-argmax streaming pass; the
    per-cluster gram matrix inside map_groups is the SemDeDup algorithm
    itself (quadratic in cluster size — control with more seeds).
    ``cluster_cap > 0`` splits any cluster larger than the cap by an id
    hash salt before the pairwise stage (bounds worst-case memory; may
    only miss cross-salt pairs, never fabricates one). Oracle-checked
    runs use cap=0.
    """
    import ray

    from phrasekit_ray.stages.agg import default_partitions
    from phrasekit_ray.stages.score import _get_broadcast

    seed_ids, seeds = seed_codes(ds, n_seeds, id_col, vec_col, scale)
    if seeds.shape[0] == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "is_dup": pa.array([], pa.int64()),
                }
            )
        )
    # int64-overflow guard for the exact pairwise test: the largest dot
    # product / squared norm is dim·scale² (codes bounded by scale for
    # unit-bounded inputs); both den²·dp² and num²·n2ᵢ·n2ⱼ must fit 2⁶³
    max_dp = seeds.shape[1] * int(scale) * int(scale)
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError("threshold must be a rational in (0, 1]")
    if max(num, den) ** 2 * max_dp * max_dp >= 2**63:
        raise ValueError(
            "semantic_dedup: dim·scale² too large for exact int64 "
            "arithmetic — lower scale or the threshold denominator"
        )
    seeds_ref = ray.put(seeds)
    nparts = default_partitions(num_partitions)

    def assign(batch: pa.Table) -> pa.Table:
        s = _get_broadcast(seeds_ref)
        codes = quantize_codes(batch, vec_col, scale)
        dots = codes @ s.T  # (n, k) exact
        snrm = np.sqrt((s.astype(np.float64) ** 2).sum(axis=1))
        score = dots.astype(np.float64) / snrm  # x-norm is j-free
        lab = np.argmax(score, axis=1).astype(np.int64)  # ties → smallest j
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        cols = {
            id_col: ids,
            "cluster": pa.array(lab, pa.int64()),
        }
        for i in range(codes.shape[1]):
            cols[f"_c{i}"] = pa.array(codes[:, i], pa.int64())
        t = pa.table(cols)
        if cluster_cap > 0:
            from phrasekit_ray.sources.pages import splitmix17

            ids_np = ids.to_numpy(zero_copy_only=False).astype(np.uint64)
            salt = (splitmix17(ids_np) % np.uint64(max(cluster_cap, 1))).astype(
                np.int64
            )
            grp = lab * np.int64(cluster_cap + 1) + salt
        else:
            grp = lab
        return t.append_column(
            "_part", pa.array((grp % nparts).astype(np.int32), pa.int32())
        ).append_column("_grp", pa.array(grp, pa.int64()))

    num2 = num * num
    den2 = den * den

    def per_partition(part: pa.Table) -> pa.Table:
        grp = part["_grp"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ids = part[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ncode = len(part.column_names) - 4  # id, cluster, _part, _grp
        codes = np.stack(
            [
                part[f"_c{i}"].combine_chunks().to_numpy(zero_copy_only=False)
                for i in range(ncode)
            ],
            axis=1,
        )
        clusters = part["cluster"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        is_dup = np.zeros(len(ids), np.int64)
        order = np.lexsort((ids, grp))
        seg = np.flatnonzero(
            np.concatenate(([True], grp[order][1:] != grp[order][:-1]))
        )
        bounds = np.append(seg, len(order))
        for gi in range(len(seg)):
            idx = order[bounds[gi] : bounds[gi + 1]]  # id-ascending in group
            if len(idx) < 2:
                continue
            g = codes[idx]
            dp = g @ g.T  # exact int64
            n2 = (g * g).sum(axis=1)  # exact int64
            # keep-first: i dup iff any j<i passes; every product is
            # int64-exact under the bound asserted above
            hit = (dp > 0) & (den2 * dp * dp >= num2 * np.outer(n2, n2))
            np.fill_diagonal(hit, False)
            dup = np.tril(hit, k=-1).any(axis=1)
            is_dup[idx] = dup.astype(np.int64)
        out_order = np.argsort(ids, kind="stable")
        return pa.table(
            {
                id_col: pa.array(ids[out_order], pa.int64()),
                "cluster": pa.array(clusters[out_order], pa.int64()),
                "is_dup": pa.array(is_dup[out_order], pa.int64()),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return assigned.groupby("_part").map_groups(
        per_partition, batch_format="pyarrow"
    )


def pq_train(
    ds,
    m_subspaces: int = 8,
    k_codes: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = DEFAULT_SCALE,
):
    """Product-quantization codebook training (Jégou et al. 2011 shape):
    split each vector into ``m_subspaces`` contiguous subvectors and run
    the SAME exact-int Lloyd recurrence as kmeans_fit independently in
    every subspace — but in ONE streaming pass per iteration (the
    per-batch partial aggregates carry the (subspace, code) key, so all
    M×K centroids update through a single two-phase hash_aggregate).

    Returns (sums, counts): sums (M, K, subdim) int64, counts (M, K)
    int64 — the exact rational codebook state (centroid = S/C), bitwise
    reproducible at any parallelism.
    """
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.score import _get_broadcast

    seed_ids, seeds = seed_codes(ds, k_codes, id_col, vec_col, scale)
    if seeds.shape[0] == 0:
        raise ValueError("pq_train: empty input dataset")
    k = seeds.shape[0]
    dim = seeds.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by M={m_subspaces}")
    sub = dim // m_subspaces
    # seed j of subspace m = sub-codes of the (j+1)-th smallest id
    sums = seeds.reshape(k, m_subspaces, sub).transpose(1, 0, 2).copy()
    counts = np.ones((m_subspaces, k), np.int64)
    sum_cols = [f"_s{i}" for i in range(sub)]
    M, K = m_subspaces, k

    def _assign(codes_r: np.ndarray, s: np.ndarray, c: np.ndarray) -> np.ndarray:
        # codes_r (n, M, sub); s (M, K, sub); c (M, K) → labels (n, M)
        dots = np.einsum("nms,mks->nmk", codes_r, s)  # exact int64
        cf = c.astype(np.float64)
        ss = (s * s).sum(axis=2)  # (M, K) exact int64
        f = (-2.0 * dots.astype(np.float64)) / cf + ss.astype(np.float64) / (
            cf * cf
        )
        return np.argmin(f, axis=2).astype(np.int64)

    for _ in range(iters):
        state_ref = ray.put((sums, counts))

        def partial(batch: pa.Table, _ref=state_ref) -> pa.Table:
            s, c = _get_broadcast(_ref)
            codes = quantize_codes(batch, vec_col, scale)
            codes_r = codes.reshape(-1, M, sub)
            lab = _assign(codes_r, s, c)  # (n, M)
            mk = (np.arange(M, dtype=np.int64)[None, :] * K + lab).ravel()
            flat = codes_r.reshape(-1, sub)  # row order matches mk
            order = np.argsort(mk, kind="stable")
            mk_s = mk[order]
            seg = np.flatnonzero(
                np.concatenate(([True], mk_s[1:] != mk_s[:-1]))
            )
            gsum = np.add.reduceat(flat[order], seg, axis=0)
            gcnt = np.diff(np.append(seg, len(mk_s)))
            cols = {
                "mk": pa.array(mk_s[seg], pa.int64()),
                "_n": pa.array(gcnt.astype(np.int64), pa.int64()),
            }
            for i, name in enumerate(sum_cols):
                cols[name] = pa.array(gsum[:, i], pa.int64())
            return pa.table(cols)

        rows = pa.concat_tables(
            list(
                hash_aggregate(
                    ds.map_batches(partial, batch_format="pyarrow"),
                    ["mk"],
                    [("_n", "sum")] + [(c, "sum") for c in sum_cols],
                ).iter_batches(batch_format="pyarrow")
            ),
            promote_options="default",
        )
        new_sums, new_counts = sums.copy(), counts.copy()
        mk = rows["mk"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = rows["_n"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        gs = (
            np.stack(
                [
                    rows[c].combine_chunks().cast(pa.int64()).to_numpy(
                        zero_copy_only=False
                    )
                    for c in sum_cols
                ],
                axis=1,
            )
            if rows.num_rows
            else np.zeros((0, sub), np.int64)
        )
        new_sums[mk // K, mk % K] = gs
        new_counts[mk // K, mk % K] = n
        sums, counts = new_sums, new_counts

    return sums, counts


def pq_encode(
    ds,
    m_subspaces: int = 8,
    k_codes: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = DEFAULT_SCALE,
):
    """Train PQ codebooks, then one labeling pass → Dataset(vec_id, m,
    code, sub_err_micro): per subspace the assigned codeword and the
    quantization error ||x_m − μ_{m,code}||² in integer micro-units
    (the same exact-int float tail as kmeans_cluster_stats, so the SQL
    twin reproduces every value)."""
    import ray

    from phrasekit_ray.stages.score import _get_broadcast

    sums, counts = pq_train(
        ds, m_subspaces, k_codes, iters, id_col, vec_col, scale
    )
    M, K, sub = sums.shape
    state_ref = ray.put((sums, counts))

    def label(batch: pa.Table) -> pa.Table:
        s, c = _get_broadcast(state_ref)
        codes = quantize_codes(batch, vec_col, scale)
        codes_r = codes.reshape(-1, M, sub)
        dots = np.einsum("nms,mks->nmk", codes_r, s)
        cf = c.astype(np.float64)
        ss = (s * s).sum(axis=2)
        f = (-2.0 * dots.astype(np.float64)) / cf + ss.astype(np.float64) / (
            cf * cf
        )
        lab = np.argmin(f, axis=2)  # (n, M)
        xx = (codes_r * codes_r).sum(axis=2)  # (n, M) exact
        take = np.take_along_axis
        dsel = take(dots, lab[:, :, None], axis=2)[:, :, 0]
        csel = take(
            np.broadcast_to(cf[None], dots.shape[:1] + cf.shape),
            lab[:, :, None],
            axis=2,
        )[:, :, 0]
        sssel = take(
            np.broadcast_to(
                ss.astype(np.float64)[None], dots.shape[:1] + ss.shape
            ),
            lab[:, :, None],
            axis=2,
        )[:, :, 0]
        err = (
            xx.astype(np.float64)
            - 2.0 * dsel.astype(np.float64) / csel
            + sssel / (csel * csel)
        ) / (scale * scale)
        err_micro = np.where(
            err * 1e6 >= 0,
            np.floor(err * 1e6 + 0.5),
            np.ceil(err * 1e6 - 0.5),
        ).astype(np.int64)
        ids = (
            batch[id_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(ids)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, M), pa.int64()),
                "m": pa.array(
                    np.tile(np.arange(M, dtype=np.int64), n), pa.int64()
                ),
                "code": pa.array(lab.ravel().astype(np.int64), pa.int64()),
                "sub_err_micro": pa.array(err_micro.ravel(), pa.int64()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow")


def pq_search(
    ds,
    n_queries: int = 8,
    k: int = 10,
    m_subspaces: int = 8,
    k_codes: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = DEFAULT_SCALE,
):
    """ADC (asymmetric distance computation) top-k over PQ codes — the
    scale path of the ANN family (Jégou et al. 2011 §IV): train the
    M×K codebooks, take the ``n_queries`` smallest ids as query vectors,
    precompute per query an (M, K) lookup table of subspace distances
    in integer micro-units, then ONE corpus pass where each document
    costs an (M,) int64 gather + sum — no full-dimension math per doc.

    Everything after the LUT build is exact int64 (sums of rounded
    per-subspace micro distances), so ranking is order-independent and
    the SQL twin reproduces every value. Per-batch partial top-k keeps
    driver traffic O(batches · n_queries · k).

    Returns pa.Table(query_id, vec_id, adc_micro, rank); self-matches
    are kept (the quantized self-distance is informative and the oracle
    stays join-shaped).
    """
    import heapq

    import ray

    from phrasekit_ray.stages.score import _get_broadcast

    sums, counts = pq_train(
        ds, m_subspaces, k_codes, iters, id_col, vec_col, scale
    )
    M, K, sub = sums.shape

    # query codes: the n_queries smallest ids (same convention as the
    # seed pick — deterministic and SQL-expressible)
    qids_arr, qseeds = seed_codes(ds, n_queries, id_col, vec_col, scale)
    qids = [int(x) for x in qids_arr]
    if not qids:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "adc_micro": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int32()),
            }
        )
    q_r = qseeds.reshape(-1, M, sub)  # (Q, M, sub) int64
    qdot = np.einsum("qms,mks->qmk", q_r, sums)  # exact int64
    qxx = (q_r * q_r).sum(axis=2)  # (Q, M) exact int64
    cf = counts.astype(np.float64)  # (M, K)
    ss = (sums * sums).sum(axis=2)  # (M, K) exact int64
    # same float tail + rounding as pq_encode/sub_err_micro
    err = (
        qxx[:, :, None].astype(np.float64)
        - 2.0 * qdot.astype(np.float64) / cf[None]
        + ss.astype(np.float64)[None] / (cf * cf)[None]
    ) / (scale * scale)
    lut = _round_away(err * 1e6).astype(np.int64)  # (Q, M, K)
    state_ref = ray.put((sums, counts, lut))
    Q = len(qids)
    marange = np.arange(M)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "qi": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "adc_micro": pa.array([], pa.int64()),
                }
            )
        s, c, l = _get_broadcast(state_ref)
        codes_r = quantize_codes(batch, vec_col, scale).reshape(-1, M, sub)
        dots = np.einsum("nms,mks->nmk", codes_r, s)
        cfb = c.astype(np.float64)
        ssb = (s * s).sum(axis=2)
        f = (-2.0 * dots.astype(np.float64)) / cfb + ssb.astype(
            np.float64
        ) / (cfb * cfb)
        lab = np.argmin(f, axis=2)  # (n, M)
        # ADC: gather each query's LUT at the doc's codes, sum subspaces
        adc = l[:, marange[None, :], lab].sum(axis=2)  # (Q, n) int64
        ids = (
            batch[id_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(ids)
        kk = min(k, n)
        idx = np.argpartition(adc, kk - 1, axis=1)[:, :kk]
        return pa.table(
            {
                "qi": pa.array(
                    np.repeat(np.arange(Q, dtype=np.int64), kk), pa.int64()
                ),
                id_col: pa.array(ids[idx].ravel(), pa.int64()),
                "adc_micro": pa.array(
                    np.take_along_axis(adc, idx, axis=1).ravel(), pa.int64()
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # driver-side heap merge, O(batches · Q · k) — mirrors _merge_topk
    # but ranks by ASCENDING integer distance
    heaps: dict[int, list] = {i: [] for i in range(Q)}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for qi, vid, dm in zip(
            b["qi"].to_pylist(),
            b[id_col].to_pylist(),
            b["adc_micro"].to_pylist(),
        ):
            h = heaps[qi]
            item = (-dm, -vid)  # max-heap root = worst kept candidate
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
            "adc_micro": pa.array(out_d, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )
