"""Sequence packing: assign documents to fixed token-capacity bins for
training-batch construction (the classic first-fit-decreasing packing
pass a pretraining data pipeline runs after filtering/dedup).

No reference analog (phrasekit is a phrase-mining engine; SURVEY.md
§2.11 extension). Scale shape: packing is PER-PARTITION by design —
real pipelines pack locally per shard because a global bin assignment
would serialize the corpus through one solver for zero training-quality
benefit. Documents are hash-partitioned by id, each partition packs its
own documents with a vectorized first-fit-decreasing pass, and bin ids
are globally unique via (partition << 32) | local_bin. The result is
deterministic for a fixed ``num_partitions`` (the partition hash and
the in-partition (tokens desc, id asc) order pin every assignment).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.stages.agg import default_partitions


def _ffd_pack_scan(tokens: np.ndarray, capacity: int) -> tuple[np.ndarray, int]:
    """First-fit-decreasing, linear-scan probe: place each doc in the
    lowest-numbered bin with room, else open a new bin. Returns
    (bin_id per input row, n_bins). O(n·bins) via a numpy scan per doc.
    Kept as the obviously-correct REFERENCE implementation — production
    uses `_ffd_pack_tree` (identical placements, cross-tested), which
    beats this at every partition size measured (4–9×: the per-doc
    numpy call overhead dominates the scan even for tiny inputs).
    Oversized docs (tokens > capacity) get a dedicated bin each —
    flagged upstream rather than silently truncated.
    """
    n = len(tokens)
    bins = np.empty(64, np.int64)  # fill levels, grown on demand
    n_bins = 0
    out = np.empty(n, np.int64)
    for i in range(n):
        t = tokens[i]
        placed = -1
        # first bin with room (fill + t <= capacity)
        room = np.flatnonzero(bins[:n_bins] + t <= capacity)
        if room.size:
            placed = room[0]
        if placed < 0:
            if n_bins == len(bins):
                bins = np.concatenate([bins, np.empty(len(bins), np.int64)])
            bins[n_bins] = 0
            placed = n_bins
            n_bins += 1
        bins[placed] += t
        out[i] = placed
    return out, n_bins


def _ffd_pack_tree(tokens: np.ndarray, capacity: int) -> tuple[np.ndarray, int]:
    """Exact first-fit via a max-segment-tree over bin residuals:
    the descend takes the left child whenever its subtree max fits, so
    it lands on the LOWEST-indexed bin with room — identical placements
    to `_ffd_pack_scan` by construction (cross-tested in
    tests/test_packing.py), at O(log bins) per doc instead of O(bins).

    The tree is a flat Python list (1-indexed, leaves at [M, 2M));
    closed leaves hold -1, which never satisfies ``>= t`` for the
    clamped weights (t >= 1). Doubling rebuilds are amortized O(bins).
    """
    n = len(tokens)
    out = np.empty(n, np.int64)
    cap = int(capacity)
    M = 64
    tree = [-1] * (2 * M)
    n_bins = 0
    toks = tokens.tolist()  # python ints: no numpy-scalar overhead in the loop
    for i in range(n):
        t = toks[i]
        if tree[1] >= t:
            node = 1
            while node < M:
                node <<= 1
                if tree[node] < t:
                    node += 1
            b = node - M
            tree[node] -= t
        else:
            b = n_bins
            n_bins += 1
            if b >= M:
                M <<= 1
                new = [-1] * (2 * M)
                new[M : M + b] = tree[M >> 1 : (M >> 1) + b]
                for nd in range(M - 1, 0, -1):
                    left, right = new[2 * nd], new[2 * nd + 1]
                    new[nd] = left if left >= right else right
                tree = new
            node = M + b
            tree[node] = cap - t
        # bubble the changed leaf's value up; stop when a node is unchanged
        v = tree[node]
        node >>= 1
        while node:
            left, right = tree[2 * node], tree[2 * node + 1]
            v = left if left >= right else right
            if tree[node] == v:
                break
            tree[node] = v
            node >>= 1
        out[i] = b
    return out, n_bins


def _ffd_pack_cohort(
    tokens: np.ndarray, capacity: int
) -> tuple[np.ndarray, int]:
    """Exact first-fit-decreasing, vectorized over COHORTS of equal
    token values (VERDICT r4 item 6 — this removes the per-doc Python
    loop from the packing hot path).

    Key fact: the input is sorted descending, so it is a sequence of
    runs of EQUAL values t. Within such a run, first-fit is exactly
    "walk bins in index order; a bin with residual r >= t absorbs
    floor(r / t) consecutive items before the walk moves on" — bins
    before the current one stay ineligible (their residuals are
    unchanged and were < t), and the current bin stays first-eligible
    until it no longer fits t. Leftover items open new bins, each
    absorbing floor(capacity / t) items. One numpy pass per cohort
    (eligibility mask, per-bin quotas, cumsum + searchsorted cut,
    np.repeat of bin ids); no per-item work at all. The number of
    cohorts is bounded by the number of DISTINCT clamped values
    (≤ capacity), so per-partition cost is O(distinct × bins) in
    vectorized element ops instead of O(n log bins) interpreted steps.

    Identical placements to `_ffd_pack_scan` / `_ffd_pack_tree` by
    construction (cross-tested in tests/test_packing.py).
    """
    n = len(tokens)
    out = np.empty(n, np.int64)
    cap = int(capacity)
    if n == 0:
        return out, 0
    R = np.empty(1024, np.int64)  # bin residuals, grown on demand
    n_bins = 0
    # cohort boundaries: runs of equal values in the desc-sorted input
    change = np.flatnonzero(np.diff(tokens)) + 1
    bounds = np.concatenate([[0], change, [n]])
    for ci in range(len(bounds) - 1):
        s, e = int(bounds[ci]), int(bounds[ci + 1])
        t = int(tokens[s])
        k = e - s
        fill_bins: list[np.ndarray] = []
        fill_counts: list[np.ndarray] = []
        if n_bins:
            Rb = R[:n_bins]
            elig = np.flatnonzero(Rb >= t)
            if elig.size:
                quota = Rb[elig] // t
                cum = np.cumsum(quota)
                cut = int(np.searchsorted(cum, k, side="left"))
                if cut == len(cum):
                    # every eligible bin fills its full quota
                    R[elig] -= quota * t
                    fill_bins.append(elig)
                    fill_counts.append(quota)
                    k -= int(cum[-1])
                else:
                    # bins before the cut fill fully; the cut bin takes
                    # the remainder; nothing spills to new bins
                    used = int(cum[cut - 1]) if cut else 0
                    rem = k - used
                    if cut:
                        R[elig[:cut]] -= quota[:cut] * t
                        fill_bins.append(elig[:cut])
                        fill_counts.append(quota[:cut])
                    b = elig[cut]
                    R[b] -= rem * t
                    fill_bins.append(np.array([b], np.int64))
                    fill_counts.append(np.array([rem], np.int64))
                    k = 0
        if k > 0:
            per_new = cap // t  # >= 1: weights are clamped to <= cap
            n_new = -(-k // per_new)
            while n_bins + n_new > len(R):
                R = np.concatenate([R, np.empty(len(R), np.int64)])
            counts = np.full(n_new, per_new, np.int64)
            counts[-1] = k - per_new * (n_new - 1)
            new_ids = np.arange(n_bins, n_bins + n_new, dtype=np.int64)
            R[new_ids] = cap - counts * t
            n_bins += n_new
            fill_bins.append(new_ids)
            fill_counts.append(counts)
        out[s:e] = np.repeat(
            np.concatenate(fill_bins), np.concatenate(fill_counts)
        )
    return out, n_bins


def _ffd_pack(tokens: np.ndarray, capacity: int) -> tuple[np.ndarray, int]:
    """First-fit-decreasing over one partition, input already sorted
    descending. The classic FFD bound holds (≤ 11/9·OPT + 6/9 bins).
    Production uses the cohort-vectorized kernel (no per-doc Python at
    all); `_ffd_pack_tree` (r4 production) and `_ffd_pack_scan` remain
    as cross-tested references. Measured on this container, 1M docs /
    cap 2048 Zipf-ish (Pareto 1.2) lengths, 74.9k bins: tree 2.73 s →
    cohort 0.09 s (30×), placements identical (tests/test_packing.py
    differential + BASELINE.md note).
    """
    return _ffd_pack_cohort(tokens, capacity)


def pack_sequences(
    ds,
    capacity: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """(id, n_tokens) Dataset → (doc_id, bin_id, oversize) with every
    bin's token total ≤ ``capacity`` (oversized docs get a dedicated
    bin and oversize=true). Bin ids are globally unique:
    ``(partition << 32) | local_bin``.
    """
    if capacity < 1:
        raise ValueError("pack_sequences: capacity must be >= 1")
    num_partitions = default_partitions(num_partitions)
    if num_partitions >= 1 << 31:
        raise ValueError("pack_sequences: num_partitions must fit int31")

    def derive(batch: pa.Table) -> pa.Table:
        # same Fibonacci-hash partitioner as the window operators — ONE
        # shared definition, so the determinism contract can't silently
        # diverge between modules
        from phrasekit_ray.stages.windows import _user_part

        did = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy()
        tok = batch[tokens_col].combine_chunks().cast(pa.int64())
        if len(tok) and pc.min(tok).as_py() < 0:
            raise ValueError("pack_sequences: negative token counts")
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_tokens": tok,
                "_part": pa.array(_user_part(did, num_partitions), pa.int32()),
            }
        )

    def per_partition(group: pa.Table) -> pa.Table:
        part = int(group["_part"][0].as_py())
        did = group["doc_id"].combine_chunks().to_numpy()
        tok = group["n_tokens"].combine_chunks().to_numpy()
        n = len(did)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bin_id": pa.array([], pa.int64()),
                    "oversize": pa.array([], pa.bool_()),
                }
            )
        # FFD order: tokens desc, doc_id asc (deterministic tie-break)
        order = np.lexsort((did, -tok))
        did_s, tok_s = did[order], tok[order]
        over = tok_s > capacity
        # oversized docs pack as exactly-capacity items: each consumes a
        # fresh bin on its own. Zero-token docs are clamped to weight 1
        # so they can never slip into a full (oversize) bin — the
        # dedicated-bin invariant holds for every bin at capacity.
        local, _ = _ffd_pack(
            np.minimum(np.maximum(tok_s, 1), capacity), capacity
        )
        return pa.table(
            {
                "doc_id": pa.array(did_s, pa.int64()),
                "bin_id": pa.array(
                    (np.int64(part) << np.int64(32)) | local, pa.int64()
                ),
                "oversize": pa.array(over),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
    )
