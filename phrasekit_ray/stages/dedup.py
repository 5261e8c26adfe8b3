"""Deduplication operators over a documents corpus.

No reference analog (phrasekit has only key-dedup in aggregation —
SURVEY.md §2.7); these are the large-scale training-data operators the
north rule adds: exact dedup, MinHash+LSH near-dup, SimHash, and n-gram
Jaccard verification.

Scale shapes:
- exact: md5(text) computed in-block → groupby(hash).min(doc_id) — the
  shuffle moves 16-byte keys, never the documents.
- minhash-LSH: per-block vectorized shingle→minhash signatures
  (np.minimum.reduceat over permuted hashes), banded; the shuffle key is
  (band, 8-byte band digest). Groups >1 emit candidate pairs; candidates
  are VERIFIED with the exact k-shingle Jaccard via distributed
  lookup_joins, then connected-componented (driver union-find under a
  bounded pair threshold, hash-min label propagation above it).
- simhash: 64-bit weighted fingerprint per doc, fully in-block.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.core import normalize
from phrasekit_ray.stages.agg import default_partitions, hash_aggregate

_MERSENNE = np.uint64((1 << 61) - 1)


def _text_md5_u64(texts: list[str]) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in texts
        ),
        dtype=np.uint64,
        count=len(texts),
    )


# --- exact dedup -----------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset → Dataset(doc_id) of kept representatives (min id per
    identical text). Hash-partition + per-group first (SURVEY.md/task)."""

    def to_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table(
            {
                "text_hash": pa.array(_text_md5_u64(texts), pa.uint64()),
                id_col: batch[id_col],
            }
        )

    hashed = ds.map_batches(to_hash, batch_format="pyarrow")
    kept = hash_aggregate(hashed, "text_hash", [(id_col, "min")])
    return kept.map_batches(
        lambda b: pa.table({id_col: b[id_col]}),
        batch_format="pyarrow",
    )


# --- minhash + LSH ---------------------------------------------------------

def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _token_hashes(flat: pa.Array) -> np.ndarray:
    """uint64 md5-based hash per token, md5 computed once per UNIQUE token
    (dictionary-encode first — web text repeats tokens heavily)."""
    dict_arr = flat.dictionary_encode()
    uniq = dict_arr.dictionary.to_pylist()
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    if not len(uh):
        return np.zeros(0, np.uint64)
    idx = dict_arr.indices.to_numpy(zero_copy_only=False)
    return uh[idx]


def _shingle_hashes(tokens_list: pa.ListArray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat k-shingle hashes + per-doc offsets (docs with < k tokens get one
    sentinel shingle so they never collide). Fully vectorized: the rolling
    k-window combine runs over the WHOLE flat token array with k shifted
    multiplies (windows crossing doc boundaries masked out), and window
    positions scatter into per-doc output slots — no per-doc Python loop."""
    offsets = tokens_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base = offsets[0]
    offsets = offsets - base
    flat = tokens_list.values.slice(base, int(offsets[-1]))
    tok_h = _token_hashes(flat)
    sizes = np.diff(offsets)
    n_docs = len(sizes)
    L = int(offsets[-1])
    m = L - k + 1
    out_counts = np.where(sizes >= k, sizes - k + 1, 1)
    out_off = np.concatenate(([0], np.cumsum(out_counts))).astype(np.int64)
    res = np.empty(int(out_off[-1]), dtype=np.uint64)
    small = sizes < k
    # sentinel shingle = doc length (never collides with real 64-bit hashes
    # in practice, and identical short docs still bucket together)
    res[out_off[:-1][small]] = sizes[small].astype(np.uint64)
    if m > 0 and n_docs:
        sh = tok_h[:m].copy()
        for j in range(1, k):
            sh = sh * np.uint64(1099511628211) ^ tok_h[j : m + j]
        doc_index = np.repeat(np.arange(n_docs), sizes)
        valid = doc_index[:m] == doc_index[k - 1 :]
        win_pos = np.flatnonzero(valid)
        win_doc = doc_index[win_pos]
        dest = out_off[win_doc] + (win_pos - offsets[win_doc])
        res[dest] = sh[valid]
    return res, out_off


def minhash_signatures(
    tokens_list: pa.ListArray, num_perm: int = 64, shingle_k: int = 3, seed: int = 7
) -> np.ndarray:
    """(num_docs, num_perm) uint64 MinHash signature matrix, vectorized via
    np.minimum.reduceat per permutation."""
    a, b = _minhash_params(num_perm, seed)
    flat, offsets = _shingle_hashes(tokens_list, shingle_k)
    n_docs = len(offsets) - 1
    sig = np.empty((n_docs, num_perm), dtype=np.uint64)
    if n_docs == 0:
        return sig
    starts = offsets[:-1]
    for p in range(num_perm):
        vals = (a[p] * flat + b[p]) % _MERSENNE
        sig[:, p] = np.minimum.reduceat(vals, starts) if len(flat) else 0
    return sig


def minhash_band_rows(
    batch: pa.Table,
    id_col: str,
    tokens_col: str,
    num_perm: int,
    bands: int,
    shingle_k: int,
) -> pa.Table:
    """Per-batch: docs → (band, digest, doc_id) rows for the LSH groupby."""
    tokens = batch[tokens_col].combine_chunks()
    sig = minhash_signatures(tokens, num_perm, shingle_k)
    n_docs = sig.shape[0]
    if bands <= 0 or num_perm % bands != 0:
        raise ValueError(
            f"bands ({bands}) must be a positive divisor of "
            f"num_perm ({num_perm}): every permutation belongs to "
            f"exactly one band"
        )
    r = num_perm // bands
    band_ids = np.repeat(np.arange(bands, dtype=np.int32), n_docs)
    digests = np.empty(bands * n_docs, dtype=np.uint64)
    for bd in range(bands):
        seg = np.ascontiguousarray(sig[:, bd * r : (bd + 1) * r])
        # fold the r 64-bit values into one digest
        d = seg[:, 0].copy()
        for j in range(1, r):
            d = d * np.uint64(1099511628211) ^ seg[:, j]
        digests[bd * n_docs : (bd + 1) * n_docs] = d
    ids = batch[id_col].combine_chunks()
    id_rep = pa.concat_arrays([ids] * bands) if bands > 1 else ids
    return pa.table(
        {
            "band": pa.array(band_ids, pa.int32()),
            "digest": pa.array(digests, pa.uint64()),
            id_col: id_rep,
        }
    )


def minhash_candidate_pairs(
    ds,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    num_partitions: int | None = None,
):
    """Dataset(doc_id, tokens) → Dataset(left, right) candidate near-dup
    pairs (docs sharing ≥1 LSH band bucket).

    The shuffle key is a derived int32 hash of (band, digest), so pair
    emission is ONE vectorized UDF call per PARTITION: rows lexsort by
    (band, digest, doc_id) and equal-bucket runs emit star pairs (hub =
    the run's min id, keeping pair count linear in bucket size) with
    pure numpy — never one Python call per bucket (a web corpus has
    ~docs×bands buckets)."""

    if bands <= 0 or num_perm % bands != 0:
        # fail at pipeline construction, not inside every worker task
        raise ValueError(
            f"bands ({bands}) must be a positive divisor of "
            f"num_perm ({num_perm})"
        )
    num_partitions = default_partitions(num_partitions)

    def fn(batch: pa.Table) -> pa.Table:
        return minhash_band_rows(
            batch, id_col, tokens_col, num_perm, bands, shingle_k
        )

    rows = ds.map_batches(fn, batch_format="pyarrow")
    return _band_pairs_from_rows(rows, id_col, num_partitions)


def _band_pairs_from_rows(rows_ds, id_col: str, num_partitions: int):
    """LSH pair emission over a (band, digest, id) row Dataset — shared
    by the one-shot candidate path and the persistent incremental index
    (same band-row multiset in ⇒ byte-identical pairs out)."""

    def add_part(t: pa.Table) -> pa.Table:
        dig = t["digest"].to_numpy(zero_copy_only=False)
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (dig ^ (band * np.uint64(0x9E3779B97F4A7C15))) * np.uint64(
            0xFF51AFD7ED558CCD
        )
        part = ((h >> np.uint64(33)) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    rows = rows_ds.map_batches(add_part, batch_format="pyarrow")

    def partition_pairs(group: pa.Table) -> pa.Table:
        band = group["band"].to_numpy(zero_copy_only=False)
        dig = group["digest"].to_numpy(zero_copy_only=False)
        ids = group[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ids)
        if n < 2:
            return pa.table(
                {"left": pa.array([], pa.int64()), "right": pa.array([], pa.int64())}
            )
        order = np.lexsort((ids, dig, band))
        b_s, d_s, i_s = band[order], dig[order], ids[order]
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (b_s[1:] != b_s[:-1]) | (d_s[1:] != d_s[:-1])
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        tail = ~new_run  # every non-head row pairs with its run's head
        return pa.table(
            {
                "left": pa.array(i_s[run_start[tail]], pa.int64()),
                "right": pa.array(i_s[tail], pa.int64()),
            }
        )

    return (
        rows.groupby("_part")
        .map_groups(
            lambda g: partition_pairs(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def verified_minhash_pairs(
    ds,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    verify_jaccard: float | None = 0.5,
    num_partitions: int | None = None,
    semi_join_broadcast_ids: int = 5_000_000,
    broadcast_verify_docs: int = 100_000,
    materialize_input: bool = False,
):
    """LSH candidate pairs, band-deduped and (by default) VERIFIED with the
    exact k-shingle Jaccard — Dataset(left, right[, jaccard]).

    ``materialize_input`` pins the (tokenized) input in the object store
    so the candidate pass and the verify pack pass don't re-execute the
    upstream tokenize chain — use when the corpus fits (bench scale); at
    100 TB keep False and let the lazy graph re-read.

    Without verification a single band collision unions unrelated
    documents into one cluster (a quality bug at scale); the verify stage
    attaches each candidate pair's two token lists with two int-keyed
    ``lookup_join`` shuffles (the corpus never moves to the driver) and
    recomputes ``ngram_jaccard`` exactly. The per-pair Python set op is
    fine here: pairs ≪ corpus by LSH construction.

    Semi-join reduction: when the DISTINCT pair-member id set fits under
    ``semi_join_broadcast_ids`` it is broadcast (a sorted int64 array —
    ids only, never documents) and the corpus is filtered BEFORE the
    joins, so the join shuffles move only pair-member documents instead
    of the whole corpus. Above the bound the joins take the full corpus
    — still distributed, just wider.

    Broadcast verify fast path: when the member set is additionally
    under ``broadcast_verify_docs``, the members' packed token strings
    are collected once and broadcast, and verification is ONE stateless
    map_batches over the pairs — zero join shuffles. Bounded
    driver/broadcast state with the distributed joins as the fallback,
    the same threshold pattern as ``driver_cc_threshold``. The verify
    join width is also sized to the materialized pair count (never 64
    near-empty partitions for a few hundred pairs).
    """
    import ray

    from phrasekit_ray.stages.agg import grouped_count, lookup_join

    if materialize_input:
        ds = ds.materialize()
    cand = minhash_candidate_pairs(ds, id_col, tokens_col, num_perm, bands, shingle_k)
    # a pair surfacing in several bands must verify once, not per band
    pairs = grouped_count(cand, ["left", "right"], count_col="_nb").materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(
            pa.table(
                {"left": pa.array([], pa.int64()), "right": pa.array([], pa.int64())}
            )
        )
    if verify_jaccard is None:
        return pairs.map_batches(
            lambda b: b.select(["left", "right"]), batch_format="pyarrow"
        )
    # the pair count is already materialized — size the verify joins to
    # the DATA, not the cluster: ~50k pairs per partition, capped at the
    # cluster-derived width (a handful of pairs should not fan out into
    # 64 near-empty shuffle partitions of pure scheduling overhead)
    num_partitions = max(2, min(
        default_partitions(num_partitions), -(-n_pairs // 50_000)
    ))

    member_ref = None
    if 2 * n_pairs <= semi_join_broadcast_ids:
        members: set[int] = set()
        for b in pairs.iter_batches(batch_format="pyarrow"):
            members.update(b["left"].to_pylist())
            members.update(b["right"].to_pylist())
        member_ref = ray.put(np.asarray(sorted(members), dtype=np.int64))

    # pack each token list into one \x1f-delimited string so the shuffle
    # moves a single string column (tokens are whitespace-split upstream,
    # so the separator is collision-free)
    def pack(b: pa.Table) -> pa.Table:
        ids_arr = b[id_col].cast(pa.int64())
        toks = b[tokens_col]
        if member_ref is not None:
            from phrasekit_ray.stages.score import _get_broadcast

            allow = _get_broadcast(member_ref)
            vid = ids_arr.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(allow, vid)
            pos_c = np.minimum(pos, len(allow) - 1)
            keep = allow[pos_c] == vid
            mask = pa.array(keep)
            ids_arr = ids_arr.filter(mask)
            toks = toks.filter(mask)
        packed = pc.binary_join(
            toks.combine_chunks().cast(pa.list_(pa.string())), "\x1f"
        )
        return pa.table({"_vid": ids_arr, "_packed": packed.cast(pa.string())})

    # bounded broadcast fast path (same pattern as driver_cc_threshold:
    # driver/broadcast state bounded by a threshold, distributed
    # fallback above it): when the pair-member doc set is small, collect
    # the members' PACKED token strings once, ray.put them, and verify
    # every candidate pair in ONE stateless map_batches over the pairs —
    # zero join shuffles. Above the bound, the two lookup_join shuffles
    # below remain the scale path.
    if member_ref is not None and len(members) <= broadcast_verify_docs:
        packed_docs: dict[int, str] = {}
        for b in ds.map_batches(pack, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            packed_docs.update(
                zip(b["_vid"].to_pylist(), b["_packed"].to_pylist())
            )
        docs_ref = ray.put(packed_docs)
        thr_b = float(verify_jaccard)
        k_b = shingle_k

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            from phrasekit_ray.stages.score import _get_broadcast

            lookup = _get_broadcast(docs_ref)
            lids = batch["left"].to_pylist()
            rids = batch["right"].to_pylist()
            j = np.fromiter(
                (
                    ngram_jaccard(
                        lookup[l].split("\x1f"), lookup[r].split("\x1f"), k_b
                    )
                    for l, r in zip(lids, rids)
                ),
                dtype=np.float64,
                count=len(lids),
            )
            keep = j >= thr_b
            return pa.table(
                {
                    "left": batch["left"].cast(pa.int64()),
                    "right": batch["right"].cast(pa.int64()),
                    "jaccard": pa.array(j, pa.float64()),
                }
            ).filter(pa.array(keep))

        return pairs.map_batches(verify_broadcast, batch_format="pyarrow")

    # tokenize+pack runs ONCE; the two join sides are cheap renames over
    # the materialized blocks
    packed = ds.map_batches(pack, batch_format="pyarrow").materialize()

    def rename_packed(col):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({"_vid": b["_vid"], col: b["_packed"]})

        return fn

    docs_l = packed.map_batches(rename_packed("tokens_l"), batch_format="pyarrow")
    docs_r = packed.map_batches(rename_packed("tokens_r"), batch_format="pyarrow")
    # explicit schemas: inference on the lazy inner join output would
    # re-execute its shuffle just to learn the schema
    pairs_schema = pa.schema(
        [("left", pa.int64()), ("right", pa.int64()), ("_nb", pa.int64())]
    )
    dl_schema = pa.schema([("_vid", pa.int64()), ("tokens_l", pa.string())])
    dr_schema = pa.schema([("_vid", pa.int64()), ("tokens_r", pa.string())])
    j1_schema = pa.schema(
        [("left", pa.int64()), ("right", pa.int64()), ("_nb", pa.int64()),
         ("tokens_l", pa.string())]
    )
    joined = lookup_join(
        lookup_join(pairs, docs_l, "left", "_vid", num_partitions,
                    left_schema=pairs_schema, right_schema=dl_schema),
        docs_r,
        "right",
        "_vid",
        num_partitions,
        left_schema=j1_schema,
        right_schema=dr_schema,
    )
    thr = float(verify_jaccard)
    k = shingle_k

    def verify(batch: pa.Table) -> pa.Table:
        tl = batch["tokens_l"].to_pylist()
        tr = batch["tokens_r"].to_pylist()
        j = np.fromiter(
            (
                ngram_jaccard(a.split("\x1f"), b.split("\x1f"), k)
                for a, b in zip(tl, tr)
            ),
            dtype=np.float64,
            count=len(tl),
        )
        keep = j >= thr
        return pa.table(
            {
                "left": batch["left"].cast(pa.int64()),
                "right": batch["right"].cast(pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            }
        ).filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow")


def near_dedup_minhash(
    ds,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    verify_jaccard: float | None = 0.5,
    num_partitions: int | None = None,
    driver_cc_threshold: int = 2_000_000,
    materialize_input: bool = False,
) -> dict[int, int]:
    """Full near-dedup: LSH candidates → exact-Jaccard verification →
    connected components → {doc_id: rep_id} for docs in duplicate
    clusters (rep = component min id).

    Scale shape: pairs are verified distributedly
    (``verified_minhash_pairs``); components run on the driver only while
    the VERIFIED pair count stays under ``driver_cc_threshold``, else via
    ``connected_components_distributed`` (hash-min label propagation) —
    driver memory is bounded by the threshold, never by the corpus. The
    returned dict is inherently driver-sized (cluster members only, ≪
    corpus after verification); use the pair/label Datasets directly for
    a fully streaming consumer.
    """
    from phrasekit_ray.stages.kg import UnionFind, connected_components_distributed

    pairs = verified_minhash_pairs(
        ds, id_col, tokens_col, num_perm, bands, shingle_k, verify_jaccard,
        num_partitions, materialize_input=materialize_input,
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return {}
    if n_pairs <= driver_cc_threshold:
        uf = UnionFind()
        members: set[int] = set()
        for b in pairs.iter_batches(batch_format="pyarrow"):
            for l, r in zip(b["left"].to_pylist(), b["right"].to_pylist()):
                uf.union(int(l), int(r))
                members.add(int(l))
                members.add(int(r))
        return {m: uf.find(m) for m in members}
    labels = connected_components_distributed(pairs, "left", "right")
    out: dict[int, int] = {}
    for b in labels.iter_batches(batch_format="pyarrow"):
        for n, lab in zip(b["node"].to_pylist(), b["label"].to_pylist()):
            out[int(n)] = int(lab)
    return out


# --- simhash ---------------------------------------------------------------

def simhash_fingerprints(ds, id_col: str = "doc_id", tokens_col: str = "tokens"):
    """Dataset(doc_id, tokens) → Dataset(doc_id, simhash: uint64).

    Classic 64-bit SimHash: per-token 64-bit hash, bit-votes weighted by
    term frequency, sign → bits. Fully in-block (no shuffle)."""

    def fn(batch: pa.Table) -> pa.Table:
        tokens = batch[tokens_col].combine_chunks()
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        offsets = offsets - base
        flat = tokens.values.slice(base, int(offsets[-1]))
        th = _token_hashes(flat)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        ) * 2 - 1
        starts = offsets[:-1]
        n_docs = len(starts)
        fp = np.zeros(n_docs, dtype=np.uint64)
        if len(th):
            # trailing zero-token docs have start == len(bits), which
            # reduceat rejects; clamp (their rows are masked below)
            votes = np.add.reduceat(
                bits, np.minimum(starts, len(th) - 1), axis=0
            )
            # docs with zero tokens: reduceat duplicates next row; mask below
            sizes = np.diff(offsets)
            fpbits = (votes > 0).astype(np.uint64)
            fp = (fpbits << np.arange(64, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            fp[sizes == 0] = 0
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(fp, pa.uint64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# --- n-gram jaccard (verification kernel) ----------------------------------

def _shingle_set(tokens: list[str], k: int) -> set[tuple[str, ...]]:
    """k-shingle set; a doc shorter than k contributes its whole token
    tuple as a single shingle, so two short docs compare by exact
    equality instead of the degenerate empty-set case (two UNRELATED
    short docs must NOT verify as near-dups — the LSH length-sentinel
    buckets all same-length short docs together, and verification is
    what rejects the non-identical ones)."""
    if len(tokens) < k:
        return {tuple(tokens)}
    return {tuple(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def ngram_jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    """Exact k-shingle Jaccard similarity of two token sequences (the
    verification step after LSH candidate generation). Docs shorter than
    k shingle to their full token tuple (see _shingle_set)."""
    sa = _shingle_set(tokens_a, k)
    sb = _shingle_set(tokens_b, k)
    return len(sa & sb) / len(sa | sb)


def _shingle_extract_fn(k: int, id_col: str, tokens_col: str):
    """Vectorized per-block DISTINCT k-shingle extractor (shingle = the
    space-joined k-gram string, same windowing as the miner):
    Table(doc_id, tokens) → Table(doc_id, shingle). Block-local distinct
    is global distinct because one doc never splits across blocks."""

    def shingles(batch: pa.Table) -> pa.Table:
        tokens = batch[tokens_col].combine_chunks()
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        offsets = offsets - base
        flat = tokens.values.slice(base, int(offsets[-1]))
        sizes = np.diff(offsets)
        L = int(offsets[-1])
        m = L - k + 1
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        if m <= 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shingle": pa.array([], pa.string()),
                }
            )
        doc_index = np.repeat(np.arange(len(sizes)), sizes)
        parts = [flat.slice(j, m) for j in range(k)]
        joined = pc.binary_join_element_wise(*parts, " ")
        valid = doc_index[:m] == doc_index[k - 1 :]
        win_doc = doc_index[:m][valid]
        joined = joined.filter(pa.array(valid))
        t = pa.table(
            {
                "doc_id": pa.array(doc_ids[win_doc], pa.int64()),
                "shingle": joined.cast(pa.string()),
            }
        )
        return t.group_by(["doc_id", "shingle"]).aggregate([])

    return shingles


def _shingle_pair_with_sizes(
    ds,
    k: int = 3,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_docs_per_shingle: int | None = None,
    num_partitions: int | None = None,
):
    """Shared set-similarity-join core: Dataset(doc_id, tokens) →
    Dataset(left, right, n=|A∩B|, n_left=|A|, n_right=|B|) over every
    unordered doc pair sharing ≥1 distinct k-shingle (left < right), or
    ``None`` when no pair co-occurs.

    Shape (all-pairs via inverted index, the classic set-similarity join):
      1. per-doc DISTINCT shingles (stateless map_batches; shingle = the
         space-joined k-gram string, same windowing as the miner);
      2. per-doc shingle-set sizes as a Dataset (one int row per doc),
         hash-joined onto the pair counts in step 4 — never collected to
         the driver, so driver memory is corpus-size-independent;
      3. groupby(shingle).map_groups emitting co-occurring (left, right)
         pairs — ``max_docs_per_shingle`` drops hotter-than-bound shingles
         (a standard prefix-filter-style cap: at web scale a shingle shared
         by thousands of docs contributes no discriminative signal but
         quadratic pairs; None = exact, keep everything);
      4. hash_aggregate pair intersection counts → two int-keyed size
         joins.

    Every stage shuffles by shingle / pair / doc key and stays fully
    distributed end to end. Consumers: ``jaccard_pairs`` (symmetric
    |A∩B|/|A∪B| filter) and ``containment_pairs`` (directed |A∩B|/|A|
    filter).
    """
    from phrasekit_ray.stages.agg import default_partitions

    num_partitions = default_partitions(num_partitions)
    import ray

    sh = ds.map_batches(
        _shingle_extract_fn(k, id_col, tokens_col), batch_format="pyarrow"
    )
    # docs never split across blocks upstream of here (one doc, one row),
    # so in-block distinct == global distinct. Per-doc shingle-set sizes
    # stay a DATASET (one row per doc) and are hash-joined onto the pair
    # counts below — never collected to the driver or broadcast, so driver
    # memory is O(1) in corpus size.
    from phrasekit_ray.stages.agg import grouped_count

    sizes = grouped_count(sh, "doc_id", count_col="n_shingles").materialize()

    # co-locate equal shingles by hash partition; one vectorized UDF call
    # per PARTITION (not per shingle) finds equal-shingle runs and emits
    # all co-occurrence pairs
    raw_pairs = _cooccurring_raw_pairs(sh, num_partitions, max_docs_per_shingle)
    pair_counts = hash_aggregate(
        raw_pairs, ["left", "right"], [("n", "sum")], num_partitions=num_partitions
    )

    # pairs ≪ corpus; materialize once so the pair pipeline runs a single
    # time ahead of the two joins, and short-circuit the empty case
    pair_counts = pair_counts.materialize()
    if pair_counts.count() == 0:
        return None
    return _attach_pair_sizes(pair_counts, sizes, num_partitions)


def _cooccurring_raw_pairs(sh, num_partitions: int, max_docs_per_shingle=None):
    """Dataset(doc_id, shingle) → raw unordered co-occurrence pair rows
    (left < right, n = 1) via ONE hash-partition-by-shingle shuffle and
    one vectorized run-scan per partition (shared by the exact and the
    prefix-filtered set-similarity joins)."""
    import zlib

    def add_part(batch: pa.Table) -> pa.Table:
        p = np.fromiter(
            (zlib.crc32(s.encode()) for s in batch["shingle"].to_pylist()),
            dtype=np.uint32,
            count=batch.num_rows,
        )
        return batch.append_column(
            "_part", pa.array((p % np.uint32(num_partitions)).astype(np.int32))
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        codes_arr = group["shingle"].combine_chunks().dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        codes, ids = codes[order], ids[order]
        boundaries = np.flatnonzero(np.diff(codes)) + 1
        runs = np.concatenate(([0], boundaries, [len(codes)]))
        lefts, rights = [], []
        for a, b in zip(runs[:-1], runs[1:]):
            d = b - a
            if d < 2 or (
                max_docs_per_shingle is not None and d > max_docs_per_shingle
            ):
                continue
            iu = np.triu_indices(d, 1)
            lefts.append(ids[a:b][iu[0]])
            rights.append(ids[a:b][iu[1]])
        if not lefts:
            return pa.table(
                {
                    "left": pa.array([], pa.int64()),
                    "right": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        left = np.concatenate(lefts)
        right = np.concatenate(rights)
        return pa.table(
            {
                "left": pa.array(left, pa.int64()),
                "right": pa.array(right, pa.int64()),
                "n": pa.array(np.ones(len(left), dtype=np.int64)),
            }
        )

    return (
        sh.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: partition_pairs(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def _attach_pair_sizes(pair_counts, sizes, num_partitions: int):
    """Join per-doc shingle-set sizes onto (left, right, n) pair counts:
    two int-keyed lookup_join shuffles (left side, then right side)
    instead of a driver-built broadcast dict."""
    from phrasekit_ray.stages.agg import lookup_join

    def size_as(col: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id": b["doc_id"], col: b["n_shingles"]})

        return fn

    sizes_l = sizes.map_batches(size_as("n_left"), batch_format="pyarrow")
    sizes_r = sizes.map_batches(size_as("n_right"), batch_format="pyarrow")
    # explicit schemas (see verified_minhash_pairs): no double execution
    pc_schema = pa.schema(
        [("left", pa.int64()), ("right", pa.int64()), ("n", pa.int64())]
    )
    sl_schema = pa.schema([("doc_id", pa.int64()), ("n_left", pa.int64())])
    sr_schema = pa.schema([("doc_id", pa.int64()), ("n_right", pa.int64())])
    j1_schema = pa.schema(
        [("left", pa.int64()), ("right", pa.int64()), ("n", pa.int64()),
         ("n_left", pa.int64())]
    )
    return lookup_join(
        lookup_join(pair_counts, sizes_l, "left", "doc_id", num_partitions,
                    left_schema=pc_schema, right_schema=sl_schema),
        sizes_r,
        "right",
        "doc_id",
        num_partitions,
        left_schema=j1_schema,
        right_schema=sr_schema,
    )


def jaccard_pairs(
    ds,
    k: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_docs_per_shingle: int | None = None,
    num_partitions: int | None = None,
):
    """Distributed EXACT k-shingle Jaccard near-dup pairs over a corpus:
    Dataset(doc_id, tokens) → Dataset(left, right, jaccard ≥ threshold).
    See ``_shingle_pair_with_sizes`` for the inverted-index shape; this
    wrapper applies the symmetric |A∩B| / (|A|+|B|−|A∩B|) filter."""
    import ray

    with_both = _shingle_pair_with_sizes(
        ds, k, id_col, tokens_col, max_docs_per_shingle, num_partitions
    )
    if with_both is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "left": pa.array([], pa.int64()),
                    "right": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )

    def jaccard_filter(batch: pa.Table) -> pa.Table:
        inter = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["n_left"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["n_right"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = inter / (na + nb - inter)
        keep = j >= threshold
        return pa.table(
            {
                "left": batch["left"].cast(pa.int64()),
                "right": batch["right"].cast(pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            }
        ).filter(pa.array(keep))

    return with_both.map_batches(jaccard_filter, batch_format="pyarrow")


def containment_pairs(
    ds,
    k: int = 3,
    min_containment_micro: int = 800_000,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_docs_per_shingle: int | None = None,
    num_partitions: int | None = None,
):
    """Distributed DIRECTED shingle-containment join (Broder's containment
    C(A→B) = |A∩B| / |A| — the quote / partial-duplication / subset
    detector Jaccard misses: a paragraph pasted into a much larger page
    scores near-zero Jaccard but containment ≈ 1 in the src→dst
    direction): Dataset(doc_id, tokens) →
    Dataset(src, dst, n_inter, n_src, cont_micro ≥ bound).

    Same inverted-index core as ``jaccard_pairs``
    (``_shingle_pair_with_sizes``); the final map emits BOTH directions
    of each co-occurring unordered pair and keeps those meeting the
    bound, with cont_micro = 10⁶·|A∩B| // |A| in exact int64 so the SQL
    twin hash-matches."""
    import ray

    with_both = _shingle_pair_with_sizes(
        ds, k, id_col, tokens_col, max_docs_per_shingle, num_partitions
    )
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "n_inter": pa.array([], pa.int64()),
            "n_src": pa.array([], pa.int64()),
            "cont_micro": pa.array([], pa.int64()),
        }
    )
    if with_both is None:
        return ray.data.from_arrow(empty)

    def containment_filter(batch: pa.Table) -> pa.Table:
        inter = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        l = batch["left"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["right"].to_numpy(zero_copy_only=False).astype(np.int64)
        nl = batch["n_left"].to_numpy(zero_copy_only=False).astype(np.int64)
        nr = batch["n_right"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate((l, r))
        dst = np.concatenate((r, l))
        ns = np.concatenate((nl, nr))
        ii = np.concatenate((inter, inter))
        cont = np.int64(10**6) * ii // np.maximum(ns, 1)
        keep = cont >= min_containment_micro
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
                "n_inter": pa.array(ii[keep], pa.int64()),
                "n_src": pa.array(ns[keep], pa.int64()),
                "cont_micro": pa.array(cont[keep], pa.int64()),
            }
        )

    return with_both.map_batches(containment_filter, batch_format="pyarrow")


# --- embedding cosine near-dup ---------------------------------------------

def embedding_near_dup_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 11,
    num_partitions: int | None = None,
):
    """Dataset(vec_id, embedding) → Dataset(left, right, cosine) near-dup
    pairs. Scale path: random-hyperplane LSH buckets (sign bits of
    `num_planes` projections) so only same-bucket vectors are compared;
    exact cosine verification inside each bucket.

    Shuffle key = bucket hash mod P: ONE verify UDF call per PARTITION,
    iterating its bucket segments (the per-bucket matmul is the real
    work; the per-bucket Python overhead is amortized across the
    partition, not paid once per bucket key)."""
    from phrasekit_ray.stages.agg import default_partitions

    num_partitions = default_partitions(num_partitions)

    def buckets(batch: pa.Table) -> pa.Table:
        emb = batch[vec_col].combine_chunks()
        offsets = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
        mat = (
            emb.values.slice(base, int(offsets[-1] - offsets[0]))
            .to_numpy(zero_copy_only=False)
            .reshape(len(batch), dim)
            .astype(np.float32)
        )
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, num_planes)).astype(np.float32)
        signs = (mat @ planes) > 0
        key = (signs.astype(np.uint64) << np.arange(num_planes, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        part = (
            (key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        ) % np.uint64(num_partitions)
        return pa.table(
            {
                "bucket": pa.array(key, pa.uint64()),
                id_col: batch[id_col],
                "unit": pa.array(list(unit), pa.list_(pa.float32())),
                "_part": pa.array(part.astype(np.int32), pa.int32()),
            }
        )

    def verify_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "left": pa.array([], pa.int64()),
                "right": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float32()),
            }
        )
        n = group.num_rows
        if n < 2:
            return empty
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        emb = group["unit"].combine_chunks()
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        dim = int(offs[1] - offs[0])
        mat = (
            emb.values.slice(offs[0], int(offs[-1] - offs[0]))
            .to_numpy(zero_copy_only=False)
            .reshape(n, dim)
        )
        order = np.argsort(bucket, kind="stable")
        bucket, ids, mat = bucket[order], ids[order], mat[order]
        seg = np.flatnonzero(np.concatenate(([True], bucket[1:] != bucket[:-1])))
        seg_end = np.concatenate((seg[1:], [n]))
        lefts, rights, coss = [], [], []
        for a, b in zip(seg, seg_end):
            d = b - a
            if d < 2:
                continue
            sub = mat[a:b]
            sid = ids[a:b]
            sim = sub @ sub.T
            iu, ju = np.triu_indices(d, k=1)
            keep = sim[iu, ju] >= threshold
            lefts.append(np.minimum(sid[iu[keep]], sid[ju[keep]]))
            rights.append(np.maximum(sid[iu[keep]], sid[ju[keep]]))
            coss.append(sim[iu, ju][keep].astype(np.float32))
        if not lefts:
            return empty
        return pa.table(
            {
                "left": pa.array(np.concatenate(lefts), pa.int64()),
                "right": pa.array(np.concatenate(rights), pa.int64()),
                "cosine": pa.array(np.concatenate(coss), pa.float32()),
            }
        )

    return (
        ds.map_batches(buckets, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: verify_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


# --- benchmark decontamination ---------------------------------------------

def _shingle_rows(batch: pa.Table, id_col: str, tokens_col: str, k: int) -> pa.Table:
    """(doc_id, shingle) rows, DISTINCT within the doc — space-joined
    k-gram strings, the same windowing as the miner/jaccard stages.
    Docs shorter than k contribute nothing (a sub-k-gram overlap is not
    contamination evidence)."""
    tokens = batch[tokens_col].combine_chunks()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base = offsets[0]
    offsets = offsets - base
    flat = tokens.values.slice(base, int(offsets[-1]))
    sizes = np.diff(offsets)
    L = int(offsets[-1])
    m = L - k + 1
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
    if m <= 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "shingle": pa.array([], pa.string())}
        )
    doc_index = np.repeat(np.arange(len(sizes)), sizes)
    parts = [flat.slice(j, m) for j in range(k)]
    joined = pc.binary_join_element_wise(*parts, " ")
    valid = doc_index[:m] == doc_index[k - 1 :]
    win_doc = doc_index[:m][valid]
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids[win_doc], pa.int64()),
            "shingle": joined.filter(pa.array(valid)).cast(pa.string()),
        }
    )
    return t.group_by(["doc_id", "shingle"]).aggregate([])


def contaminated_docs(
    train_ds,
    bench_ds,
    k: int = 3,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    broadcast_shingles: int = 5_000_000,
    num_partitions: int | None = None,
):
    """Benchmark decontamination: training docs sharing at least one
    k-token shingle with a benchmark corpus →
    Dataset(doc_id, n_shared) where n_shared = DISTINCT shared shingles
    (the op every LLM data pipeline runs before training — Brown et al.
    2020 §C style n-gram overlap).

    Physical paths, chosen by the benchmark's distinct-shingle count:
    - small benchmark (the common case — benchmarks are tiny next to a
      training corpus): the DISTINCT shingle strings broadcast once
      (ray.put) and every train block tests membership with ONE
      vectorized ``pc.is_in`` — no shuffle at all;
    - large benchmark: both sides hash-partition by shingle (conformed
      union, one in-partition sorted membership pass per partition),
      then a grouped count by doc — fully distributed.
    """
    from phrasekit_ray.stages.agg import (
        _part_column,
        default_partitions,
        grouped_count,
        hash_aggregate,
    )

    import ray

    num_partitions = default_partitions(num_partitions)

    def bench_shingles(b: pa.Table) -> pa.Table:
        t = (
            _shingle_rows(b, id_col, tokens_col, k)
            .group_by(["shingle"])
            .aggregate([])
        )
        return t.append_column("_one", pa.array(np.ones(t.num_rows, np.int64)))

    bench_sh = hash_aggregate(
        bench_ds.map_batches(bench_shingles, batch_format="pyarrow"),
        ["shingle"],
        [("_one", "sum")],
        num_partitions=num_partitions,
    )

    # try the broadcast path under the bound
    collected: list[str] = []
    over = False
    for b in bench_sh.iter_batches(batch_format="pyarrow"):
        collected.extend(b["shingle"].to_pylist())
        if len(collected) > broadcast_shingles:
            over = True
            break

    if not over:
        value_set = pa.array(sorted(collected), pa.string())
        ref = ray.put(value_set)

        def hits(batch: pa.Table) -> pa.Table:
            from phrasekit_ray.stages.score import _get_broadcast

            vs = _get_broadcast(ref)
            t = _shingle_rows(batch, id_col, tokens_col, k)
            mask = pc.is_in(t["shingle"], value_set=vs)
            t = t.filter(mask)
            # one doc's rows never split across blocks upstream, so the
            # in-block count per doc is the exact distinct-hit count
            out = t.group_by(["doc_id"]).aggregate([("shingle", "count")])
            return out.rename_columns(["doc_id", "n_shared"])

        return train_ds.map_batches(hits, batch_format="pyarrow")

    # distributed fallback: conformed union partitioned by shingle
    def conform_train(batch: pa.Table) -> pa.Table:
        t = _shingle_rows(batch, id_col, tokens_col, k)
        t = t.append_column("_isb", pa.array(np.zeros(t.num_rows, np.int8)))
        return t.append_column(
            "_part", _part_column(t, ["shingle"], num_partitions)
        )

    def conform_bench(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
                "shingle": batch["shingle"],
            }
        )
        t = t.append_column("_isb", pa.array(np.ones(t.num_rows, np.int8)))
        return t.append_column(
            "_part", _part_column(t, ["shingle"], num_partitions)
        )

    unioned = train_ds.map_batches(conform_train, batch_format="pyarrow").union(
        bench_sh.map_batches(conform_bench, batch_format="pyarrow")
    )

    def per_partition(group: pa.Table) -> pa.Table:
        sh = np.asarray(group["shingle"].to_pylist(), dtype=object)
        isb = group["_isb"].to_numpy(zero_copy_only=False).astype(bool)
        docs = group["doc_id"].to_numpy(zero_copy_only=False)
        bench_set = set(sh[isb])
        keep = np.fromiter(
            (s in bench_set for s in sh), dtype=bool, count=len(sh)
        ) & ~isb
        return pa.table(
            {"doc_id": pa.array(docs[keep], pa.int64())}
        )

    flagged = (
        unioned.groupby("_part")
        .map_groups(
            lambda g: per_partition(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
    return grouped_count(flagged, ["doc_id"], count_col="n_shared",
                         num_partitions=num_partitions)


def chunk_dedup(
    ds,
    chunk_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """Corpus-wide chunk-level (paragraph-style) dedup, CCNet-shaped:
    split every document into consecutive ``chunk_tokens``-token chunks,
    keep only the globally FIRST occurrence of each distinct chunk text
    (order = (doc_id, chunk_idx)), and reconstruct each document from its
    surviving chunks.

    Scale shape: ZERO joins on the corpus — the groupby(chunk).min(order
    key) argmin IS the kept instance (doc id and chunk position decode
    from the packed order key), so the only all-to-all is one string-key
    aggregate whose in-block combine already collapses repeats; document
    reconstruction is a partition-by-doc map with one vectorized
    ListArray+binary_join per partition (never per-doc Python). Chunk
    texts are compared EXACTLY (full string as the group key, no hash
    truncation → no collision risk).

    Requires integer-string doc ids (the testdata contract) and
    chunk_idx < 2^20 per document (1M chunks ≈ 20M tokens/doc).
    """
    from phrasekit_ray.stages.agg import default_partitions, hash_aggregate, lookup_join

    num_partitions = default_partitions(num_partitions)
    # doc ids round-trip through the packed int64 order key; emit them in
    # the INPUT's type (string at some scale factors, int at others)
    in_schema = ds.schema(fetch_if_missing=True)
    id_type = dict(zip(in_schema.names, in_schema.types))[id_col]
    id_type = id_type if isinstance(id_type, pa.DataType) else pa.int64()

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        did = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy()
        sizes = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        n_chunks = np.maximum((sizes + chunk_tokens - 1) // chunk_tokens, 1)
        max_c = int(n_chunks.max()) if len(n_chunks) else 0
        if max_c > 1 << 20:
            # the packed order key is did*2^20 + chunk_idx with chunk_idx
            # < n_chunks, so exactly 2^20 chunks (max idx 2^20-1) still
            # fits; beyond that a doc would silently collide into the
            # next doc_id's key space
            raise ValueError(
                f"chunk_dedup: document with {max_c} chunks exceeds the "
                f"2^20 packed-key limit (~{chunk_tokens * (1 << 20)} "
                "tokens/doc); raise chunk_tokens or pre-split the doc"
            )
        okeys, chunks = [], []
        for ci in range(max_c):
            live = np.flatnonzero(n_chunks > ci)
            sl = pc.list_slice(
                toks, ci * chunk_tokens, (ci + 1) * chunk_tokens
            )
            joined = pc.binary_join(sl, " ")
            chunks.append(joined.take(pa.array(live)))
            okeys.append(did[live] * np.int64(1 << 20) + np.int64(ci))
        if not okeys:
            return pa.table(
                {"chunk": pa.array([], pa.string()), "okey": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "chunk": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in chunks]
                ),
                "okey": pa.array(np.concatenate(okeys), pa.int64()),
            }
        )

    def totals(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        did = batch[id_col].combine_chunks().cast(pa.int64())
        sizes = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        n_chunks = np.maximum((sizes + chunk_tokens - 1) // chunk_tokens, 1)
        return pa.table(
            {"did": did, "n_total": pa.array(n_chunks.astype(np.int64), pa.int64())}
        )

    kept = hash_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        "chunk",
        [("okey", "min")],
        num_partitions=num_partitions,
    )

    def part_by_doc(batch: pa.Table) -> pa.Table:
        okey = batch["okey"].combine_chunks().to_numpy()
        did = okey >> np.int64(20)
        h = (did.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("_part", pa.array(part, pa.int32()))

    def rebuild(group: pa.Table) -> pa.Table:
        okey = group["okey"].combine_chunks().to_numpy()
        if len(okey) == 0:
            return pa.table(
                {
                    "did": pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_kept": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(okey, kind="stable")
        okey_s = okey[order]
        chunks_s = group["chunk"].combine_chunks().take(pa.array(order))
        did_s = okey_s >> np.int64(20)
        new_doc = np.concatenate(([True], did_s[1:] != did_s[:-1]))
        seg_starts = np.flatnonzero(new_doc)
        offsets = np.concatenate((seg_starts, [len(okey_s)])).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), chunks_s)
        joined = pc.binary_join(lists, " ")
        return pa.table(
            {
                "did": pa.array(did_s[seg_starts], pa.int64()),
                "clean_text": joined,
                "n_kept": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
            }
        )

    docs_out = (
        kept.map_batches(part_by_doc, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: rebuild(g.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )
    with_totals = lookup_join(
        docs_out,
        ds.map_batches(totals, batch_format="pyarrow"),
        "did",
        "did",
        num_partitions=num_partitions,
        left_schema=pa.schema(
            [("did", pa.int64()), ("clean_text", pa.string()), ("n_kept", pa.int64())]
        ),
        right_schema=pa.schema([("did", pa.int64()), ("n_total", pa.int64())]),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["did"].cast(id_type),
                "clean_text": batch["clean_text"],
                "n_kept": batch["n_kept"],
                "n_total": batch["n_total"],
            }
        )

    return with_totals.map_batches(finish, batch_format="pyarrow")


def _ed_le1(a: str, b: str) -> bool:
    """Exact Levenshtein ≤ 1 check (lengths already within 1)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is one longer: single-gap walk
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_token_pairs(
    ds,
    tok_col: str = "tok",
    min_len: int = 3,
    num_partitions: int | None = None,
    hot_variant_cap: int = 10_000,
):
    """All unordered DISTINCT token pairs (a < b) with Levenshtein
    distance ≤ 1 — the SymSpell deletion-neighborhood fuzzy self-join
    (public algorithm): ed(a,b) ≤ 1 ⟺ ({a} ∪ del1(a)) ∩ ({b} ∪ del1(b))
    ≠ ∅, so candidates are exactly the pairs sharing a deletion-variant
    key, then verified exactly.

    Scale shape: distinct tokens via one hash aggregate; variants are
    generated VECTORIZED (one utf8_slice + concat kernel pass per
    deletion position, like the chunk stride loop); candidate pairs come
    from per-variant segment enumeration inside hash partitions with a
    ``hot_variant_cap`` guard (a variant shared by k tokens contributes
    C(k,2) pairs — the cap bounds the one quadratic step); the exact
    ≤1 check runs only on surviving candidates. Variant keys slice by
    UTF-8 code units — exact for ASCII tokens; multi-byte code points
    may over-generate candidates but never break the exact verify.
    """
    from phrasekit_ray.stages.agg import default_partitions, hash_aggregate

    num_partitions = default_partitions(num_partitions)

    from phrasekit_ray.stages.agg import grouped_count

    def distinct_prep(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_trim_whitespace(batch[tok_col].combine_chunks())
        keep = pc.greater_equal(pc.utf8_length(toks), min_len)
        # in-block distinct before the shuffle
        return pa.table({"tok": toks.filter(keep)}).group_by(["tok"]).aggregate([])

    tokens = grouped_count(
        ds.map_batches(distinct_prep, batch_format="pyarrow"),
        "tok",
        num_partitions=num_partitions,
    ).map_batches(lambda b: b.select(["tok"]), batch_format="pyarrow")

    def variants(batch: pa.Table) -> pa.Table:
        toks = batch["tok"].combine_chunks()
        lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
        outs_v, outs_t = [toks], [toks]
        max_len = int(lens.max()) if len(lens) else 0
        for d in range(max_len):
            live = pa.array(lens > d)
            sub = toks.filter(live)
            head = pc.utf8_slice_codeunits(sub, 0, d)
            tail = pc.utf8_slice_codeunits(sub, d + 1, 1 << 30)
            outs_v.append(pc.binary_join_element_wise(head, tail, ""))
            outs_t.append(sub)
        v = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in outs_v])
        t = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in outs_t])
        from phrasekit_ray.stages.agg import _hash_string_array

        # deterministic cross-process hash, vectorized over the Arrow
        # buffers (same variant MUST land on the same partition; Python
        # hash() is seeded per process)
        h = _hash_string_array(v).astype(np.int64)
        return pa.table(
            {
                "v": v,
                "tok": t,
                "_part": pa.array(
                    (h % num_partitions).astype(np.int32), pa.int32()
                ),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        # Arrow-native end to end (no to_pandas, no per-pair Python):
        # sort by (variant, token), drop duplicate (variant, token)
        # rows, then expand within-variant position pairs with the same
        # vectorized stride kernel cooccurrence_edges uses. Within a
        # segment tokens are sorted ascending and distinct, so
        # t_s[i] < t_s[j] for every emitted (i, j) — no swap needed.
        from phrasekit_ray.stages.kg import _segment_pair_positions

        empty = pa.table(
            {
                "left_tok": pa.array([], pa.string()),
                "right_tok": pa.array([], pa.string()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        order = pc.sort_indices(
            group, sort_keys=[("v", "ascending"), ("tok", "ascending")]
        )
        v_s = group["v"].take(order).combine_chunks()
        t_s = group["tok"].take(order).combine_chunks()

        def _neq_shift(arr):
            return pc.not_equal(arr.slice(1), arr.slice(0, len(arr) - 1)).to_numpy(
                zero_copy_only=False
            )

        keep = np.concatenate(([True], _neq_shift(v_s) | _neq_shift(t_s)))
        if not keep.all():
            mask = pa.array(keep)
            v_s = v_s.filter(mask)
            t_s = t_s.filter(mask)
        if len(v_s) == 0:
            return empty
        seg_id = np.cumsum(np.concatenate(([True], _neq_shift(v_s)))) - 1
        lens = np.bincount(seg_id)
        if (lens > hot_variant_cap).any():
            raise ValueError(
                f"fuzzy_token_pairs: a deletion variant is shared by "
                f"{int(lens.max())} tokens (> cap {hot_variant_cap})"
            )
        i, j = _segment_pair_positions(seg_id)
        if len(i) == 0:
            return empty
        return pa.table(
            {
                "left_tok": t_s.take(pa.array(i)),
                "right_tok": t_s.take(pa.array(j)),
            }
        )

    cand = (
        tokens.map_batches(variants, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: pairs(g.drop_columns(["_part"])), batch_format="pyarrow"
        )
        .groupby(["left_tok", "right_tok"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )  # distinct candidate pairs (a pair can share several variants)

    def verify(batch: pa.Table) -> pa.Table:
        ls = batch["left_tok"].to_pylist()
        rs = batch["right_tok"].to_pylist()
        keep = np.fromiter(
            (abs(len(a) - len(b)) <= 1 and _ed_le1(a, b) for a, b in zip(ls, rs)),
            dtype=bool, count=len(ls),
        )
        return batch.filter(pa.array(keep))

    return cand.map_batches(verify, batch_format="pyarrow")


def dup_ngram_docs(
    ds,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """Substring-level duplication signal (the n-gram form of
    Lee et al. 2022's "Deduplicating Training Data" substring dedup):
    for every document, how many DISTINCT ``k``-token shingles it shares
    with at least one OTHER document. Returns (doc_id, dup_shingles) for
    documents with ≥ 1 shared shingle; docs shorter than ``k`` tokens
    emit nothing.

    Scale shape: two exchanges, no joins. Each batch explodes to
    (doc_id, shingle) pairs with numpy repeat/gather + one binary_join
    and DEDUPES per block (a doc repeating a shingle ships it once);
    pairs hash-partition by shingle, so per-shingle distinct-doc
    resolution is local to one partition (vectorized sort + segment
    masks); surviving doc ids flow into the standard two-phase
    per-doc count. Shingles travel as full strings (exact comparison —
    no hash-collision false positives); swap in a 128-bit hash upstream
    if shingle bytes dominate the exchange at your scale.
    """
    from phrasekit_ray.stages.agg import (
        _part_column,
        default_partitions,
        grouped_count,
    )

    if k < 1:
        raise ValueError("dup_ngram_docs: k must be >= 1")
    num_partitions = default_partitions(num_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "sh": pa.array([], pa.string())}
        )
        if batch.num_rows == 0:
            return empty
        # tokenize, then reuse the shared zero-copy shingle kernel
        # (_shingle_rows: k sliced views + one binary_join, distinct
        # within the block — a doc repeating a shingle ships it once)
        toks = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        t = pa.table(
            {
                "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "_toks": toks,
            }
        )
        rows = _shingle_rows(t, "doc_id", "_toks", k)
        return rows.rename_columns(["doc_id", "sh"])

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", _part_column(batch, ["sh"], num_partitions)
        )

    def per_shingle_partition(group: pa.Table) -> pa.Table:
        tbl = group.drop_columns(["_part"])
        if tbl.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        idx = pc.sort_indices(
            tbl, sort_keys=[("sh", "ascending"), ("doc_id", "ascending")]
        )
        srt = tbl.take(idx)
        sh = srt["sh"].combine_chunks()
        did = srt["doc_id"].combine_chunks().to_numpy()
        n = len(did)
        same_sh = pc.equal(sh.slice(1, n - 1), sh.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        ) if n > 1 else np.zeros(0, bool)
        # global distinct (doc, shingle): all copies of a shingle are in
        # this partition, so neighbor-dedupe here IS the global distinct
        dup_pair = np.concatenate(([False], same_sh & (did[1:] == did[:-1])))
        keep = ~dup_pair
        sh_k = sh.filter(pa.array(keep))
        did_k = did[keep]
        m = len(did_k)
        same_k = pc.equal(sh_k.slice(1, m - 1), sh_k.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        ) if m > 1 else np.zeros(0, bool)
        seg_start = np.concatenate(([True], ~same_k))
        seg_id = np.cumsum(seg_start) - 1
        seg_sizes = np.bincount(seg_id)
        shared = seg_sizes[seg_id] >= 2
        return pa.table({"doc_id": pa.array(did_k[shared], pa.int64())})

    pairs = ds.map_batches(explode, batch_format="pyarrow").map_batches(
        add_part, batch_format="pyarrow"
    )
    shared_docs = pairs.groupby("_part").map_groups(
        per_shingle_partition, batch_format="pyarrow"
    )
    return grouped_count(
        shared_docs, ["doc_id"], count_col="dup_shingles",
        num_partitions=num_partitions,
    )


def contamination_fraction(
    train_ds,
    bench_ds,
    k: int = 3,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    **contam_kwargs,
):
    """Per-doc contamination FRACTION (X107): for every training doc
    sharing ≥ 1 distinct k-shingle with the benchmark, report
    ``(doc_id, n_shared, n_total, contam_bp)`` where ``n_total`` is the
    doc's distinct-shingle count and ``contam_bp`` = ⌊10000·n_shared /
    n_total⌋ basis points — the graded form of ``contaminated_docs``
    (Brown et al. 2020 §C uses the binary form; data audits want the
    fraction to pick an excision threshold).

    Scale shape: ``n_total`` is computed ENTIRELY in-block (a doc's
    tokens live in one row, so its distinct shingles never cross
    blocks — zero shuffle), then one int-keyed ``lookup_join`` attaches
    it to the shared counts. Integer basis points keep the oracle
    hash-stable."""
    from phrasekit_ray.stages.agg import lookup_join

    shared = contaminated_docs(
        train_ds, bench_ds, k=k, id_col=id_col, tokens_col=tokens_col,
        **contam_kwargs,
    )

    def totals(b: pa.Table) -> pa.Table:
        t = (
            _shingle_rows(b, id_col, tokens_col, k)
            .group_by([id_col, "shingle"])
            .aggregate([])
            .group_by([id_col])
            .aggregate([("shingle", "count")])
        )
        return t.rename_columns([id_col, "n_total"])

    tot = train_ds.map_batches(totals, batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        bp = pc.divide(
            pc.multiply(b["n_shared"].cast(pa.int64()), pa.scalar(10000)),
            b["n_total"].cast(pa.int64()),
        )
        return pa.table(
            {
                id_col: b[id_col],
                "n_shared": b["n_shared"].cast(pa.int64()),
                "n_total": b["n_total"].cast(pa.int64()),
                "contam_bp": bp,
            }
        )

    return lookup_join(shared, tot, id_col, id_col).map_batches(
        finish, batch_format="pyarrow"
    )


def excise_duplicate_spans(
    ds,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    min_count: int = 2,
):
    """Duplicate-span EXCISION (X108) — the applied form of Lee et al.
    2022 substring dedup (``dup_ngram_docs`` is the signal form): every
    token covered by any k-token shingle whose occurrence count across
    the whole corpus (within-doc repeats included) is ≥ ``min_count``
    is REMOVED, and the cleaned text re-joined. Returns
    ``(doc_id, clean_text, n_removed)`` for EVERY input doc (docs
    shorter than k pass through unchanged; fully-covered docs come back
    with empty text, letting a downstream length filter drop them).

    Scale shape — exactly TWO exchanges, zero joins:
    1. per-occurrence (doc, pos, shingle) rows hash-partition by
       shingle, so the global occurrence count of a shingle is local to
       one partition: a vectorized sort + segment-size pass emits the
       duplicated-span START rows right there (no dup-set broadcast, no
       second pass over the corpus);
    2. start rows and the docs themselves co-partition by doc id
       (conformed union); per partition, coverage is one ±1 difference
       array over the partition's flattened tokens (cumsum > 0), the
       kept tokens re-join with ONE binary_join. No per-row Python.
    Shingles travel as full strings (exact, no collision false
    positives) — swap a 128-bit hash upstream if shingle bytes dominate
    the exchange at your scale.
    """
    from phrasekit_ray.stages.agg import _part_column, default_partitions

    if k < 1:
        raise ValueError("excise_duplicate_spans: k must be >= 1")
    num_partitions = default_partitions(num_partitions)

    occ_empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "sh": pa.array([], pa.string()),
        }
    )

    def occ(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return occ_empty.append_column("_part", pa.array([], pa.int32()))
        toks = pc.split_pattern(
            pc.fill_null(batch[text_col].combine_chunks(), ""), " "
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        off = offsets - base
        total = int(off[-1])
        flat = toks.values.slice(base, total)
        sizes = np.diff(off)
        m = total - k + 1
        if m <= 0:
            return occ_empty.append_column("_part", pa.array([], pa.int32()))
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy()
        doc_index = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        parts = [flat.slice(j, m) for j in range(k)]
        joined = pc.binary_join_element_wise(*parts, " ")
        valid = doc_index[:m] == doc_index[k - 1 :]
        idx = np.flatnonzero(valid)
        win_doc = doc_index[idx]
        t = pa.table(
            {
                "doc_id": pa.array(ids[win_doc], pa.int64()),
                "pos": pa.array(idx - off[:-1][win_doc], pa.int64()),
                "sh": joined.take(pa.array(idx)).cast(pa.string()),
            }
        )
        return t.append_column("_part", _part_column(t, ["sh"], num_partitions))

    def dup_starts(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        srt = t.take(pc.sort_indices(t, sort_keys=[("sh", "ascending")]))
        sh = srt["sh"].combine_chunks()
        diff = (
            pc.not_equal(sh.slice(1, n - 1), sh.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            if n > 1
            else np.zeros(0, bool)
        )
        seg = np.flatnonzero(np.concatenate(([True], diff)))
        seg_sizes = np.diff(np.concatenate((seg, [n])))
        # every occurrence in a segment of size >= min_count is a dup start
        occ_seg = np.repeat(seg_sizes, seg_sizes)
        keep = occ_seg >= min_count
        out = srt.filter(pa.array(keep))
        return pa.table({"doc_id": out["doc_id"], "pos": out["pos"]})

    starts = (
        ds.map_batches(occ, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dup_starts, batch_format="pyarrow")
    )

    def doc_side(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
                # NULL text = empty doc; it must stay a DOC row (the
                # union discriminates sides on text validity)
                "pos": pa.nulls(batch.num_rows, pa.int64()),
            }
        ).add_column(
            1,
            "text",
            pc.fill_null(
                batch[text_col].combine_chunks().cast(pa.string()), ""
            ),
        )
        return t.append_column(
            "_part", _part_column(t, ["doc_id"], num_partitions)
        )

    def start_side(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
                "text": pa.nulls(batch.num_rows, pa.string()),
                "pos": batch["pos"].combine_chunks().cast(pa.int64()),
            }
        )
        return t.append_column(
            "_part", _part_column(t, ["doc_id"], num_partitions)
        )

    unioned = ds.map_batches(doc_side, batch_format="pyarrow").union(
        starts.map_batches(start_side, batch_format="pyarrow")
    )

    def rebuild(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        is_doc = pc.is_valid(g["text"])
        docs = g.filter(is_doc)
        if docs.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_removed": pa.array([], pa.int64()),
                }
            )
        docs = docs.take(
            pc.sort_indices(docs, sort_keys=[("doc_id", "ascending")])
        )
        did = docs["doc_id"].combine_chunks().to_numpy()
        toks = pc.split_pattern(docs["text"].combine_chunks(), " ")
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        off = offsets - base
        total = int(off[-1])
        flat = toks.values.slice(base, total)
        sizes = np.diff(off)
        sts = g.filter(pc.invert(is_doc))
        st_doc = sts["doc_id"].combine_chunks().to_numpy()
        st_pos = (
            sts["pos"]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        row = np.searchsorted(did, st_doc)
        fs = off[:-1][row] + st_pos
        delta = np.zeros(total + 1, np.int64)
        np.add.at(delta, fs, 1)
        np.add.at(delta, fs + k, -1)
        covered = np.cumsum(delta[:total]) > 0
        ccum = np.concatenate(([0], np.cumsum(covered)))
        rem = ccum[off[1:]] - ccum[off[:-1]]
        kept_vals = flat.filter(pa.array(~covered))
        kept_off = np.concatenate(([0], np.cumsum(sizes - rem)))
        lst = pa.LargeListArray.from_arrays(
            pa.array(kept_off, pa.int64()), kept_vals
        )
        clean = pc.binary_join(lst, " ")
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "clean_text": clean.cast(pa.string()),
                "n_removed": pa.array(rem, pa.int64()),
            }
        )

    return unioned.groupby("_part").map_groups(rebuild, batch_format="pyarrow")


def snapshot_diff(
    old_ds,
    new_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """Corpus snapshot diff (X120): what changed between two crawls —
    Dataset(doc_id, status) with status ∈ {added, removed, changed}
    (unchanged docs emit nothing). Membership via the engine's
    semi/anti joins; change detection compares 64-bit content
    fingerprints attached with one int-keyed lookup_join. All three
    legs are the cardinality-chosen broadcast/partitioned join paths —
    no driver state beyond the join machinery's own bounds.
    """
    from phrasekit_ray.stages.agg import (
        hash_string_array64,
        key_filter_join,
        lookup_join,
    )

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                "_h": pa.array(
                    hash_string_array64(
                        batch[text_col].combine_chunks().cast(pa.string())
                    ).astype(np.int64)
                ),
            }
        )

    oldh = old_ds.map_batches(fp, batch_format="pyarrow").materialize()
    newh = new_ds.map_batches(fp, batch_format="pyarrow").materialize()

    def tag(status: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: batch[id_col],
                    "status": pa.array(
                        [status] * batch.num_rows, pa.string()
                    ),
                }
            )

        return fn

    added = key_filter_join(
        newh, oldh, id_col, id_col, anti=True, num_partitions=num_partitions
    ).map_batches(tag("added"), batch_format="pyarrow")
    removed = key_filter_join(
        oldh, newh, id_col, id_col, anti=True, num_partitions=num_partitions
    ).map_batches(tag("removed"), batch_format="pyarrow")

    both = lookup_join(
        newh,
        oldh.map_batches(
            lambda b: pa.table({id_col: b[id_col], "_h_old": b["_h"]}),
            batch_format="pyarrow",
        ),
        id_col,
        id_col,
        num_partitions=num_partitions,
    )

    def changed_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch["_h"], batch["_h_old"]))
        return pa.table(
            {
                id_col: t[id_col],
                "status": pa.array(["changed"] * t.num_rows, pa.string()),
            }
        )

    changed = both.map_batches(changed_only, batch_format="pyarrow")
    return added.union(removed).union(changed)


def sorted_neighborhood_pairs(
    ds,
    sort_cols: list[str],
    id_col: str,
    window: int = 3,
    num_partitions: int | None = None,
):
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    classic entity-resolution candidate generator: totally order the
    records by ``sort_cols + [id_col]`` and emit every pair within
    ``window`` positions (0 < rn_b − rn_a ≤ window).

    Scale shape: ONE distributed sort + ONE metadata-only global row
    enumeration (state/rowindex, X19), then rows scatter to bucket
    rn//window (as pair-left "own") and bucket rn//window − 1 (as
    boundary ghost, pair-right only) so every qualifying pair lives in
    exactly one group of ~2·window rows; pair emission inside a group
    is one repeat/cumsum gather — no per-row Python, no all-pairs.
    Output pair count is n·window by construction, independent of key
    skew (the attraction of SNM blocking over hash blocking).

    Returns Dataset(a, b) of id pairs, a sorted before b.
    """
    import ray

    from phrasekit_ray.state.rowindex import with_row_index

    if window < 1:
        raise ValueError("window must be >= 1")
    w = int(window)

    srt = ds.map_batches(
        lambda b: pa.table(
            {id_col: b[id_col].cast(pa.int64())}
            | {c: b[c] for c in sort_cols}
        ),
        batch_format="pyarrow",
    ).sort(sort_cols + [id_col])
    idx = with_row_index(srt, "_rn")

    def scatter(batch: pa.Table) -> pa.Table:
        rn = batch["_rn"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        g = rn // w
        own = pa.table(
            {
                "_grp": pa.array(g, pa.int64()),
                "_rn": pa.array(rn, pa.int64()),
                id_col: pa.array(ids, pa.int64()),
                "_own": pa.array(np.ones(len(rn), bool)),
            }
        )
        mask = g > 0
        ghost = pa.table(
            {
                "_grp": pa.array(g[mask] - 1, pa.int64()),
                "_rn": pa.array(rn[mask], pa.int64()),
                id_col: pa.array(ids[mask], pa.int64()),
                "_own": pa.array(np.zeros(int(mask.sum()), bool)),
            }
        )
        return pa.concat_tables([own, ghost])

    def pairs(group: pa.Table) -> pa.Table:
        rn = group["_rn"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(rn, kind="stable")
        rn = rn[order]
        ids = group[id_col].combine_chunks().to_numpy(zero_copy_only=False)[order]
        own = group["_own"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        n = len(rn)
        hi = np.searchsorted(rn, rn + w, side="right")
        counts = np.where(own, hi - np.arange(n) - 1, 0)
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        a_pos = np.repeat(np.arange(n), counts)
        within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        b_pos = a_pos + 1 + within
        return pa.table(
            {
                "a": pa.array(ids[a_pos], pa.int64()),
                "b": pa.array(ids[b_pos], pa.int64()),
            }
        )

    return (
        idx.map_batches(scatter, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(pairs, batch_format="pyarrow")
    )


def prefix_filter_jaccard_pairs(
    ds,
    k: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_partitions: int | None = None,
):
    """Prefix-filtered EXACT set-similarity join (Bayardo et al. 2007
    AllPairs / Xiao et al. PPJoin family) — the web-scale path beside the
    full inverted-index join ``jaccard_pairs``, with IDENTICAL output:
    Dataset(doc_id, tokens) → Dataset(left, right, jaccard ≥ threshold).

    Instead of emitting co-occurrence pairs from EVERY shingle posting
    list (quadratic in the hottest list), each doc indexes only its
    PREFIX under the canonical global order (df asc, shingle asc): the
    first p = n − ⌈θ·n⌉ + 1 of its n distinct shingles. Lossless by the
    standard prefix-filtering lemma: J(A,B) ≥ θ ⟹ |A∩B| ≥ ⌈θ·max(|A|,|B|)⌉
    = α, and the α-th largest common element (canonical order) must sit
    within the first |X| − α + 1 ≤ p_X positions of BOTH sets — so every
    qualifying pair shares a prefix shingle. Rare-first ordering makes
    prefixes maximally selective (the hot shingles land in suffixes and
    never generate candidates).

    Stages (all distributed, no driver state):
      1. distinct shingles per doc (shared extractor);
      2. global df attached in ONE shuffle (equal shingles co-located by
         hash partition ⇒ in-partition run length == global df);
      3. per-doc prefix via ONE doc-partitioned Arrow sort by
         (doc, df, shingle) + a vectorized segment mask;
      4. candidate pairs from PREFIX posting lists only (shared run-scan
         kernel), deduped by a two-phase count;
      5. exact verification: two native hash joins fetch each candidate
         pair's true intersection count from the FULL shingle table
         (left explode ⋈ packed right (doc, shingle) key), then the same
         size join + Jaccard filter as ``jaccard_pairs``.
    """
    import ray
    import zlib

    from phrasekit_ray.stages.agg import (
        default_partitions,
        grouped_count,
        hash_aggregate,
        join_partitions,
    )

    num_partitions = default_partitions(num_partitions)
    sh = ds.map_batches(
        _shingle_extract_fn(k, id_col, tokens_col), batch_format="pyarrow"
    ).materialize()
    sizes = grouped_count(sh, "doc_id", count_col="n_shingles").materialize()

    empty = pa.table(
        {
            "left": pa.array([], pa.int64()),
            "right": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def add_spart(batch: pa.Table) -> pa.Table:
        p = np.fromiter(
            (zlib.crc32(s.encode()) for s in batch["shingle"].to_pylist()),
            dtype=np.uint32,
            count=batch.num_rows,
        )
        return batch.append_column(
            "_part", pa.array((p % np.uint32(num_partitions)).astype(np.int32))
        )

    def attach_df(group: pa.Table) -> pa.Table:
        enc = group["shingle"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        df = np.bincount(codes, minlength=len(enc.dictionary)) if len(codes) else np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": group["doc_id"],
                "shingle": group["shingle"],
                "df": pa.array(df[codes].astype(np.int64) if len(codes) else np.zeros(0, np.int64), pa.int64()),
            }
        )

    with_df = (
        sh.map_batches(add_spart, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: attach_df(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )

    def add_dpart(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().cast(pa.int64()).to_numpy()
        return batch.append_column(
            "_part", pa.array((ids % num_partitions).astype(np.int32))
        )

    def take_prefix(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shingle": pa.array([], pa.string()),
                }
            )
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("doc_id", "ascending"),
                ("df", "ascending"),
                ("shingle", "ascending"),
            ],
        )
        g = group.take(idx)
        ids = g["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        m = len(ids)
        new_seg = np.concatenate(([True], ids[1:] != ids[:-1]))
        seg_start = np.flatnonzero(new_seg)
        seg_sizes = np.diff(np.concatenate((seg_start, [m])))
        seg_id = np.cumsum(new_seg) - 1
        pos = np.arange(m, dtype=np.int64) - seg_start[seg_id]
        n = seg_sizes[seg_id]
        p = n - np.ceil(threshold * n).astype(np.int64) + 1
        keep = pa.array(pos < p)
        return pa.table(
            {
                "doc_id": g["doc_id"].combine_chunks().filter(keep),
                "shingle": g["shingle"].combine_chunks().filter(keep),
            }
        )

    prefix = (
        with_df.map_batches(add_dpart, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: take_prefix(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )

    cand = hash_aggregate(
        _cooccurring_raw_pairs(prefix, num_partitions),
        ["left", "right"],
        [("n", "sum")],
        num_partitions=num_partitions,
    ).materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(empty)

    cand_pairs = cand.map_batches(
        lambda b: b.select(["left", "right"]), batch_format="pyarrow"
    )

    # exact verification: explode each candidate's LEFT set with ONE
    # native hash join (materialized so the join never chains into the
    # downstream shuffle — Ray 2.49 native joins are fragile when
    # chained, see lookup_join's docstring), then an exact in-partition
    # STRING semi-match of the packed (right, shingle) key against the
    # full shingle table — survivors are exactly the pair's intersection
    # elements. No second native join, no hashing of the match key: the
    # partition trick is crc32 co-location + one dictionary_encode
    # equality per partition.
    jp = join_partitions(num_partitions)
    j1 = cand_pairs.join(
        sh,
        join_type="inner",
        num_partitions=jp,
        on=("left",),
        right_on=("doc_id",),
    ).materialize()

    def pack_probe(b: pa.Table) -> pa.Table:
        key2 = pc.binary_join_element_wise(
            pc.cast(b["right"].combine_chunks(), pa.string()),
            b["shingle"].combine_chunks().cast(pa.string()),
            "\x1f",
        )
        return pa.table(
            {"left": b["left"], "right": b["right"], "key2": key2,
             "_side": pa.array(np.zeros(b.num_rows, np.int8))}
        )

    def pack_target(b: pa.Table) -> pa.Table:
        key2 = pc.binary_join_element_wise(
            pc.cast(b["doc_id"].combine_chunks().cast(pa.int64()), pa.string()),
            b["shingle"].combine_chunks().cast(pa.string()),
            "\x1f",
        )
        z = np.zeros(b.num_rows, np.int64)
        return pa.table(
            {"left": pa.array(z), "right": pa.array(z), "key2": key2,
             "_side": pa.array(np.ones(b.num_rows, np.int8))}
        )

    import zlib as _zlib

    def add_kpart(b: pa.Table) -> pa.Table:
        p = np.fromiter(
            (_zlib.crc32(s.encode()) for s in b["key2"].to_pylist()),
            dtype=np.uint32,
            count=b.num_rows,
        )
        return b.append_column(
            "_part", pa.array((p % np.uint32(num_partitions)).astype(np.int32))
        )

    def semi_match(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        enc = group["key2"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        in_target = np.zeros(len(enc.dictionary), dtype=bool)
        tmask = side == 1
        in_target[codes[tmask]] = True
        keep = (~tmask) & in_target[codes]
        return pa.table(
            {
                "left": group["left"].combine_chunks().filter(pa.array(keep)),
                "right": group["right"].combine_chunks().filter(pa.array(keep)),
            }
        )

    probes = j1.map_batches(pack_probe, batch_format="pyarrow")
    targets = sh.map_batches(pack_target, batch_format="pyarrow")
    matched = (
        probes.union(targets)
        .map_batches(add_kpart, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: semi_match(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
    inter = grouped_count(
        matched,
        ["left", "right"],
        count_col="n",
        num_partitions=num_partitions,
    ).materialize()
    if inter.count() == 0:
        return ray.data.from_arrow(empty)
    with_both = _attach_pair_sizes(inter, sizes, num_partitions)

    def jaccard_filter(batch: pa.Table) -> pa.Table:
        inter_n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["n_left"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["n_right"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = inter_n / (na + nb - inter_n)
        keep = j >= threshold
        return pa.table(
            {
                "left": batch["left"].cast(pa.int64()),
                "right": batch["right"].cast(pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            }
        ).filter(pa.array(keep))

    return with_both.map_batches(jaccard_filter, batch_format="pyarrow")


def write_minhash_index(
    ds,
    index_dir: str,
    snapshot: str,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    num_partitions: int = 16,
) -> dict:
    """Append one crawl snapshot's LSH band rows to a PERSISTENT on-disk
    MinHash index (X191) — production near-dedup is incremental: each new
    crawl hashes only ITS documents (the expensive shingling + minhash
    work) and appends (band, digest, doc_id) rows; the stored rows of
    prior snapshots are reused verbatim. Written via the resumable
    lineage writer, so a crashed append resumes per partition.

    The index manifest pins the hash parameters (num_perm, bands,
    shingle_k, seed) — an append with different parameters is REJECTED,
    not silently mixed (the ADVICE-r4 stale-checkpoint lesson: state
    reuse must be fingerprint-gated). Re-appending an existing snapshot
    name is a no-op resume, never a duplicate."""
    import json
    import os

    from phrasekit_ray.state import lineage

    params = {
        "op": "minhash_index",
        "num_perm": num_perm,
        "bands": bands,
        "shingle_k": shingle_k,
        "seed": 7,
        "id_col": id_col,
    }
    os.makedirs(index_dir, exist_ok=True)
    mpath = os.path.join(index_dir, "minhash_index.json")
    manifest = {"params": params, "snapshots": []}
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest["params"] != params:
            raise ValueError(
                "write_minhash_index: index at "
                f"{index_dir} was built with {manifest['params']}, "
                f"refusing to append rows hashed with {params}"
            )

    rows = ds.map_batches(
        lambda b: minhash_band_rows(
            b, id_col, tokens_col, num_perm, bands, shingle_k
        ),
        batch_format="pyarrow",
    )
    summary = lineage.write_dataset_resumable(
        rows,
        index_dir,
        stage=f"bands_{snapshot}",
        config_desc=params,
        partition_col=id_col,
        num_partitions=num_partitions,
    )
    if snapshot not in manifest["snapshots"]:
        manifest["snapshots"].append(snapshot)
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return summary


def index_candidate_pairs(
    index_dir: str,
    num_partitions: int | None = None,
):
    """Candidate near-dup pairs over EVERY snapshot in a persistent
    MinHash index (X191): union the stored band rows of all appends and
    run the same pair-emission kernel as the one-shot path — the band-row
    multiset equals a full recompute over the union corpus, so the pair
    output is byte-identical to ``minhash_candidate_pairs`` on the
    concatenated snapshots (the invariant the tests pin). Only new
    snapshots ever pay hashing; pair emission is one shuffle over stored
    8-byte digests."""
    import json
    import os

    from phrasekit_ray.stages.agg import default_partitions
    from phrasekit_ray.state import lineage

    num_partitions = default_partitions(num_partitions)
    mpath = os.path.join(index_dir, "minhash_index.json")
    with open(mpath) as f:
        manifest = json.load(f)
    id_col = manifest["params"]["id_col"]
    parts = [
        lineage.read_partitioned(index_dir, f"bands_{s}")
        for s in manifest["snapshots"]
    ]
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.union(p)
    return _band_pairs_from_rows(rows, id_col, num_partitions)
