"""KG extension: mentions → triples → canonicalization → node/edge tables.

North-rule additions beyond the reference (BASELINE.json north_star;
FIXTURES.md §8). The reference stops at tagged spans; this stage lifts
them into a knowledge graph:

1. **Mentions**: tagged docs → flat mention rows (stateless flat-map).
2. **Triple lift**: ADJACENT mention pairing within a document — each pair
   of consecutive resolved spans (subject = earlier mention's entity,
   object = next mention's entity) becomes (subj, pred, obj) with the
   configured constant predicate (documented lift rule, FIXTURES.md §8).
3. **Canonicalization**: union-find connected components over alias-match
   edges. Alias rule: phrase A aliases phrase B when A's token sequence is
   a proper prefix of B's (e.g. "rat cdk10" ← "rat cdk10 oligo"). The edge
   set is ≤ #phrases (model-side, small), so edges are collected to one
   task for union-find and the resulting phrase_id→entity_id mapping is
   broadcast back — no iterative shuffle (SURVEY.md §7.3).
   Canonical entity_id of a component = min phrase_id in it.
4. **Materialize**: nodes/edges as partitioned Parquet with per-partition
   lineage manifests (state.lineage) for resumable runs.

Partitioning assumption (documented per the custom-operator rule): triple
lift is per-document (embarrassingly parallel); only the final node/edge
aggregates shuffle, keyed by entity id — hot entities are pre-combined
in-block by the same combiner pattern as mining.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.config import KGConfig
from phrasekit_ray.core.artifact import MatcherArtifact
from phrasekit_ray.stages.agg import hash_aggregate


# --- union-find (driver/single-task; edge set is model-sized) --------------

class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent.setdefault(p, p)
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def alias_edges_from_artifact(artifact: MatcherArtifact) -> list[tuple[int, int]]:
    """Token-prefix alias rule over the phrase table: (shorter_id, longer_id)
    for every pattern that is a proper token-prefix of another."""
    by_tokens = {
        tuple(toks): int(pid)
        for toks, pid in zip(artifact.pattern_tokens, artifact.phrase_ids)
    }
    edges: list[tuple[int, int]] = []
    for toks, pid in by_tokens.items():
        for cut in range(1, len(toks)):
            prefix = toks[:cut]
            other = by_tokens.get(prefix)
            if other is not None:
                edges.append((other, pid))
    return edges


def canonical_mapping(
    phrase_ids, edges: list[tuple[int, int]]
) -> dict[int, int]:
    """phrase_id → canonical entity_id (min phrase_id of its component)."""
    uf = UnionFind()
    for pid in phrase_ids:
        uf.find(int(pid))
    for a, b in edges:
        uf.union(a, b)
    # min-id per root
    root_min: dict[int, int] = {}
    for pid in phrase_ids:
        r = uf.find(int(pid))
        root_min[r] = min(root_min.get(r, int(pid)), int(pid))
    return {int(pid): root_min[uf.find(int(pid))] for pid in phrase_ids}


def connected_components_distributed(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
):
    """Distributed connected components over an edge Dataset via hash-min
    label propagation — the scale path for canonicalization when the
    alias-edge set is too big to collect (SURVEY.md §7.3; driver-side
    ``canonical_mapping`` handles the model-sized case).

    Each round every node adopts the minimum label among itself and its
    neighbors (two shuffles per round: message aggregate + label merge,
    both int-keyed hash_aggregate). Converges in O(component diameter)
    rounds; the loop stops when the global label sum is stable — a cheap
    scalar aggregate, no per-node comparison pass. Returns a Dataset
    (node: int64, label: int64) where label = component minimum.
    """
    def norm_edges(batch: pa.Table) -> pa.Table:
        # SYMMETRIZE up front: with both (u,v) and (v,u) materialized,
        # each propagation round needs ONE join (label(src) → dst)
        # instead of two — half the per-round all-to-all fixed cost for
        # the same joined volume
        s = batch[src_col].combine_chunks().cast(pa.int64())
        d = batch[dst_col].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([s, d]),
                "dst": pa.concat_arrays([d, s]),
            }
        )

    edges = edges_ds.map_batches(norm_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        # joins on an empty dataset lose the schema (same empty-edge class
        # the triangle driver path guards); the component set is empty
        import ray

        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        )

    def initial_labels(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
        )
        return pa.table({"node": nodes, "label": nodes})

    labels = hash_aggregate(
        edges.map_batches(initial_labels, batch_format="pyarrow"),
        "node",
        [("label", "min")],
    ).materialize()
    prev_sum = labels.sum("label")

    def msg_from_src(batch: pa.Table) -> pa.Table:
        # after join on src: (src, dst, label) — send src's label to dst;
        # edges are symmetrized, so this ONE join covers both directions
        return pa.table({"node": batch["dst"], "label": batch["label"]})

    for _ in range(max_rounds):
        # ONE distributed hash join per round: every (directed) edge
        # fetches its source's current label and sends it to its dst
        j_src = edges.join(
            labels, join_type="inner", num_partitions=8, on=("src",), right_on=("node",)
        )
        m1 = j_src.map_batches(msg_from_src, batch_format="pyarrow")
        labels = hash_aggregate(
            labels.union(m1), "node", [("label", "min")]
        ).materialize()
        # label-sum stability IS sound here (unlike LPA): hash-min
        # propagation is monotone non-increasing per node, so an unchanged
        # sum implies an unchanged state
        cur = labels.sum("label")
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels


def entity_lut(artifact: MatcherArtifact, mapping: dict[int, int]) -> np.ndarray:
    """Dense lookup: pattern index → canonical entity id."""
    return np.fromiter(
        (mapping[int(p)] for p in artifact.phrase_ids),
        dtype=np.uint32,
        count=artifact.num_patterns,
    )


# --- mention + triple stages (stateless map_batches) -----------------------

def _dense_lut(lut: dict, pmax: int) -> np.ndarray:
    """phrase_id → entity_id mapping as a dense uint32 array (identity for
    unmapped ids) so batch lookups are numpy indexing, not dict.get loops.
    Phrase-id space is artifact-sized (≤1M), never corpus-sized."""
    size = (max(int(pmax), int(max(lut.keys())) if lut else 0)) + 1
    arr = np.arange(size, dtype=np.uint32)
    if lut:
        k = np.fromiter(lut.keys(), dtype=np.int64, count=len(lut))
        v = np.fromiter(lut.values(), dtype=np.int64, count=len(lut))
        arr[k] = v.astype(np.uint32)
    return arr


def mentions_from_tagged(tagged_ds, id_col: str = "doc_id", **map_kwargs):
    """tagged docs → flat mentions(doc_id, start, end, phrase_id)."""

    def fn(batch: pa.Table) -> pa.Table:
        spans = batch["spans"].combine_chunks()
        offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        offsets = offsets - base
        vals = spans.values.slice(base, int(offsets[-1]))
        sizes = np.diff(offsets)
        parent = np.repeat(np.arange(len(sizes)), sizes)
        doc_ids = batch[id_col].combine_chunks().take(pa.array(parent))
        return pa.table(
            {
                "doc_id": doc_ids,
                "start": vals.field("start"),
                "end": vals.field("end"),
                "phrase_id": vals.field("phrase_id"),
            }
        )

    return tagged_ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)


def triples_from_tagged(
    tagged_ds,
    entity_lut_by_phrase: dict[int, int],
    config: KGConfig | None = None,
    id_col: str = "doc_id",
    **map_kwargs,
):
    """tagged docs → triples(subj, pred, obj, doc_id, subj_start, obj_start).

    Adjacent-mention pairing: spans within a doc are already ordered by
    start (policy output order); consecutive pairs with token gap ≤
    max_pair_distance become triples. Entities are the canonicalized ids.
    """
    import ray

    config = config or KGConfig()
    lut_ref = ray.put(entity_lut_by_phrase)
    pred = config.predicate
    max_gap = config.max_pair_distance

    def fn(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        lut = _get_broadcast(lut_ref)
        spans = batch["spans"].combine_chunks()
        offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[0]
        offsets = offsets - base
        vals = spans.values.slice(base, int(offsets[-1]))
        starts = vals.field("start").to_numpy(zero_copy_only=False)
        ends = vals.field("end").to_numpy(zero_copy_only=False)
        pids = vals.field("phrase_id").to_numpy(zero_copy_only=False)
        sizes = np.diff(offsets)
        parent = np.repeat(np.arange(len(sizes)), sizes)

        n = len(starts)
        if n >= 2:
            # pair i with i+1 when same doc and within gap
            same_doc = parent[:-1] == parent[1:]
            gap_ok = (starts[1:] - ends[:-1]) <= max_gap
            pair = same_doc & gap_ok
            idx = np.flatnonzero(pair)
        else:
            idx = np.zeros(0, dtype=np.int64)

        # dense-array canonicalization lookup (identity where unmapped)
        arr_lut = _dense_lut(lut, int(pids.max()) if len(pids) else 0)
        subj = arr_lut[pids[idx]]
        obj = arr_lut[pids[idx + 1]]
        doc_ids = batch[id_col].combine_chunks().take(pa.array(parent[idx]))
        pred_col = pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(len(idx), dtype=np.int32)), pa.array([pred])
        )
        return pa.table(
            {
                "subj": pa.array(subj, pa.uint32()),
                "pred": pred_col,
                "obj": pa.array(obj, pa.uint32()),
                "doc_id": doc_ids,
                "subj_start": pa.array(starts[idx], pa.int32()),
                "obj_start": pa.array(starts[idx + 1], pa.int32()),
            }
        )

    return tagged_ds.map_batches(fn, batch_format="pyarrow", **map_kwargs)


# --- node / edge aggregates ------------------------------------------------

def node_table(mentions_ds, entity_lut_by_phrase: dict[int, int], canonical_names: dict[int, str]):
    """mentions → nodes(entity_id, canonical, n_mentions).

    In-block partial count (combiner) before the groupby shuffle, same
    hot-key treatment as mining.
    """
    import ray

    lut_ref = ray.put(entity_lut_by_phrase)

    def partial(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        lut = _get_broadcast(lut_ref)
        pids = batch["phrase_id"].to_numpy(zero_copy_only=False)
        arr_lut = _dense_lut(lut, int(pids.max()) if len(pids) else 0)
        ents = arr_lut[pids].astype(np.uint64)
        uniq, counts = np.unique(ents, return_counts=True)
        return pa.table(
            {
                "entity_id": pa.array(uniq, pa.uint64()),
                "n_mentions": pa.array(counts.astype(np.uint64), pa.uint64()),
            }
        )

    agg = hash_aggregate(
        mentions_ds.map_batches(partial, batch_format="pyarrow"),
        "entity_id",
        [("n_mentions", "sum")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        ents = batch["entity_id"].to_pylist()
        return pa.table(
            {
                "entity_id": batch["entity_id"],
                "canonical": pa.array(
                    [canonical_names.get(int(e), str(e)) for e in ents], pa.string()
                ),
                "n_mentions": batch["n_mentions"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def edge_table(triples_ds, pred: str | None = None):
    """triples → edges(subj, pred, obj, weight) with in-block combine.

    When ``pred`` is given (the common case — KGConfig.predicate is
    constant per pipeline run) the combine/shuffle key is (subj, obj)
    only. When ``pred`` is None the ACTUAL pred column joins the group
    key in both the in-block combine and the shuffle, so a triples
    dataset mixing predicates aggregates each (subj, pred, obj)
    separately — never merged under whichever pred a block saw first."""

    def partial(batch: pa.Table) -> pa.Table:
        if pred is not None:
            t = (
                batch.select(["subj", "obj"])
                .group_by(["subj", "obj"])
                .aggregate([("subj", "count")])
                .rename_columns(["subj", "obj", "weight"])
            )
            return t.append_column(
                "_pred", pa.array([pred] * t.num_rows, pa.string())
            )
        t = pa.table(
            {
                "subj": batch["subj"],
                "obj": batch["obj"],
                "_pred": batch["pred"].cast(pa.string()),
            }
        )
        return (
            t.group_by(["subj", "obj", "_pred"])
            .aggregate([("subj", "count")])
            .rename_columns(["subj", "obj", "_pred", "weight"])
        )

    agg = hash_aggregate(
        triples_ds.map_batches(partial, batch_format="pyarrow"),
        ["subj", "obj", "_pred"],
        [("weight", "sum")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": batch["subj"],
                "pred": batch["_pred"],
                "obj": batch["obj"],
                "weight": batch["weight"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def canonical_names_from_artifact(
    artifact: MatcherArtifact, mapping: dict[int, int]
) -> dict[int, str]:
    """entity_id → canonical surface form = pattern string of the canonical
    phrase (the component's min phrase_id member)."""
    by_pid = {
        int(pid): " ".join(toks)
        for pid, toks in zip(artifact.phrase_ids, artifact.pattern_tokens)
    }
    return {ent: by_pid[ent] for ent in set(mapping.values()) if ent in by_pid}


# --- incremental KG construction -------------------------------------------

def _conform_edges(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "subj": batch["subj"].cast(pa.int64()),
            "pred": batch["pred"].cast(pa.string()),
            "obj": batch["obj"].cast(pa.int64()),
            "weight": batch["weight"].cast(pa.int64()),
        }
    )


def merge_edge_tables(*edge_dss, num_partitions: int | None = None):
    """Union edge tables from incremental runs and re-aggregate —
    edge weights are additive triple counts, so incremental KG
    construction over a FIXED artifact/mapping is exactly
    union + grouped sum (proved by
    tests/test_kg.py::test_incremental_merge_equals_full_run).
    (subj, pred, obj) stays the full group key: increments carrying
    different predicates never merge."""
    ds = edge_dss[0]
    for other in edge_dss[1:]:
        ds = ds.union(other)
    return hash_aggregate(
        ds.map_batches(_conform_edges, batch_format="pyarrow"),
        ["subj", "pred", "obj"],
        [("weight", "sum")],
        num_partitions=num_partitions,
    )


def merge_node_tables(*node_dss, num_partitions: int | None = None):
    """Union node tables from incremental runs — mention counts are
    additive per (entity_id, canonical)."""

    def conform(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity_id": batch["entity_id"].cast(pa.int64()),
                "canonical": batch["canonical"].cast(pa.string()),
                "n_mentions": batch["n_mentions"].cast(pa.int64()),
            }
        )

    ds = node_dss[0]
    for other in node_dss[1:]:
        ds = ds.union(other)
    return hash_aggregate(
        ds.map_batches(conform, batch_format="pyarrow"),
        ["entity_id", "canonical"],
        [("n_mentions", "sum")],
        num_partitions=num_partitions,
    )


def pagerank(
    edges_ds,
    damping: float = 0.85,
    iterations: int = 10,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "weight",
    num_partitions: int | None = None,
):
    """Weighted PageRank over the KG edge table — power iteration built
    from the engine's own primitives, fully distributed:

    per round, rank/out-weight attaches to each edge with ONE int-keyed
    ``lookup_join`` (ranks are unique per node), per-edge contributions
    ``rank · w/out_w`` aggregate to the target node with ONE two-phase
    ``hash_aggregate``, and dangling mass (nodes with no out-edges)
    redistributes uniformly via two scalar ``Dataset.sum`` aggregates —
    the driver only ever holds scalars; ranks stay a Dataset and are
    re-materialized once per round (an iterative lazy graph would
    re-execute all prior rounds per consumer).

    Returns Dataset(node: int64, rank: float64); ranks sum to 1.
    """
    import ray

    from phrasekit_ray.stages.agg import default_partitions as _dp
    from phrasekit_ray.stages.agg import hash_aggregate, lookup_join

    num_partitions = _dp(num_partitions)

    def conform(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": batch[subj_col].cast(pa.int64()),
                "obj": batch[obj_col].cast(pa.int64()),
                "w": batch[weight_col].cast(pa.float64()),
            }
        )

    edges = edges_ds.map_batches(conform, batch_format="pyarrow").materialize()

    def halves(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [batch["subj"].combine_chunks(), batch["obj"].combine_chunks()]
            )}
        )

    nodes = hash_aggregate(
        edges.map_batches(halves, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column("_one", pa.array(np.ones(b.num_rows))),
            batch_format="pyarrow",
        ),
        ["node"],
        [("_one", "sum")],
        num_partitions=num_partitions,
    ).map_batches(lambda b: b.select(["node"]), batch_format="pyarrow").materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())})
        )

    out_w = hash_aggregate(
        edges.map_batches(
            lambda b: pa.table({"subj": b["subj"], "ow": b["w"]}),
            batch_format="pyarrow",
        ),
        ["subj"],
        [("ow", "sum")],
        num_partitions=num_partitions,
    ).materialize()

    init = 1.0 / n_nodes
    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, init, np.float64))
        ),
        batch_format="pyarrow",
    ).materialize()
    ranks_schema = pa.schema([("node", pa.int64()), ("rank", pa.float64())])
    ow_schema = pa.schema([("subj", pa.int64()), ("ow", pa.float64())])
    edges_schema = pa.schema(
        [("subj", pa.int64()), ("obj", pa.int64()), ("w", pa.float64())]
    )
    rw_schema = pa.schema(
        [("node", pa.int64()), ("rank", pa.float64()), ("ow", pa.float64())]
    )

    d = float(damping)
    for _ in range(iterations):
        # rank (and out-weight) of every NON-DANGLING node; inner join
        # drops dangling nodes, whose mass is recovered as a scalar below
        rw = lookup_join(
            ranks, out_w, "node", "subj", num_partitions,
            left_schema=ranks_schema, right_schema=ow_schema,
        ).materialize()
        total = ranks.sum("rank")
        non_dangling = rw.sum("rank") or 0.0
        dangling_mass = total - non_dangling

        per_out = rw.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "rpo": pa.array(
                        b["rank"].to_numpy(zero_copy_only=False)
                        / b["ow"].to_numpy(zero_copy_only=False),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contrib_edges = lookup_join(
            edges, per_out, "subj", "node", num_partitions,
            left_schema=edges_schema,
            right_schema=pa.schema([("node", pa.int64()), ("rpo", pa.float64())]),
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["obj"],
                    "s": pa.array(
                        b["w"].to_numpy(zero_copy_only=False)
                        * b["rpo"].to_numpy(zero_copy_only=False),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        # union with a zero row per node so sinks keep a rank entry
        zeros = nodes.map_batches(
            lambda b: pa.table(
                {"node": b["node"],
                 "s": pa.array(np.zeros(b.num_rows, np.float64))}
            ),
            batch_format="pyarrow",
        )
        sums = hash_aggregate(
            contrib_edges.union(zeros), ["node"], [("s", "sum")],
            num_partitions=num_partitions,
        )
        base = (1.0 - d) / n_nodes + d * dangling_mass / n_nodes

        def renorm(b: pa.Table, _base=base, _d=d) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"],
                    "rank": pa.array(
                        _base + _d * b["s"].to_numpy(zero_copy_only=False),
                        pa.float64(),
                    ),
                }
            )

        ranks = sums.map_batches(renorm, batch_format="pyarrow").materialize()
    return ranks


# --- graph analytics over the edge table ------------------------------------

def _segment_positions(keys_sorted: np.ndarray):
    """Per-row (pos-within-segment, segment-length) plus per-segment
    lengths of a SORTED key array — the shared prologue of every
    stride-loop pair enumeration below."""
    n = len(keys_sorted)
    new_seg = np.concatenate(([True], keys_sorted[1:] != keys_sorted[:-1]))
    idx = np.arange(n, dtype=np.int64)
    seg_base = np.zeros(n, dtype=np.int64)
    seg_base[new_seg] = idx[new_seg]
    seg_base = np.maximum.accumulate(seg_base)
    pos = idx - seg_base
    starts = np.flatnonzero(new_seg)
    lens = np.diff(np.concatenate((starts, [n])))
    seg_len = np.repeat(lens, lens)
    return pos, seg_len, lens


def _segment_pair_positions(keys_sorted: np.ndarray):
    """All within-segment position pairs (i, j), i < j, of a SORTED key
    array — one repeat/cumsum gather, O(emitted pairs) total work.

    (The previous stride-loop form did O(max segment length) passes
    over the WHOLE array — 460 × 2.4M bool scans = 65 s on the sf0.1
    basket graph where this emits 148M pairs in ~4 s.)"""
    n = len(keys_sorted)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    pos, seg_len, _ = _segment_positions(keys_sorted)
    counts = seg_len - pos - 1  # element i pairs with the next counts[i]
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    i = np.repeat(np.arange(n, dtype=np.int64), counts)
    start = np.cumsum(counts) - counts
    ramp = np.arange(total, dtype=np.int64) - np.repeat(start, counts) + 1
    return i, i + ramp


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       num_partitions: int | None = None,
                       input_rows: int | None = None,
                       driver_rows_threshold: int = 20_000_000):
    """Market-basket co-occurrence graph: undirected edges (subj, obj),
    subj < obj, between item values sharing a group value.

    Hash-partition by group (a group never straddles partitions), then
    ONE vectorized UDF per partition: sort by (group, item), drop
    in-group duplicates, enumerate within-segment pairs with
    ``_segment_pair_positions``. Per-group pair blowup is C(basket, 2) —
    bounded by the max basket size, not the corpus. Output may repeat a
    pair seen in different groups; feed through ``_canonical_undirected``
    (or ``edge_table``) for DISTINCT/weighted edges.

    Bounded fast path: when the caller KNOWS the input row count (e.g.
    parquet metadata) and it is ≤ ``driver_rows_threshold`` (two int64
    columns ≈ 320 MB at the default), the (group, item) pairs are pulled
    to the driver once and the whole enumeration is one numpy lexsort +
    stride pass — Ray's all-to-all shuffle has a multi-second fixed cost
    that dwarfs the compute at this size. Above the bound (or when
    ``input_rows`` is unknown) the distributed hash-partition path runs
    unchanged — that is the 100 TB shape."""
    from phrasekit_ray.stages.agg import default_partitions

    num_partitions = default_partitions(num_partitions)

    if input_rows is not None and input_rows <= driver_rows_threshold:
        import ray

        mat = ds.materialize()
        tbl = pa.concat_tables(ray.get(mat.to_arrow_refs()))
        g = tbl.column(group_col).combine_chunks().cast(pa.int64()).to_numpy()
        it = tbl.column(item_col).combine_chunks().cast(pa.int64()).to_numpy()
        order = np.lexsort((it, g))
        g, it = g[order], it[order]
        if len(g):
            uniq = np.concatenate(([True], (g[1:] != g[:-1]) | (it[1:] != it[:-1])))
            g, it = g[uniq], it[uniq]
        i, j = _segment_pair_positions(g)
        out = pa.table(
            {"subj": pa.array(it[i], pa.int64()), "obj": pa.array(it[j], pa.int64())}
        )
        # split into blocks so downstream stages parallelize
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        step = max(1, -(-out.num_rows // cpus))
        slices = [out.slice(s, step) for s in range(0, max(out.num_rows, 1), step)]
        return ray.data.from_arrow(slices)

    def prep(batch: pa.Table) -> pa.Table:
        g = batch[group_col].combine_chunks().cast(pa.int64()).to_numpy()
        i = batch[item_col].combine_chunks().cast(pa.int64()).to_numpy()
        h = (g.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return pa.table(
            {
                "g": pa.array(g, pa.int64()),
                "i": pa.array(i, pa.int64()),
                "_part": pa.array(
                    (h % np.uint64(num_partitions)).astype(np.int32), pa.int32()
                ),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        g = group["g"].combine_chunks().to_numpy()
        it = group["i"].combine_chunks().to_numpy()
        order = np.lexsort((it, g))
        g, it = g[order], it[order]
        uniq = np.concatenate(
            ([True], (g[1:] != g[:-1]) | (it[1:] != it[:-1]))
        ) if len(g) else np.zeros(0, bool)
        g, it = g[uniq], it[uniq]
        i, j = _segment_pair_positions(g)
        return pa.table(
            {
                "subj": pa.array(it[i], pa.int64()),
                "obj": pa.array(it[j], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda grp: pairs(grp.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def _wedge_cross(in_m, in_a, out_m, out_c):
    """Directed-wedge cross products: given the in-side (mid, predecessor)
    rows SORTED by mid and the out-side (mid, successor) rows SORTED by
    mid, emit one (a, c) row per wedge a→m→c with a ≠ c. O(emitted)
    total work — per-mid blowup is kin·kout, bounded by the max in/out
    degree, never the corpus."""
    if len(in_m) == 0 or len(out_m) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    um_in, in_start, kin = np.unique(in_m, return_index=True, return_counts=True)
    um_out, out_start, kout = np.unique(out_m, return_index=True, return_counts=True)
    common, ii, oo = np.intersect1d(um_in, um_out, return_indices=True)
    if len(common) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    kin, in_start = kin[ii], in_start[ii]
    kout, out_start = kout[oo], out_start[oo]
    n = kin * kout
    total = int(n.sum())
    rep = np.repeat(np.arange(len(n), dtype=np.int64), n)
    off = np.cumsum(n) - n
    w = np.arange(total, dtype=np.int64) - off[rep]
    a = in_a[in_start[rep] + w // kout[rep]]
    c = out_c[out_start[rep] + w % kout[rep]]
    keep = a != c
    return a[keep], c[keep]


def directed_wedges(edges_ds, num_partitions: int | None = None,
                    input_rows: int | None = None,
                    driver_rows_threshold: int = 20_000_000):
    """Directed 2-hop wedge enumeration: edges(s, o) — assumed DISTINCT
    with s ≠ o — → one (subj=a, obj=c) row per path a→m→c, a ≠ c. The
    KG path-join primitive (the SPARQL ``?a p ?m . ?m p ?c`` pattern);
    feed through ``grouped_count`` for per-(a, c) distinct-intermediate
    counts (each wedge appears exactly once because the edge set is
    distinct).

    Same two physical paths as ``cooccurrence_edges``: a bounded driver
    fast path (one numpy sort + segment cross per side) under
    ``driver_rows_threshold``, else hash-partition by the MIDDLE node —
    each edge is shipped twice, once as an in-edge at its dst and once
    as an out-edge at its src, so a mid never straddles partitions and
    one vectorized cross-product kernel runs per partition. That is the
    100 TB shape; per-mid blowup is in-degree × out-degree (salt/split
    hot mids upstream if a single mid's wedge set exceeds a task)."""
    from phrasekit_ray.stages.agg import default_partitions

    num_partitions = default_partitions(num_partitions)

    if input_rows is not None and input_rows <= driver_rows_threshold:
        import ray

        mat = edges_ds.materialize()
        tbl = pa.concat_tables(ray.get(mat.to_arrow_refs()))
        s = tbl.column("s").combine_chunks().cast(pa.int64()).to_numpy()
        o = tbl.column("o").combine_chunks().cast(pa.int64()).to_numpy()
        in_order = np.argsort(o, kind="stable")
        out_order = np.argsort(s, kind="stable")
        a, c = _wedge_cross(
            o[in_order], s[in_order], s[out_order], o[out_order]
        )
        out = pa.table(
            {"subj": pa.array(a, pa.int64()), "obj": pa.array(c, pa.int64())}
        )
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        step = max(1, -(-out.num_rows // cpus))
        slices = [out.slice(i, step) for i in range(0, max(out.num_rows, 1), step)]
        return ray.data.from_arrow(slices)

    def prep(batch: pa.Table) -> pa.Table:
        s = batch["s"].combine_chunks().cast(pa.int64()).to_numpy()
        o = batch["o"].combine_chunks().cast(pa.int64()).to_numpy()
        # each edge contributes to its dst's partition as an in-edge
        # (side 0, node = predecessor) and to its src's as an out-edge
        m = np.concatenate((o, s))
        node = np.concatenate((s, o))
        side = np.concatenate(
            (np.zeros(len(s), np.int8), np.ones(len(s), np.int8))
        )
        h = (m.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return pa.table(
            {
                "m": pa.array(m, pa.int64()),
                "node": pa.array(node, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "_part": pa.array(
                    (h % np.uint64(num_partitions)).astype(np.int32), pa.int32()
                ),
            }
        )

    def wedges(group: pa.Table) -> pa.Table:
        m = group["m"].combine_chunks().to_numpy()
        node = group["node"].combine_chunks().to_numpy()
        side = group["side"].combine_chunks().to_numpy()
        is_in = side == 0
        in_order = np.argsort(m[is_in], kind="stable")
        out_order = np.argsort(m[~is_in], kind="stable")
        a, c = _wedge_cross(
            m[is_in][in_order], node[is_in][in_order],
            m[~is_in][out_order], node[~is_in][out_order],
        )
        return pa.table(
            {"subj": pa.array(a, pa.int64()), "obj": pa.array(c, pa.int64())}
        )

    return (
        edges_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda grp: wedges(grp.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def _canonical_undirected(edges_ds, num_partitions=None):
    """edges(subj,obj,...) → distinct undirected pairs (u,v) with u<v,
    self-loops dropped. One count-aggregate (in-block combine first)."""
    from phrasekit_ray.stages.agg import grouped_count

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["subj"].combine_chunks().cast(pa.int64()).to_numpy()
        o = batch["obj"].combine_chunks().cast(pa.int64()).to_numpy()
        keep = s != o
        s, o = s[keep], o[keep]
        return pa.table(
            {
                "u": pa.array(np.minimum(s, o), pa.int64()),
                "v": pa.array(np.maximum(s, o), pa.int64()),
            }
        )

    dist = grouped_count(
        edges_ds.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        num_partitions=num_partitions,
    )
    return dist.map_batches(
        lambda b: b.select(["u", "v"]), batch_format="pyarrow"
    )


def _triangle_slice(blob, s: int, e: int):
    """Wedge enumeration + inline closure over one contiguous lo-segment
    slice of the (lo-sorted) oriented edge arrays; returns the slice's
    per-node triangle-corner counts (tiny: ≤ 3×triangles entries)."""
    lo_all, hi_all, allow = blob
    lo, hi = lo_all[s:e], hi_all[s:e]
    if not len(lo):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    pos, seg_len, lens = _segment_positions(lo)
    us, vs, ws = [], [], []
    for k in range(1, int(lens.max())):
        ok = pos + k < seg_len
        if not ok.any():
            break
        i = np.flatnonzero(ok)
        v = hi[i]
        w = hi[i + k]
        wk = (v << np.int64(32)) | w
        if len(allow):
            p = np.minimum(np.searchsorted(allow, wk), len(allow) - 1)
            hit = allow[p] == wk
        else:
            hit = np.zeros(len(wk), dtype=bool)
        if hit.any():
            us.append(lo[i][hit])
            vs.append(v[hit])
            ws.append(w[hit])
    if not us:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    corners = np.concatenate(
        [np.concatenate(us), np.concatenate(vs), np.concatenate(ws)]
    )
    ids, cnt = np.unique(corners, return_counts=True)
    return ids, cnt.astype(np.int64)


def _triangle_counts_driver(und, broadcast_nodes: int):
    """Driver-orchestrated triangle counts for an edge set under the
    broadcast bound (the SAME bound the distributed path already accepts
    for its closing-edge-key broadcast): degrees / orientation / edge-key
    sort are one numpy pass on the driver, wedge enumeration fans out as
    wedge-count-balanced slice tasks over one ``ray.put`` of the sorted
    arrays. Skips three all-to-all shuffles whose fixed cost dominates at
    ≤20M edges. Returns None when the node count exceeds
    ``broadcast_nodes`` (caller falls back to the distributed path)."""
    import ray

    tbls = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "n_triangles": pa.array([], pa.int64())}
            )
        )
    tbl = pa.concat_tables(tbls)
    u = tbl.column("u").combine_chunks().to_numpy()
    v = tbl.column("v").combine_chunks().to_numpy()
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    if len(nodes) > broadcast_nodes:
        return None
    deg = np.bincount(inv, minlength=len(nodes)).astype(np.int64)
    du, dv = deg[inv[: len(u)]], deg[inv[len(u):]]
    ru = (du << np.int64(32)) | u
    rv = (dv << np.int64(32)) | v
    lo = np.where(ru < rv, u, v)
    hi = np.where(ru < rv, v, u)
    rhi = np.maximum(ru, rv)
    ekeys = np.sort((lo << np.int64(32)) | hi)
    order = np.lexsort((rhi, lo))
    lo_s, hi_s = lo[order], hi[order]
    # wedge-count-balanced slicing at lo-segment boundaries
    starts = np.flatnonzero(
        np.concatenate(([True], lo_s[1:] != lo_s[:-1]))
    ) if len(lo_s) else np.zeros(0, np.int64)
    lens = np.diff(np.concatenate((starts, [len(lo_s)])))
    wedge_cum = np.cumsum(lens * (lens - 1) // 2)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_tasks = int(max(1, min(cpus, len(starts))))
    if n_tasks > 1 and wedge_cum[-1] > 0:
        targets = np.linspace(0, wedge_cum[-1], n_tasks + 1)[1:-1]
        seg_cut = np.minimum(np.searchsorted(wedge_cum, targets) + 1,
                             len(starts) - 1)
        bounds = np.unique(
            np.concatenate(([0], starts[seg_cut], [len(lo_s)]))
        )
    else:
        bounds = np.array([0, len(lo_s)], dtype=np.int64)
    blob = ray.put((lo_s, hi_s, ekeys))
    task = ray.remote(num_cpus=1)(_triangle_slice)
    parts = ray.get(
        [task.remote(blob, int(s), int(e))
         for s, e in zip(bounds[:-1], bounds[1:])]
    )
    ids = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    uids, inv2 = np.unique(ids, return_inverse=True)
    tot = np.zeros(len(uids), np.int64)
    np.add.at(tot, inv2, cnts)
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(uids, pa.int64()),
             "n_triangles": pa.array(tot, pa.int64())}
        )
    )


def triangle_counts(
    edges_ds,
    num_partitions: int | None = None,
    broadcast_nodes: int = 10_000_000,
    broadcast_edges: int = 20_000_000,
):
    """Per-node triangle counts over the undirected edge graph →
    (node, n_triangles), nodes in ≥1 triangle.

    ``broadcast_nodes`` / ``broadcast_edges`` bound the degree table and
    distinct-edge-key set (~160 MB of int64s each at the defaults) that
    may be pulled to the driver and re-broadcast; above them the
    operator falls back to fully-distributed joins.

    Distributed degree-ordered algorithm (the MapReduce-classic shape
    that bounds wedge blowup on skewed graphs): orient every edge from
    lower to higher (degree, id) rank so each node's OUT-degree is
    O(sqrt(m)); generate wedges only at each edge's low-rank endpoint
    (vectorized pair enumeration per hash partition — a stride loop over
    neighbor positions, never per-node Python); then one distributed
    SEMI join of packed wedge keys against packed oriented-edge keys.
    Every triangle is found exactly once (its rank-lowest corner).

    Node ids must fit 31 bits (packed pair keys); entity ids do.
    """
    from phrasekit_ray.stages.agg import (
        default_partitions,
        grouped_count,
        hash_aggregate,
        key_filter_join,
        lookup_join,
    )

    num_partitions = default_partitions(num_partitions)
    # consumed twice (degree count + degree attach): materialize so the
    # upstream distinct-aggregate runs once
    und = _canonical_undirected(edges_ds, num_partitions).materialize()

    # bounded fast path: an edge set the distributed path would broadcast
    # anyway (its closing-edge keys go to every worker) is orchestrated
    # from the driver with slice tasks — no all-to-all shuffles
    if und.count() <= broadcast_edges:
        fast = _triangle_counts_driver(und, broadcast_nodes)
        if fast is not None:
            return fast

    def explode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch["u"].combine_chunks(),
                        batch["v"].combine_chunks(),
                    ]
                )
            }
        )

    degrees = grouped_count(
        und.map_batches(explode, batch_format="pyarrow"),
        ["node"],
        count_col="deg",
        num_partitions=num_partitions,
    ).materialize()
    n_nodes = degrees.count()

    # degree attachment: the degree table is node-count-sized (≪ edges);
    # under the broadcast bound it ships ONCE as two sorted int arrays
    # and orientation is a stateless map — zero join shuffles. Above it,
    # two distributed lookup_joins (the general path).
    if n_nodes <= broadcast_nodes:
        import ray as _ray

        # materialized → block refs pull directly (iter_batches restarts a
        # streaming executor per pull, a measured ~2 s fixed cost)
        dtbl = pa.concat_tables(_ray.get(degrees.to_arrow_refs()))
        nk = dtbl.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        dg = dtbl.column("deg").combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(nk)
        deg_ref = _ray.put((nk[o], dg[o]))

        def attach(batch: pa.Table) -> pa.Table:
            from phrasekit_ray.stages.score import _get_broadcast

            keys, degs = _get_broadcast(deg_ref)
            u = batch["u"].combine_chunks().to_numpy()
            v = batch["v"].combine_chunks().to_numpy()
            du = degs[np.searchsorted(keys, u)]
            dv = degs[np.searchsorted(keys, v)]
            return pa.table(
                {
                    "u": pa.array(u, pa.int64()),
                    "v": pa.array(v, pa.int64()),
                    "deg_u": pa.array(du, pa.int64()),
                    "deg_v": pa.array(dv, pa.int64()),
                }
            )

        with_dd = und.map_batches(attach, batch_format="pyarrow")
    else:
        e_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
        with_du = lookup_join(
            und, degrees.map_batches(
                lambda b: pa.table({"node": b["node"], "deg_u": b["deg"]}),
                batch_format="pyarrow",
            ),
            "u", "node", num_partitions,
            left_schema=e_schema,
            right_schema=pa.schema([("node", pa.int64()), ("deg_u", pa.int64())]),
        )
        with_dd = lookup_join(
            with_du, degrees.map_batches(
                lambda b: pa.table({"node": b["node"], "deg_v": b["deg"]}),
                batch_format="pyarrow",
            ),
            "v", "node", num_partitions,
            left_schema=pa.schema(
                [("u", pa.int64()), ("v", pa.int64()), ("deg_u", pa.int64())]
            ),
            right_schema=pa.schema([("node", pa.int64()), ("deg_v", pa.int64())]),
        )

    def orient(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks().to_numpy()
        v = batch["v"].combine_chunks().to_numpy()
        du = batch["deg_u"].combine_chunks().to_numpy()
        dv = batch["deg_v"].combine_chunks().to_numpy()
        # rank = (deg, id) packed; orient low rank → high rank
        ru = (du << np.int64(32)) | u
        rv = (dv << np.int64(32)) | v
        lo = np.where(ru < rv, u, v)
        hi = np.where(ru < rv, v, u)
        rhi = np.maximum(ru, rv)
        h = (lo.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "rhi": pa.array(rhi, pa.int64()),
                "ekey": pa.array((lo << np.int64(32)) | hi, pa.int64()),
                "_part": pa.array(
                    (h % np.uint64(num_partitions)).astype(np.int32), pa.int32()
                ),
            }
        )

    # consumed twice (wedge generation + the closing-edge key set)
    oriented = with_dd.map_batches(orient, batch_format="pyarrow").materialize()

    # closing-edge membership: when the DISTINCT edge-key set fits the
    # broadcast bound, ship it once (sorted int64 array) and close
    # triangles INSIDE the wedge UDF — the ~(edges·out-degree/2) wedge
    # stream never touches the object store, only actual triangles do.
    # Above the bound: emit wedges and resolve with a distributed semi
    # join (the general path).
    n_edges = oriented.count()
    ekeys_ref = None
    if n_edges <= broadcast_edges:
        import ray as _ray

        # materialized → block refs pull directly (iter_batches restarts a
        # streaming executor per pull, a measured ~8 s fixed cost here)
        eks = [
            t.column("ekey").combine_chunks().to_numpy(zero_copy_only=False)
            for t in _ray.get(oriented.to_arrow_refs())
        ]
        ekeys = np.sort(np.concatenate(eks)) if eks else np.zeros(0, np.int64)
        ekeys_ref = _ray.put(ekeys)

    def wedges(group: pa.Table) -> pa.Table:
        lo = group["lo"].combine_chunks().to_numpy()
        hi = group["hi"].combine_chunks().to_numpy()
        rhi = group["rhi"].combine_chunks().to_numpy()
        n = len(lo)
        inline = ekeys_ref is not None
        cols = (["u", "v", "w"] if inline else ["wkey", "u", "v", "w"])
        empty = pa.table({c: pa.array([], pa.int64()) for c in cols})
        if n == 0:
            return empty
        allow = None
        if inline:
            from phrasekit_ray.stages.score import _get_broadcast

            allow = _get_broadcast(ekeys_ref)
        # neighbors of each lo node, ordered by the HI endpoint's rank so
        # emitted pairs (v, w) satisfy rank(v) < rank(w) = oriented order
        order = np.lexsort((rhi, lo))
        lo_s, hi_s = lo[order], hi[order]
        if inline:
            # stride loop with per-offset inline closure: each pass emits
            # only surviving triangles, so peak memory is one wedge slab
            pos, seg_len, lens = _segment_positions(lo_s)
            us, vs, ws = [], [], []
            for k in range(1, int(lens.max())):
                ok = pos + k < seg_len
                if not ok.any():
                    break
                i = np.flatnonzero(ok)
                v = hi_s[i]
                w = hi_s[i + k]
                wk = (v << np.int64(32)) | w
                if len(allow):
                    p = np.minimum(np.searchsorted(allow, wk), len(allow) - 1)
                    hit = allow[p] == wk
                else:
                    hit = np.zeros(len(wk), dtype=bool)
                if hit.any():
                    us.append(lo_s[i][hit])
                    vs.append(v[hit])
                    ws.append(w[hit])
            if not us:
                return empty
            return pa.table(
                {
                    "u": pa.array(np.concatenate(us), pa.int64()),
                    "v": pa.array(np.concatenate(vs), pa.int64()),
                    "w": pa.array(np.concatenate(ws), pa.int64()),
                }
            )
        i, j = _segment_pair_positions(lo_s)
        if not len(i):
            return empty
        u, v, w = lo_s[i], hi_s[i], hi_s[j]
        return pa.table(
            {
                "wkey": pa.array((v << np.int64(32)) | w, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )

    wedge_ds = oriented.groupby("_part").map_groups(
        lambda g: wedges(g.drop_columns(["_part"])), batch_format="pyarrow"
    )
    if ekeys_ref is not None:
        tri = wedge_ds
    else:
        tri = key_filter_join(
            wedge_ds,
            oriented.map_batches(
                lambda b: pa.table({"ekey": b["ekey"]}), batch_format="pyarrow"
            ),
            "wkey",
            "ekey",
            anti=False,
            num_partitions=num_partitions,
            left_schema=pa.schema(
                [("wkey", pa.int64()), ("u", pa.int64()), ("v", pa.int64()),
                 ("w", pa.int64())]
            ),
        )

    def corners(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch["u"].combine_chunks(),
                        batch["v"].combine_chunks(),
                        batch["w"].combine_chunks(),
                    ]
                )
            }
        )

    return grouped_count(
        tri.map_batches(corners, batch_format="pyarrow"),
        ["node"],
        count_col="n_triangles",
        num_partitions=num_partitions,
    )


def _k_hop_driver(und, hops: int, seed: int | None):
    """Driver BFS for an edge set under the broadcast bound: one pull of
    the (already distinct) undirected edges, CSR adjacency, numpy
    frontier sweeps — the same bounded-driver pattern as
    _triangle_counts_driver. Always returns a (node, dist) dataset; when
    a seed is given it is emitted at dist 0 even if the edge pull is
    empty."""
    import ray

    tbls = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows]
    u = (
        np.concatenate([t.column("u").combine_chunks().to_numpy() for t in tbls])
        if tbls else np.zeros(0, np.int64)
    )
    v = (
        np.concatenate([t.column("v").combine_chunks().to_numpy() for t in tbls])
        if tbls else np.zeros(0, np.int64)
    )
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    nodes, inv_src = np.unique(src, return_inverse=True)
    if seed is None:
        if not len(nodes):
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
            )
        seed = int(nodes.min())
    order = np.argsort(inv_src, kind="stable")
    dst_sorted = dst[order]
    starts = np.searchsorted(inv_src[order], np.arange(len(nodes) + 1))
    dist = np.full(len(nodes), -1, np.int64)
    out_nodes, out_dists = [np.array([seed], np.int64)], [np.zeros(1, np.int64)]
    si = np.searchsorted(nodes, seed)
    frontier = np.zeros(0, np.int64)
    if si < len(nodes) and nodes[si] == seed:
        dist[si] = 0
        frontier = np.array([si], np.int64)
    for h in range(1, hops + 1):
        if not len(frontier):
            break
        # gather all frontier adjacency ranges vectorized (range-expand
        # via repeat + cumsum, no per-node Python)
        lens_f = starts[frontier + 1] - starts[frontier]
        total_f = int(lens_f.sum())
        if not total_f:
            break
        seg_off = np.concatenate(([0], np.cumsum(lens_f)[:-1]))
        idx = (
            np.repeat(starts[frontier], lens_f)
            + np.arange(total_f)
            - np.repeat(seg_off, lens_f)
        )
        neigh = np.unique(dst_sorted[idx])
        ni = np.searchsorted(nodes, neigh)
        fresh = ni[dist[ni] < 0]
        if not len(fresh):
            break
        dist[fresh] = h
        out_nodes.append(nodes[fresh])
        out_dists.append(np.full(len(fresh), h, np.int64))
        frontier = fresh
    node_arr = np.concatenate(out_nodes)
    dist_arr = np.concatenate(out_dists)
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(node_arr, pa.int64()),
             "dist": pa.array(dist_arr, pa.int64())}
        )
    )


def k_hop(edges_ds, hops: int = 3, seed: int | None = None,
          num_partitions: int | None = None,
          broadcast_edges: int = 20_000_000):
    """BFS distance labels (node, dist) for every node within ``hops``
    undirected hops of ``seed`` (default: the graph's min node id).

    Iterative frontier expansion — per hop one SEMI join (edges whose
    source is in the frontier; broadcast while the frontier is small,
    partitioned above the threshold) and one ANTI join against the
    visited set. ``hops`` is small and fixed; the corpus-side edge set
    never moves to the driver on the distributed path. Under
    ``broadcast_edges`` the whole BFS runs on the driver over one edge
    pull (CSR + numpy sweeps) — 2·hops shuffle-join barriers replaced
    by array ops, same bounded-fast-path/distributed-fallback shape as
    triangle_counts."""
    from phrasekit_ray.stages.agg import (
        default_partitions,
        grouped_count,
        key_filter_join,
    )

    num_partitions = default_partitions(num_partitions)
    und = _canonical_undirected(edges_ds, num_partitions)

    und_mat = und.materialize()
    if und_mat.count() <= broadcast_edges:
        return _k_hop_driver(und_mat, hops, seed)
    und = und_mat

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks()
        v = batch["v"].combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([u, v]),
                "dst": pa.concat_arrays([v, u]),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pyarrow").materialize()
    import ray

    if seed is None:
        lo = adj.min("src") if adj.count() else None
        if lo is None:
            # empty graph: no seed to expand from → empty labels
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
            )
        seed = int(lo)

    frontier = ray.data.from_arrow(
        pa.table({"node": pa.array([seed], pa.int64()),
                  "dist": pa.array([0], pa.int64())})
    )
    visited = frontier
    out = [frontier]
    a_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    for h in range(1, hops + 1):
        hit = key_filter_join(
            adj, frontier, "src", "node",
            num_partitions=num_partitions, left_schema=a_schema,
        )
        cand = grouped_count(
            hit.map_batches(
                lambda b: pa.table({"node": b["dst"]}), batch_format="pyarrow"
            ),
            ["node"],
            num_partitions=num_partitions,
        ).map_batches(
            lambda b, d=h: pa.table(
                {
                    "node": b["node"],
                    "dist": pa.array(
                        np.full(b.num_rows, d, dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        nd_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
        frontier = key_filter_join(
            cand, visited, "node", "node", anti=True,
            num_partitions=num_partitions, left_schema=nd_schema,
        ).materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).materialize()
        out.append(frontier)
    res = out[0]
    for f in out[1:]:
        res = res.union(f)
    return res


def label_propagation_communities(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 10,
    num_partitions: int | None = None,
):
    """Community detection by DETERMINISTIC synchronous label propagation
    over an undirected edge Dataset → (node: int64, label: int64).

    Update rule (fixed, so results are reproducible across runs and
    partitionings): each round every node adopts the most frequent label
    among its NEIGHBORS, ties broken by the smallest label; nodes start
    labeled with their own id. The loop stops early at a FIXPOINT,
    detected by a per-row (node,label) hash sum — the plain label-sum
    test CC uses is unsound here because LPA admits sum-preserving
    label changes (a two-node swap) — and is capped at ``max_rounds``
    because synchronous LPA can oscillate on bipartite structures; the
    cap makes the operator total, and the tie-break makes the capped
    result deterministic.

    Scale shape per round (no driver-side graph state):
      1. two int-keyed hash joins attach current labels to edge
         endpoints; each edge sends its endpoint's label to the
         opposite endpoint,
      2. ONE hash_aggregate counts votes per (node, label),
      3. the per-node argmax (count desc, label asc) is a SECOND
         hash_aggregate over a packed score ``count·2³² − label`` —
         max(score) IS the lexicographic argmax, so no per-group sort.
    Bounds (validated): labels < 2³² and vote counts < 2³¹ so the packed
    score fits int64 — node ids must be < 2³² (remap upstream if not).
    """
    num_partitions = num_partitions or 8

    _LBL_MAX = np.int64(1) << np.int64(32)

    def norm_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch[src_col].cast(pa.int64()),
                "dst": batch[dst_col].cast(pa.int64()),
            }
        )

    edges = edges_ds.map_batches(norm_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        # joins on an empty dataset lose the schema (same empty-edge class
        # the triangle driver path guards); the community set is empty
        import ray

        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        )

    def initial_labels(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
        )
        mx = pc.max(nodes).as_py()
        mn = pc.min(nodes).as_py()
        if mx is not None and (mx >= int(_LBL_MAX) or mn < 0):
            # the packed-score modulo silently corrupts negative ids, so
            # they must be rejected, not just ids >= 2^32
            raise ValueError(
                "label_propagation_communities: node ids must be in "
                "[0, 2^32) (packed-argmax bound); remap ids upstream"
            )
        return pa.table({"node": nodes, "label": nodes})

    labels = hash_aggregate(
        edges.map_batches(initial_labels, batch_format="pyarrow"),
        "node",
        [("label", "min")],
    ).materialize()

    def fp_rows(batch: pa.Table) -> pa.Table:
        # 32-bit per-row mix of (node, label); summing int32 mixes into
        # an int64 cannot overflow below 2^31 nodes (document the bound —
        # beyond that, widen the convergence check or drop early-stop)
        node = batch["node"].combine_chunks().to_numpy().astype(np.uint64)
        lbl = batch["label"].combine_chunks().to_numpy().astype(np.uint64)
        h = (node * np.uint64(0x9E3779B97F4A7C15)) ^ (
            lbl * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        return pa.table(
            {"fp": pa.array((h >> np.uint64(32)).astype(np.int64), pa.int64())}
        )

    def state_fp(lab) -> int:
        # label-SUM stability (the CC convergence test) is unsound for
        # LPA: sum-preserving label changes exist (e.g. a two-node swap),
        # so the loop would freeze mid-oscillation on a non-fixpoint.
        # A per-row (node,label) hash sum changes w.h.p. for ANY state
        # change, making the early stop a fixpoint test.
        return lab.map_batches(fp_rows, batch_format="pyarrow").sum("fp")

    prev_fp = state_fp(labels)

    def msg_to_dst(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["dst"],
                "label": batch["label"],
                "votes": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    def msg_to_src(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["src"],
                "label": batch["label"],
                "votes": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    def pack(batch: pa.Table) -> pa.Table:
        votes = batch["votes"].combine_chunks().to_numpy()
        lbl = batch["label"].combine_chunks().to_numpy()
        if len(votes) and votes.max() >= (1 << 31):
            raise ValueError(
                "label_propagation_communities: vote count >= 2^31 "
                "overflows the packed score"
            )
        score = votes * _LBL_MAX - lbl
        return pa.table(
            {"node": batch["node"], "score": pa.array(score, pa.int64())}
        )

    def unpack(batch: pa.Table) -> pa.Table:
        score = batch["score"].combine_chunks().to_numpy()
        lbl = (-score) % _LBL_MAX
        return pa.table(
            {"node": batch["node"], "label": pa.array(lbl, pa.int64())}
        )

    for _ in range(max_rounds):
        j_src = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        )
        j_dst = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("node",),
        )
        votes = hash_aggregate(
            j_src.map_batches(msg_to_dst, batch_format="pyarrow").union(
                j_dst.map_batches(msg_to_src, batch_format="pyarrow")
            ),
            ["node", "label"],
            [("votes", "sum")],
        )
        labels = (
            hash_aggregate(
                votes.map_batches(pack, batch_format="pyarrow"),
                "node",
                [("score", "max")],
            )
            .map_batches(unpack, batch_format="pyarrow")
            .materialize()
        )
        cur = state_fp(labels)
        if cur == prev_fp:
            break
        prev_fp = cur
    return labels


def k_core(
    edges_ds,
    k: int = 2,
    subj_col: str = "subj",
    obj_col: str = "obj",
    max_rounds: int = 256,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_partitions: int = 16,
    input_token: str | None = None,
):
    """Distributed k-core (X113): iteratively peel nodes whose
    undirected degree over DISTINCT non-loop edges is < ``k`` until a
    fixpoint; returns Dataset(node, degree) — the surviving nodes with
    their in-core degree. The classic graph-cleaning pass before
    community/centrality work (Seidman 1983).

    Scale shape per round: ONE two-phase degree aggregate + TWO
    semi-joins (cardinality-chosen broadcast/partitioned paths) keep
    only edges between survivors; the driver holds the survivor COUNT —
    a scalar — and stops when it is unchanged (no node removed ⇒
    degrees unchanged ⇒ fixpoint; sound). Peel depth is bounded by the
    longest removal CHAIN (a path graph peels two endpoints per round —
    O(diameter), NOT O(max degree)); if ``max_rounds`` is exhausted
    before the fixpoint the function RAISES rather than silently
    returning a non-core.

    ``checkpoint_dir`` makes the ITERATION resumable (the lineage
    pattern applied to loop state): after each round the surviving edge
    set lands as hash-partitioned parquet + a round marker manifest; a
    restarted job resumes from the last complete round instead of
    re-peeling from scratch. Long-running multi-round graph jobs on
    preemptible clusters need exactly this.
    """
    from phrasekit_ray.stages.agg import hash_aggregate, key_filter_join

    if k < 1:
        raise ValueError("k_core: k must be >= 1")

    def conform(b: pa.Table) -> pa.Table:
        a = b[subj_col].combine_chunks().cast(pa.int64()).to_numpy()
        c = b[obj_col].combine_chunks().cast(pa.int64()).to_numpy()
        lo = np.minimum(a, c)
        hi = np.maximum(a, c)
        m = lo != hi  # drop self-loops
        return pa.table(
            {
                "a": pa.array(lo[m], pa.int64()),
                "b": pa.array(hi[m], pa.int64()),
                "_one": pa.array(np.ones(int(m.sum()), np.int64)),
            }
        )

    # DISTINCT undirected edges
    edges = hash_aggregate(
        edges_ds.map_batches(conform, batch_format="pyarrow"),
        ["a", "b"],
        [("_one", "sum")],
        num_partitions=num_partitions,
    ).drop_columns(["_one"]).materialize()

    def halves(b: pa.Table) -> pa.Table:
        node = pa.concat_arrays(
            [b["a"].combine_chunks(), b["b"].combine_chunks()]
        )
        return pa.table(
            {"node": node, "_one": pa.array(np.ones(len(node), np.int64))}
        )

    prev = -1
    surv = None
    converged = False
    start_round = 0
    fp = None
    if checkpoint_dir:
        import json as _json

        from phrasekit_ray.state import lineage

        # The fingerprint must identify the INPUT, not just {op, k}:
        # reusing a checkpoint_dir after the edge set changed would
        # silently resume from stale edges and return a wrong core
        # (ADVICE r4). Callers can supply ``input_token`` (e.g. a
        # source-manifest hash) to skip the extra pass; otherwise we
        # compute an order-insensitive content signature of the
        # conformed distinct-edge table — per-block splitmix partial
        # sums, one row per block on the driver (bounded).
        if input_token is None:
            from phrasekit_ray.sources.pages import splitmix17

            def _edge_sig(b: pa.Table) -> pa.Table:
                a = b["a"].combine_chunks().to_numpy().astype(np.uint64)
                c = b["b"].combine_chunks().to_numpy().astype(np.uint64)
                h = splitmix17(
                    a * np.uint64(0x9E3779B97F4A7C15) ^ splitmix17(c)
                )
                with np.errstate(over="ignore"):
                    s = int(h.sum(dtype=np.uint64))
                return pa.table(
                    {
                        "sig": pa.array([s], pa.uint64()),
                        "n": pa.array([len(h)], pa.int64()),
                    }
                )

            parts = edges.map_batches(
                _edge_sig, batch_format="pyarrow"
            ).take_all()
            sig = sum(int(r["sig"]) for r in parts) % (1 << 64)
            n_edges = sum(int(r["n"]) for r in parts)
            input_token = f"{n_edges}:{sig:016x}"

        fp = lineage.fingerprint(
            {"op": "k_core", "k": k, "input": input_token}
        )
        last = None
        r = 0
        while lineage.partition_complete(checkpoint_dir, "kcore_round", r, fp):
            last = r
            r += 1
        if last is not None:
            with open(
                lineage.manifest_path(checkpoint_dir, "kcore_round", last)
            ) as f:
                prev = int(_json.load(f)["prev_count"])
            edges = lineage.read_partitioned(
                checkpoint_dir, f"kcore_edges_{last}"
            ).materialize()
            start_round = last + 1

    for _round in range(start_round, max_rounds):
        deg = hash_aggregate(
            edges.map_batches(halves, batch_format="pyarrow"),
            ["node"],
            [("_one", "sum")],
            num_partitions=num_partitions,
        )

        def keep(b: pa.Table) -> pa.Table:
            m = pc.greater_equal(b["_one"], pa.scalar(k))
            t = b.filter(m)
            return pa.table({"node": t["node"], "degree": t["_one"]})

        surv = deg.map_batches(keep, batch_format="pyarrow").materialize()
        n = surv.count()
        if n == prev:
            converged = True
            break
        prev = n
        if n == 0:
            return surv  # fully peeled
        edges = key_filter_join(edges, surv, "a", "node")
        edges = key_filter_join(edges, surv, "b", "node").materialize()
        if checkpoint_dir:
            from phrasekit_ray.state import lineage

            lineage.write_dataset_resumable(
                edges,
                checkpoint_dir,
                f"kcore_edges_{_round}",
                {"k": k, "round": _round},
                "a",
                num_partitions=checkpoint_partitions,
            )
            # marker LAST: a crash mid-edge-write resumes the same round
            lineage.write_partition(
                checkpoint_dir,
                "kcore_round",
                _round,
                pa.table({"round": pa.array([_round], pa.int64())}),
                fp,
                extra={"prev_count": prev},
            )
    if not converged:
        raise RuntimeError(
            f"k_core: no fixpoint within max_rounds={max_rounds} "
            "(long peel chains — raise max_rounds)"
        )
    return surv


def link_prediction(
    edges_ds,
    max_middle_degree: int = 0,
    num_partitions: int | None = None,
):
    """Common-neighbor / Adamic–Adar link prediction over the undirected
    graph: for every NON-adjacent pair (u, v) with ≥1 common neighbor,
    emit (u, v, cn, aa_micro) where cn = |Γ(u) ∩ Γ(v)| and aa_micro =
    Σ_{z ∈ Γ(u)∩Γ(v)} round(10⁶ / ln(deg z)) — Adamic–Adar in integer
    micro-units, so the distributed sum is order-independent and the SQL
    twin lands on the identical value (common neighbors always have
    deg ≥ 2, so ln(deg) > 0).

    Distributed shape: canonical distinct undirected edges → adjacency
    exploded both ways → hash-partition by the MIDDLE node (a node's
    whole neighborhood co-locates, so deg(z) = its segment length — no
    degree join needed) → vectorized within-segment pair enumeration
    (`_segment_pair_positions`, same stride kernel as
    cooccurrence_edges) → two-phase (cn, aa) aggregate → packed-key ANTI
    join against the edge set drops existing links. Wedge blowup is
    Σ C(deg, 2): ``max_middle_degree > 0`` skips hub middles above the
    cap (the standard miss-only pressure valve for skewed graphs —
    capped output ⊆ uncapped; off in oracle-checked runs).

    Node ids must fit 31 bits (packed (u,v) anti-join keys), same
    contract as triangle_counts.
    """
    from phrasekit_ray.stages.agg import (
        default_partitions,
        hash_aggregate,
        key_filter_join,
    )

    num_partitions = default_partitions(num_partitions)
    und = _canonical_undirected(edges_ds, num_partitions).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch["v"].combine_chunks().to_numpy(zero_copy_only=False)
        z = np.concatenate([u, v])
        x = np.concatenate([v, u])
        h = (z.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return pa.table(
            {
                "z": pa.array(z, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "_part": pa.array(
                    (h % np.uint64(num_partitions)).astype(np.int32), pa.int32()
                ),
            }
        )

    def wedge_pairs(group: pa.Table) -> pa.Table:
        z = group["z"].combine_chunks().to_numpy(zero_copy_only=False)
        x = group["x"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((x, z))
        z, x = z[order], x[order]
        # edges are distinct → no within-segment dup (z, x) rows
        pos, seg_len, _ = _segment_positions(z)
        if max_middle_degree > 0:
            keep = seg_len <= max_middle_degree
            z, x = z[keep], x[keep]
            if len(z) == 0:
                return pa.table(
                    {
                        "a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "cn": pa.array([], pa.int64()),
                        "aa_micro": pa.array([], pa.int64()),
                    }
                )
            pos, seg_len, _ = _segment_positions(z)
        i, j = _segment_pair_positions(z)
        deg = seg_len[i].astype(np.float64)  # = deg(z) of the middle
        w = np.where(
            seg_len[i] >= 2,
            np.where(
                np.log(np.maximum(deg, 2.0)) != 0,
                1e6 / np.log(np.maximum(deg, 2.0)),
                0.0,
            ),
            0.0,
        )
        w_micro = np.where(
            w >= 0, np.floor(w + 0.5), np.ceil(w - 0.5)
        ).astype(np.int64)
        a, b = x[i], x[j]  # x sorted within segment → a < b already
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "cn": pa.array(np.ones(len(a), np.int64), pa.int64()),
                "aa_micro": pa.array(w_micro, pa.int64()),
            }
        )

    pair_scores = hash_aggregate(
        und.map_batches(explode, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: wedge_pairs(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        ),
        ["a", "b"],
        [("cn", "sum"), ("aa_micro", "sum")],
        num_partitions=num_partitions,
    )

    PACK = np.int64(1) << np.int64(31)

    def pack_pairs(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = batch["b"].combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("_pk", pa.array(a * PACK + b, pa.int64()))

    def pack_edges(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch["v"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"_ek": pa.array(u * PACK + v, pa.int64())})

    non_edges = key_filter_join(
        pair_scores.map_batches(pack_pairs, batch_format="pyarrow"),
        und.map_batches(pack_edges, batch_format="pyarrow"),
        "_pk",
        "_ek",
        anti=True,
    )
    return non_edges.map_batches(
        lambda b: b.select(["a", "b", "cn", "aa_micro"]),
        batch_format="pyarrow",
    )


def _ppr_driver(edges_tbl: pa.Table, n_seeds, iters, an, ad, total_micro):
    """Bounded driver fast path for :func:`ppr_exact` — the IDENTICAL
    integer recurrence vectorized over the pulled edge table (np.add.at
    int64 sums are order-independent, so fast == distributed exactly;
    tests force the distributed path with driver_edges_threshold=0)."""
    subj = edges_tbl["subj"].to_numpy(zero_copy_only=False)
    obj = edges_tbl["obj"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([subj, obj]))
    si = np.searchsorted(nodes, subj)
    oi = np.searchsorted(nodes, obj)
    od = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    n_s = min(n_seeds, len(nodes))
    r = np.zeros(len(nodes), np.int64)
    r[:n_s] = total_micro // n_s
    base = ((ad - an) * total_micro) // (ad * n_s)
    for _ in range(iters):
        q = (r[si] * an) // (ad * od[si])
        nr = np.zeros(len(nodes), np.int64)
        np.add.at(nr, oi, q)
        nr[:n_s] += base
        r = nr
    return pa.table(
        {"node": pa.array(nodes, pa.int64()),
         "rank_micro": pa.array(r, pa.int64())}
    )


def ppr_exact(
    edges_ds,
    n_seeds: int = 4,
    iters: int = 4,
    alpha_num: int = 85,
    alpha_den: int = 100,
    total_micro: int = 10**12,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_partitions: int | None = None,
    driver_edges_threshold: int = 5_000_000,
):
    """Personalized PageRank in EXACT integer micro-units — the
    oracle-checkable sibling of :func:`pagerank` (whose float ranks are
    only verifiable via an in-band residual column).

    Semantics (the "sink-loss" PPR variant; Jeh & Widom 2003 shape):

    - graph = DISTINCT directed edges, self-loops dropped;
    - seeds = the ``n_seeds`` smallest node ids (deterministic and
      SQL-expressible, same convention as the k-means/PQ seed pick);
    - r0(v) = total_micro // |S| for seeds, else 0;
    - per round, every node u with outdeg d sends each out-neighbor
      q(u) = (r(u) * alpha_num) // (alpha_den * d)   [int64 floor div]
      and r'(v) = base(v) + Σ_{u→v} q(u), where base(v ∈ S) =
      ((alpha_den - alpha_num) * total_micro) // (alpha_den * |S|).
      Mass reaching dangling nodes is NOT redistributed (documented
      divergence from :func:`pagerank`): every operation stays a pure
      int64 function of the input, so the unrolled SQL twin reproduces
      each round bit-for-bit regardless of partitioning.

    Distribution per round: ONE int-keyed ``lookup_join`` (rank ⋈
    outdeg — the per-node quotient is computed once, not once per
    edge), ONE ``lookup_join`` attaching quotients to edges, ONE
    two-phase ``hash_aggregate`` into the target node; the driver holds
    only the seed list. Ranks re-materialize once per round (an
    iterative lazy graph would re-execute all prior rounds).

    Returns Dataset(node: int64, rank_micro: int64).
    """
    import ray

    from phrasekit_ray.stages.agg import default_partitions as _dp
    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate, lookup_join

    if n_seeds < 1:
        raise ValueError("n_seeds must be >= 1")
    num_partitions = _dp(num_partitions)

    def conform(batch: pa.Table) -> pa.Table:
        s = batch[subj_col].cast(pa.int64())
        o = batch[obj_col].cast(pa.int64())
        keep = pc.invert(pc.equal(s, o))
        return pa.table({"subj": s.filter(keep), "obj": o.filter(keep)})

    edges = grouped_count(
        edges_ds.map_batches(conform, batch_format="pyarrow"),
        ["subj", "obj"],
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.select(["subj", "obj"]), batch_format="pyarrow"
    ).materialize()

    def halves(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [batch["subj"].combine_chunks(), batch["obj"].combine_chunks()]
            )}
        )

    nodes = grouped_count(
        edges.map_batches(halves, batch_format="pyarrow"),
        "node",
        num_partitions=num_partitions,
    ).map_batches(lambda b: b.select(["node"]), batch_format="pyarrow").materialize()
    if nodes.count() == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "rank_micro": pa.array([], pa.int64())})
        )

    # bounded fast path (triangle_counts convention): a deduped edge set
    # under the threshold (~80 MB int64 pairs at the default) runs the
    # identical recurrence vectorized on the driver — per-round join
    # scheduling dominates tiny graphs otherwise
    if edges.count() <= driver_edges_threshold:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        return ray.data.from_arrow(
            _ppr_driver(tbl, n_seeds, iters, alpha_num, alpha_den, total_micro)
        )

    seeds = sorted(
        r["node"] for r in nodes.sort("node").limit(n_seeds).take(n_seeds)
    )
    n_s = len(seeds)
    seed_arr = np.asarray(seeds, np.int64)
    r0 = total_micro // n_s
    base = ((alpha_den - alpha_num) * total_micro) // (alpha_den * n_s)

    outdeg = grouped_count(
        edges, "subj", count_col="od", num_partitions=num_partitions
    ).materialize()

    def init(batch: pa.Table) -> pa.Table:
        n = batch["node"].combine_chunks().to_numpy(zero_copy_only=False)
        r = np.where(np.isin(n, seed_arr), np.int64(r0), np.int64(0))
        return pa.table({"node": batch["node"], "rank_micro": pa.array(r, pa.int64())})

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()
    ranks_schema = pa.schema([("node", pa.int64()), ("rank_micro", pa.int64())])
    od_schema = pa.schema([("subj", pa.int64()), ("od", pa.int64())])
    edges_schema = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])
    q_schema = pa.schema([("node", pa.int64()), ("q", pa.int64())])

    an, ad = np.int64(alpha_num), np.int64(alpha_den)

    for _ in range(iters):
        rq = lookup_join(
            ranks, outdeg, "node", "subj", num_partitions,
            left_schema=ranks_schema, right_schema=od_schema,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "q": pa.array(
                        (b["rank_micro"].to_numpy(zero_copy_only=False) * an)
                        // (ad * b["od"].to_numpy(zero_copy_only=False)),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contribs = lookup_join(
            edges, rq, "subj", "node", num_partitions,
            left_schema=edges_schema, right_schema=q_schema,
        ).map_batches(
            lambda b: pa.table({"node": b["obj"], "s": b["q"]}),
            batch_format="pyarrow",
        )
        zeros = nodes.map_batches(
            lambda b: pa.table(
                {"node": b["node"],
                 "s": pa.array(np.zeros(b.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        )
        sums = hash_aggregate(
            contribs.union(zeros), ["node"], [("s", "sum")],
            num_partitions=num_partitions,
        )

        def renorm(b: pa.Table) -> pa.Table:
            n = b["node"].combine_chunks().to_numpy(zero_copy_only=False)
            s = b["s"].combine_chunks().to_numpy(zero_copy_only=False)
            r = s + np.where(np.isin(n, seed_arr), np.int64(base), np.int64(0))
            return pa.table({"node": b["node"], "rank_micro": pa.array(r, pa.int64())})

        ranks = sums.map_batches(renorm, batch_format="pyarrow").materialize()
    return ranks


def _sssp_driver(edges_tbl: pa.Table, source: int, iters: int):
    """Bounded driver fast path for :func:`sssp_exact` — identical
    hop-bounded relaxation vectorized with np.minimum.at (min is
    order-independent; tests force the distributed path too)."""
    subj = edges_tbl["subj"].to_numpy(zero_copy_only=False)
    obj = edges_tbl["obj"].to_numpy(zero_copy_only=False)
    w = edges_tbl["w"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([subj, obj, [source]]))
    si = np.searchsorted(nodes, subj)
    oi = np.searchsorted(nodes, obj)
    INF = np.int64(1) << np.int64(62)
    dist = np.full(len(nodes), INF, np.int64)
    dist[np.searchsorted(nodes, source)] = 0
    for _ in range(iters):
        nd = dist.copy()
        reach = dist[si] < INF
        np.minimum.at(nd, oi[reach], dist[si][reach] + w[reach])
        dist = nd
    m = dist < INF
    return pa.table(
        {"node": pa.array(nodes[m], pa.int64()),
         "dist": pa.array(dist[m], pa.int64())}
    )


def sssp_exact(
    edges_ds,
    source: int,
    iters: int = 6,
    subj_col: str = "subj",
    obj_col: str = "obj",
    weight_col: str = "w",
    num_partitions: int | None = None,
    driver_edges_threshold: int = 5_000_000,
):
    """Hop-bounded single-source shortest paths (Bellman–Ford, T
    relaxation rounds) with EXACT int64 weights — after round T every
    returned distance is the exact weight of the lightest path from
    ``source`` using ≤ T edges; unreached nodes are absent (no ∞
    sentinel to round-trip through SQL).

    Parallel edges collapse to their MIN weight first (one two-phase
    aggregate), so the recurrence is a pure function of the distinct
    weighted edge set. Each round is ONE int-keyed ``lookup_join``
    (edge ⋈ current frontier distances — the right side is the
    unique-keyed dist table) + ONE two-phase MIN ``hash_aggregate``
    over old dists ∪ relaxations; the driver holds only the source id.
    min() over int64 is order-independent, so the unrolled SQL twin is
    bit-exact at any partitioning.

    Returns Dataset(node: int64, dist: int64), source included at 0.
    """
    import ray

    from phrasekit_ray.stages.agg import default_partitions as _dp
    from phrasekit_ray.stages.agg import hash_aggregate, lookup_join

    num_partitions = _dp(num_partitions)

    def conform(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": batch[subj_col].cast(pa.int64()),
                "obj": batch[obj_col].cast(pa.int64()),
                "w": batch[weight_col].cast(pa.int64()),
            }
        )

    edges = hash_aggregate(
        edges_ds.map_batches(conform, batch_format="pyarrow"),
        ["subj", "obj"],
        [("w", "min")],
        num_partitions=num_partitions,
    ).materialize()

    if edges.count() <= driver_edges_threshold:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        return ray.data.from_arrow(_sssp_driver(tbl, int(source), iters))

    dist = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([int(source)], pa.int64()),
                "dist": pa.array([0], pa.int64()),
            }
        )
    )
    edges_schema = pa.schema(
        [("subj", pa.int64()), ("obj", pa.int64()), ("w", pa.int64())]
    )
    dist_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    for _ in range(iters):
        relax = lookup_join(
            edges, dist, "subj", "node", num_partitions,
            left_schema=edges_schema, right_schema=dist_schema,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["obj"],
                    "dist": pc.add_checked(b["w"], b["dist"]),
                }
            ),
            batch_format="pyarrow",
        )
        dist = hash_aggregate(
            dist.union(relax), ["node"], [("dist", "min")],
            num_partitions=num_partitions,
        ).materialize()
    return dist


def _hits_driver(edges_tbl: pa.Table, iters: int, scale: int):
    """Bounded driver fast path for :func:`hits_exact` — identical
    integer recurrence vectorized with np.add.at (sums and maxima are
    order-independent; tests force the distributed path too)."""
    subj = edges_tbl["subj"].to_numpy(zero_copy_only=False)
    obj = edges_tbl["obj"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([subj, obj]))
    si = np.searchsorted(nodes, subj)
    oi = np.searchsorted(nodes, obj)
    sc = np.int64(scale)
    auth = np.full(len(nodes), sc, np.int64)
    hub = np.full(len(nodes), sc, np.int64)
    for _ in range(iters):
        araw = np.zeros(len(nodes), np.int64)
        np.add.at(araw, oi, hub[si])
        qa = max((int(araw.max(initial=0)) + scale - 1) // scale, 1)
        auth = araw // np.int64(qa)
        hraw = np.zeros(len(nodes), np.int64)
        np.add.at(hraw, si, auth[oi])
        qh = max((int(hraw.max(initial=0)) + scale - 1) // scale, 1)
        hub = hraw // np.int64(qh)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "auth_micro": pa.array(auth, pa.int64()),
            "hub_micro": pa.array(hub, pa.int64()),
        }
    )


def hits_exact(
    edges_ds,
    iters: int = 4,
    scale: int = 10**6,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_partitions: int | None = None,
    driver_edges_threshold: int = 5_000_000,
):
    """HITS hubs & authorities (Kleinberg 1999 shape) in EXACT integer
    arithmetic — the oracle-checkable complement to PageRank-family
    centrality (X49 float / X138 exact-int PPR): authorities are pages
    many good hubs point AT, hubs are pages that point at many good
    authorities.

    Semantics (pure int64 function of the distinct edge set, so the
    unrolled SQL twin reproduces every round bit-for-bit):

    - graph = DISTINCT directed edges, self-loops dropped;
    - a0(v) = h0(v) = ``scale`` for every node;
    - per round:  araw(v) = Σ_{u→v} h(u);   a(v) = araw(v) // qa
      with qa = max(ceil(max_v araw(v) / scale), 1)   [the divide-by-
      ceil form keeps every intermediate ≤ indeg·scale — no
      (value·scale) multiply that could overflow int64 on a mega-hub];
      then hraw(u) = Σ_{u→v} a(v);  h(u) = hraw(u) // qh likewise.
      After normalization the max score each round is ~scale (floor
      drift ±1 is shared exactly by the SQL twin).

    Distribution per round: TWO int-keyed ``lookup_join``s (edges ⋈
    hubs on subj, then edges ⋈ authorities on obj — each score table is
    unique-keyed and small enough to broadcast at any realistic node
    count) + TWO two-phase sum ``hash_aggregate``s + two scalar MAX
    reductions; the driver holds only the two scalar maxima. Scores
    re-materialize once per round (an iterative lazy graph would
    re-execute all prior rounds).

    Returns Dataset(node: int64, auth_micro: int64, hub_micro: int64).
    """
    import ray

    from phrasekit_ray.stages.agg import default_partitions as _dp
    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate, lookup_join

    if iters < 1:
        raise ValueError("iters must be >= 1")
    num_partitions = _dp(num_partitions)

    def conform(batch: pa.Table) -> pa.Table:
        s = batch[subj_col].cast(pa.int64())
        o = batch[obj_col].cast(pa.int64())
        keep = pc.invert(pc.equal(s, o))
        return pa.table({"subj": s.filter(keep), "obj": o.filter(keep)})

    edges = grouped_count(
        edges_ds.map_batches(conform, batch_format="pyarrow"),
        ["subj", "obj"],
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.select(["subj", "obj"]), batch_format="pyarrow"
    ).materialize()

    def halves(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [batch["subj"].combine_chunks(), batch["obj"].combine_chunks()]
            )}
        )

    nodes = grouped_count(
        edges.map_batches(halves, batch_format="pyarrow"),
        "node",
        num_partitions=num_partitions,
    ).map_batches(lambda b: b.select(["node"]), batch_format="pyarrow").materialize()
    if nodes.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "auth_micro": pa.array([], pa.int64()),
                    "hub_micro": pa.array([], pa.int64()),
                }
            )
        )

    if edges.count() <= driver_edges_threshold:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        return ray.data.from_arrow(_hits_driver(tbl, iters, scale))

    edges_schema = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])
    score_schema = pa.schema([("node", pa.int64()), ("v", pa.int64())])

    def const_scores(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b["node"],
             "v": pa.array(np.full(b.num_rows, scale, np.int64))}
        )

    def zeros(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b["node"],
             "v": pa.array(np.zeros(b.num_rows, np.int64))}
        )

    def _half_round(edges_ds_, scores, from_col: str, to_col: str):
        """One HITS half-step: sum scores over edges into ``to_col``
        endpoints, then ceil-quotient normalize to ~scale."""
        contrib = lookup_join(
            edges_ds_, scores, from_col, "node", num_partitions,
            left_schema=edges_schema, right_schema=score_schema,
        ).map_batches(
            lambda b: pa.table({"node": b[to_col], "v": b["v"]}),
            batch_format="pyarrow",
        )
        raw = hash_aggregate(
            contrib.union(nodes.map_batches(zeros, batch_format="pyarrow")),
            ["node"], [("v", "sum")],
            num_partitions=num_partitions,
        ).materialize()
        q = np.int64(max((int(raw.max("v") or 0) + scale - 1) // scale, 1))
        return raw.map_batches(
            lambda b: pa.table(
                {"node": b["node"],
                 "v": pa.array(
                     b["v"].combine_chunks().to_numpy(zero_copy_only=False)
                     // q, pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()

    hubs = nodes.map_batches(const_scores, batch_format="pyarrow").materialize()
    auth = hubs
    for _ in range(iters):
        auth = _half_round(edges, hubs, "subj", "obj")
        hubs = _half_round(edges, auth, "obj", "subj")

    out = lookup_join(
        auth.map_batches(
            lambda b: pa.table({"node": b["node"], "auth_micro": b["v"]}),
            batch_format="pyarrow",
        ),
        hubs.map_batches(
            lambda b: pa.table({"node": b["node"], "hub_micro": b["v"]}),
            batch_format="pyarrow",
        ),
        "node", "node", num_partitions,
        left_schema=pa.schema([("node", pa.int64()), ("auth_micro", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("hub_micro", pa.int64())]),
    )
    return out


def _negative_edges_driver(
    edges_tbl: pa.Table, k: int, n_nodes: int, nodes: np.ndarray
) -> pa.Table:
    """Bounded driver fast path for :func:`negative_edges` — identical
    integer hash recurrence, fully vectorized."""
    from phrasekit_ray.sources.pages import splitmix17

    s = edges_tbl["subj"].to_numpy(zero_copy_only=False)
    o = edges_tbl["obj"].to_numpy(zero_copy_only=False)
    si = np.searchsorted(nodes, s)
    oi = np.searchsorted(nodes, o)
    kk = np.uint64(k)
    nn = np.uint64(n_nodes)
    # all k slots per edge
    sr = np.repeat(si.astype(np.uint64), k)
    orr = np.repeat(oi.astype(np.uint64), k)
    j = np.tile(np.arange(1, k + 1, dtype=np.uint64), len(si))
    with np.errstate(over="ignore"):
        key = (sr * nn + orr) * kk + j
    r = (splitmix17(key) % nn).astype(np.int64)
    # drop self-loops and collisions with ANY positive edge
    pos = set(zip(si.tolist(), oi.tolist()))
    keep = np.array(
        [a != b and (a, b) not in pos for a, b in zip(sr.astype(np.int64), r)],
        bool,
    )
    return pa.table(
        {
            "subj": pa.array(nodes[sr[keep].astype(np.int64)], pa.int64()),
            "obj_neg": pa.array(nodes[r[keep]], pa.int64()),
            "slot": pa.array(j[keep].astype(np.int64), pa.int64()),
        }
    )


def negative_edges(
    edges_ds,
    k: int = 3,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_partitions: int | None = None,
    driver_edges_threshold: int = 5_000_000,
):
    """Negative edge sampling for KG-embedding training data (the
    corrupted-triple scheme of TransE, Bordes et al. 2013): for each
    DISTINCT directed positive edge (s, o) and slot j ∈ 1..k, corrupt
    the object to o' = the node with sorted rank
    ``splitmix17((rank(s)·N + rank(o))·k + j) % N`` over the N distinct
    nodes. Candidates that are self-loops (o' == s) or collide with ANY
    positive edge are DROPPED, not resampled (expected loss ≈ graph
    density × k — negligible on sparse web graphs; a retry loop would
    make the output a non-fixed-depth function and break the SQL twin).
    Pure integer function of the distinct edge set ⇒ deterministic,
    partition-invariant, and bit-exact against the unrolled SQL twin.

    Distributed shape: distinct edges (one two-phase aggregate) →
    sorted node enumeration (X19 ``with_row_index``) → vectorized
    k-slot candidate expansion per batch → ONE int-keyed ``lookup_join``
    (rank → node id) + ONE packed-key ANTI ``key_filter_join`` vs the
    positive edge set. Node count must fit 31 bits (packed keys and the
    2^64 hash-input bound at k ≤ 256), same convention as
    :func:`link_prediction`.

    Returns Dataset(subj: int64, obj_neg: int64, slot: int64).
    """
    import ray

    from phrasekit_ray.sources.pages import splitmix17
    from phrasekit_ray.stages.agg import default_partitions as _dp
    from phrasekit_ray.stages.agg import (
        grouped_count,
        key_filter_join,
        lookup_join,
    )
    from phrasekit_ray.state.rowindex import with_row_index

    if not 1 <= k <= 256:
        raise ValueError("k must be in [1, 256]")
    num_partitions = _dp(num_partitions)

    def conform(batch: pa.Table) -> pa.Table:
        s = batch[subj_col].cast(pa.int64())
        o = batch[obj_col].cast(pa.int64())
        keep = pc.invert(pc.equal(s, o))
        return pa.table({"subj": s.filter(keep), "obj": o.filter(keep)})

    edges = grouped_count(
        edges_ds.map_batches(conform, batch_format="pyarrow"),
        ["subj", "obj"],
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.select(["subj", "obj"]), batch_format="pyarrow"
    ).materialize()

    def halves(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [batch["subj"].combine_chunks(), batch["obj"].combine_chunks()]
            )}
        )

    nodes_ds = grouped_count(
        edges.map_batches(halves, batch_format="pyarrow"),
        "node",
        num_partitions=num_partitions,
    ).map_batches(lambda b: b.select(["node"]), batch_format="pyarrow")
    nodes_ds = with_row_index(nodes_ds.sort("node"), col="idx")
    nodes_ds = nodes_ds.materialize()
    n_nodes = nodes_ds.count()
    empty = pa.table(
        {
            "subj": pa.array([], pa.int64()),
            "obj_neg": pa.array([], pa.int64()),
            "slot": pa.array([], pa.int64()),
        }
    )
    if n_nodes == 0:
        return ray.data.from_arrow(empty)
    if n_nodes > (1 << 31):
        raise ValueError("node count must fit 31 bits; remap ids upstream")

    if edges.count() <= driver_edges_threshold:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        node_arr = np.sort(
            np.unique(
                np.concatenate(
                    [
                        tbl["subj"].to_numpy(zero_copy_only=False),
                        tbl["obj"].to_numpy(zero_copy_only=False),
                    ]
                )
            )
        )
        return ray.data.from_arrow(
            _negative_edges_driver(tbl, k, n_nodes, node_arr)
        )

    # rank edges: attach sorted ranks to both endpoints (two lookups
    # against the small unique-keyed enumeration table)
    nodes_schema = pa.schema([("node", pa.int64()), ("idx", pa.int64())])
    edges_schema = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])
    sr = lookup_join(
        edges, nodes_ds, "subj", "node", num_partitions,
        left_schema=edges_schema, right_schema=nodes_schema,
    ).map_batches(
        lambda b: pa.table({"s": b["idx"], "obj": b["obj"]}),
        batch_format="pyarrow",
    )
    ranked = lookup_join(
        sr, nodes_ds, "obj", "node", num_partitions,
        left_schema=pa.schema([("s", pa.int64()), ("obj", pa.int64())]),
        right_schema=nodes_schema,
    ).map_batches(
        lambda b: pa.table({"s": b["s"], "o": b["idx"]}),
        batch_format="pyarrow",
    )

    nn_u = np.uint64(n_nodes)
    kk_u = np.uint64(k)

    def expand(batch: pa.Table) -> pa.Table:
        s = batch["s"].combine_chunks().to_numpy(zero_copy_only=False)
        o = batch["o"].combine_chunks().to_numpy(zero_copy_only=False)
        srp = np.repeat(s.astype(np.uint64), k)
        orp = np.repeat(o.astype(np.uint64), k)
        j = np.tile(np.arange(1, k + 1, dtype=np.uint64), len(s))
        with np.errstate(over="ignore"):
            key = (srp * nn_u + orp) * kk_u + j
        r = (splitmix17(key) % nn_u).astype(np.int64)
        keep = r != srp.astype(np.int64)
        return pa.table(
            {
                "s": pa.array(srp[keep].astype(np.int64), pa.int64()),
                "r": pa.array(r[keep], pa.int64()),
                "slot": pa.array(j[keep].astype(np.int64), pa.int64()),
                "pk": pa.array(
                    srp[keep].astype(np.int64) * n_nodes + r[keep], pa.int64()
                ),
            }
        )

    cand = ranked.map_batches(expand, batch_format="pyarrow")
    pos_keys = ranked.map_batches(
        lambda b: pa.table(
            {
                "pk": pa.array(
                    b["s"].combine_chunks().to_numpy(zero_copy_only=False)
                    * n_nodes
                    + b["o"].combine_chunks().to_numpy(zero_copy_only=False),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    neg = key_filter_join(
        cand, pos_keys, "pk", "pk", anti=True,
        num_partitions=num_partitions,
        left_schema=pa.schema(
            [("s", pa.int64()), ("r", pa.int64()),
             ("slot", pa.int64()), ("pk", pa.int64())]
        ),
    )

    # ranks back to node ids (two lookups against the enumeration table)
    out = lookup_join(
        neg.map_batches(
            lambda b: b.select(["s", "r", "slot"]), batch_format="pyarrow"
        ),
        nodes_ds.map_batches(
            lambda b: pa.table({"idx": b["idx"], "subj": b["node"]}),
            batch_format="pyarrow",
        ),
        "s", "idx", num_partitions,
        left_schema=pa.schema(
            [("s", pa.int64()), ("r", pa.int64()), ("slot", pa.int64())]
        ),
        right_schema=pa.schema([("idx", pa.int64()), ("subj", pa.int64())]),
    )
    out = lookup_join(
        out.map_batches(
            lambda b: b.select(["subj", "r", "slot"]), batch_format="pyarrow"
        ),
        nodes_ds.map_batches(
            lambda b: pa.table({"idx": b["idx"], "obj_neg": b["node"]}),
            batch_format="pyarrow",
        ),
        "r", "idx", num_partitions,
        left_schema=pa.schema(
            [("subj", pa.int64()), ("r", pa.int64()), ("slot", pa.int64())]
        ),
        right_schema=pa.schema([("idx", pa.int64()), ("obj_neg", pa.int64())]),
    )
    return out.map_batches(
        lambda b: b.select(["subj", "obj_neg", "slot"]), batch_format="pyarrow"
    )


def _oriented_support_counts(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Per-edge triangle support (aligned with the input edge arrays)
    over a DISTINCT undirected edge set (u < v, no dups) — the shared
    driver-side kernel of :func:`edge_triangle_support` and
    :func:`k_truss`: degree-oriented wedge enumeration (each triangle
    found once, at its min-(deg, node)-rank vertex), sorted packed-key
    closure search, each closed wedge credits its three edges via
    bincount. Orientation cuts the wedge volume from Σ C(deg, 2) to
    Σ C(outdeg, 2) — on the sf0.1 basket graph 148M → 46M."""
    PACK = np.int64(1) << np.int64(31)
    n_e = len(u)
    if n_e == 0:
        return np.zeros(0, np.int64)
    keys = u * PACK + v
    sort_idx = np.argsort(keys)
    keys_sorted = keys[sort_idx]
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes)).astype(np.int64)
    du, dv = deg[inv[:n_e]], deg[inv[n_e:]]
    u_first = (du < dv) | ((du == dv) & (u < v))
    a = np.where(u_first, u, v)
    b = np.where(u_first, v, u)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    i, j = _segment_pair_positions(a)
    mid, p, q = a[i], b[i], b[j]  # b sorted in segment → p < q
    idx = np.searchsorted(keys_sorted, p * PACK + q)
    ok = (idx < n_e) & (keys_sorted[np.minimum(idx, n_e - 1)] == p * PACK + q)
    mid, p, q = mid[ok], p[ok], q[ok]
    sup_sorted = np.zeros(n_e, np.int64)
    for k1, k2 in ((mid, p), (mid, q), (p, q)):
        ck = np.minimum(k1, k2) * PACK + np.maximum(k1, k2)
        sup_sorted += np.bincount(
            np.searchsorted(keys_sorted, ck), minlength=n_e
        ).astype(np.int64)
    sup = np.zeros(n_e, np.int64)
    sup[sort_idx] = sup_sorted
    return sup


def _edge_support_driver(und_tbl: pa.Table) -> pa.Table:
    """Bounded driver fast path for :func:`edge_triangle_support` — the
    shared oriented kernel, keeping only support ≥ 1 edges (X151
    contract)."""
    u = und_tbl["u"].to_numpy(zero_copy_only=False)
    v = und_tbl["v"].to_numpy(zero_copy_only=False)
    sup = _oriented_support_counts(u, v)
    keep = sup >= 1
    return pa.table(
        {
            "u": pa.array(u[keep], pa.int64()),
            "v": pa.array(v[keep], pa.int64()),
            "support": pa.array(sup[keep], pa.int64()),
        }
    )


def edge_triangle_support(
    edges_ds,
    num_partitions: int | None = None,
    driver_edges_threshold: int = 200_000,
):
    """Per-edge triangle support over the DISTINCT undirected edge set:
    for every edge (u, v), support = |Γ(u) ∩ Γ(v)| = the number of
    triangles the edge participates in — the building block of k-truss
    decomposition (:func:`k_truss`) and cohesion filtering. Edges in no
    triangle are ABSENT from the output (support would be 0).

    Distributed shape: DEGREE-ORIENTED wedge enumeration (orient each
    edge from lower (deg, node) rank to higher; every triangle is
    enumerated exactly once, at its min-rank vertex) → packed-key SEMI
    join against the edge set closes the third edge → each closed wedge
    credits its THREE edges → one two-phase count per packed edge key.
    Degree orientation caps per-node wedge fan-out at the oriented
    out-degree (O(√m) worst case) instead of C(deg, 2) — on the sf0.1
    basket graph this cut the wedge volume ~3× and, with the pre-join
    aggregate gone, the forced-distributed pass from 84 s to well under
    half that. Node ids must fit 31 bits (packed (u,v) keys).

    Bounded driver fast path under ``driver_edges_threshold`` distinct
    edges — the threshold is LOWER than the other graph ops' 5M gate
    because the work here scales with the wedge volume, not the edge
    count, and past ~200k edges the parallel distributed kernel beats
    the single-thread numpy sweep (sf0.1 basket graph: 5.3 s
    distributed vs 39 s driver at 1.19M edges / 46M oriented wedges).
    Tests force the distributed path with threshold 0.

    Returns Dataset(u: int64, v: int64, support: int64), u < v.
    """
    import ray

    from phrasekit_ray.stages.agg import default_partitions

    num_partitions = default_partitions(num_partitions)
    und = _canonical_undirected(edges_ds, num_partitions).materialize()
    if und.count() <= driver_edges_threshold:
        tbl = pa.concat_tables(
            list(und.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        return ray.data.from_arrow(_edge_support_driver(tbl))
    return _edge_support_over(und, num_partitions)


def _edge_support_over(und, num_partitions):
    """Support counts over an ALREADY-canonical distinct undirected edge
    Dataset (u < v, no dups) — the per-round kernel of :func:`k_truss`.
    Degree-oriented (see :func:`edge_triangle_support`): each triangle
    is found once and credits its three edges."""
    from phrasekit_ray.stages.agg import (
        grouped_count,
        hash_aggregate,
        key_filter_join,
        lookup_join,
    )

    PACK = np.int64(1) << np.int64(31)

    deg = grouped_count(
        und.map_batches(
            lambda b: pa.table(
                {"node": pa.concat_arrays(
                    [b["u"].combine_chunks(), b["v"].combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        ),
        "node", count_col="d",
        num_partitions=num_partitions,
    )
    e_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    d_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])
    with_du = lookup_join(
        und, deg, "u", "node", num_partitions,
        left_schema=e_schema, right_schema=d_schema,
    ).map_batches(
        lambda b: pa.table(
            {"u": b["u"], "v": b["v"], "du": b["d"]}
        ),
        batch_format="pyarrow",
    )
    with_both = lookup_join(
        with_du, deg, "v", "node", num_partitions,
        left_schema=pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("du", pa.int64())]
        ),
        right_schema=d_schema,
    )

    def orient(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch["v"].combine_chunks().to_numpy(zero_copy_only=False)
        du = batch["du"].combine_chunks().to_numpy(zero_copy_only=False)
        dv = batch["d"].combine_chunks().to_numpy(zero_copy_only=False)
        # rank = (deg, node) lexicographic: orient low rank → high rank
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        b = np.where(u_first, v, u)
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "_part": pa.array(
                    (h % np.uint64(num_partitions)).astype(np.int32), pa.int32()
                ),
            }
        )

    def wedges(group: pa.Table) -> pa.Table:
        a = group["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = group["b"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        i, j = _segment_pair_positions(a)
        z, v, w = a[i], b[i], b[j]  # b sorted in segment → v < w by node id
        return pa.table(
            {
                "z": pa.array(z, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "_pk": pa.array(v * PACK + w, pa.int64()),
            }
        )

    wedge_rows = (
        with_both.map_batches(orient, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: wedges(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )

    def pack_edges(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch["v"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"_ek": pa.array(u * PACK + v, pa.int64())})

    triangles = key_filter_join(
        wedge_rows,
        und.map_batches(pack_edges, batch_format="pyarrow"),
        "_pk",
        "_ek",
        anti=False,
        num_partitions=num_partitions,
        left_schema=pa.schema(
            [("z", pa.int64()), ("v", pa.int64()),
             ("w", pa.int64()), ("_pk", pa.int64())]
        ),
    )

    def credits(batch: pa.Table) -> pa.Table:
        z = batch["z"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch["v"].combine_chunks().to_numpy(zero_copy_only=False)
        w = batch["w"].combine_chunks().to_numpy(zero_copy_only=False)
        # the three undirected edges of each triangle, canonical u < v
        k1 = np.minimum(z, v) * PACK + np.maximum(z, v)
        k2 = np.minimum(z, w) * PACK + np.maximum(z, w)
        k3 = v * PACK + w  # already v < w
        key = np.concatenate([k1, k2, k3])
        return pa.table(
            {
                "_ck": pa.array(key, pa.int64()),
                "support": pa.array(np.ones(len(key), np.int64)),
            }
        )

    counts = hash_aggregate(
        triangles.map_batches(credits, batch_format="pyarrow"),
        ["_ck"],
        [("support", "sum")],
        num_partitions=num_partitions,
    )

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch["_ck"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(k // PACK, pa.int64()),
                "v": pa.array(k % PACK, pa.int64()),
                "support": batch["support"].combine_chunks().cast(pa.int64()),
            }
        )

    return counts.map_batches(unpack, batch_format="pyarrow")


def _k_truss_driver(und_tbl: pa.Table, k: int, rounds: int) -> pa.Table:
    """Bounded driver fast path for :func:`k_truss` — the identical
    fixed-R-round peel, each round's support from the shared
    degree-oriented kernel (:func:`_oriented_support_counts`)."""
    u = und_tbl["u"].to_numpy(zero_copy_only=False).copy()
    v = und_tbl["v"].to_numpy(zero_copy_only=False).copy()
    sup = np.zeros(0, np.int64)
    for _ in range(rounds):
        if len(u) == 0:
            sup = np.zeros(0, np.int64)
            break
        sup = _oriented_support_counts(u, v)
        keep = sup >= (k - 2)
        u, v, sup = u[keep], v[keep], sup[keep]
    return pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "support": pa.array(sup, pa.int64()),
        }
    )


def k_truss(
    edges_ds,
    k: int = 4,
    rounds: int = 6,
    num_partitions: int | None = None,
    driver_edges_threshold: int = 200_000,
):
    """k-truss peel, FIXED ``rounds``-round variant: starting from the
    distinct undirected edge set, each round computes per-edge triangle
    support within the surviving subgraph and drops edges with
    support < k−2. After enough rounds this is the classic maximal
    k-truss (Cohen 2008) — the fixed depth makes the output a pure
    function of (edge set, k, rounds), so the unrolled SQL twin is
    bit-exact, and tests pin that the fixpoint is reached on the
    fixtures (one extra round changes nothing). At true scale, pass
    more rounds or iterate externally until the returned edge count
    stops changing.

    Per round: ONE middle-partitioned wedge enumeration + two-phase
    count + packed-key SEMI join (:func:`_edge_support_over`) and one
    survivor SEMI filter; survivors re-materialize per round. Output
    rows carry the support each edge had in the LAST round's subgraph
    (≥ k−2 by construction — the in-band invariant).

    Requires k ≥ 3 (k = 2 would be "every edge", but support-0 edges
    never appear in the support table). Node ids must fit 31 bits.

    Returns Dataset(u: int64, v: int64, support: int64), u < v.
    """
    import ray

    from phrasekit_ray.stages.agg import default_partitions

    if k < 3:
        raise ValueError("k must be >= 3")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    num_partitions = default_partitions(num_partitions)
    und = _canonical_undirected(edges_ds, num_partitions).materialize()

    if und.count() <= driver_edges_threshold:
        tbl_list = list(und.iter_batches(batch_format="pyarrow"))
        tbl = (
            pa.concat_tables(tbl_list, promote_options="default")
            if tbl_list
            else pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        )
        return ray.data.from_arrow(_k_truss_driver(tbl, k, rounds))

    cur = und
    out = None
    for _ in range(rounds):
        sup = _edge_support_over(cur, num_partitions)
        out = sup.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["support"], pa.scalar(k - 2, pa.int64()))
            ),
            batch_format="pyarrow",
        ).materialize()
        cur = out.map_batches(
            lambda b: b.select(["u", "v"]), batch_format="pyarrow"
        ).materialize()
    return out


def sampled_triangle_estimate(
    edges_ds,
    rate_num: int = 64,
    rate_den: int = 1024,
    num_partitions: int | None = None,
):
    """Wedge-sampled triangle ESTIMATE (the Schank–Wagner/Seshadhri
    wedge-sampling family) — the scale path for graphs whose exact
    triangle count (X62) is infeasible: sample each wedge with
    probability rate_num/rate_den, test closure only for sampled
    wedges, and scale up. Deterministic sampling — wedge (z, v, w) is
    kept iff splitmix17(splitmix17(z) + v·2³¹ + w) % rate_den <
    rate_num — makes the estimate a pure integer function of the edge
    set: partition-invariant and bit-exact against the SQL twin
    (estimator semantics, exactly reproducible).

    est_triangles_milli = closed_sampled · rate_den · 1000 //
    (rate_num · 3): each triangle is 3 closed wedges, each kept with
    probability rate_num/rate_den ⇒ unbiased. Sampled wedges never
    leave the wedge kernel unsampled — the wedge stream shrinks by the
    rate at the source, so the closure SEMI join sees rate × Σ C(deg,2)
    rows instead of all wedges.

    Returns a ONE-ROW Dataset(wedges_total, wedges_sampled,
    closed_sampled, est_triangles_milli), all int64.
    """
    import ray

    from phrasekit_ray.sources.pages import splitmix17
    from phrasekit_ray.stages.agg import (
        default_partitions,
        grouped_count,
        key_filter_join,
    )

    if not 0 < rate_num <= rate_den:
        raise ValueError("need 0 < rate_num <= rate_den")
    num_partitions = default_partitions(num_partitions)
    und = _canonical_undirected(edges_ds, num_partitions).materialize()
    PACK = np.int64(1) << np.int64(31)
    num_u, den_u = np.uint64(rate_num), np.uint64(rate_den)

    def explode(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch["v"].combine_chunks().to_numpy(zero_copy_only=False)
        z = np.concatenate([u, v])
        x = np.concatenate([v, u])
        h = (z.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return pa.table(
            {
                "z": pa.array(z, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "_part": pa.array(
                    (h % np.uint64(num_partitions)).astype(np.int32), pa.int32()
                ),
            }
        )

    def sampled_wedges(group: pa.Table) -> pa.Table:
        z = group["z"].combine_chunks().to_numpy(zero_copy_only=False)
        x = group["x"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((x, z))
        z, x = z[order], x[order]
        i, j = _segment_pair_positions(z)
        v, w = x[i], x[j]  # sorted in segment → v < w
        mid = z[i]
        with np.errstate(over="ignore"):
            k2 = (
                splitmix17(mid.astype(np.uint64))
                + v.astype(np.uint64) * np.uint64(PACK)
                + w.astype(np.uint64)
            )
            keep = (splitmix17(k2) % den_u) < num_u
        n_w = len(i)
        v, w = v[keep], w[keep]
        # one sentinel row per group carries the group's pre-sampling
        # wedge total (pk = -1 is never a packed edge key), so the
        # exact denominator needs no second wedge pass
        pk = np.concatenate([v * PACK + w, np.array([-1], np.int64)])
        wt = np.concatenate(
            [np.zeros(len(v), np.int64), np.array([n_w], np.int64)]
        )
        return pa.table(
            {"pk": pa.array(pk, pa.int64()), "wt": pa.array(wt, pa.int64())}
        )

    wedges = (
        und.map_batches(explode, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: sampled_wedges(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
        .materialize()
    )
    wedges_total = wedges.sum("wt") or 0
    real = wedges.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b["pk"], pa.scalar(0, pa.int64()))
        ).select(["pk"]),
        batch_format="pyarrow",
    )
    wedges_sampled = real.count()

    def pack_edges(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch["v"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"_ek": pa.array(u * PACK + v, pa.int64())})

    closed = key_filter_join(
        real,
        und.map_batches(pack_edges, batch_format="pyarrow"),
        "pk", "_ek", anti=False,
        num_partitions=num_partitions,
        left_schema=pa.schema([("pk", pa.int64())]),
    )
    closed_sampled = closed.count()
    est = (closed_sampled * rate_den * 1000) // (rate_num * 3)
    return ray.data.from_arrow(
        pa.table(
            {
                "wedges_total": pa.array([wedges_total], pa.int64()),
                "wedges_sampled": pa.array([wedges_sampled], pa.int64()),
                "closed_sampled": pa.array([closed_sampled], pa.int64()),
                "est_triangles_milli": pa.array([est], pa.int64()),
            }
        )
    )


def _katz_driver(
    edges_tbl: pa.Table, iters: int, scale: int, beta_num: int, beta_den: int
):
    """Bounded driver fast path for :func:`katz_exact` — identical
    integer recurrence vectorized with np.add.at (the sum and max are
    order-independent; tests force the distributed path too)."""
    subj = edges_tbl["subj"].to_numpy(zero_copy_only=False)
    obj = edges_tbl["obj"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([subj, obj]))
    si = np.searchsorted(nodes, subj)
    oi = np.searchsorted(nodes, obj)
    sc = np.int64(scale)
    x = np.full(len(nodes), sc, np.int64)
    for _ in range(iters):
        raw = np.full(len(nodes), sc, np.int64)
        np.add.at(raw, oi, x[si] * np.int64(beta_num) // np.int64(beta_den))
        q = max((int(raw.max(initial=0)) + scale - 1) // scale, 1)
        x = raw // np.int64(q)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "katz_micro": pa.array(x, pa.int64()),
        }
    )


def katz_exact(
    edges_ds,
    iters: int = 4,
    scale: int = 10**6,
    beta_num: int = 1,
    beta_den: int = 5,
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_partitions: int | None = None,
    driver_edges_threshold: int = 5_000_000,
):
    """Katz attenuated-path centrality (Katz 1953 recurrence shape,
    x ← 1 + β·Aᵀx) in EXACT integer arithmetic with the X147
    ceil-quotient per-round normalization — the every-node-gets-a-base
    centrality that, unlike HITS/PageRank, scores isolated-in-degree
    nodes a nonzero floor and weights a length-r inbound path by βʳ.

    Semantics (pure int64 function of the distinct edge set ⇒ an
    unrolled SQL twin reproduces every round bit-for-bit):

    - graph = DISTINCT directed edges, self-loops dropped;
    - x0(v) = ``scale`` for every node;
    - per round: raw(v) = scale + Σ_{u→v} (x(u)·beta_num // beta_den)
      [divide-per-edge keeps every addend ≤ scale, so raw ≤
      scale·(1+indeg) — no overflow short of a 10¹²-indegree hub];
      x(v) = raw(v) // max(ceil(max_v raw(v) / scale), 1).

    Distribution per round: ONE int-keyed ``lookup_join`` (edges ⋈
    scores on subj — the score table is unique-keyed per node) + ONE
    two-phase sum ``hash_aggregate`` + one scalar MAX; the driver holds
    only the scalar normalizer. Same bounded driver fast
    path / forced-distributed contract as hits_exact
    (driver_edges_threshold, tests force 0).

    Returns Dataset(node: int64, katz_micro: int64).
    """
    import ray

    from phrasekit_ray.stages.agg import default_partitions as _dp
    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate, lookup_join

    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0 < beta_num <= beta_den:
        raise ValueError("need 0 < beta_num <= beta_den")
    num_partitions = _dp(num_partitions)

    def conform(batch: pa.Table) -> pa.Table:
        s = batch[subj_col].cast(pa.int64())
        o = batch[obj_col].cast(pa.int64())
        keep = pc.invert(pc.equal(s, o))
        return pa.table({"subj": s.filter(keep), "obj": o.filter(keep)})

    edges = grouped_count(
        edges_ds.map_batches(conform, batch_format="pyarrow"),
        ["subj", "obj"],
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.select(["subj", "obj"]), batch_format="pyarrow"
    ).materialize()

    def halves(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [batch["subj"].combine_chunks(), batch["obj"].combine_chunks()]
            )}
        )

    nodes = grouped_count(
        edges.map_batches(halves, batch_format="pyarrow"),
        "node",
        num_partitions=num_partitions,
    ).map_batches(lambda b: b.select(["node"]), batch_format="pyarrow").materialize()
    if nodes.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "katz_micro": pa.array([], pa.int64()),
                }
            )
        )

    if edges.count() <= driver_edges_threshold:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        return ray.data.from_arrow(
            _katz_driver(tbl, iters, scale, beta_num, beta_den)
        )

    edges_schema = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])
    score_schema = pa.schema([("node", pa.int64()), ("v", pa.int64())])
    bn, bd = np.int64(beta_num), np.int64(beta_den)

    def const_scores(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b["node"],
             "v": pa.array(np.full(b.num_rows, scale, np.int64))}
        )

    def bases(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b["node"],
             "v": pa.array(np.full(b.num_rows, scale, np.int64))}
        )

    x = nodes.map_batches(const_scores, batch_format="pyarrow").materialize()
    for _ in range(iters):
        contrib = lookup_join(
            edges, x, "subj", "node", num_partitions,
            left_schema=edges_schema, right_schema=score_schema,
        ).map_batches(
            lambda b: pa.table(
                {"node": b["obj"],
                 "v": pa.array(
                     b["v"].combine_chunks().to_numpy(zero_copy_only=False)
                     * bn // bd, pa.int64())}
            ),
            batch_format="pyarrow",
        )
        raw = hash_aggregate(
            contrib.union(nodes.map_batches(bases, batch_format="pyarrow")),
            ["node"], [("v", "sum")],
            num_partitions=num_partitions,
        ).materialize()
        q = np.int64(max((int(raw.max("v") or 0) + scale - 1) // scale, 1))
        x = raw.map_batches(
            lambda b, q=q: pa.table(
                {"node": b["node"],
                 "v": pa.array(
                     b["v"].combine_chunks().to_numpy(zero_copy_only=False)
                     // q, pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()

    return x.map_batches(
        lambda b: pa.table({"node": b["node"], "katz_micro": b["v"]}),
        batch_format="pyarrow",
    )
