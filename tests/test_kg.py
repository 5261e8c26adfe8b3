"""KG extension tests: triple lift, union-find canonicalization,
node/edge aggregates, resumable lineage writes (FIXTURES.md §8)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from phrasekit_ray.config import BuildConfig, KGConfig, TagConfig
from phrasekit_ray.core.artifact import build_artifact
from phrasekit_ray.stages import kg as kgmod
from phrasekit_ray.stages.build import put_artifact
from phrasekit_ray.stages.tag import tag_corpus
from phrasekit_ray.state import lineage


PHRASES = [
    {"tokens": ["rat", "cdk10"], "phrase_id": 1000, "salience": 5.0, "count": 30},
    {"tokens": ["rat", "cdk10", "oligo"], "phrase_id": 1001, "salience": 6.0, "count": 10},
    {"tokens": ["rat", "cdk10", "protein"], "phrase_id": 1002, "salience": 6.0, "count": 10},
    {"tokens": ["lysis", "buffer"], "phrase_id": 1003, "salience": 4.0, "count": 20},
    {"tokens": ["master", "mix"], "phrase_id": 1004, "salience": 4.0, "count": 20},
]


@pytest.fixture(scope="module")
def artifact():
    art, _ = build_artifact(PHRASES, BuildConfig())
    return art


def test_alias_edges_prefix_rule(artifact):
    edges = set(kgmod.alias_edges_from_artifact(artifact))
    # "rat cdk10" is a proper prefix of both longer phrases
    assert edges == {(1000, 1001), (1000, 1002)}


def test_canonical_mapping_min_id(artifact):
    edges = kgmod.alias_edges_from_artifact(artifact)
    mapping = kgmod.canonical_mapping(artifact.phrase_ids, edges)
    assert mapping[1000] == mapping[1001] == mapping[1002] == 1000
    assert mapping[1003] == 1003
    assert mapping[1004] == 1004


def test_union_find_chain_and_determinism():
    uf = kgmod.UnionFind()
    uf.union(5, 3)
    uf.union(3, 9)
    uf.union(1, 9)
    assert len({uf.find(x) for x in (1, 3, 5, 9)}) == 1
    assert uf.find(5) == 1  # smallest id is root
    mapping = kgmod.canonical_mapping([1, 3, 5, 9, 20], [(5, 3), (3, 9), (1, 9)])
    assert mapping == {1: 1, 3: 1, 5: 1, 9: 1, 20: 20}


def tagged_ds(artifact, docs):
    import ray

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [d for d, _ in docs],
                "tokens": pa.array([t for _, t in docs], pa.list_(pa.string())),
            }
        )
    )
    return tag_corpus(ds, put_artifact(artifact), TagConfig(), concurrency=1)


DOCS = [
    ("doc_1", ["the", "rat", "cdk10", "oligo", "was", "in", "lysis", "buffer"]),
    ("doc_2", ["master", "mix", "and", "rat", "cdk10", "protein"]),
    ("doc_3", ["nothing", "here"]),
]


def test_mentions_flatten(ray_session, artifact):
    m = kgmod.mentions_from_tagged(tagged_ds(artifact, DOCS))
    rows = sorted(m.iter_rows(), key=lambda r: (r["doc_id"], r["start"]))
    assert [(r["doc_id"], r["start"], r["end"], r["phrase_id"]) for r in rows] == [
        ("doc_1", 1, 4, 1001),
        ("doc_1", 6, 8, 1003),
        ("doc_2", 0, 2, 1004),
        ("doc_2", 3, 6, 1002),
    ]


def test_triples_adjacent_pairing_canonicalized(ray_session, artifact):
    edges = kgmod.alias_edges_from_artifact(artifact)
    mapping = kgmod.canonical_mapping(artifact.phrase_ids, edges)
    t = kgmod.triples_from_tagged(tagged_ds(artifact, DOCS), mapping, KGConfig())
    rows = sorted(t.iter_rows(), key=lambda r: r["doc_id"])
    # doc_1: (rat cdk10 oligo → 1000, lysis buffer 1003)
    # doc_2: (master mix 1004, rat cdk10 protein → 1000)
    assert [(r["doc_id"], r["subj"], r["pred"], r["obj"]) for r in rows] == [
        ("doc_1", 1000, "co_mentioned_with", 1003),
        ("doc_2", 1004, "co_mentioned_with", 1000),
    ]


def test_triples_gap_cap(ray_session, artifact):
    mapping = {int(p): int(p) for p in artifact.phrase_ids}
    doc = (
        "x1",
        ["rat", "cdk10"] + ["pad"] * 60 + ["lysis", "buffer"],
    )
    t = kgmod.triples_from_tagged(
        tagged_ds(artifact, [doc]), mapping, KGConfig(max_pair_distance=50)
    )
    assert t.count() == 0


def test_node_and_edge_tables(ray_session, artifact):
    edges_a = kgmod.alias_edges_from_artifact(artifact)
    mapping = kgmod.canonical_mapping(artifact.phrase_ids, edges_a)
    names = kgmod.canonical_names_from_artifact(artifact, mapping)
    tg = tagged_ds(artifact, DOCS)
    mentions = kgmod.mentions_from_tagged(tg)
    nodes = {r["entity_id"]: r for r in kgmod.node_table(mentions, mapping, names).iter_rows()}
    assert nodes[1000]["n_mentions"] == 2  # oligo + protein variants
    assert nodes[1000]["canonical"] == "rat cdk10"
    assert nodes[1003]["n_mentions"] == 1
    triples = kgmod.triples_from_tagged(tg, mapping, KGConfig())
    edges = list(kgmod.edge_table(triples).iter_rows())
    assert {(e["subj"], e["obj"], e["weight"]) for e in edges} == {
        (1000, 1003, 1),
        (1004, 1000, 1),
    }


def test_resumable_write_skips_complete(ray_session, tmp_path, artifact):
    import ray

    root = str(tmp_path / "kg_out")
    t = pa.table(
        {
            "entity_id": pa.array(range(100), pa.uint64()),
            "n": pa.array([1] * 100, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    s1 = lineage.write_dataset_resumable(ds, root, "nodes", {"v": 1}, "entity_id", 4)
    assert s1["written"] == 4 and s1["skipped"] == 0
    back = lineage.read_partitioned(root, "nodes")
    assert back.count() == 100
    assert sorted(r["entity_id"] for r in back.iter_rows()) == list(range(100))
    # second run with identical fingerprint: all partitions skipped
    s2 = lineage.write_dataset_resumable(ds, root, "nodes", {"v": 1}, "entity_id", 4)
    assert s2["skipped"] == 4 and s2["written"] == 0
    # config change → new fingerprint → rewrite
    s3 = lineage.write_dataset_resumable(ds, root, "nodes", {"v": 2}, "entity_id", 4)
    assert s3["written"] == 4


def test_resumable_write_partial_resume(ray_session, tmp_path):
    import ray

    root = str(tmp_path / "kg_out2")
    t = pa.table(
        {
            "entity_id": pa.array(range(64), pa.uint64()),
            "n": pa.array([1] * 64, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    lineage.write_dataset_resumable(ds, root, "nodes", {"v": 1}, "entity_id", 4)
    # corrupt one partition: delete its manifest → incomplete
    os.remove(lineage.manifest_path(root, "nodes", 2))
    s = lineage.write_dataset_resumable(ds, root, "nodes", {"v": 1}, "entity_id", 4)
    assert s["skipped"] == 3 and s["written"] == 1
    assert lineage.read_partitioned(root, "nodes").count() == 64


def test_dataset_metrics_structured(ray_session):
    import ray

    from phrasekit_ray.state.metrics import dataset_metrics

    ds = ray.data.range(1000, override_num_blocks=4).map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    mat = ds.materialize()
    ms = dataset_metrics(mat)
    assert len(ms) >= 1
    assert all("operator" in m for m in ms)
    assert any(m["tasks"] for m in ms)


def test_distributed_cc_matches_union_find(ray_session):
    """Hash-min label propagation == driver-side union-find on random graphs."""
    import numpy as np
    import ray

    from phrasekit_ray.stages.kg import UnionFind, connected_components_distributed

    rng = np.random.default_rng(11)
    nodes = np.arange(100, 200)
    edges = [
        (int(rng.choice(nodes)), int(rng.choice(nodes))) for _ in range(120)
    ]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components_distributed(
            ray.data.from_arrow(tbl)
        ).iter_rows()
    }
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    touched = {a for a, _ in edges} | {b for _, b in edges}
    comp_min: dict[int, int] = {}
    for n in touched:
        r = uf.find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[uf.find(n)] for n in touched}
    assert got == want


def test_edge_table_mixed_predicates(ray_session):
    """Triples mixing predicates within one block must aggregate per
    (subj, pred, obj), not merge under the block's first-row pred."""
    import ray

    from phrasekit_ray.stages.kg import edge_table

    t = pa.table(
        {
            "subj": pa.array([1, 1, 1, 2], pa.uint32()),
            "pred": pa.array(["rel_a", "rel_b", "rel_a", "rel_a"], pa.string()),
            "obj": pa.array([2, 2, 2, 3], pa.uint32()),
            "doc_id": pa.array([0, 0, 1, 1], pa.int64()),
            "subj_start": pa.array([0, 0, 0, 0], pa.int32()),
            "obj_start": pa.array([1, 1, 1, 1], pa.int32()),
        }
    )
    edges = edge_table(ray.data.from_arrow(t))
    rows = {
        (r["subj"], r["pred"], r["obj"]): r["weight"]
        for b in edges.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert rows == {
        (1, "rel_a", 2): 2,
        (1, "rel_b", 2): 1,
        (2, "rel_a", 3): 1,
    }


def test_incremental_merge_equals_full_run(ray_session):
    """Incremental KG construction invariant: with a FIXED artifact +
    mapping, tagging two disjoint halves of the corpus and merging their
    node/edge tables equals one full run over the combined corpus."""
    import ray

    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.kg import run_kg_increment, run_kg_pipeline
    from phrasekit_ray.sources import pages as pagesmod
    from phrasekit_ray.stages.build import put_artifact
    from phrasekit_ray.stages.kg import merge_edge_tables, merge_node_tables

    full_tbl = pagesmod.synthesize_pages_table()
    full = ray.data.from_arrow(full_tbl)
    res = run_kg_pipeline(
        full,
        pagesmod.background_table(),
        MineConfig(min_n=2, max_n=5, min_count=2),
        ScoreConfig(min_domain_count=2),
    )
    ref = put_artifact(res.artifact)

    n = full_tbl.num_rows
    half_a = ray.data.from_arrow(full_tbl.slice(0, n // 2))
    half_b = ray.data.from_arrow(full_tbl.slice(n // 2))
    inc_a = run_kg_increment(half_a, ref, res.mapping)
    inc_b = run_kg_increment(half_b, ref, res.mapping)

    def norm(ds, cols):
        df = ds.to_pandas()[cols]
        return df.sort_values(cols).reset_index(drop=True)

    e_cols = ["subj", "pred", "obj", "weight"]
    merged_e = norm(merge_edge_tables(inc_a.edges, inc_b.edges), e_cols)
    full_e = norm(merge_edge_tables(res.edges), e_cols)  # conform types
    assert merged_e.equals(full_e)

    n_cols = ["entity_id", "canonical", "n_mentions"]
    merged_n = norm(merge_node_tables(inc_a.nodes, inc_b.nodes), n_cols)
    full_n = norm(merge_node_tables(res.nodes), n_cols)
    assert merged_n.equals(full_n)


def test_pagerank_matches_dense_power_iteration(ray_session):
    """Differential: the distributed join/aggregate PageRank equals a
    dense numpy power iteration with the same damping/dangling handling."""
    import numpy as np
    import ray

    from phrasekit_ray.stages.kg import pagerank

    rng = np.random.default_rng(21)
    n = 30
    rows = []
    for _ in range(120):
        s, o = rng.integers(0, n, 2)
        if s != o:
            rows.append((int(s), int(o), int(rng.integers(1, 5))))
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.int64()),
            "pred": pa.array(["p"] * len(rows)),
            "obj": pa.array([r[1] for r in rows], pa.int64()),
            "weight": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(ray.data.from_arrow(t), iterations=6).iter_rows()
    }

    # dense reference
    nodes = sorted({r[0] for r in rows} | {r[1] for r in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    W = np.zeros((m, m))
    for s, o, w in rows:
        W[idx[s], idx[o]] += w
    outw = W.sum(axis=1)
    d = 0.85
    r = np.full(m, 1.0 / m)
    for _ in range(6):
        dangling = r[outw == 0].sum()
        contrib = np.zeros(m)
        nz = outw > 0
        contrib = (W[nz].T @ (r[nz] / outw[nz]))
        r = (1 - d) / m + d * (contrib + dangling / m)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_bucketed_join_shuffle_free(ray_session, tmp_path):
    """Two stage outputs written with the same key/partition layout join
    per-bucket with no all-to-all — equals a plain hash join."""
    import numpy as np
    import ray

    from phrasekit_ray.state.lineage import bucketed_join, write_dataset_resumable

    rng = np.random.default_rng(11)
    keys = rng.permutation(200)[:150]
    left = pa.table(
        {
            "custkey": pa.array(np.repeat(keys, 2), pa.int64()),
            "amount": pa.array(np.arange(300), pa.int64()),
        }
    )
    right = pa.table(
        {
            "custkey": pa.array(np.arange(0, 200, 3), pa.int64()),  # partial overlap
            "segment": pa.array([f"s{i%4}" for i in range(0, 200, 3)]),
        }
    )
    root = str(tmp_path)
    write_dataset_resumable(ray.data.from_arrow(left), root, "l", {"v": 1}, "custkey", 8)
    write_dataset_resumable(ray.data.from_arrow(right), root, "r", {"v": 1}, "custkey", 8)
    got = (
        bucketed_join(root, "l", root, "r", "custkey", "custkey", 8)
        .to_pandas().sort_values(["custkey", "amount"]).reset_index(drop=True)
    )
    want = (
        left.to_pandas().merge(right.to_pandas(), on="custkey", how="inner")
        .sort_values(["custkey", "amount"]).reset_index(drop=True)
    )
    assert got[["custkey", "amount", "segment"]].equals(
        want[["custkey", "amount", "segment"]]
    )


def test_bucketed_join_layout_mismatch_raises(ray_session, tmp_path):
    import ray

    from phrasekit_ray.state.lineage import bucketed_join, write_dataset_resumable

    t = pa.table({"k": pa.array([1, 2], pa.int64())})
    root = str(tmp_path)
    write_dataset_resumable(ray.data.from_arrow(t), root, "l", {"v": 1}, "k", 4)
    write_dataset_resumable(ray.data.from_arrow(t), root, "r", {"v": 1}, "k", 2)
    with pytest.raises(FileNotFoundError):
        bucketed_join(root, "l", root, "r", "k", "k", 4)


# --- graph analytics: triangles / k-hop / co-occurrence ---------------------

def _random_edges(seed=7, n_nodes=60, n_edges=400):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n_nodes, n_edges)
    o = rng.integers(0, n_nodes, n_edges)
    return pa.table(
        {
            "subj": pa.array(s, pa.int64()),
            "obj": pa.array(o, pa.int64()),
        }
    )


def _ref_undirected(tbl):
    pairs = set()
    for u, v in zip(tbl["subj"].to_pylist(), tbl["obj"].to_pylist()):
        if u != v:
            pairs.add((min(u, v), max(u, v)))
    return pairs


def test_segment_pair_positions_matches_itertools():
    import itertools

    from phrasekit_ray.stages.kg import _segment_pair_positions

    keys = np.array([0, 0, 0, 2, 2, 5, 7, 7, 7, 7], dtype=np.int64)
    i, j = _segment_pair_positions(keys)
    got = sorted(zip(i.tolist(), j.tolist()))
    want = []
    for _, grp in itertools.groupby(range(len(keys)), key=lambda p: keys[p]):
        want.extend(itertools.combinations(list(grp), 2))
    assert got == sorted(want)
    e_i, e_j = _segment_pair_positions(np.zeros(0, np.int64))
    assert len(e_i) == 0 and len(e_j) == 0


def test_triangle_counts_matches_driver_reference(ray_session):
    import collections

    import ray

    from phrasekit_ray.stages.kg import triangle_counts

    tbl = _random_edges()
    pairs = _ref_undirected(tbl)
    adj = collections.defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    ref = collections.Counter()
    for u, v in pairs:
        for w in adj[u] & adj[v]:
            if w > v:
                ref[u] += 1
                ref[v] += 1
                ref[w] += 1
    got = triangle_counts(ray.data.from_arrow(tbl).repartition(6)).to_pandas()
    assert dict(zip(got.node, got.n_triangles)) == dict(ref)
    assert sum(ref.values()) % 3 == 0 and sum(ref.values()) > 0


def test_k_hop_matches_bfs_reference(ray_session):
    import collections

    import ray

    from phrasekit_ray.stages.kg import k_hop

    tbl = _random_edges(seed=11, n_nodes=200, n_edges=220)  # sparse: real hops
    pairs = _ref_undirected(tbl)
    adj = collections.defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    seed = min(adj)
    dist = {seed: 0}
    frontier = [seed]
    for d in range(1, 4):
        nxt = []
        for x in frontier:
            for y in adj[x]:
                if y not in dist:
                    dist[y] = d
                    nxt.append(y)
        frontier = nxt
    got = k_hop(ray.data.from_arrow(tbl).repartition(6), hops=3).to_pandas()
    assert dict(zip(got.node, got.dist)) == dist
    assert max(dist.values()) >= 2  # fixture actually exercises >1 hop


def test_cooccurrence_edges_matches_reference(ray_session):
    import itertools

    import ray

    from phrasekit_ray.stages.kg import cooccurrence_edges

    rng = np.random.default_rng(3)
    g = rng.integers(0, 40, 500)
    items = rng.integers(0, 30, 500)
    baskets = {}
    for gg, ii in zip(g.tolist(), items.tolist()):
        baskets.setdefault(gg, set()).add(ii)
    want = set()
    for members in baskets.values():
        for a, b in itertools.combinations(sorted(members), 2):
            want.add((a, b))
    ds = ray.data.from_arrow(
        pa.table({"ok": pa.array(g, pa.int64()), "pk": pa.array(items, pa.int64())})
    ).repartition(5)
    got = cooccurrence_edges(ds, "ok", "pk").to_pandas()
    got_pairs = set(zip(got.subj, got.obj))  # may repeat across groups
    assert got_pairs == want
    assert all(a < b for a, b in got_pairs)


def test_k_hop_empty_graph(ray_session):
    import ray

    from phrasekit_ray.stages.kg import k_hop

    empty = ray.data.from_arrow(
        pa.table(
            {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
        )
    )
    assert k_hop(empty, hops=2).count() == 0


def test_run_kg_increment_accepts_plain_artifact(ray_session):
    """KGResult.artifact is a plain MatcherArtifact — run_kg_increment must
    ray.put it before handing it to the tagger actors (regression: passing
    it straight through crashed TaggerActor.__init__'s ray.get)."""
    import ray

    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.kg import run_kg_increment, run_kg_pipeline
    from phrasekit_ray.sources import pages as pagesmod

    full_tbl = pagesmod.synthesize_pages_table()
    full = ray.data.from_arrow(full_tbl)
    res = run_kg_pipeline(
        full,
        pagesmod.background_table(),
        MineConfig(min_n=2, max_n=5, min_count=2),
        ScoreConfig(min_domain_count=2),
    )
    inc = run_kg_increment(
        ray.data.from_arrow(full_tbl.slice(0, 4)), res.artifact, res.mapping
    )
    assert inc.nodes.count() >= 0  # executes the tag stage without crashing


def test_resumable_write_crash_mid_write_redoes_byte_identically(
    ray_session, tmp_path
):
    """Crash-mid-write drill (VERDICT r2 item 9): after a simulated kill
    that leaves partition 2 with a half-written data file and NO manifest
    and partition 3 missing entirely, a re-run must (a) leave the
    manifest-complete partitions' files untouched, (b) rewrite the
    crashed partitions byte-identically to an uninterrupted run."""
    import ray

    t = pa.table(
        {
            "entity_id": pa.array(range(128), pa.uint64()),
            "n": pa.array(list(range(128)), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)

    def data_path(root, i):
        return os.path.join(lineage.partition_dir(root, "nodes", i), "data.parquet")

    # reference: one uninterrupted run
    ref_root = str(tmp_path / "ref")
    lineage.write_dataset_resumable(ds, ref_root, "nodes", {"v": 1}, "entity_id", 4)
    ref_bytes = {i: open(data_path(ref_root, i), "rb").read() for i in range(4)}

    # crashed run: partitions 0/1 completed, 2 half-written (no manifest),
    # 3 never started
    root = str(tmp_path / "crashed")
    lineage.write_dataset_resumable(ds, root, "nodes", {"v": 1}, "entity_id", 4)
    os.remove(lineage.manifest_path(root, "nodes", 2))
    with open(data_path(root, 2), "wb") as f:
        f.write(ref_bytes[2][: len(ref_bytes[2]) // 2])  # torn write
    os.remove(lineage.manifest_path(root, "nodes", 3))
    os.remove(data_path(root, 3))
    survivors = {i: os.stat(data_path(root, i)).st_mtime_ns for i in (0, 1)}

    s = lineage.write_dataset_resumable(ds, root, "nodes", {"v": 1}, "entity_id", 4)
    assert s["skipped"] == 2 and s["written"] == 2
    # complete partitions untouched
    for i in (0, 1):
        assert os.stat(data_path(root, i)).st_mtime_ns == survivors[i]
    # crashed partitions redone byte-identically to the clean run
    for i in (2, 3):
        assert open(data_path(root, i), "rb").read() == ref_bytes[i], i
    back = lineage.read_partitioned(root, "nodes")
    assert sorted(r["entity_id"] for r in back.iter_rows()) == list(range(128))


def test_triangle_counts_distributed_path_matches_fast_path(ray_session):
    """Force the fully-distributed path (broadcast bounds 0: lookup_join
    degrees, wedge semi-join, no driver orchestration) and check it
    against the bounded driver fast path on the same graph."""
    import ray

    from phrasekit_ray.stages.kg import triangle_counts

    tbl = _random_edges(seed=11, n_nodes=40, n_edges=300)
    fast = triangle_counts(ray.data.from_arrow(tbl).repartition(5)).to_pandas()
    dist = triangle_counts(
        ray.data.from_arrow(tbl).repartition(5),
        broadcast_nodes=0,
        broadcast_edges=0,
    ).to_pandas()
    assert dict(zip(fast.node, fast.n_triangles)) == dict(
        zip(dist.node, dist.n_triangles)
    )
    assert len(fast) > 0


def test_cooccurrence_driver_path_matches_shuffle_path(ray_session):
    import ray

    from phrasekit_ray.stages.kg import cooccurrence_edges

    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "g": pa.array(rng.integers(0, 50, 400), pa.int64()),
            "i": pa.array(rng.integers(0, 30, 400), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)

    def pairs(res):
        df = res.to_pandas()
        return sorted(map(tuple, df[["subj", "obj"]].values))

    shuffle = pairs(cooccurrence_edges(ds, "g", "i"))
    driver = pairs(cooccurrence_edges(ds, "g", "i", input_rows=400))
    # same multiset of (subj, obj) pairs (dupes across groups legal)
    assert shuffle == driver and len(driver) > 0


def test_triangle_counts_empty_and_triangle_free(ray_session):
    import ray

    from phrasekit_ray.stages.kg import triangle_counts

    empty = pa.table(
        {"subj": pa.array([], pa.int64()), "obj": pa.array([], pa.int64())}
    )
    assert triangle_counts(ray.data.from_arrow(empty)).count() == 0
    # a path graph has zero triangles
    path = pa.table(
        {
            "subj": pa.array([1, 2, 3, 4], pa.int64()),
            "obj": pa.array([2, 3, 4, 5], pa.int64()),
        }
    )
    assert triangle_counts(ray.data.from_arrow(path)).count() == 0


def test_k_hop_driver_path_matches_distributed(ray_session):
    import ray

    from phrasekit_ray.stages.kg import k_hop

    tbl = _random_edges(seed=5, n_nodes=30, n_edges=120)
    ds = ray.data.from_arrow(tbl).repartition(4)
    fast = k_hop(ds, hops=3).to_pandas()
    dist = k_hop(ds, hops=3, broadcast_edges=0).to_pandas()
    assert dict(zip(fast.node, fast.dist)) == dict(zip(dist.node, dist.dist))
    assert (fast.dist == 0).sum() == 1
    # isolated seed: emits only (seed, 0)
    lone = k_hop(ds, hops=2, seed=10_000).to_pandas()
    assert list(map(tuple, lone.values)) == [(10_000, 0)]


def _lpa_reference(edge_list, max_rounds):
    """Driver reference for the EXACT distributed rule: synchronous, each
    node adopts the most frequent neighbor label (ties → smallest),
    early-stop when the global label sum is stable, capped rounds."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(list)
    for u, v in edge_list:
        nbrs[u].append(v)
        nbrs[v].append(u)
    labels = {n: n for n in nbrs}
    for _ in range(max_rounds):
        new = {}
        for n, ns in nbrs.items():
            c = Counter(labels[m] for m in ns)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        if new == labels:  # fixpoint (mirrors the distributed hash test)
            break
        labels = new
    return labels


def _lpa_run(ray, edge_list, max_rounds=10, parts=1):
    from phrasekit_ray.stages.kg import label_propagation_communities

    t = pa.table(
        {
            "src": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = label_propagation_communities(ds, max_rounds=max_rounds)
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return dict(zip(tbl["node"].to_pylist(), tbl["label"].to_pylist()))


def test_lpa_two_cliques_with_bridge(ray_session):
    import ray

    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14) if b >= 10]
    edges = k1 + k2 + [(3, 10)]
    got = _lpa_run(ray, edges)
    want = _lpa_reference(edges, 10)
    assert got == want
    # the two cliques end in two distinct communities
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n] for n in range(10, 14)}) == 1
    assert got[0] != got[12]


def test_lpa_matches_reference_random_and_partition_invariant(ray_session):
    import ray

    rng = np.random.default_rng(7)
    n = 60
    edges = set()
    for _ in range(150):
        u, v = rng.integers(0, n, 2)
        if u != v:
            edges.add((int(min(u, v)), int(max(u, v))))
    edges = sorted(edges)
    want = _lpa_reference(edges, 6)
    got1 = _lpa_run(ray, edges, max_rounds=6, parts=1)
    got7 = _lpa_run(ray, edges, max_rounds=6, parts=7)
    assert got1 == want
    assert got7 == want  # partitioning-independent


def test_lpa_rejects_oversized_node_ids(ray_session):
    import ray
    import pytest as _pytest

    from phrasekit_ray.stages.kg import label_propagation_communities

    t = pa.table(
        {
            "src": pa.array([1 << 33], pa.int64()),
            "dst": pa.array([2], pa.int64()),
        }
    )
    with _pytest.raises(Exception, match="2\\^32"):
        out = label_propagation_communities(ray.data.from_arrow(t))
        pa.concat_tables(out.iter_batches(batch_format="pyarrow"))


def test_lpa_empty_edges_and_negative_ids(ray_session):
    import ray
    import pytest as _pytest

    from phrasekit_ray.stages.kg import label_propagation_communities

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    res = label_propagation_communities(empty)
    assert res.count() == 0
    assert set(res.schema().names) == {"node", "label"}

    neg = ray.data.from_arrow(
        pa.table({"src": pa.array([-5], pa.int64()), "dst": pa.array([3], pa.int64())})
    )
    with _pytest.raises(Exception, match=r"\[0, 2\^32\)"):
        pa.concat_tables(
            label_propagation_communities(neg).iter_batches(batch_format="pyarrow")
        )


def test_lpa_two_node_swap_not_frozen_by_convergence_check(ray_session):
    """A single edge {0,1} oscillates with a CONSTANT label sum — the old
    sum-stability check froze mid-oscillation; the fixpoint hash check
    must keep iterating to the round cap, matching the reference."""
    import ray

    edges = [(0, 1)]
    for cap in (1, 2, 3):
        got = _lpa_run(ray, edges, max_rounds=cap)
        want = _lpa_reference(edges, cap)
        assert got == want, (cap, got, want)
