"""Round-5 additions: DSIR importance weights (X133) and
common-neighbor/Adamic–Adar link prediction (X134). SQL-oracle
equivalence runs in test_queries_oracle.py; these pin the properties a
SQL twin can't express."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _collect(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tables, promote_options="default")


def test_dsir_target_slice_scores_higher(ray_session, sf_dir):
    """The defining DSIR property: documents drawn from the target
    distribution should average a higher importance weight than the
    rest (the weight is literally the target-vs-raw LM log-ratio)."""
    import ray

    from phrasekit_ray.stages.textstats import dsir_weights

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    w = _collect(dsir_weights(docs, target_lang="en")).to_pydict()
    langs = dict(
        zip(
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])[
                "doc_id"
            ].to_pylist(),
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])[
                "lang"
            ].to_pylist(),
        )
    )
    tgt = [
        m / max(n, 1)
        for d, n, m in zip(w["doc_id"], w["n_toks"], w["dsir_micro"])
        if langs[d] == "en"
    ]
    rest = [
        m / max(n, 1)
        for d, n, m in zip(w["doc_id"], w["n_toks"], w["dsir_micro"])
        if langs[d] != "en"
    ]
    assert tgt and rest
    assert np.mean(tgt) > np.mean(rest)


def test_dsir_matches_single_process_reference(ray_session, sf_dir):
    """Distributed two-pass result == a one-process recomputation over
    the same md5-bucket hash and micro-nat rounding."""
    import hashlib

    import ray

    from phrasekit_ray.stages.lm import _round_away_np
    from phrasekit_ray.stages.textstats import dsir_weights

    docs_tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    B = 65536
    cr = np.zeros(B, np.int64)
    ct = np.zeros(B, np.int64)
    doc_buckets = {}
    for d, txt, lang in zip(
        docs_tbl["doc_id"].to_pylist(),
        docs_tbl["text"].to_pylist(),
        docs_tbl["lang"].to_pylist(),
    ):
        bs = [
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") % B
            for t in (txt or "").split()
        ]
        doc_buckets[d] = bs
        for b in bs:
            cr[b] += 1
            if lang == "en":
                ct[b] += 1
    nt, nr = int(ct.sum()), int(cr.sum())
    lp_t = _round_away_np(np.log((ct + 1.0) / np.float64(nt + B)) * 1e6).astype(
        np.int64
    )
    lp_r = _round_away_np(np.log((cr + 1.0) / np.float64(nr + B)) * 1e6).astype(
        np.int64
    )
    diff = lp_t - lp_r
    ref = {
        d: (len(bs), int(diff[bs].sum()) if bs else 0)
        for d, bs in doc_buckets.items()
    }

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    got = _collect(dsir_weights(ds, target_lang="en")).to_pydict()
    for d, n, m in zip(got["doc_id"], got["n_toks"], got["dsir_micro"]):
        assert (n, m) == ref[d], f"doc {d}"


def _toy_edges():
    import ray

    # path + square: 1-2-3-4, 4-5, 2-5  (undirected)
    return ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array([1, 2, 3, 4, 2], pa.int64()),
                "obj": pa.array([2, 3, 4, 5, 5], pa.int64()),
            }
        )
    )


def test_link_prediction_toy_graph(ray_session):
    from phrasekit_ray.stages.kg import link_prediction

    t = _collect(link_prediction(_toy_edges())).to_pydict()
    got = {
        (a, b): (cn, aa)
        for a, b, cn, aa in zip(
            t["a"], t["b"], t["cn"], t["aa_micro"]
        )
    }
    # adjacency: 1:{2} 2:{1,3,5} 3:{2,4} 4:{3,5} 5:{2,4}
    # non-edges with common neighbors:
    #   (1,3) via 2 (deg 3); (1,5) via 2; (3,5) via 2 and 4 (deg 2)
    #   (2,4) via 3 and 5 (both deg 2)
    w3 = round(1e6 / np.log(3.0))
    w2 = round(1e6 / np.log(2.0))
    assert got == {
        (1, 3): (1, w3),
        (1, 5): (1, w3),
        (3, 5): (2, w3 + w2),
        (2, 4): (2, w2 + w2),
    }


def test_link_prediction_never_emits_existing_edges(ray_session, sf_dir):
    import ray

    from phrasekit_ray.pipelines.queries_ext import q_link_prediction  # noqa: F401
    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import link_prediction

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    hosts = sorted(set(he["src_host"].to_pylist()) | set(he["dst_host"].to_pylist()))
    hid = {h: i for i, h in enumerate(hosts)}
    edges = pa.table(
        {
            "subj": pa.array([hid[h] for h in he["src_host"].to_pylist()], pa.int64()),
            "obj": pa.array([hid[h] for h in he["dst_host"].to_pylist()], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(edges)
    out = _collect(link_prediction(ds)).to_pydict()
    existing = set()
    for u, v in zip(edges["subj"].to_pylist(), edges["obj"].to_pylist()):
        if u != v:
            existing.add((min(u, v), max(u, v)))
    predicted = set(zip(out["a"], out["b"]))
    assert predicted and not (predicted & existing)
    assert all(c >= 1 for c in out["cn"])


def test_link_prediction_cap_only_misses(ray_session):
    """max_middle_degree is a one-sided pressure valve: capped results
    are a subset of uncapped (hub middles skipped, nothing invented)."""
    from phrasekit_ray.stages.kg import link_prediction

    full = _collect(link_prediction(_toy_edges())).to_pydict()
    capped = _collect(link_prediction(_toy_edges(), max_middle_degree=2)).to_pydict()
    full_pairs = set(zip(full["a"], full["b"]))
    capped_pairs = set(zip(capped["a"], capped["b"]))
    assert capped_pairs < full_pairs  # deg-3 middle (node 2) skipped
    # surviving pairs keep exact (cn, aa) from deg-2 middles only
    cap_map = {
        (a, b): (c, w)
        for a, b, c, w in zip(
            capped["a"], capped["b"], capped["cn"], capped["aa_micro"]
        )
    }
    w2 = round(1e6 / np.log(2.0))
    assert cap_map == {(3, 5): (1, w2), (2, 4): (2, 2 * w2)}


def _ref_ppr(E, n_seeds=4, iters=4, an=85, ad=100, M=10**12):
    """Single-process reference for the exact-int sink-loss PPR
    recurrence (stages/kg.ppr_exact)."""
    es = sorted({(int(a), int(b)) for a, b in E if a != b})
    nodes = sorted({x for e in es for x in e})
    S = set(nodes[:n_seeds])
    od = {}
    for a, _ in es:
        od[a] = od.get(a, 0) + 1
    r = {v: (M // len(S) if v in S else 0) for v in nodes}
    base = ((ad - an) * M) // (ad * len(S))
    for _ in range(iters):
        nr = {v: (base if v in S else 0) for v in nodes}
        for a, b in es:
            nr[b] += (r[a] * an) // (ad * od[a])
        r = nr
    return r


def test_ppr_exact_matches_reference_and_is_partition_invariant(ray_session):
    import ray

    from phrasekit_ray.stages.kg import ppr_exact

    rng = np.random.default_rng(11)
    E = rng.integers(0, 40, size=(300, 2))
    edges = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    want = _ref_ppr(E)
    # fast (driver) path
    got = {
        r["node"]: r["rank_micro"]
        for r in _collect(ppr_exact(ray.data.from_arrow(edges))).to_pylist()
    }
    assert got == want
    # forced fully-distributed path, two partitionings
    for parts in (1, 9):
        got2 = {
            r["node"]: r["rank_micro"]
            for r in _collect(
                ppr_exact(
                    ray.data.from_arrow(edges).repartition(parts),
                    driver_edges_threshold=0,
                )
            ).to_pylist()
        }
        assert got2 == want


def test_ppr_exact_mass_and_seed_locality(ray_session):
    """Total mass never exceeds the injected total (sink loss + floor
    division only ever LOSE micro-units), and seeds hold more mass than
    any non-seed-adjacent far node on a two-cluster graph."""
    import ray

    from phrasekit_ray.stages.kg import ppr_exact

    # two 4-cliques joined by one directed bridge 3 -> 10
    edges = []
    for grp in (range(4), range(10, 14)):
        g = list(grp)
        edges += [(a, b) for a in g for b in g if a != b]
    edges.append((3, 10))
    t = pa.table(
        {
            "subj": pa.array([a for a, _ in edges], pa.int64()),
            "obj": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    res = _collect(ppr_exact(ray.data.from_arrow(t), n_seeds=2, iters=6))
    r = {row["node"]: row["rank_micro"] for row in res.to_pylist()}
    assert sum(r.values()) <= 10**12
    # seeds are 0 and 1 (smallest ids): their cluster outranks the far one
    assert min(r[0], r[1]) > max(r[11], r[12], r[13])


def _ref_sssp(E, W, src=0, T=6):
    ew = {}
    for (a, b), w in zip(E, W):
        k = (int(a), int(b))
        ew[k] = min(ew.get(k, 1 << 60), int(w))
    d = {src: 0}
    for _ in range(T):
        nd = dict(d)
        for (a, b), w in ew.items():
            if a in d and d[a] + w < nd.get(b, 1 << 60):
                nd[b] = d[a] + w
        d = nd
    return d


def test_sssp_exact_matches_reference_and_is_partition_invariant(ray_session):
    import ray

    from phrasekit_ray.stages.kg import sssp_exact

    rng = np.random.default_rng(5)
    E = rng.integers(0, 50, size=(400, 2))
    W = rng.integers(1, 10, size=400)
    edges = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
            "w": pa.array(W, pa.int64()),
        }
    )
    want = _ref_sssp(E, W)
    # fast (driver) path
    got = {
        r["node"]: r["dist"]
        for r in _collect(
            sssp_exact(ray.data.from_arrow(edges), source=0)
        ).to_pylist()
    }
    assert got == want
    # forced fully-distributed path, two partitionings
    for parts in (1, 9):
        got2 = {
            r["node"]: r["dist"]
            for r in _collect(
                sssp_exact(
                    ray.data.from_arrow(edges).repartition(parts),
                    source=0,
                    driver_edges_threshold=0,
                )
            ).to_pylist()
        }
        assert got2 == want


def test_sssp_hop_bound_semantics(ray_session):
    """On a weighted path graph 0-1-2-...-9 (w=2 each), T rounds reach
    exactly T hops; a heavier shortcut 0->9 (w=25) wins only until the
    cheap path becomes reachable."""
    import ray

    from phrasekit_ray.stages.kg import sssp_exact

    chain = [(i, i + 1, 2) for i in range(9)] + [(0, 9, 25)]
    edges = pa.table(
        {
            "subj": pa.array([a for a, _, _ in chain], pa.int64()),
            "obj": pa.array([b for _, b, _ in chain], pa.int64()),
            "w": pa.array([w for _, _, w in chain], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(edges)
    d3 = {
        r["node"]: r["dist"]
        for r in _collect(sssp_exact(ds, source=0, iters=3)).to_pylist()
    }
    assert d3 == {0: 0, 1: 2, 2: 4, 3: 6, 9: 25}
    d9 = {
        r["node"]: r["dist"]
        for r in _collect(sssp_exact(ds, source=0, iters=9)).to_pylist()
    }
    assert d9[9] == 18  # the cheap 9-hop path beats the shortcut


def test_skyline_mask_brute_force():
    from phrasekit_ray.stages.agg import _skyline_mask

    rng = np.random.default_rng(0)
    for _ in range(150):
        n = int(rng.integers(1, 60))
        d1 = rng.integers(0, 8, n).astype(np.int64)
        d2 = rng.integers(0, 8, n).astype(np.int64)
        got = _skyline_mask(d1, d2)
        want = np.array(
            [
                not any(
                    d1[q] >= d1[p]
                    and d2[q] <= d2[p]
                    and (d1[q] > d1[p] or d2[q] < d2[p])
                    for q in range(n)
                )
                for p in range(n)
            ]
        )
        assert np.array_equal(got, want)


def test_skyline_2d_distributed_equals_single_block(ray_session):
    """Local-prune + one-task merge must equal the single-block exact
    skyline at any partitioning, including duplicate frontier points."""
    import ray

    from phrasekit_ray.stages.agg import skyline_2d

    rng = np.random.default_rng(2)
    n = 5000
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "a": pa.array(rng.integers(0, 100, n), pa.int64()),
            "b": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )

    def run(ds):
        out = _collect(skyline_2d(ds, "id", "a", "b"))
        return sorted(zip(*[out[c].to_pylist() for c in ("id", "a", "b")]))

    one = run(ray.data.from_arrow(t))
    many = run(ray.data.from_arrow(t).repartition(13))
    assert one == many
    # no kept point dominates another kept point
    for i, (idi, a1, b1) in enumerate(one):
        for j, (idj, a2, b2) in enumerate(one):
            if i != j:
                assert not (a2 >= a1 and b2 <= b1 and (a2 > a1 or b2 < b1))


def test_sorted_neighborhood_pairs_reference_and_invariance(ray_session):
    import ray

    from phrasekit_ray.stages.dedup import sorted_neighborhood_pairs

    rng = np.random.default_rng(4)
    n = 800
    ids = np.arange(1000, 1000 + n)
    key = rng.integers(0, 50, n)  # heavy ties exercise the total order
    t = pa.table(
        {"id": pa.array(ids, pa.int64()), "k": pa.array(key, pa.int64())}
    )
    order = np.lexsort((ids, key))
    sid = ids[order]
    w = 3
    want = sorted(
        (int(sid[i]), int(sid[j]))
        for i in range(n)
        for j in range(i + 1, min(i + w + 1, n))
    )
    for parts in (1, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = sorted(
            zip(*[
                _collect(
                    sorted_neighborhood_pairs(ds, ["k"], "id", window=w)
                )[c].to_pylist()
                for c in ("a", "b")
            ])
        )
        assert got == want
    assert len(want) == n * w - w * (w + 1) // 2  # n·w minus the tail


def test_sorted_neighborhood_rejects_bad_window(ray_session):
    import pytest
    import ray

    from phrasekit_ray.stages.dedup import sorted_neighborhood_pairs

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([1], pa.int64()), "k": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(ds, ["k"], "id", window=0)


def test_ngram_novelty_conservation_and_first_doc(ray_session):
    """Σ novelty == total distinct bigram types, and the smallest
    doc_id owns every bigram it contains."""
    import ray

    from phrasekit_ray.stages.textstats import ngram_novelty

    texts = [
        "a b c a b",      # doc 0: types {a b, b c, c a} -> owns 3
        "a b x y",        # doc 1: new types {b x, x y} -> owns 2
        "x y a b",        # doc 2: new type {y a} -> owns 1
        "q",              # doc 3: no bigrams -> 0
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = {
        r["doc_id"]: r["new_ngrams"]
        for r in _collect(
            ngram_novelty(ray.data.from_arrow(t).repartition(3))
        ).to_pylist()
    }
    assert out == {0: 3, 1: 2, 2: 1, 3: 0}
    types = set()
    for s in texts:
        w = s.split()
        types |= {f"{a} {b}" for a, b in zip(w, w[1:])}
    assert sum(out.values()) == len(types)


def test_zonemap_prunes_and_matches_full_scan(ray_session, tmp_path):
    import ray

    from phrasekit_ray.state.lineage import read_zonemapped, write_zonemapped

    rng = np.random.default_rng(6)
    n = 20_000
    vals = rng.integers(0, 10_000, n)
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    root = str(tmp_path)
    write_zonemapped(ray.data.from_arrow(t).repartition(8), root, "s", "v", 16)
    out, scanned, total = read_zonemapped(root, "s", "v", 1000, 1999)
    # collect ONCE: two _collect calls would execute the read twice, and
    # iter_batches block order is not stable across executions — zipping
    # id from one run with v from another fabricates crossed pairs
    ot = _collect(out)
    got = sorted(zip(ot["id"].to_pylist(), ot["v"].to_pylist()))
    want = sorted(
        (int(i), int(v)) for i, v in zip(np.arange(n), vals)
        if 1000 <= v <= 1999
    )
    assert got == want
    assert total == 16
    # a 10% value range over a range layout must NOT open most zones
    assert scanned <= 4
    # a disjoint range opens nothing
    _, scanned0, _ = read_zonemapped(root, "s", "v", 50_000, 60_000)
    assert scanned0 == 0


def test_zonemap_empty_input(ray_session, tmp_path):
    import ray

    from phrasekit_ray.state.lineage import read_zonemapped, write_zonemapped

    empty = ray.data.from_arrow(
        pa.table({"id": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    root = str(tmp_path)
    s = write_zonemapped(empty, root, "s", "v", 4)
    assert s["rows"] == 0
    out, scanned, total = read_zonemapped(root, "s", "v", 0, 10)
    assert scanned == 0 and total == 4
    assert out.count() == 0


def test_kmv_estimator_accuracy_and_partition_invariance(ray_session):
    """Synthetic corpus with ~2000 distinct tokens per group exercises
    the k-th-min estimation branch (the sf fixtures' 31-token vocab
    stays under k): estimate within 4σ (σ≈1/√(k−2)), identical at any
    partitioning (sketch mergeability)."""
    import ray

    from phrasekit_ray.stages.agg import kmv_distinct

    rng = np.random.default_rng(9)
    texts, langs = [], []
    true = {"aa": 2000, "bb": 900}
    for lang, vocab in true.items():
        toks = [f"{lang}tok{i}" for i in range(vocab)]
        for _ in range(200):
            texts.append(" ".join(rng.choice(toks, 40)))
            langs.append(lang)
    # ensure every token appears: one doc listing the whole vocab
    for lang, vocab in true.items():
        texts.append(" ".join(f"{lang}tok{i}" for i in range(vocab)))
        langs.append(lang)
    t = pa.table(
        {"lang": pa.array(langs, pa.string()), "text": pa.array(texts, pa.string())}
    )
    k = 64
    sigma = 1.0 / np.sqrt(k - 2)
    res1 = kmv_distinct(ray.data.from_arrow(t), "lang", "text", k=k)
    res2 = kmv_distinct(
        ray.data.from_arrow(t).repartition(7), "lang", "text", k=k
    )
    assert res1.to_pandas().equals(res2.to_pandas())
    for row in res1.to_pylist():
        d = true[row["lang"]]
        assert abs(row["est_distinct"] - d) <= 4 * sigma * d, row


def test_kmv_small_group_is_exact(ray_session):
    import ray

    from phrasekit_ray.stages.agg import kmv_distinct

    t = pa.table(
        {
            "lang": pa.array(["x", "x", "y"], pa.string()),
            "text": pa.array(["a b c a", "c d", "zz"], pa.string()),
        }
    )
    out = {
        r["lang"]: r["est_distinct"]
        for r in kmv_distinct(ray.data.from_arrow(t), "lang", "text").to_pylist()
    }
    assert out == {"x": 4, "y": 1}


# ---------------------------------------------------------------- X147 HITS


def _ref_hits(E, iters=4, scale=10**6):
    """From-scratch HITS reference: the same ceil-quotient-normalized
    integer recurrence, dict-of-python-ints (no numpy)."""
    edges = sorted({(int(a), int(b)) for a, b in E if a != b})
    nodes = sorted({x for e in edges for x in e})
    a = {n: scale for n in nodes}
    h = {n: scale for n in nodes}
    for _ in range(iters):
        araw = {n: 0 for n in nodes}
        for s, o in edges:
            araw[o] += h[s]
        qa = max((max(araw.values()) + scale - 1) // scale, 1)
        a = {n: araw[n] // qa for n in nodes}
        hraw = {n: 0 for n in nodes}
        for s, o in edges:
            hraw[s] += a[o]
        qh = max((max(hraw.values()) + scale - 1) // scale, 1)
        h = {n: hraw[n] // qh for n in nodes}
    return {n: (a[n], h[n]) for n in nodes}


def test_hits_exact_matches_reference_and_is_partition_invariant(ray_session):
    import ray

    from phrasekit_ray.stages.kg import hits_exact

    rng = np.random.default_rng(23)
    E = rng.integers(0, 40, size=(300, 2))
    t = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    want = _ref_hits(E)
    got = {
        r["node"]: (r["auth_micro"], r["hub_micro"])
        for r in _collect(hits_exact(ray.data.from_arrow(t))).to_pylist()
    }
    assert got == want
    # forced fully-distributed path, two partitionings
    for parts in (1, 9):
        got2 = {
            r["node"]: (r["auth_micro"], r["hub_micro"])
            for r in _collect(
                hits_exact(
                    ray.data.from_arrow(t).repartition(parts),
                    driver_edges_threshold=0,
                )
            ).to_pylist()
        }
        assert got2 == want


def test_hits_hub_authority_semantics(ray_session):
    """A pure hub (only out-edges, pointing at every authority) ends
    with hub score == scale and authority 0; a pure authority pointed
    at by every hub ends with authority == scale and hub 0; dup edges
    and self-loops don't change anything."""
    import ray

    from phrasekit_ray.stages.kg import hits_exact

    hubs = [0, 1, 2]
    auths = [10, 11]
    edges = [(h, a) for h in hubs for a in auths]
    edges += edges[:3] + [(5, 5)]  # dups + a self-loop
    t = pa.table(
        {
            "subj": pa.array([a for a, _ in edges], pa.int64()),
            "obj": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    r = {
        row["node"]: (row["auth_micro"], row["hub_micro"])
        for row in _collect(hits_exact(ray.data.from_arrow(t), iters=3)).to_pylist()
    }
    assert 5 not in r  # self-loop-only node drops out with its loop
    for h in hubs:
        assert r[h] == (0, 10**6)
    for a in auths:
        assert r[a] == (10**6, 0)


def test_hits_empty_and_iters_guard(ray_session):
    import pytest
    import ray

    from phrasekit_ray.stages.kg import hits_exact

    empty = pa.table(
        {"subj": pa.array([], pa.int64()), "obj": pa.array([], pa.int64())}
    )
    out = hits_exact(ray.data.from_arrow(empty))
    assert out.count() == 0
    assert out.schema().names == ["node", "auth_micro", "hub_micro"]
    with pytest.raises(ValueError):
        hits_exact(ray.data.from_arrow(empty), iters=0)


# ------------------------------------------------ X148 negative sampling


def _ref_negative_edges(E, k=3):
    from phrasekit_ray.sources.pages import splitmix17

    edges = sorted({(int(a), int(b)) for a, b in E if a != b})
    nodes = sorted({x for e in edges for x in e})
    rank = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    pos = {(rank[a], rank[b]) for a, b in edges}
    out = []
    for a, b in edges:
        s, o = rank[a], rank[b]
        for j in range(1, k + 1):
            r = int(splitmix17(np.uint64((s * N + o) * k + j)) % np.uint64(N))
            if r != s and (s, r) not in pos:
                out.append((nodes[s], nodes[r], j))
    return sorted(out)


def test_negative_edges_matches_reference_and_is_partition_invariant(
    ray_session,
):
    import ray

    from phrasekit_ray.stages.kg import negative_edges

    rng = np.random.default_rng(31)
    E = rng.integers(0, 50, size=(400, 2))
    t = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    want = _ref_negative_edges(E)
    got = sorted(
        (r["subj"], r["obj_neg"], r["slot"])
        for r in _collect(negative_edges(ray.data.from_arrow(t))).to_pylist()
    )
    assert got == want
    for parts in (1, 7):
        got2 = sorted(
            (r["subj"], r["obj_neg"], r["slot"])
            for r in _collect(
                negative_edges(
                    ray.data.from_arrow(t).repartition(parts),
                    driver_edges_threshold=0,
                )
            ).to_pylist()
        )
        assert got2 == want


def test_negative_edges_never_emit_positives_or_self_loops(ray_session):
    import ray

    from phrasekit_ray.stages.kg import negative_edges

    rng = np.random.default_rng(5)
    E = rng.integers(0, 12, size=(120, 2))  # dense graph → many collisions
    t = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    pos = {(int(a), int(b)) for a, b in E if a != b}
    k = 4
    rows = _collect(negative_edges(ray.data.from_arrow(t), k=k)).to_pylist()
    assert 0 < len(rows) <= k * len(pos)
    for r in rows:
        assert r["subj"] != r["obj_neg"]
        assert (r["subj"], r["obj_neg"]) not in pos
        assert 1 <= r["slot"] <= k


def test_negative_edges_guards(ray_session):
    import pytest
    import ray

    from phrasekit_ray.stages.kg import negative_edges

    empty = pa.table(
        {"subj": pa.array([], pa.int64()), "obj": pa.array([], pa.int64())}
    )
    out = negative_edges(ray.data.from_arrow(empty))
    assert out.count() == 0
    assert out.schema().names == ["subj", "obj_neg", "slot"]
    with pytest.raises(ValueError):
        negative_edges(ray.data.from_arrow(empty), k=0)
    with pytest.raises(ValueError):
        negative_edges(ray.data.from_arrow(empty), k=257)


# -------------------------------------- X149/X150 snapshot + clustering


def test_latest_facts_pick_max_ts_then_max_obj(ray_session, sf_dir):
    """q_kg_latest_facts: one row per subj; winner == SQL row_number
    ORDER BY ts DESC, obj DESC (pinned here independently of the
    DuckDB harness by recomputing from the raw triple stream)."""
    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.kg import run_kg_pipeline
    from phrasekit_ray.pipelines.queries_ext import q_kg_latest_facts
    from phrasekit_ray.sources.pages import DEMO_BACKGROUND, EPOCH_US, pages_from_documents

    got = q_kg_latest_facts(sf_dir)
    assert got.column_names == ["subj", "obj", "last_ts"]
    subs = got["subj"].to_pylist()
    assert len(subs) == len(set(subs))  # one fact per subject

    res = run_kg_pipeline(
        pages_from_documents(sf_dir),
        {" ".join(t): c for t, c in DEMO_BACKGROUND},
        MineConfig(min_n=2, max_n=5, min_count=3),
        ScoreConfig(min_domain_count=3),
        tag_concurrency=(1, 2),
    )
    best = {}
    for b in res.triples.iter_batches(batch_format="pyarrow"):
        for s, o, d in zip(
            b["subj"].to_pylist(),
            b["obj"].to_pylist(),
            b["doc_id"].to_pylist(),
        ):
            ts = EPOCH_US + int(d.rsplit("/", 1)[1]) * 1_000_000
            if s not in best or (ts, o) > best[s]:
                best[s] = (ts, o)
    want = {s: (o, ts) for s, (ts, o) in best.items()}
    assert {
        s: (o, t)
        for s, o, t in zip(subs, got["obj"].to_pylist(), got["last_ts"].to_pylist())
    } == want


def test_clustering_coeff_toy_values(ray_session, tmp_path):
    """Triangle 1-2-3 plus pendant 3-4 through a synthetic lineitem
    basket: cc(1)=cc(2)=10⁶ (deg 2, one triangle), cc(3)=2·10⁶//6
    (deg 3), node 4 absent (no triangle)."""
    import pyarrow.parquet as pq_mod

    from phrasekit_ray.pipelines.queries_ext import q_clustering_coeff

    # baskets: order 1 = {1,2,3} (the triangle), order 2 = {3,4}
    tbl = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "l_partkey": pa.array([1, 2, 3, 3, 4], pa.int64()),
        }
    )
    pq_mod.write_table(tbl, tmp_path / "lineitem.parquet")
    got = {
        r["node"]: (r["n_triangles"], r["cc_micro"])
        for r in q_clustering_coeff(str(tmp_path)).to_pylist()
    }
    assert got == {
        1: (1, 1_000_000),
        2: (1, 1_000_000),
        3: (1, 2_000_000 // 6),
    }


# ------------------------------------------ X151/X152 support + k-truss


def _ref_truss_fixpoint(E, k):
    """Brute-force UNTIL-FIXPOINT k-truss (the classic definition) —
    the fixed-round stage must land on this once rounds suffice."""
    edges = {(min(a, b), max(a, b)) for a, b in E if a != b}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return {e: sup[e] for e in edges}
        edges -= drop


def test_edge_support_toy_and_triangle_consistency(ray_session):
    import ray

    from phrasekit_ray.stages.kg import edge_triangle_support

    # triangle 1-2-3 plus pendant 3-4
    t = pa.table(
        {
            "subj": pa.array([1, 2, 1, 3], pa.int64()),
            "obj": pa.array([2, 3, 3, 4], pa.int64()),
        }
    )
    got = {
        (r["u"], r["v"]): r["support"]
        for r in _collect(
            edge_triangle_support(ray.data.from_arrow(t))
        ).to_pylist()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}  # pendant edge absent

    # random graph: Σ support == 3 · Σ per-node triangles / 3
    from phrasekit_ray.stages.kg import triangle_counts

    rng = np.random.default_rng(41)
    E = rng.integers(0, 30, size=(200, 2))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array(E[:, 0], pa.int64()),
                "obj": pa.array(E[:, 1], pa.int64()),
            }
        )
    )
    sup = _collect(edge_triangle_support(ds)).to_pydict()
    tri = _collect(triangle_counts(ds)).to_pydict()
    assert sum(sup["support"]) == sum(tri["n_triangles"])


def test_k_truss_matches_fixpoint_reference_and_partition_invariant(
    ray_session,
):
    import ray

    from phrasekit_ray.stages.kg import k_truss

    rng = np.random.default_rng(43)
    E = rng.integers(0, 25, size=(150, 2))
    t = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    for k in (3, 4, 5):
        want = _ref_truss_fixpoint(E, k)
        # enough rounds to converge on 25 nodes
        got = {
            (r["u"], r["v"]): r["support"]
            for r in _collect(
                k_truss(ray.data.from_arrow(t), k=k, rounds=10)
            ).to_pylist()
        }
        assert got == want, f"k={k}"
        # fixpoint: one more round changes nothing
        got11 = {
            (r["u"], r["v"]): r["support"]
            for r in _collect(
                k_truss(ray.data.from_arrow(t), k=k, rounds=11)
            ).to_pylist()
        }
        assert got11 == got
    # forced fully-distributed path, two partitionings
    want4 = _ref_truss_fixpoint(E, 4)
    for parts in (1, 7):
        got2 = {
            (r["u"], r["v"]): r["support"]
            for r in _collect(
                k_truss(
                    ray.data.from_arrow(t).repartition(parts),
                    k=4,
                    rounds=10,
                    driver_edges_threshold=0,
                )
            ).to_pylist()
        }
        assert got2 == want4


def test_k_truss_guards_and_invariant(ray_session, sf_dir):
    import pytest
    import ray

    from phrasekit_ray.pipelines.queries_ext import q_graph_ktruss
    from phrasekit_ray.stages.kg import k_truss

    empty = pa.table(
        {"subj": pa.array([], pa.int64()), "obj": pa.array([], pa.int64())}
    )
    with pytest.raises(ValueError):
        k_truss(ray.data.from_arrow(empty), k=2)
    with pytest.raises(ValueError):
        k_truss(ray.data.from_arrow(empty), rounds=0)
    out = q_graph_ktruss(sf_dir)
    sup = out["support"].to_pylist()
    assert sup and min(sup) >= 3  # k=5 → in-band invariant support ≥ k−2
    # the query's 4 rounds reach the fixpoint on the fixture
    from phrasekit_ray.pipelines.queries_ext import _basket_edges_ds

    more = _collect(k_truss(_basket_edges_ds(sf_dir), k=5, rounds=5))
    assert more.num_rows == out.num_rows


def test_triangle_estimate_full_rate_is_exact(ray_session):
    """rate_num == rate_den keeps every wedge ⇒ the 'estimate' IS the
    exact triangle count (×1000): the unbiasedness claim made concrete
    at the degenerate rate."""
    import ray

    from phrasekit_ray.stages.kg import (
        sampled_triangle_estimate,
        triangle_counts,
    )

    rng = np.random.default_rng(47)
    E = rng.integers(0, 40, size=(300, 2))
    t = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    est = _collect(
        sampled_triangle_estimate(
            ray.data.from_arrow(t), rate_num=64, rate_den=64
        )
    ).to_pylist()[0]
    exact = sum(
        _collect(triangle_counts(ray.data.from_arrow(t))).to_pydict()[
            "n_triangles"
        ]
    ) // 3
    assert est["wedges_sampled"] == est["wedges_total"]
    assert est["est_triangles_milli"] == exact * 1000


def test_triangle_estimate_accuracy_and_partition_invariance(ray_session):
    """At rate 1/4 the estimate lands within 15% of the exact count on
    a dense-enough random graph (deterministic sampler ⇒ this is a
    fixed property of the edge set, not a flaky statistical bound), and
    the whole output row is bit-identical across partitionings."""
    import ray

    from phrasekit_ray.stages.kg import (
        sampled_triangle_estimate,
        triangle_counts,
    )

    rng = np.random.default_rng(48)
    E = rng.integers(0, 60, size=(900, 2))
    t = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    exact = sum(
        _collect(triangle_counts(ray.data.from_arrow(t))).to_pydict()[
            "n_triangles"
        ]
    ) // 3
    rows = []
    for parts in (1, 5, 13):
        rows.append(
            _collect(
                sampled_triangle_estimate(
                    ray.data.from_arrow(t).repartition(parts),
                    rate_num=256,
                    rate_den=1024,
                )
            ).to_pylist()[0]
        )
    assert rows[0] == rows[1] == rows[2]
    est = rows[0]["est_triangles_milli"] / 1000
    assert exact > 100  # the bound below is meaningless on a sparse graph
    assert abs(est - exact) / exact < 0.15, (est, exact)


def test_triangle_estimate_guards(ray_session):
    import pytest
    import ray

    from phrasekit_ray.stages.kg import sampled_triangle_estimate

    t = pa.table(
        {"subj": pa.array([1], pa.int64()), "obj": pa.array([2], pa.int64())}
    )
    with pytest.raises(ValueError):
        sampled_triangle_estimate(ray.data.from_arrow(t), rate_num=0)
    with pytest.raises(ValueError):
        sampled_triangle_estimate(
            ray.data.from_arrow(t), rate_num=9, rate_den=8
        )
    # triangle-free graph: estimate 0, wedge bookkeeping still sane
    out = _collect(
        sampled_triangle_estimate(
            ray.data.from_arrow(t), rate_num=64, rate_den=64
        )
    ).to_pylist()[0]
    assert out["est_triangles_milli"] == 0
    assert out["wedges_total"] == 0


def _ref_katz(E, iters, scale, bn, bd):
    """From-scratch reference: dict-of-lists adjacency, per-round
    integer recurrence applied literally."""
    nodes = sorted({int(x) for r in E for x in r if r[0] != r[1]})
    dedup = {(int(a), int(b)) for a, b in E if a != b}
    x = {v: scale for v in nodes}
    for _ in range(iters):
        raw = {v: scale for v in nodes}
        for a, b in dedup:
            raw[b] += x[a] * bn // bd
        q = max((max(raw.values(), default=0) + scale - 1) // scale, 1)
        x = {v: r // q for v, r in raw.items()}
    return x


def test_katz_matches_reference_and_is_partition_invariant(ray_session):
    import ray

    from phrasekit_ray.stages.kg import katz_exact

    rng = np.random.default_rng(49)
    E = rng.integers(0, 30, size=(200, 2))
    t = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    want = _ref_katz(E, 4, 10**6, 1, 5)
    got = {
        r["node"]: r["katz_micro"]
        for r in _collect(
            katz_exact(ray.data.from_arrow(t), iters=4)
        ).to_pylist()
    }
    assert got == want
    # forced fully-distributed path, two partitionings
    for parts in (1, 7):
        got2 = {
            r["node"]: r["katz_micro"]
            for r in _collect(
                katz_exact(
                    ray.data.from_arrow(t).repartition(parts),
                    iters=4,
                    driver_edges_threshold=0,
                )
            ).to_pylist()
        }
        assert got2 == want, parts


def test_katz_base_floor_and_attenuation_semantics(ray_session):
    """The properties that make Katz Katz: a node with no in-edges
    scores exactly the normalized base (nonzero — unlike HITS where it
    collapses to 0), and longer inbound chains contribute strictly less
    per hop (β < 1 attenuation)."""
    import ray

    from phrasekit_ray.stages.kg import katz_exact

    # chain 1→2→3→4 plus isolated-in-degree source 1
    t = pa.table(
        {
            "subj": pa.array([1, 2, 3], pa.int64()),
            "obj": pa.array([2, 3, 4], pa.int64()),
        }
    )
    got = {
        r["node"]: r["katz_micro"]
        for r in _collect(
            katz_exact(ray.data.from_arrow(t), iters=4)
        ).to_pylist()
    }
    assert got[1] > 0  # base floor: no in-edges, still scored
    # one in-hop beats zero; deeper chains accumulate attenuated extras
    assert got[2] > got[1]
    assert got[3] > got[2] - got[1]  # second hop adds less than the first
    assert got[4] >= got[3]


def test_katz_guards_and_empty(ray_session):
    import pytest
    import ray

    from phrasekit_ray.stages.kg import katz_exact

    t = pa.table(
        {"subj": pa.array([1], pa.int64()), "obj": pa.array([2], pa.int64())}
    )
    with pytest.raises(ValueError):
        katz_exact(ray.data.from_arrow(t), iters=0)
    with pytest.raises(ValueError):
        katz_exact(ray.data.from_arrow(t), beta_num=0)
    with pytest.raises(ValueError):
        katz_exact(ray.data.from_arrow(t), beta_num=6, beta_den=5)
    empty = pa.table(
        {"subj": pa.array([7], pa.int64()), "obj": pa.array([7], pa.int64())}
    )  # only a self-loop → empty conformed graph
    assert katz_exact(ray.data.from_arrow(empty)).count() == 0


def test_edge_support_forced_distributed_matches_driver(ray_session):
    """The degree-oriented distributed wedge kernel (orient → SEMI
    closure → 3-credit count) must equal the driver kernel exactly, at
    two partitionings."""
    import ray

    from phrasekit_ray.stages.kg import edge_triangle_support

    rng = np.random.default_rng(53)
    E = rng.integers(0, 40, size=(400, 2))
    t = pa.table(
        {
            "subj": pa.array(E[:, 0], pa.int64()),
            "obj": pa.array(E[:, 1], pa.int64()),
        }
    )
    want = {
        (r["u"], r["v"]): r["support"]
        for r in _collect(
            edge_triangle_support(ray.data.from_arrow(t))
        ).to_pylist()
    }
    assert want  # sanity: the random graph has triangles
    for parts in (1, 7):
        got = {
            (r["u"], r["v"]): r["support"]
            for r in _collect(
                edge_triangle_support(
                    ray.data.from_arrow(t).repartition(parts),
                    driver_edges_threshold=0,
                )
            ).to_pylist()
        }
        assert got == want, parts


def test_directed_wedges_matches_brute_force_both_paths(ray_session):
    import ray

    from phrasekit_ray.stages.kg import directed_wedges

    rng = np.random.default_rng(41)
    n_nodes, n_edges = 60, 400
    s = rng.integers(0, n_nodes, n_edges)
    o = rng.integers(0, n_nodes, n_edges)
    keep = s != o
    pairs = sorted({(int(a), int(b)) for a, b in zip(s[keep], o[keep])})
    t = pa.table(
        {
            "s": pa.array([a for a, _ in pairs], pa.int64()),
            "o": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    es = set(pairs)
    want = sorted(
        (a, c)
        for a, m1 in es
        for m2, c in es
        if m1 == m2 and a != c
    )
    # bounded driver fast path
    got_fast = sorted(
        (r["subj"], r["obj"])
        for r in _collect(
            directed_wedges(ray.data.from_arrow(t), input_rows=len(pairs))
        ).to_pylist()
    )
    assert got_fast == want
    # forced distributed mid-partitioned path, two partitionings
    for parts in (1, 5):
        got = sorted(
            (r["subj"], r["obj"])
            for r in _collect(
                directed_wedges(ray.data.from_arrow(t).repartition(parts))
            ).to_pylist()
        )
        assert got == want, parts


def test_directed_wedges_empty_and_no_match(ray_session):
    import ray

    from phrasekit_ray.stages.kg import directed_wedges

    # a→b, c→d: no shared mid, no wedges (both paths)
    t = pa.table(
        {"s": pa.array([0, 2], pa.int64()), "o": pa.array([1, 3], pa.int64())}
    )
    for kwargs in ({"input_rows": 2}, {}):
        assert directed_wedges(ray.data.from_arrow(t), **kwargs).count() == 0
    # a→b→a closes into a 2-cycle: the only wedge candidates are a→b→a
    # and b→a→b, both excluded by a != c
    t2 = pa.table(
        {"s": pa.array([0, 1], pa.int64()), "o": pa.array([1, 0], pa.int64())}
    )
    assert directed_wedges(ray.data.from_arrow(t2), input_rows=2).count() == 0


def test_random_walks_follow_edges_and_hold_at_dead_ends(ray_session, sf_dir):
    from phrasekit_ray.pipelines.queries_ext import q_random_walks
    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges

    out = q_random_walks(sf_dir).to_pydict()
    he = _collect(
        host_edges(extract_links(pages_from_documents(sf_dir, with_links=True)))
    )
    edges = set(zip(he["src_host"].to_pylist(), he["dst_host"].to_pylist()))
    has_out = {a for a, b in edges if a != b}
    walks = {}
    for s, t, h in zip(out["start_host"], out["step"], out["host"]):
        walks.setdefault(s, {})[t] = h
    assert walks and all(len(w) == 5 for w in walks.values())
    for s, w in walks.items():
        assert w[0] == s  # step 0 is the start node
        for t in range(1, 5):
            prev, cur = w[t - 1], w[t]
            if prev in has_out:
                assert (prev, cur) in edges, (s, t)  # real out-edge taken
            else:
                assert cur == prev, (s, t)  # dead end holds position
    # determinism: a second run is identical
    assert q_random_walks(sf_dir).to_pydict() == out


def test_grouped_topk_matches_bruteforce_and_partitioning(ray_session):
    """grouped_topk (X177 primitive): exact vs a driver brute force at
    three partitionings, mixed int/string sort keys, duplicate order
    values broken by the tiebreak column."""
    import ray

    from phrasekit_ray.stages.agg import grouped_topk

    rng = np.random.RandomState(7)
    n = 5000
    key = rng.randint(0, 97, n).astype(np.int64)
    score = rng.randint(0, 20, n).astype(np.int64)  # heavy ties
    tok = np.array([f"t{v:04d}" for v in rng.randint(0, 500, n)])
    t = pa.table(
        {
            "k": pa.array(key),
            "score": pa.array(score),
            "tok": pa.array(tok, pa.string()),
        }
    )

    def brute(k_n):
        import pandas as pd

        df = t.to_pandas().sort_values(
            ["k", "score", "tok"], ascending=[True, False, True]
        )
        out = df.groupby("k", sort=True).head(k_n)
        return out.reset_index(drop=True)

    for k_n in (1, 3):
        want = brute(k_n)
        for nblocks in (1, 4, 16):
            ds = ray.data.from_arrow(t).repartition(nblocks)
            got = (
                grouped_topk(
                    ds, "k",
                    [("score", "descending"), ("tok", "ascending")], k_n,
                )
                .to_pandas()
                .sort_values(["k", "score", "tok"], ascending=[True, False, True])
                .reset_index(drop=True)
            )
            assert got.equals(want), (k_n, nblocks)


def test_grouped_topk_rejects_bad_k(ray_session):
    import pytest
    import ray

    from phrasekit_ray.stages.agg import grouped_topk

    ds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        grouped_topk(ds, "k", [], 0)


def test_kg_threshold_curve_distributed_matches_fast_path(ray_session, sf_dir):
    """X178: the forced-distributed path (driver_edges_threshold=0 →
    hash-min label propagation + two-phase size count per θ) returns
    the identical curve as the bounded union-find fast path."""
    from phrasekit_ray.pipelines.queries_ext import q_kg_threshold_curve

    fast = q_kg_threshold_curve(sf_dir)
    dist = q_kg_threshold_curve(sf_dir, driver_edges_threshold=0)
    assert fast.equals(dist)
    d = fast.to_pydict()
    # monotonicity: raising θ never adds edges; the giant component
    # can only fragment
    assert d["n_edges"] == sorted(d["n_edges"], reverse=True)
    assert d["max_comp_size"] == sorted(d["max_comp_size"], reverse=True)
