"""Round-5 late additions: CCNet perplexity buckets (X182), directed
shingle-containment join (X183), and the prefix-filtered set-similarity
join scale path (X184). The exact SQL twins are covered by the
parametrized oracle harness (test_queries_oracle.py); these tests pin
the semantic properties the twins can't express."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _docs_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.string())
                ),
            }
        )
    )


class TestContainmentPairs:
    def test_subset_scores_full_containment_one_way(self, ray_session):
        from phrasekit_ray.stages.dedup import containment_pairs

        small = ["a", "b", "c", "d"]  # 2 distinct 3-shingles
        big = small + ["e", "f", "g", "h", "i", "j"]  # superset + more
        ds = _docs_ds([(1, small), (2, big)])
        t = containment_pairs(ds, k=3, min_containment_micro=900_000)
        rows = {
            (r["src"], r["dst"]): r["cont_micro"]
            for r in t.take_all()
        }
        # small ⊂ big: src=1 fully contained; the reverse direction is
        # 2/8 = 0.25 and must NOT pass the 0.9 bound
        assert rows == {(1, 2): 1_000_000}

    def test_directions_independent_thresholds(self, ray_session):
        from phrasekit_ray.stages.dedup import containment_pairs

        a = ["x", "y", "z", "w"]        # shingles: xyz, yzw
        b = ["x", "y", "z", "q"]        # shingles: xyz, yzq
        ds = _docs_ds([(1, a), (2, b)])
        t = containment_pairs(ds, k=3, min_containment_micro=500_000)
        rows = {(r["src"], r["dst"]): r for r in t.take_all()}
        # |A∩B| = 1, |A| = |B| = 2 → 0.5 both ways
        assert rows[(1, 2)]["cont_micro"] == 500_000
        assert rows[(2, 1)]["cont_micro"] == 500_000
        assert rows[(1, 2)]["n_inter"] == 1 and rows[(1, 2)]["n_src"] == 2

    def test_empty_input_schema(self, ray_session):
        from phrasekit_ray.stages.dedup import containment_pairs

        ds = _docs_ds([])
        t = containment_pairs(ds, k=3)
        assert t.count() == 0
        assert set(t.schema().names) == {
            "src", "dst", "n_inter", "n_src", "cont_micro"
        }


class TestCcnetBuckets:
    def test_terciles_partition_each_lang(self, ray_session, sf_dir):
        from phrasekit_ray.pipelines.queries import QUERIES

        t = QUERIES["q_ccnet_buckets"](sf_dir)
        lang = np.array(t["lang"].to_pylist())
        bucket = t["bucket"].to_numpy()
        nll = t["nll_micro"].to_numpy()
        for l in np.unique(lang):
            m = lang == l
            b, v = bucket[m], nll[m]
            # every bucket populated and sizes within 1 of a tercile
            # split (ties at a threshold can only shrink later buckets)
            sizes = np.bincount(b, minlength=3)
            assert (sizes > 0).all()
            # monotone: max NLL in head <= min NLL in tail
            assert v[b == 0].max() <= v[b == 2].min()
            assert v[b == 0].max() <= v[b == 1].min()
            assert v[b == 1].max() <= v[b == 2].min()


class TestPrefixFilterJaccard:
    def _rand_docs(self, seed=7, n_docs=60, vocab=30, lo=5, hi=18):
        rng = np.random.RandomState(seed)
        rows = []
        for i in range(n_docs):
            L = rng.randint(lo, hi)
            toks = [f"t{rng.randint(vocab)}" for _ in range(L)]
            rows.append((i, toks))
        # inject near-duplicates so pairs exist at high thresholds
        for i in range(0, 20, 2):
            base = list(rows[i][1])
            base[0] = "zz"
            rows.append((1000 + i, base))
        return _docs_ds(rows)

    @pytest.mark.parametrize("threshold", [0.5, 0.8])
    def test_identical_to_exact_join(self, ray_session, threshold):
        from phrasekit_ray.stages.dedup import (
            jaccard_pairs,
            prefix_filter_jaccard_pairs,
        )

        ds = self._rand_docs().materialize()
        want = sorted(
            (r["left"], r["right"], round(r["jaccard"], 12))
            for r in jaccard_pairs(ds, k=3, threshold=threshold).take_all()
        )
        got = sorted(
            (r["left"], r["right"], round(r["jaccard"], 12))
            for r in prefix_filter_jaccard_pairs(
                ds, k=3, threshold=threshold
            ).take_all()
        )
        assert got == want
        assert len(want) > 0  # the fixture must actually exercise pairs

    def test_partition_invariance(self, ray_session):
        from phrasekit_ray.stages.dedup import prefix_filter_jaccard_pairs

        ds = self._rand_docs(seed=11).materialize()
        a = sorted(
            (r["left"], r["right"], round(r["jaccard"], 12))
            for r in prefix_filter_jaccard_pairs(
                ds, k=3, threshold=0.6, num_partitions=3
            ).take_all()
        )
        b = sorted(
            (r["left"], r["right"], round(r["jaccard"], 12))
            for r in prefix_filter_jaccard_pairs(
                ds, k=3, threshold=0.6, num_partitions=7
            ).take_all()
        )
        assert a == b

    def test_empty_input(self, ray_session):
        from phrasekit_ray.stages.dedup import prefix_filter_jaccard_pairs

        t = prefix_filter_jaccard_pairs(_docs_ds([]), k=3)
        assert t.count() == 0


class TestMutualNN:
    def _emb_ds(self, rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                }
            )
        )

    def test_mutual_and_one_way(self, ray_session):
        from phrasekit_ray.stages.similarity import mutual_nn_pairs

        # A = even ids, B = odd ids.
        # a0 <-> b1 mutual (identical); a2 -> b3 but b3's best is a0.
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),
            (2, [0.6, 0.8, 0.0]),
            (3, [0.9, 0.1, 0.0]),
        ]
        t = mutual_nn_pairs(self._emb_ds(rows))
        got = {(r["src"], r["dst"]) for r in
               pa.Table.to_pylist(t)}
        # b3's best A: cos(a0,b3) vs cos(a2,b3): a0 wins -> (2,3) not mutual
        assert (0, 1) in got and (2, 3) not in got
        # a0's best B: b1 (cos 1) -> mutual with b3? b3 best is a0 but a0
        # best is b1, so (0,3) must not appear either
        assert all(s == 0 or s == 2 for s, _ in got)
        one = t.filter(pa.compute.equal(t["src"], 0))
        assert one["cos_micro"][0].as_py() == 1_000_000

    def test_tie_breaks_to_smaller_id(self, ray_session):
        from phrasekit_ray.stages.similarity import mutual_nn_pairs

        # b1 and b3 identical: a0's best must be the SMALLER id b1
        rows = [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),
            (3, [1.0, 0.0]),
        ]
        t = mutual_nn_pairs(self._emb_ds(rows))
        got = {(r["src"], r["dst"]) for r in pa.Table.to_pylist(t)}
        assert got == {(0, 1)}

    def test_empty_and_single_group(self, ray_session):
        from phrasekit_ray.stages.similarity import mutual_nn_pairs

        assert mutual_nn_pairs(self._emb_ds([])).num_rows == 0
        only_a = self._emb_ds([(0, [1.0, 0.0]), (2, [0.0, 1.0])])
        assert mutual_nn_pairs(only_a).num_rows == 0


class TestAliasClusters:
    def test_cluster_properties(self, ray_session, sf_dir):
        from phrasekit_ray.pipelines.queries import QUERIES

        t = QUERIES["q_alias_clusters"](sf_dir)
        alias = t["alias"].to_pylist()
        canon = t["canon"].to_pylist()
        assert len(alias) == len(set(alias))  # one row per alias
        by = {}
        for a, c in zip(alias, canon):
            by.setdefault(c, []).append(a)
        for c, members in by.items():
            assert c == min(members)  # canonical = lexicographic min
            assert len(members) >= 2  # only mergeable clusters emitted


class TestWinnowing:
    def _ds(self, rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    def test_shared_substring_guarantee(self, ray_session):
        from phrasekit_ray.stages.textstats import winnowed_fingerprints

        # docs share a run of window + k - 1 = 6 tokens -> must share >=1
        # fingerprint hash (the winnowing coverage guarantee)
        shared = "alpha beta gamma delta epsilon zeta"
        rows = [
            (1, f"x1 y1 {shared} z1"),
            (2, f"p2 q2 r2 s2 {shared}"),
        ]
        t = winnowed_fingerprints(self._ds(rows), k=3, window=4)
        by = {}
        for r in t.take_all():
            by.setdefault(r["doc_id"], set()).add(r["h62"])
        assert by[1] & by[2]

    def test_window_coverage_density(self, ray_session):
        from phrasekit_ray.stages.textstats import winnowed_fingerprints

        rng = np.random.RandomState(3)
        text = " ".join(f"w{rng.randint(50)}" for _ in range(200))
        t = winnowed_fingerprints(self._ds([(7, text)]), k=3, window=4)
        pos = sorted(r["pos"] for r in t.take_all())
        # every window of 4 consecutive k-grams contains a selection:
        # consecutive picks can never be more than `window` apart
        assert pos[0] <= 4
        assert max(np.diff(pos)) <= 4

    def test_short_doc_single_fingerprint(self, ray_session):
        from phrasekit_ray.stages.textstats import winnowed_fingerprints

        # 4 tokens -> 2 k-grams (< window) -> exactly one fingerprint
        t = winnowed_fingerprints(
            self._ds([(1, "a b c d"), (2, "a b")]), k=3, window=4
        )
        rows = t.take_all()
        assert len(rows) == 1 and rows[0]["doc_id"] == 1


class TestEventBursts:
    def test_hand_case(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        day = 86_400_000_000
        # type A: 7 quiet days of 1 event, then a 10-event spike (burst);
        # type B: flat (never bursts); day-0 rows have no baseline
        rows = []
        eid = 0
        for d in range(7):
            rows.append(("A", d * day + 1))
            rows.append(("B", d * day + 2))
        for _ in range(10):
            rows.append(("A", 7 * day + 3))
        rows.append(("B", 7 * day + 4))
        t = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        from phrasekit_ray.pipelines.queries import QUERIES

        out = QUERIES["q_event_bursts"](str(tmp_path))
        m = {
            (r["event_type"], r["day"]): r for r in out.to_pylist()
        }
        assert m[("A", 7)]["is_burst"] == 1  # 7*10 >= 3*7 with warm base
        assert m[("B", 7)]["is_burst"] == 0  # flat
        assert m[("A", 0)]["is_burst"] == 0  # no baseline -> never burst
        assert m[("A", 7)]["trail7"] == 7


class TestIncrementalMinhashIndex:
    def _toks(self, seed, ids):
        rng = np.random.RandomState(seed)
        rows = []
        for i in ids:
            L = rng.randint(6, 20)
            rows.append((i, [f"t{rng.randint(25)}" for _ in range(L)]))
        return rows

    def test_incremental_equals_full_recompute(self, ray_session, tmp_path):
        from phrasekit_ray.stages.dedup import (
            index_candidate_pairs,
            minhash_candidate_pairs,
            write_minhash_index,
        )

        snap1 = self._toks(1, range(0, 40))
        snap2 = self._toks(2, range(100, 140))
        # duplicate docs across snapshots so cross-snapshot pairs exist
        snap2 += [(200 + i, toks) for i, toks in
                  [(i, t) for i, t in snap1[:6]]]
        idx = str(tmp_path / "mh_index")
        write_minhash_index(_docs_ds(snap1), idx, "crawl1")
        write_minhash_index(_docs_ds(snap2), idx, "crawl2")
        inc = sorted(
            (r["left"], r["right"])
            for r in index_candidate_pairs(idx).take_all()
        )
        full = sorted(
            (r["left"], r["right"])
            for r in minhash_candidate_pairs(
                _docs_ds(snap1 + snap2)
            ).take_all()
        )
        assert inc == full
        assert len(full) > 0  # the cross-snapshot dups must surface

    def test_param_mismatch_rejected(self, ray_session, tmp_path):
        from phrasekit_ray.stages.dedup import write_minhash_index

        idx = str(tmp_path / "mh_index2")
        write_minhash_index(_docs_ds(self._toks(3, range(5))), idx, "a")
        with pytest.raises(ValueError, match="refusing to append"):
            write_minhash_index(
                _docs_ds(self._toks(3, range(5, 10))), idx, "b", bands=8
            )

    def test_reappend_is_resume_not_duplicate(self, ray_session, tmp_path):
        from phrasekit_ray.stages.dedup import (
            index_candidate_pairs,
            write_minhash_index,
        )

        idx = str(tmp_path / "mh_index3")
        docs = self._toks(4, range(30))
        docs += [(100, docs[0][1])]  # one duplicate -> at least one pair
        write_minhash_index(_docs_ds(docs), idx, "a")
        before = sorted(
            (r["left"], r["right"])
            for r in index_candidate_pairs(idx).take_all()
        )
        s = write_minhash_index(_docs_ds(docs), idx, "a")  # same snapshot
        assert s["written"] == 0  # fully resumed, nothing rewritten
        after = sorted(
            (r["left"], r["right"])
            for r in index_candidate_pairs(idx).take_all()
        )
        assert before == after and len(before) > 0


class TestTagVote:
    def test_vote_tiers(self, ray_session, sf_dir):
        from phrasekit_ray.pipelines.queries import QUERIES

        votes = QUERIES["q_tag_vote"](sf_dir)
        all_spans = QUERIES["q_tag_policies"](sf_dir)
        assert votes.num_rows > 0
        assert set(votes["n_votes"].to_pylist()) <= {2, 3}
        # every surviving span exists in the greedy LF output (2 of the
        # 3 LFs are the greedy pair on a bigram artifact, so a majority
        # necessarily includes it)
        greedy = {
            (r["doc_id"], r["start"], r["end"], r["phrase_id"])
            for r in all_spans.filter(
                pa.compute.equal(all_spans["policy"], "leftmost_longest")
            ).to_pylist()
        }
        for r in votes.to_pylist():
            assert (r["doc_id"], r["start"], r["end"], r["phrase_id"]) in greedy


class TestCompactZonemapped:
    def test_pruning_improves_and_rows_identical(self, ray_session, tmp_path):
        from phrasekit_ray.state.lineage import (
            compact_zonemapped,
            read_zonemapped,
            write_zonemapped,
        )

        rng = np.random.RandomState(5)
        def snap(ids):
            vals = rng.randint(0, 1000, len(ids))
            return ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(ids, pa.int64()),
                        "v": pa.array(vals, pa.int64()),
                    }
                )
            )

        root = str(tmp_path)
        write_zonemapped(snap(range(0, 400)), root, "s1", "v", 8)
        write_zonemapped(snap(range(400, 800)), root, "s2", "v", 8)
        # before: the [100, 180] range must open zones in BOTH snapshots
        o1, sc1, _ = read_zonemapped(root, "s1", "v", 100, 180)
        o2, sc2, _ = read_zonemapped(root, "s2", "v", 100, 180)
        before_rows = sorted(
            (r["doc_id"], r["v"]) for r in o1.take_all() + o2.take_all()
        )
        assert sc1 > 0 and sc2 > 0

        compact_zonemapped(root, ["s1", "s2"], "c", "v", 16)
        oc, scc, tot = read_zonemapped(root, "c", "v", 100, 180)
        after_rows = sorted((r["doc_id"], r["v"]) for r in oc.take_all())
        assert after_rows == before_rows and len(after_rows) > 0
        # real pruning: compacted layout scans fewer files than the two
        # snapshot layouts combined, and prunes most of its own zones
        assert scc <= sc1 + sc2
        assert scc < tot

    def test_full_readback_equals_union(self, ray_session, tmp_path):
        from phrasekit_ray.state.lineage import (
            compact_zonemapped,
            read_partitioned,
            write_zonemapped,
        )

        a = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "v": pa.array([10, 20], pa.int64())})
        )
        b = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([3], pa.int64()),
                      "v": pa.array([15], pa.int64())})
        )
        root = str(tmp_path)
        write_zonemapped(a, root, "s1", "v", 4)
        write_zonemapped(b, root, "s2", "v", 4)
        compact_zonemapped(root, ["s1", "s2"], "c", "v", 4)
        rows = sorted(
            (r["doc_id"], r["v"])
            for r in read_partitioned(root, "c").take_all()
        )
        assert rows == [(1, 10), (2, 20), (3, 15)]
