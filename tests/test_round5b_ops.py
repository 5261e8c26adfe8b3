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
    def test_subset_scores_full_containment_one_way(self):
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

    def test_directions_independent_thresholds(self):
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

    def test_empty_input_schema(self):
        from phrasekit_ray.stages.dedup import containment_pairs

        ds = _docs_ds([])
        t = containment_pairs(ds, k=3)
        assert t.count() == 0
        assert set(t.schema().names) == {
            "src", "dst", "n_inter", "n_src", "cont_micro"
        }


class TestCcnetBuckets:
    def test_terciles_partition_each_lang(self, sf_dir):
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
