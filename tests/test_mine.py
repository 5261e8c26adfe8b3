"""Miner tests, ported from reference spec/miner_spec.rb."""

import pyarrow as pa
import pytest

from phrasekit_ray.config import MineConfig
from phrasekit_ray.stages.mine import mine_ngrams, mine_stats, ngram_table_to_rows


def corpus_ds(docs):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [f"doc_{i}" for i in range(len(docs))],
                "tokens": pa.array(docs, pa.list_(pa.string())),
            }
        )
    )


def counts_dict(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow")) if ds.count() else None
    if t is None:
        return {}
    return dict(zip(t["ngram"].to_pylist(), t["count"].to_pylist()))


SPEC_CORPUS = [
    ["rat", "cdk10", "oligo"],
    ["rat", "cdk10", "protein"],
    ["lysis", "buffer"],
    ["rat", "cdk10"],
]


def test_bigram_count_golden(ray_session):
    # spec/miner_spec.rb:101-115: min_n=2,max_n=2,min_count=2 → rat cdk10 ×3
    ds = corpus_ds(SPEC_CORPUS)
    out = counts_dict(mine_ngrams(ds, MineConfig(min_n=2, max_n=2, min_count=2)))
    assert out == {"rat cdk10": 3}


def test_min_count_monotonic(ray_session):
    # spec/miner_spec.rb:76-99
    ds = corpus_ds(SPEC_CORPUS)
    out1 = counts_dict(mine_ngrams(ds, MineConfig(min_n=2, max_n=2, min_count=1)))
    out2 = counts_dict(mine_ngrams(ds, MineConfig(min_n=2, max_n=2, min_count=2)))
    assert set(out2) <= set(out1)
    assert "cdk10 oligo" in out1 and out1["cdk10 oligo"] == 1
    assert "cdk10 oligo" not in out2


def test_n_length_bounds(ray_session):
    # spec/miner_spec.rb:117-132: only n in [min_n, max_n] windows emitted
    ds = corpus_ds([["a", "b", "c", "d"]])
    out = counts_dict(mine_ngrams(ds, MineConfig(min_n=2, max_n=3, min_count=1)))
    lens = {len(k.split(" ")) for k in out}
    assert lens == {2, 3}
    assert out["a b"] == 1 and out["a b c"] == 1


def test_empty_corpus(ray_session):
    # spec/miner_spec.rb:135-152
    ds = corpus_ds([])
    assert counts_dict(mine_ngrams(ds, MineConfig(min_n=2, max_n=2, min_count=1))) == {}


def test_case_normalization_merges_counts(ray_session):
    # spec/miner_spec.rb:189-213: 3 case variants → one n-gram, count 3
    ds = corpus_ds(
        [["Lysis", "Buffer"], ["lysis", "buffer"], ["LYSIS", "BUFFER"]]
    )
    out = counts_dict(
        mine_ngrams(ds, MineConfig(min_n=2, max_n=2, min_count=1), lowercase=True)
    )
    assert out == {"lysis buffer": 3}


def test_token_level_not_doc_level_counts(ray_session):
    # docs/MINING.md:192-198: same n-gram twice in one doc counts twice
    ds = corpus_ds([["a", "b", "x", "a", "b"]])
    out = counts_dict(mine_ngrams(ds, MineConfig(min_n=2, max_n=2, min_count=1)))
    assert out["a b"] == 2


def test_no_cross_document_ngrams(ray_session):
    ds = corpus_ds([["a", "b"], ["c", "d"]])
    out = counts_dict(mine_ngrams(ds, MineConfig(min_n=2, max_n=2, min_count=1)))
    assert "b c" not in out


def test_invalid_config_rejected():
    with pytest.raises(ValueError):
        MineConfig(min_n=0)
    with pytest.raises(ValueError):
        MineConfig(max_n=11)
    with pytest.raises(ValueError):
        MineConfig(min_n=3, max_n=2)


def test_sorted_output_deterministic(ray_session):
    ds = corpus_ds(SPEC_CORPUS)
    out = mine_ngrams(
        ds, MineConfig(min_n=2, max_n=2, min_count=1), sort_output=True
    )
    rows = list(out.iter_rows())
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # tie-break: ngram asc within equal counts
    for i in range(len(rows) - 1):
        if rows[i]["count"] == rows[i + 1]["count"]:
            assert rows[i]["ngram"] < rows[i + 1]["ngram"]


def test_mine_stats(ray_session):
    ds = corpus_ds(SPEC_CORPUS)
    s = mine_stats(ds, MineConfig(min_n=2, max_n=2, min_count=1))
    assert s["total_docs"] == 4
    assert s["total_tokens"] == 10
    assert s["total_ngrams_extracted"] == 6


def test_ngram_table_to_rows_roundtrip(ray_session):
    ds = corpus_ds(SPEC_CORPUS)
    t = pa.concat_tables(
        mine_ngrams(ds, MineConfig(min_n=2, max_n=2, min_count=2)).iter_batches(
            batch_format="pyarrow"
        )
    )
    rows = ngram_table_to_rows(t)
    assert rows == [{"tokens": ["rat", "cdk10"], "count": 3}]


def test_hash_prefilter_mining_identical_to_direct(ray_session, sf_dir):
    """The two-pass hash-prefiltered miner must produce IDENTICAL output
    to the direct string-space miner (collisions only widen the pass-1
    survivor superset; pass 2 refilters exactly)."""
    import ray

    from phrasekit_ray.config import MineConfig
    from phrasekit_ray.stages.extract import tokenize_documents
    from phrasekit_ray.stages.mine import mine_ngrams, mine_ngrams_hash_prefilter

    docs = tokenize_documents(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    ).materialize()
    cfg = MineConfig(min_n=1, max_n=3, min_count=3)
    a = pa.concat_tables(
        list(mine_ngrams(docs, cfg).iter_batches(batch_format="pyarrow"))
    ).sort_by([("ngram", "ascending")])
    b = pa.concat_tables(
        list(
            mine_ngrams_hash_prefilter(docs, cfg).iter_batches(
                batch_format="pyarrow"
            )
        )
    ).sort_by([("ngram", "ascending")])
    assert a.equals(b)
