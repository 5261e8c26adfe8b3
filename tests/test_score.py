"""Scorer tests, ported from reference spec/scorer_spec.rb."""

import numpy as np
import pyarrow as pa
import pytest

from phrasekit_ray.config import ScoreConfig
from phrasekit_ray.sources.pages import DEMO_BACKGROUND, background_table
from phrasekit_ray.stages.score import background_to_dict, score_ngrams


def domain_ds(rows):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "ngram": pa.array([r[0] for r in rows], pa.string()),
                "count": pa.array([r[1] for r in rows], pa.uint64()),
            }
        )
    )


DOMAIN = [
    ("rat cdk10", 30),
    ("lysis buffer", 25),
    ("for the", 40),
    ("protein assay", 15),
    ("rare phrase", 5),
]


def collect(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tables, promote_options="default")


def test_output_shape_and_filters(ray_session):
    # spec/scorer_spec.rb:64-120: min_domain_count drops rare, min_salience
    # drops generic phrases
    out = collect(
        score_ngrams(
            domain_ds(DOMAIN),
            background_table(),
            ScoreConfig(min_domain_count=10, min_salience=2.0),
        )
    )
    names = out["ngram"].to_pylist()
    assert "rare phrase" not in names  # count 5 < 10
    assert "for the" not in names  # 40/(50000+1) tiny salience
    assert "rat cdk10" in names  # bg 0 → salience 30
    assert out.schema.field("salience").type == pa.float32()
    assert out.schema.field("phrase_id").type == pa.uint32()


def test_generic_rejected_domain_retained(ray_session):
    # spec/scorer_spec.rb:140-170
    out = collect(
        score_ngrams(
            domain_ds([("for the", 100), ("rat cdk10", 100)]),
            background_table(),
            ScoreConfig(min_domain_count=1, min_salience=2.0),
        )
    )
    assert out["ngram"].to_pylist() == ["rat cdk10"]
    assert out["background_count"].to_pylist() == [0]


def test_sequential_phrase_id_range(ray_session):
    # spec/scorer_spec.rb:122-138: ids = starting..starting+n-1 in sort order
    out = collect(
        score_ngrams(
            domain_ds(DOMAIN),
            background_table(),
            ScoreConfig(min_domain_count=10, starting_phrase_id=5000),
        )
    )
    ids = out["phrase_id"].to_pylist()
    assert ids == list(range(5000, 5000 + len(ids)))
    sal = out["salience"].to_pylist()
    assert sal == sorted(sal, reverse=True)


def test_assign_phrase_ids_false(ray_session):
    # spec/scorer_spec.rb:355-371
    out = collect(
        score_ngrams(
            domain_ds(DOMAIN),
            background_table(),
            ScoreConfig(min_domain_count=10, assign_phrase_ids=False),
        )
    )
    assert "phrase_id" not in out.column_names


def test_all_three_methods(ray_session):
    # spec/scorer_spec.rb:173-230
    from phrasekit_ray.core import salience as S

    dom = domain_ds([("rat cdk10", 30), ("lysis buffer", 25)])
    bg = background_table()
    bgd = background_to_dict(bg)
    total_d = 55
    total_b = sum(bgd.values())
    for method in ("ratio", "pmi", "tfidf"):
        out = collect(
            score_ngrams(
                dom, bg, ScoreConfig(method=method, min_domain_count=1, min_salience=-100.0)
            )
        )
        got = dict(zip(out["ngram"].to_pylist(), out["salience"].to_pylist()))
        want_rc = S.compute_salience(method, 30, 0, total_d, total_b)
        want_lb = S.compute_salience(method, 25, 8, total_d, total_b)
        assert got["rat cdk10"] == pytest.approx(float(want_rc), rel=1e-6)
        assert got["lysis buffer"] == pytest.approx(float(want_lb), rel=1e-6)


def test_empty_domain(ray_session):
    out = score_ngrams(domain_ds([]), background_table(), ScoreConfig())
    assert out.count() == 0


def test_empty_background(ray_session):
    # spec/scorer_spec.rb:232-276: everything gets bg 0
    out = collect(
        score_ngrams(domain_ds([("rat cdk10", 30)]), {}, ScoreConfig(min_domain_count=1))
    )
    assert out["background_count"].to_pylist() == [0]
    assert out["salience"].to_pylist() == [30.0]


def test_background_dict_normalization():
    d = background_to_dict([{"tokens": ["For", "THE"], "count": 10}])
    assert d == {"for the": 10}
    # last-wins on duplicates (phrasekit_score.rs:160-161)
    d = background_to_dict([
        {"tokens": ["a", "b"], "count": 1},
        {"tokens": ["A", "B"], "count": 9},
    ])
    assert d == {"a b": 9}


def test_phrase_ids_stable_across_parallelism(ray_session):
    # SURVEY.md §7.3: enumeration must not depend on block layout
    import ray

    big = [(f"phrase {i:04d}", 10 + (i % 7)) for i in range(500)]
    t = pa.table(
        {
            "ngram": pa.array([r[0] for r in big]),
            "count": pa.array([r[1] for r in big], pa.uint64()),
        }
    )
    ds1 = ray.data.from_arrow(t)
    ds2 = ray.data.from_arrow(t).repartition(13)
    cfg = ScoreConfig(min_domain_count=1, min_salience=0.0)
    a = collect(score_ngrams(ds1, {}, cfg)).sort_by("ngram")
    b = collect(score_ngrams(ds2, {}, cfg)).sort_by("ngram")
    assert a["phrase_id"].to_pylist() == b["phrase_id"].to_pylist()


def test_finalize_streams_above_threshold(ray_session):
    """Above driver_finalize_threshold the finalize must abandon driver
    collection and take the distributed sort path — same answer, bounded
    driver memory."""
    small = collect(
        score_ngrams(
            domain_ds(DOMAIN),
            background_table(),
            ScoreConfig(min_domain_count=10, min_salience=2.0),
        )
    )
    big_path = collect(
        score_ngrams(
            domain_ds(DOMAIN),
            background_table(),
            ScoreConfig(min_domain_count=10, min_salience=2.0),
            driver_finalize_threshold=1,  # force the distributed path
        )
    )
    assert small.num_rows == big_path.num_rows
    assert small["ngram"].to_pylist() == big_path["ngram"].to_pylist()
    assert small["phrase_id"].to_pylist() == big_path["phrase_id"].to_pylist()
    assert (
        small["salience"].to_pylist() == big_path["salience"].to_pylist()
    )


def test_score_stats_counts(ray_session):
    """reference phrasekit_score.rs:56-62 scoring stats surface (A5)."""
    from phrasekit_ray.stages.score import score_stats

    stats = score_stats(
        domain_ds(DOMAIN),
        background_table(),
        ScoreConfig(min_domain_count=10, min_salience=2.0),
    )
    # DOMAIN: 5 phrases; 'rare phrase' (5) fails min_domain_count=10;
    # 'for the' passes the count filter but fails min_salience
    assert stats["domain_phrases"] == 5
    assert stats["after_domain_filter"] == 4
    assert stats["after_salience_filter"] == 3
    assert stats["background_phrases"] > 0


def test_score_probe_normalizes_cased_domain(ray_session):
    import ray

    from phrasekit_ray.config import ScoreConfig
    from phrasekit_ray.stages.score import score_ngrams

    domain = ray.data.from_arrow(
        pa.table(
            {
                "ngram": pa.array(["The Cat"], pa.string()),
                "count": pa.array([10], pa.uint32()),
            }
        )
    )
    out = score_ngrams(
        domain,
        {"the cat": 5},
        ScoreConfig(method="ratio", min_domain_count=1, min_salience=0.0),
    ).to_pandas()
    # the background dict is lowercased (reference parity); a cased
    # domain ngram must still find its background count
    assert out.background_count.tolist() == [5]


def test_score_join_duplicate_background_keys(ray_session):
    import ray

    from phrasekit_ray.config import ScoreConfig
    from phrasekit_ray.stages.score import score_ngrams_join

    domain = ray.data.from_arrow(
        pa.table(
            {
                "ngram": pa.array(["x y"], pa.string()),
                "count": pa.array([10], pa.uint32()),
            }
        )
    )
    bg = ray.data.from_arrow(
        pa.table(
            {
                "ngram": pa.array(["x y", "x y"], pa.string()),
                "count": pa.array([3, 5], pa.uint32()),
            }
        )
    )
    out = score_ngrams_join(
        domain,
        bg,
        ScoreConfig(method="ratio", min_domain_count=1, min_salience=0.0),
    ).to_pandas()
    # duplicate bg keys collapse (max) instead of multiplying the row
    assert len(out) == 1
    assert out.background_count.tolist() == [5]
