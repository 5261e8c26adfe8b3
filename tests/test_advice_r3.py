"""Regression tests for the round-2 ADVICE findings (round-3 fixes):

1. lm.py tokenization matches SQL string_split(text, ' ') on dirty text
   (double/leading spaces, empty docs).
2. chunk_dedup raises on a document exceeding the 2^20 packed-key chunk
   limit instead of silently colliding keys.
3. with_row_index accepts exactly 2^32 representable indices (off-by-one).
4. grouped_cube / grouped_rollup / grouped_sets emit the SQL grand-total
   row (all-NULL keys, NULL aggregate) on an EMPTY input.
5. score_ngrams probes the lowercase-normalized background key (reference
   lowercases both sides), not a raw cased entry.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def test_lm_token_counts_match_string_split_on_dirty_text(ray_session):
    import ray

    from phrasekit_ray.stages.lm import unigram_nll_scores

    texts = [
        "clean text here",
        "  leading spaces",
        "double  space",
        "",
        "trailing space ",
    ]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    )
    got = _collect(
        unigram_nll_scores(docs, min_count=1)
    ).sort_by("doc_id")
    con = duckdb.connect()
    want = con.execute(
        "SELECT i AS doc_id, len(string_split(t, ' ')) AS n_tokens "
        "FROM (SELECT unnest(range(5)) i, unnest(?) t) ORDER BY doc_id",
        [texts],
    ).fetch_arrow_table()
    assert got["n_tokens"].to_pylist() == want["n_tokens"].to_pylist()


def test_chunk_dedup_rejects_over_20bit_chunk_count(ray_session):
    import ray

    from phrasekit_ray.stages.dedup import chunk_dedup

    # chunk_tokens=1 → one chunk per token; max chunk_idx is n_chunks-1,
    # so exactly 2^20 chunks still fits the packed key and 2^20+1 is the
    # first rejected count
    big = " ".join(["x"] * ((1 << 20) + 1))
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(["1"]), "text": pa.array([big])})
    )
    with pytest.raises(Exception, match="packed-key"):
        _collect(chunk_dedup(docs, chunk_tokens=1))


def test_row_index_boundary_off_by_one(ray_session):
    import ray

    from phrasekit_ray.state.rowindex import with_row_index

    ds = ray.data.from_arrow(pa.table({"v": pa.array([1, 2, 3], pa.int64())}))
    # 3 rows from start=2^32-3 → max index 2^32-1: representable, must pass
    out = _collect(with_row_index(ds, start=2**32 - 3))
    idx = sorted(
        out[[c for c in out.column_names if c != "v"][0]].to_pylist()
    )
    assert idx == [2**32 - 3, 2**32 - 2, 2**32 - 1]
    # 3 rows from start=2^32-2 → max index 2^32: overflows, must raise
    with pytest.raises(OverflowError):
        with_row_index(ds, start=2**32 - 2)


@pytest.mark.parametrize("which", ["cube", "rollup", "sets"])
def test_grouped_cube_rollup_sets_empty_input_grand_total(ray_session, which):
    import ray

    from phrasekit_ray.stages.agg import (
        grouped_cube,
        grouped_rollup,
        grouped_sets,
    )

    empty = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "v": pa.array([], pa.int64()),
            }
        )
    )
    if which == "cube":
        out = _collect(grouped_cube(empty, ["a", "b"], "v"))
    elif which == "rollup":
        out = _collect(grouped_rollup(empty, ["a", "b"], "v"))
    else:
        out = _collect(
            grouped_sets(empty, ["a", "b"], [["a", "b"], []], "v")
        )
    # SQL: one grand-total row, keys NULL, sum NULL
    con = duckdb.connect()
    clause = {
        "cube": "CUBE(a, b)",
        "rollup": "ROLLUP(a, b)",
        "sets": "GROUPING SETS ((a, b), ())",
    }[which]
    want = con.execute(
        "SELECT a, b, sum(v) AS v FROM (SELECT NULL::VARCHAR a, "
        f"NULL::VARCHAR b, NULL::BIGINT v WHERE false) GROUP BY {clause}"
    ).fetch_arrow_table()
    assert out.num_rows == want.num_rows == 1
    assert out["a"].to_pylist() == [None]
    assert out["b"].to_pylist() == [None]
    assert out["v"].to_pylist() == [None]


def test_grouped_sets_empty_input_without_grand_total_set(ray_session):
    import ray

    from phrasekit_ray.stages.agg import grouped_sets

    empty = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    out = _collect(grouped_sets(empty, ["a"], [["a"]], "v"))
    assert out.num_rows == 0  # no () set requested → SQL emits zero rows


def test_score_probe_prefers_normalized_background_key(ray_session):
    import ray

    from phrasekit_ray.config import ScoreConfig
    from phrasekit_ray.stages.score import score_ngrams

    domain = ray.data.from_arrow(
        pa.table(
            {"ngram": pa.array(["Machine Learning"]),
             "count": pa.array([10], pa.uint64())}
        )
    )
    # caller dict carries BOTH casings with different counts; the
    # reference lowercases both sides, so the lowercase entry must win
    bg = {"Machine Learning": 999, "machine learning": 7}
    out = _collect(
        score_ngrams(
            domain, bg, ScoreConfig(method="ratio", min_domain_count=1,
                                    min_salience=0.0)
        )
    )
    assert out["background_count"].to_pylist() == [7]


def test_empty_input_grand_total_preserves_key_types(ray_session):
    """Review fix: the empty-input grand-total row must carry the SOURCE
    key types (the registered cube/rollup/sets queries key on int64
    user_bucket), not hardcoded string — a string-typed null key breaks
    the oracle schema compare and any union with a non-empty partition."""
    import ray

    from phrasekit_ray.stages.agg import grouped_cube

    empty = ray.data.from_arrow(
        pa.table(
            {
                "et": pa.array([], pa.string()),
                "user_bucket": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
            }
        )
    )
    out = _collect(grouped_cube(empty, ["et", "user_bucket"], "v"))
    assert out.schema.field("et").type == pa.string()
    assert out.schema.field("user_bucket").type == pa.int64()
    assert out.schema.field("v").type == pa.int64()
    assert out.num_rows == 1
