"""Regression tests for the round-3 ADVICE findings (round-4 fixes):

1. decode_jpeg raises ValueError (only) on malformed streams — covered in
   tests/test_jpeg.py (SOS-component-absent, zero sampling factors,
   truncated DHT/SOF, byte-flip + truncation fuzz).
2. grouped_cube/rollup/sets: the empty-input grand-total row carries the
   aggregate RESULT type (Arrow grouped sum widens int→int64, uint→uint64,
   float32→float64), so empty and non-empty inputs of the same query have
   identical output schemas.
"""

import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


@pytest.mark.parametrize("which", ["cube", "rollup", "sets"])
@pytest.mark.parametrize(
    "vtype,agg_fn",
    [
        (pa.int32(), "sum"),
        (pa.uint32(), "sum"),
        (pa.float32(), "sum"),
        (pa.int32(), "min"),
        (pa.float32(), "max"),
    ],
)
def test_empty_vs_nonempty_schema_identical(ray_session, which, vtype, agg_fn):
    import ray

    from phrasekit_ray.stages.agg import (
        grouped_cube,
        grouped_rollup,
        grouped_sets,
    )

    def run(tbl):
        ds = ray.data.from_arrow(tbl)
        if which == "cube":
            return _collect(grouped_cube(ds, ["a", "b"], "v", agg_fn=agg_fn))
        if which == "rollup":
            return _collect(grouped_rollup(ds, ["a", "b"], "v", agg_fn=agg_fn))
        return _collect(
            grouped_sets(ds, ["a", "b"], [["a", "b"], []], "v", agg_fn=agg_fn)
        )

    empty = pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "v": pa.array([], vtype),
        }
    )
    nonempty = pa.table(
        {
            "a": pa.array(["x", "x"], pa.string()),
            "b": pa.array(["y", "z"], pa.string()),
            "v": pa.array([1, 2], vtype),
        }
    )
    out_empty = run(empty)
    out_nonempty = run(nonempty)
    # same column set and, per column, the same Arrow type
    got = {f.name: f.type for f in out_empty.schema}
    want = {f.name: f.type for f in out_nonempty.schema}
    assert got == want, (agg_fn, vtype, got, want)
    assert out_empty.num_rows == 1
    assert out_empty["v"].to_pylist() == [None]


def test_score_stats_probes_normalized_key_once(ray_session):
    """VERDICT r3 item 3: score_stats must use the same once-per-batch
    vectorized normalization check as the main scoring path — normalized
    key probed ONLY (reference lowercases both sides), and no per-miss
    double probe left in the source."""
    import inspect

    import ray

    from phrasekit_ray.config import ScoreConfig
    from phrasekit_ray.stages import score as scoremod
    from phrasekit_ray.stages.score import score_stats

    domain = ray.data.from_arrow(
        pa.table(
            {
                "ngram": pa.array(["Machine  Learning"]),  # cased + dbl space
                "count": pa.array([10], pa.uint64()),
            }
        )
    )
    # both casings present: the normalized entry must win (b=7 →
    # ratio salience 10/7 passes min_salience=1.0; the cased entry's
    # 999999 would fail it)
    bg = {"Machine  Learning": 999999, "machine learning": 7}
    stats = score_stats(
        domain,
        bg,
        ScoreConfig(method="ratio", min_domain_count=1, min_salience=1.0),
    )
    assert stats["domain_phrases"] == 1
    assert stats["after_domain_filter"] == 1
    assert stats["after_salience_filter"] == 1

    # source-level pin: the per-miss `or bg_map.get(...)` fallback is gone
    src = inspect.getsource(scoremod)
    assert "or bg_map.get" not in src
