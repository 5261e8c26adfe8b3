"""Regression tests for the round-4 ADVICE items fixed in round 5:
k_core stale-checkpoint rejection, _SyncedDict single-key push,
bloom_semi_join incremental driver merge, props_extract oracle typing."""

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds):
    if isinstance(ds, pa.Table):
        return ds
    return pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    ) if not hasattr(ds, "to_arrow_refs") else pa.Table.from_pandas(
        ds.to_pandas(), preserve_index=False
    )


def test_k_core_rejects_stale_checkpoint(ray_session, tmp_path):
    """ADVICE r4 (medium): a checkpoint_dir reused after the input edge
    set changed must NOT resume from the stale edges — the fingerprint
    now folds an order-insensitive content signature of the conformed
    edge table, so a changed input recomputes from scratch."""
    import ray

    from phrasekit_ray.stages.kg import k_core

    # graph A: a 4-clique (every node survives k=2) plus a pendant
    cl = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tA = pa.table(
        {
            "subj": pa.array([e[0] for e in cl] + [0], pa.int64()),
            "obj": pa.array([e[1] for e in cl] + [9], pa.int64()),
        }
    )
    ckpt = str(tmp_path / "kcore")
    gotA = k_core(
        ray.data.from_arrow(tA), k=2, checkpoint_dir=ckpt,
        checkpoint_partitions=2,
    ).to_pandas()
    assert sorted(gotA["node"]) == [0, 1, 2, 3]

    # graph B over the SAME checkpoint_dir: a path graph -> empty 2-core.
    # With the old {op, k}-only fingerprint this resumed from A's edges
    # and returned A's core; the input-aware fingerprint must reject the
    # stale rounds and return the correct empty result.
    n = 6
    tB = pa.table(
        {
            "subj": pa.array(list(range(n - 1)), pa.int64()),
            "obj": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    gotB = k_core(
        ray.data.from_arrow(tB), k=2, checkpoint_dir=ckpt,
        checkpoint_partitions=2,
    ).to_pandas()
    assert len(gotB) == 0

    # caller-supplied input_token skips the signature pass but still
    # separates inputs
    gotA2 = k_core(
        ray.data.from_arrow(tA), k=2, checkpoint_dir=str(tmp_path / "k2"),
        checkpoint_partitions=2, input_token="corpusA-v1",
    ).to_pandas()
    assert sorted(gotA2["node"]) == [0, 1, 2, 3]


def test_synced_dict_setitem_pushes(ray_session):
    """ADVICE r4 (low): plain __setitem__ / setdefault / del on
    EXT_QUERIES must reach queries.QUERIES, not strand the entry."""
    from phrasekit_ray.pipelines import queries as q
    from phrasekit_ray.pipelines.queries_ext import EXT_QUERIES

    def fake(sf_dir):
        return pa.table({"x": pa.array([1], pa.int64())})

    try:
        EXT_QUERIES["q__test_setitem"] = fake
        assert q.QUERIES["q__test_setitem"] is fake
        EXT_QUERIES.setdefault("q__test_setdefault", fake)
        assert q.QUERIES["q__test_setdefault"] is fake
    finally:
        for name in ("q__test_setitem", "q__test_setdefault"):
            if name in EXT_QUERIES:
                del EXT_QUERIES[name]
            assert name not in q.QUERIES


def test_bloom_semi_join_incremental_merge_matches(ray_session):
    """ADVICE r4 (medium): the ray.wait incremental OR-merge must
    produce the same semi-join result as before across many blocks."""
    import ray

    from phrasekit_ray.stages.agg import bloom_semi_join

    rng = np.random.default_rng(7)
    left_keys = rng.integers(0, 5000, size=20_000)
    right_keys = np.unique(rng.integers(0, 5000, size=800))
    left = pa.table(
        {
            "k": pa.array(left_keys, pa.int64()),
            "v": pa.array(rng.integers(0, 100, size=len(left_keys)),
                          pa.int64()),
        }
    )
    right = pa.table({"k": pa.array(right_keys, pa.int64())})
    out = bloom_semi_join(
        ray.data.from_arrow(left).repartition(8),
        ray.data.from_arrow(right).repartition(8),
        "k", "k",
    ).to_pandas()
    want = int(np.isin(left_keys, right_keys).sum())
    assert len(out) == want


def test_props_extract_sql_twin_ignores_floats():
    """ADVICE r4 (low): the SQL twin now counts only strict-integer k,
    matching json_extract_int's contract on a float-bearing fixture."""
    import duckdb

    from phrasekit_ray.pipelines.queries_ext import SQL_PROPS_EXTRACT

    con = duckdb.connect()
    con.execute(
        """CREATE VIEW events AS SELECT * FROM (VALUES
          ('a', '{"k": 3}'),
          ('a', '{"k": 4.5}'),
          ('a', '{"k": 2e3}'),
          ('a', '{"k": -7}'),
          ('b', '{"j": 1}'),
          ('b', NULL)
        ) t(event_type, props)"""
    )
    df = con.execute(SQL_PROPS_EXTRACT).fetch_df()
    a = df[df["event_type"] == "a"].iloc[0]
    # only 3 and -7 qualify; 4.5 and 2e3 are non-integral string forms
    assert int(a["k_sum"]) == -4 and int(a["n"]) == 2
    b = df[df["event_type"] == "b"].iloc[0]
    assert int(b["n"]) == 0
