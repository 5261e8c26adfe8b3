"""The correctness gate, run locally: every SQL-checked query compared
against its DuckDB oracle at sf0.001 (driver runs the same at sf0.01)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SQL_CHECKED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_df(obj) -> pd.DataFrame:
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()  # ray Dataset


def _arrow_kind(t: pa.DataType) -> str:
    """Coarse type class used to compare Ray output vs oracle output.

    The driver's value-hash is representation-sensitive: DuckDB's uncast
    sum(BIGINT) returns HUGEINT -> decimal128(38,0), which hash-mismatches
    an int64 even when values are equal (VERDICT r4 "What's wrong" 1-2).
    Guard: any decimal in an oracle schema is an immediate failure, and
    int-vs-float class mismatches between the two sides fail too.
    """
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "time"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    return str(t)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, con, sf_dir, name):
    got_obj = entrymod.queries()[name](sf_dir)
    got = normalize(to_df(got_obj))
    want_arrow = con.execute(entrymod.oracle_sql()[name]).fetch_arrow_table()
    bad = [
        f.name for f in want_arrow.schema if pa.types.is_decimal(f.type)
    ]
    assert not bad, (
        f"{name}: oracle SQL emits decimal128 column(s) {bad} (DuckDB HUGEINT "
        f"from an uncast sum?) — add CAST(... AS BIGINT) so the driver's "
        f"representation-sensitive value-hash can match (VERDICT r4 item 1)"
    )
    if isinstance(got_obj, pa.Table):
        got_schema = got_obj.schema
    elif isinstance(got_obj, pd.DataFrame):
        got_schema = pa.Table.from_pandas(got_obj, preserve_index=False).schema
    else:  # ray Dataset — queries() collect to Table/DataFrame, but be safe
        got_schema = pa.Table.from_pandas(got, preserve_index=False).schema
    want_kinds = {f.name: _arrow_kind(f.type) for f in want_arrow.schema}
    for f in got_schema:
        if f.name in want_kinds:
            assert _arrow_kind(f.type) == want_kinds[f.name], (
                f"{name}.{f.name}: Ray type {f.type} vs oracle type class "
                f"{want_kinds[f.name]}"
            )
    want = normalize(want_arrow.to_pandas())
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-12)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, sf_dir, name):
    out = to_df(entrymod.queries()[name](sf_dir))
    assert out is not None
    assert len(out.columns) > 0


def test_ann_queries_recall_vs_brute_force(ray_session, sf_dir):
    """The two approximate-ANN queries measured against the exact one on
    the same corpus/queries (VERDICT r1 item 4, tightened r3): recall@10
    floors below the measured values (LSH 6 tables × 17 probes ≈ 0.98,
    IVF nc=16 nprobe=12 ≈ 0.94-0.96 on sf0.001/sf0.01)."""
    q = entrymod.queries()
    exact = to_df(q["q_knn_cosine"](sf_dir))

    def recall(approx: pd.DataFrame) -> float:
        recs = []
        for qid in sorted(set(exact["query_id"])):
            e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
            a = set(approx.loc[approx["query_id"] == qid, "vec_id"])
            recs.append(len(e & a) / len(e))
        return sum(recs) / len(recs)

    r_lsh = recall(to_df(q["q_knn_lsh"](sf_dir)))
    r_ivf = recall(to_df(q["q_knn_ivf"](sf_dir)))
    assert r_lsh >= 0.9, f"LSH recall@10 {r_lsh}"
    assert r_ivf >= 0.9, f"IVF recall@10 {r_ivf}"


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = to_df(res)
    assert len(df) >= 0
    assert set(df.columns) == {"subj", "pred", "obj", "weight"}


def test_round_away_matches_duckdb_on_half_ties():
    """pc.round defaults to half-to-even; DuckDB round() is half away from
    zero. The oracle-facing helper must match DuckDB on exact .5 values
    (regression: 404 diverging lineitem cents rows at sf0.01)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from phrasekit_ray.pipelines.queries import _round_away
    from phrasekit_ray.stages.lm import _round_away_np

    vals = [184.5, -184.5, 2.5, -2.5, 3.5, 0.5, -0.5, 1.25, 4260514.5]
    duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT round(v) FROM (SELECT unnest(?::DOUBLE[]) AS v)", params=[vals]
        ).fetchall()
    ]
    got = _round_away(pa.array(vals, pa.float64())).to_pylist()
    assert got == duck
    got_np = _round_away_np(np.array(vals)).tolist()
    assert got_np == duck
