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


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, con, sf_dir, name):
    got = normalize(to_df(entrymod.queries()[name](sf_dir)))
    want = normalize(con.execute(entrymod.oracle_sql()[name]).fetch_df())
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


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = to_df(res)
    assert len(df) >= 0
    assert set(df.columns) == {"subj", "pred", "obj", "weight"}
