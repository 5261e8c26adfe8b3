"""Quick single-query oracle check: python tools/check_query.py q_name [sf_dir]."""

import sys

import duckdb
import pandas as pd
import pyarrow as pa
import ray

sys.path.insert(0, ".")
import __ray_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_df(obj) -> pd.DataFrame:
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = 0
    for name in names:
        got = normalize(to_df(qs[name](sf_dir)))
        if name not in oracles:
            print(f"{name}: rows-only, {len(got)} rows")
            continue
        want = normalize(con.execute(oracles[name]).fetch_df())
        try:
            assert list(got.columns) == list(want.columns), (
                f"columns {list(got.columns)} vs {list(want.columns)}"
            )
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=1e-12
            )
            print(f"{name}: OK ({len(got)} rows)")
        except AssertionError as e:
            failed += 1
            print(f"{name}: FAIL {e}")
            print("got:", got.head(8).to_string())
            print("want:", want.head(8).to_string())
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
