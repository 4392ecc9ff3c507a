"""Driver-simulation: run every queries() entry at sf0.01 and compare
row-count + column names + order-insensitive values against oracle_sql()
via DuckDB — the same check the driver's CORRECTNESS gate performs."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype(float)
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(con, name):
    ray_result = canon(to_df(entrymod.queries()[name](SF)))
    sql_result = canon(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(ray_result.columns) == list(sql_result.columns), (
        f"{name}: columns {list(ray_result.columns)} vs {list(sql_result.columns)}"
    )
    assert len(ray_result) == len(sql_result), (
        f"{name}: rows {len(ray_result)} vs {len(sql_result)}"
    )
    pd.testing.assert_frame_equal(
        ray_result, sql_result, check_dtype=False, check_exact=True, obj=name
    )


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only = [k for k in qs if k not in oracles and not k.startswith("extract")]
    for name in rows_only:
        df = to_df(qs[name](SF))
        assert df is not None, name


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    ds = entrymod.entry()
    assert ds.count() > 0
    names = set(ds.schema().names)
    assert {"doc_id", "span_idx", "kind", "text", "media_ref"} <= names
