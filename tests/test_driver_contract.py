"""Emulates the driver's correctness gate: run each queries() entry at a
small sf and compare against oracle_sql() via DuckDB — row count, schema
(column names), and order-insensitive values."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def contract():
    qs = entrymod.queries()
    sql = entrymod.oracle_sql()
    # pages queries hardcode the sf0.01 oracle path → test those at sf0.01
    return qs, sql


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _duck(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _sf_for(name: str) -> str:
    # pages_* / multimodal queries synthesize their own input keyed by sf;
    # their oracle paths point at the sf0.01 synth dir.
    return "/root/testdata/sf0.01" if ("pages" in name or name == "multimodal_decode") else SF_DIR


SQL_CHECKED = None


def test_all_sql_queries_match_oracle(contract):
    qs, sqls = contract
    failures = []
    for name, sql in sqls.items():
        sf_dir = _sf_for(name)
        try:
            got = _normalize(_to_df(qs[name](sf_dir)))
            exp = _normalize(_duck(sql, sf_dir))
            assert list(got.columns) == list(exp.columns), \
                f"columns {list(got.columns)} != {list(exp.columns)}"
            assert len(got) == len(exp), f"rows {len(got)} != {len(exp)}"
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
        except Exception as e:  # collect all failures, report once
            failures.append((name, str(e)[:500]))
    assert not failures, "\n\n".join(f"--- {n}:\n{m}" for n, m in failures)


def test_rows_only_queries_run(contract):
    qs, sqls = contract
    for name, fn in qs.items():
        if name in sqls:
            continue
        df = _to_df(fn(_sf_for(name)))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke():
    df = entrymod.entry()
    assert len(df) > 0
    assert list(df.columns) == ["sink", "lang", "hour", "n_docs", "sum_tokens"]
    assert df.n_docs.sum() > 0


def test_driver_window_is_all_oracle_backed():
    """The driver records CORRECTNESS rows for only the first 50 queries()
    entries; every one of those slots must carry a SQL oracle (rows-only
    queries ride beyond the window and are covered by contract_check)."""
    from illumio_ray.pipelines.queries import REGISTRY, ordered_registry

    ordered = ordered_registry()
    assert set(ordered) == set(REGISTRY)  # a reordering, never a filter
    names = list(ordered)
    in_window = names[:50]
    assert all(ordered[n].sql for n in in_window), [
        n for n in in_window if not ordered[n].sql]
    # rows-only entries are all after every oracle-backed entry
    kinds = [bool(ordered[n].sql) for n in names]
    assert kinds == sorted(kinds, reverse=True)
