"""Local mirror of the driver's DuckDB-oracle conformance check
(SURVEY.md §5.2.3): run every queries() entry at sf0.001 and compare
against oracle_sql() order-insensitively. The driver runs the same thing
at sf0.01 — this catches breakage before it does."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError, OverflowError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_conformance(ray_session, con, name):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    got = _normalize(_to_pandas(qs[name](SF_DIR)))
    want = _normalize(con.execute(sqls[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-9)


ROWS_ONLY_KEYS = sorted(set(entry_mod.queries().keys()) - set(ORACLE_KEYS))


def test_every_query_key_is_oracled():
    """Every queries() entry carries an oracle_sql() row — the driver's
    strongest check covers the whole registry. If a future key is
    genuinely not SQL-expressible, remove this assert and restore the
    rows-only parametrized runner this replaced (git history)."""
    assert ROWS_ONLY_KEYS == []


if ROWS_ONLY_KEYS:  # pragma: no cover - see test_every_query_key_is_oracled

    @pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
    def test_rows_only_queries_run(ray_session, name):
        qs = entry_mod.queries()
        df = _to_pandas(qs[name](SF_DIR))
        assert len(df) >= 0
        assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    df = _to_pandas(ds)
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "lang", "text", "n_tokens"}
    # the synthetic <script> payload never leaks into extracted text
    assert not df["text"].str.contains("hidden").any()
