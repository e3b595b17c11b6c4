"""Replicates the driver's correctness gate locally: every
SQL-checked query in extractor.queries must match its DuckDB oracle on
/root/testdata/sf0.01 — row count, column names, exact values
(order-insensitive). Rows-only queries must at least run and return a
stable schema."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from extractor.queries import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            "CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            .format(t=tbl, d=SF_DIR))
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    got = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    if name not in ORACLES:
        assert len(got) >= 0  # rows-only: runs, stable schema
        assert list(got.columns)
        return
    exp = _canon(duck.sql(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), (
        "column mismatch: {} vs {}".format(list(got.columns), list(exp.columns)))
    assert len(got) == len(exp), "row count {} vs {}".format(len(got), len(exp))
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype(float), e.astype(float), check_names=False,
                rtol=0, atol=0)
        else:
            assert (g.to_numpy() == e.to_numpy()).all(), (
                "value mismatch in column {}: {} vs {}".format(
                    c, g.head().tolist(), e.head().tolist()))
