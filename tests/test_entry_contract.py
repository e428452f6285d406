"""Driver-contract simulation: run every queries() entry at sf0.001
and compare against its oracle_sql() via DuckDB — the same check the
driver performs at sf0.01 (row count + order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    c.execute("SET TimeZone='UTC'")
    return c


def _norm_cell(x):
    if isinstance(x, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(v) for v in x)
    if isinstance(x, (float, np.floating)):
        return round(float(x), 6)
    if isinstance(x, np.integer):
        return int(x)
    return x


def _rowset(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in pdf.iterrows()]
    return sorted(rows, key=repr), cols


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "score"]


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, sf_dir, con, name):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir).toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        # rows-only check (approximate operators)
        assert len(sdf) >= 0
        return
    odf = con.sql(oracles[name]).df()
    srows, scols = _rowset(sdf)
    orows, ocols = _rowset(odf)
    assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"
