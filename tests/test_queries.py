"""Local replica of the driver's t2 correctness gate: every queries() entry
vs its oracle_sql() via DuckDB at sf0.001 (order-insensitive compare)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("PFS_SF", "/root/testdata/sf0.001")


_CON = duckdb.connect()
for _t in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    _CON.execute(
        f"CREATE VIEW {_t} AS SELECT * FROM read_parquet('{os.path.join(SF_DIR, _t)}.parquet')"
    )


def _duck(sql: str):
    return _CON.sql(sql)


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )
    return out


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", [n for n in QUERIES if n in ORACLES])
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ddf = _duck(ORACLES[name])
    dcols = ddf.columns
    drows = ddf.fetchall()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    a, b = _norm(srows, scols), _norm(drows, dcols)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first mismatches {mismatches}"


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"subj", "pred", "obj", "score", "url"} <= set(df.columns)
