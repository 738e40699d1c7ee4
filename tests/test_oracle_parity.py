"""Local replica of the driver's DuckDB-oracle correctness gate.

For every registered query with an oracle: run the Spark callable and
the DuckDB SQL on the same parquet dir, sort columns by name and rows by
value, and require EXACT equality (the driver hashes values, so approx
isn't enough — doubles are round()ed in-query on both sides).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # bool -> int for cross-engine stability; bytes -> hex
    for c in df.columns:
        if df[c].dtype == bool:
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    odf = duck.execute(ORACLES[name]).fetchdf()
    assert list(sorted(sdf.columns)) == list(sorted(odf.columns)), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    s, o = _normalize(sdf), _normalize(odf)
    assert len(s) == len(o), f"{name}: row count {len(s)} vs oracle {len(o)}"
    mismatches = []
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _cells_equal(a, b):
                mismatches.append((col, i, a, b))
                if len(mismatches) > 5:
                    break
        if len(mismatches) > 5:
            break
    assert not mismatches, f"{name}: value mismatches (col, row, spark, oracle): {mismatches}"


def test_every_query_has_callable():
    for name in ORACLES:
        assert name in QUERIES


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) == 9
