"""Operator parity vs DuckDB oracle — local mirror of the driver's
CORRECTNESS gate (row-count + schema + order-insensitive values), run at
sf0.001 for speed (the driver runs sf0.01)."""

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMALL

QUERIES = E.queries()
ORACLES = E.oracle_sql()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Same-kind widening only (int32->int64, datetime unit) — NO
    cross-kind coercion: an int column on one side and a float on the
    other must FAIL here, because the driver's value hash stringifies
    per-type ("5" != "5.0"). check_dtype-lenient comparison is exactly
    how the round-1 sessionize HUGEINT bug passed locally but failed
    the gate."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMALL).toPandas()
    odf = duck.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    s, o = normalize(sdf), normalize(odf)
    assert len(s) == len(o), f"{name}: row count {len(s)} vs {len(o)}"
    assert len(s) > 0, f"{name}: VACUOUS oracle (0 rows) — proves nothing, reformulate"
    skinds = {c: s[c].dtype.kind for c in s.columns}
    okinds = {c: o[c].dtype.kind for c in o.columns}
    assert skinds == okinds, (
        f"{name}: dtype-kind mismatch (driver hash would fail): {skinds} vs {okinds}"
    )
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, atol=1e-9, rtol=0)


def test_all_queries_have_callables():
    assert len(QUERIES) >= 20
    for name in ORACLES:
        assert name in QUERIES


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 2


NO_ORACLE = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(name, spark):
    """Registry entries without a SQL oracle (codec stages — decode is
    not SQL-expressible) still get the driver's rows-only check; mirror
    it: runs, >0 rows, fully non-null key column, stable schema."""
    df = QUERIES[name](spark, SF_SMALL)
    pdf = df.toPandas()
    assert len(pdf) > 0, f"{name}: empty rows-only query"
    key = df.schema.fields[0].name
    assert pdf[key].notna().all()
    assert not df.schema.fields[0].nullable
