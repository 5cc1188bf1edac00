"""Driver-mimicking correctness gate: run every catalog query in Spark AND
its oracle SQL in DuckDB at sf0.001, compare row counts, column names, and
order-insensitive values."""

import duckdb
import pandas as pd
import pytest

from urbanistic_polygons_spark.catalog import TABLES, build_catalog

SF_DIR = "/root/testdata/sf0.001"

CATALOG = build_catalog()
ORACLE_NAMES = [n for n, s in CATALOG.items() if s["oracle"]]
ROWS_ONLY_NAMES = [n for n, s in CATALOG.items() if not s["oracle"]]


def duck_conn():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = pd.to_numeric(df[c], errors="ignore")
            if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
                df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, name):
    spec = CATALOG[name]
    got = canon(spec["spark"](spark, SF_DIR).toPandas())
    con = duck_conn()
    exp = canon(con.execute(spec["oracle"]).df())
    con.close()
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}")
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    assert len(got) > 0, f"{name}: empty result is too weak a check"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True, obj=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only(spark, name):
    df = CATALOG[name]["spark"](spark, SF_DIR)
    assert df.count() > 0, f"{name}: no rows"
