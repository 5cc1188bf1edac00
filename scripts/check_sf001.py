"""Driver-mimicking correctness pre-flight at sf0.01 (the driver's SF).

The pytest oracle gate (tests/test_catalog_oracle.py) runs at sf0.001;
the driver's CORRECTNESS_r{N}.json runs at sf0.01.  A query can be green
at the small SF and diverge at the larger one (more edge-case rows, Arrow
batch boundaries, hot-bucket caps engaging).  This script replays the
driver's compare — row count, sorted column names, order-insensitive
values — for the FIRST 50 registered queries (the driver's report cap)
at sf0.01, so a divergence is caught before the round closes.

Usage: python scripts/check_sf001.py [--all] [names...]
"""
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from urbanistic_polygons_spark.catalog import TABLES, build_catalog  # noqa: E402
from urbanistic_polygons_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def canon(tbl: pa.Table) -> pd.DataFrame:
    bad = [f.name for f in tbl.schema if pa.types.is_decimal(f.type)]
    if bad:
        raise AssertionError(f"decimal columns {bad}")
    df = tbl.to_pandas()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif (pd.api.types.is_integer_dtype(df[c])
              or pd.api.types.is_bool_dtype(df[c])):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_all = "--all" in sys.argv
    catalog = build_catalog()
    names = list(catalog)
    if args:
        names = args
    elif not run_all:
        names = names[:50]

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    n_bad = 0
    for name in names:
        spec = catalog[name]
        t0 = time.time()
        try:
            got = canon(spec["spark"](spark, SF_DIR).toArrow())
            if spec["oracle"]:
                exp = canon(con.execute(spec["oracle"]).arrow())
                ok_cols = list(got.columns) == list(exp.columns)
                ok_rows = len(got) == len(exp)
                ok_vals = False
                if ok_cols and ok_rows:
                    try:
                        pd.testing.assert_frame_equal(
                            got, exp, check_dtype=False, check_exact=True)
                        ok_vals = True
                    except AssertionError:
                        ok_vals = False
                status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
                detail = (f"rows={len(got)}/{len(exp)} cols={ok_cols} "
                          f"vals={ok_vals}")
            else:
                status = "OK" if len(got) > 0 else "FAIL"
                detail = f"rows-only={len(got)}"
        except Exception as e:  # noqa: BLE001 — report, keep scanning
            status, detail = "ERR", repr(e)[:200]
        if status != "OK":
            n_bad += 1
        print(f"{status:4s} {name:24s} {time.time()-t0:6.1f}s  {detail}",
              flush=True)
    print(f"done: {n_bad} bad of {len(names)}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
