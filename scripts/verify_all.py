#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run EVERY catalog
query with an oracle through the __spark_entry__ contract at sf0.01
(the driver's scale, vs the pytest gate's sf0.001) and compare shapes +
values the way the driver does.  Usage:

    python scripts/verify_all.py [sf_dir] 2>/dev/null
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from urbanistic_polygons_spark.catalog import TABLES  # noqa: E402
from urbanistic_polygons_spark.session import get_spark  # noqa: E402


def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("verify-all", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    queries, oracles = E.queries(), E.oracle_sql()
    bad = []
    for i, name in enumerate(queries):
        if name not in oracles:
            print(f"{i:3d} {name}: rows-only "
                  f"({queries[name](spark, sf).count()} rows)")
            continue
        try:
            sdf = norm(queries[name](spark, sf).toPandas())
            odf = norm(con.execute(oracles[name]).df())
            ok = (sdf.shape == odf.shape
                  and all((sdf[c].values == odf[c].values).all()
                          for c in sdf.columns))
        except Exception as exc:  # noqa: BLE001
            print(f"{i:3d} {name}: ERROR {exc}")
            bad.append(name)
            continue
        print(f"{i:3d} {name}: {sdf.shape} "
              f"{'MATCH' if ok else 'MISMATCH vs ' + str(odf.shape)}")
        if not ok:
            bad.append(name)
    print(f"\n{'ALL GREEN' if not bad else 'FAILURES: ' + ', '.join(bad)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
