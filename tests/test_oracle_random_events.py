"""Randomized-events oracle gate — sibling of test_oracle_random_corpus
for the event-stream queries (sessionize, as-of, banded interval join,
JSON schema-on-read, CDC MERGE).  The generated stream plants the
boundary cases the sf corpus never produces:

- duplicate (user_id, ts) rows — window determinism under order ties;
- gaps of EXACTLY the 30-minute session threshold — > vs >= semantics;
- decimal-tie values (x.xx5) — HALF_UP vs half-even rounding;
- malformed / empty / missing-key / nested JSON props;
- single-event users and long single-user bursts.

Deterministic seeds; non-events tables symlink the real sf0.001."""

import json
import os
import random

import duckdb
import pandas as pd
import pytest

from urbanistic_polygons_spark.catalog import TABLES, build_catalog

from test_catalog_oracle import canon

CATALOG = build_catalog()

EVENT_QUERIES = ["sessionize", "asof_join", "range_join", "json_props",
                 "cdc_upsert", "trip_segments"]

SEEDS = [5, 17]

TYPES = ["click", "view", "purchase", "signup", "error"]
PROPS = ['{"k": %d}', '{}', '{"other": 1}', 'not json', '',
         '{"k": %d, "nested": {"deep": true}}', '{"k": null}']


def _gen_events(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01 00:00:00")
    for user in range(25):
        t = base + pd.Timedelta(seconds=rng.randint(0, 3600))
        n = rng.choice([1, 1, 2, 5, 30, 60])     # singletons + bursts
        for _ in range(n):
            p = rng.random()
            if p < 0.15:
                pass                              # duplicate ts (tie)
            elif p < 0.30:
                t += pd.Timedelta(minutes=30)     # EXACT session gap
            elif p < 0.45:
                t += pd.Timedelta(minutes=30, microseconds=1)
            else:
                t += pd.Timedelta(seconds=rng.randint(1, 7200))
            prop = rng.choice(PROPS)
            if "%d" in prop:
                prop = prop % rng.randint(0, 99)
            # decimal ties: .xx5 values exercise rounding conventions
            value = rng.choice([1.005, 2.675, 0.0, -3.555,
                                round(rng.uniform(0, 500), 2)])
            rows.append((eid, t, user, rng.choice(TYPES), value, prop))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    # Spark rejects parquet TIMESTAMP(NANOS); write microseconds like the
    # real testdata
    return df.astype({"event_id": "int64", "user_id": "int64",
                      "value": "float64", "ts": "datetime64[us]"})


@pytest.fixture(scope="module")
def event_dirs(tmp_path_factory):
    dirs = {}
    for seed in SEEDS:
        d = tmp_path_factory.mktemp(f"re{seed}")
        _gen_events(seed).to_parquet(d / "events.parquet", index=False)
        for t in TABLES:
            if t != "events":
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           d / f"{t}.parquet")
        dirs[seed] = str(d)
    return dirs


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_random_events_oracle(spark, event_dirs, name, seed):
    sf_dir = event_dirs[seed]
    spec = CATALOG[name]
    got = canon(spec["spark"](spark, sf_dir).toArrow(), name, "spark")
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        exp = canon(con.execute(spec["oracle"]).arrow(), name, "oracle")
    finally:
        con.close()
    assert list(got.columns) == list(exp.columns), (
        f"{name}@seed{seed}: columns {list(got.columns)} != "
        f"{list(exp.columns)}")
    assert len(got) == len(exp), (
        f"{name}@seed{seed}: {len(got)} rows != {len(exp)}")
    assert len(got) > 0, f"{name}@seed{seed}: empty result"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True, obj=f"{name}@{seed}")
