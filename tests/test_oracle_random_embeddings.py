"""Randomized-embeddings oracle gate — sibling of the corpus/events gates
for the similarity family.  The generated table plants the vector edge
cases the sf corpus never produces:

- all-zero vectors (sign-LSH bucket of sign(0), zero-norm cosine);
- exact duplicate vectors and exact negations;
- tiny magnitudes that quantize to the zero vector;
- large-magnitude outliers;
- enough duplicates that IVF centroids can collide.

Deterministic seeds; non-embeddings tables symlink the real sf0.001."""

import os
import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from urbanistic_polygons_spark.catalog import TABLES, build_catalog

from test_catalog_oracle import canon

CATALOG = build_catalog()

EMB_QUERIES = ["embedding_topk", "embedding_ann", "embedding_ivf",
               "embedding_near_dup", "semdedup"]

SEEDS = [3, 29]
DIM = 64
N = 160


def _gen_embeddings(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vecs = (rng.uniform(-0.25, 0.25, size=(N, DIM))).astype(np.float32)
    r = random.Random(seed)
    for _ in range(6):
        vecs[r.randrange(N)] = 0.0                       # zero vectors
    for _ in range(10):
        vecs[r.randrange(N)] = vecs[r.randrange(N)]      # exact dups
    for _ in range(5):
        vecs[r.randrange(N)] = -vecs[r.randrange(N)]     # negations
    for _ in range(3):
        vecs[r.randrange(N)] = vecs[r.randrange(N)] * np.float32(1e-6)
    for _ in range(3):
        vecs[r.randrange(N)] = vecs[r.randrange(N)] * np.float32(40.0)
    return pd.DataFrame({
        "vec_id": np.arange(N, dtype=np.int64),
        "embedding": [v for v in vecs],
        "label": (np.arange(N) % 10).astype(np.int32),
    })


@pytest.fixture(scope="module")
def emb_dirs(tmp_path_factory):
    dirs = {}
    for seed in SEEDS:
        d = tmp_path_factory.mktemp(f"remb{seed}")
        _gen_embeddings(seed).to_parquet(d / "embeddings.parquet",
                                         index=False)
        for t in TABLES:
            if t != "embeddings":
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           d / f"{t}.parquet")
        dirs[seed] = str(d)
    return dirs


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("name", EMB_QUERIES)
def test_random_embeddings_oracle(spark, emb_dirs, name, seed):
    sf_dir = emb_dirs[seed]
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
