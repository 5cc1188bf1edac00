"""SemDeDup semantics on hand-built embeddings: exact duplicate groups
keep their min-id representative, near-orthogonal vectors survive, and
the integer cosine-squared threshold is exact at the boundary."""
import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from urbanistic_polygons_spark.operators.semdedup import (
    semantic_dup_pairs, semdedup)

_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], _SCHEMA)


def _basis(dim, i, scale=1.0):
    v = [0.0] * dim
    v[i] = scale
    return v


def test_exact_dups_keep_min_id(spark):
    dim = 8
    rows = []
    # 20 base vectors on pairwise-distinct directions (cos <= 0.48)
    for i in range(8):
        rows.append((i, _basis(dim, i)))
    for i in range(8, 16):
        rows.append((i, _basis(dim, i % dim, -1.0)))
    for i in range(16, 20):
        v = [0.0] * dim
        v[i % dim], v[(i + 1) % dim] = 0.6, 0.8
        rows.append((i, v))
    # exact duplicates of vectors 3 and 5 under larger ids
    rows.append((103, _basis(dim, 3)))
    rows.append((203, _basis(dim, 3)))
    rows.append((105, _basis(dim, 5)))
    out = semdedup(_emb(spark, rows), n_lists=4, t_num=9, t_den=10)
    got = {r["vec_id"]: (r["keeper"], r["is_kept"]) for r in out.collect()}
    assert got[3] == (3, 1)
    assert got[103] == (3, 0)
    assert got[203] == (3, 0)
    assert got[5] == (5, 1)
    assert got[105] == (5, 0)
    # a non-duplicated vector keeps itself
    assert got[7] == (7, 1)
    assert sum(1 - kept for _, kept in got.values()) == 3


def test_threshold_boundary_is_exact(spark):
    # pairs at cos exactly above/below 0.9: (1,0) vs (cos t, sin t)
    # quantized to 1e3 ints -> dot=1000*c, na=1e6, nb=c^2+s^2
    # dup iff (1000*c)^2 * 100 >= 81 * 1e6 * (c*c+s*s)
    spark_df = _emb(spark, [
        (0, [1.0, 0.0]), (1, [0.95, math.sqrt(1 - 0.95 ** 2)]),
        (2, [0.85, math.sqrt(1 - 0.85 ** 2)])])
    assigned = spark_df.select(
        F.col("vec_id"),
        F.transform("embedding",
                    lambda x: F.round(x.cast("double") * 1000)
                    .cast("long")).alias("q"),
        F.lit(0).cast("long").alias("list_id"))
    pairs = {(r["id_a"], r["id_b"]) for r in
             semantic_dup_pairs(assigned, t_num=9, t_den=10).collect()}
    assert (0, 1) in pairs          # cos 0.95 >= 0.9
    assert (0, 2) not in pairs      # cos 0.85 < 0.9
    # cos(1,2) = cos(arccos .95 - arccos .85) ~ 0.988 -> dup
    assert (1, 2) in pairs


def test_cluster_cap_drops_oversized(spark):
    rows = [(i, _basis(4, 0)) for i in range(6)]
    assigned = _emb(spark, rows).select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.round(x.cast("double") * 1000)
                    .cast("long")).alias("q"),
        F.lit(0).cast("long").alias("list_id"))
    full = semantic_dup_pairs(assigned, t_num=9, t_den=10, max_cluster=6)
    capped = semantic_dup_pairs(assigned, t_num=9, t_den=10, max_cluster=5)
    assert full.count() == 15       # all 6 identical -> C(6,2)
    assert capped.count() == 0      # oversized cluster dropped, counted
