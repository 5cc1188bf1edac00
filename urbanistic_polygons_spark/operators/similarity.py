"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force top-k: quantized-integer dot product (exact, oracle-matching)
  against a small broadcast query set — the correctness baseline;
- LSH-bucketed ANN: random-hyperplane signs bucket the corpus; queries probe
  only their bucket — the 100 TB scale path (buckets shard the shuffle).

The dot product uses embeddings quantized to integers (round(x*1000)) so
ranking is exact integer arithmetic — identical in Spark and DuckDB — and
never sensitive to float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT_SCALE = 1000


def quantized(vec_col):
    """array<float> -> array<long> with round-half-away-from-zero (both
    engines' default round)."""
    return F.transform(vec_col, lambda x: F.round(x * QUANT_SCALE, 0).cast("long"))


def int_dot(a, b):
    """Exact integer dot product via zip_with + aggregate (JVM-side)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def brute_force_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbors for each query vector by integer dot product.

    Output: (query_id, neighbor_id, dot, rank) — rank 1..k, deterministic
    tie-break on neighbor_id.  The query side is a broadcast (tiny), so the
    corpus never shuffles; the per-query top-k is a window over the
    broadcast-join result.
    """
    base = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("q"))
    queries = (base.filter(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"), F.col("q").alias("qv")))
    scored = (
        base.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                int_dot(F.col("q"), F.col("qv")).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dot", "rank"))


def lsh_bucket(vec_col, n_planes: int = 8, seed: int = 7):
    """Random-hyperplane LSH bucket id: sign bits of dot products with
    ``n_planes`` deterministic pseudo-random hyperplanes.

    The "hyperplane" coefficients are a deterministic +-1 pattern derived
    from (plane, dimension index) parity — reproducible anywhere without
    shipping float weights.
    """
    bucket = None
    for p in range(n_planes):
        # +-1 coefficient per dim: parity of a small integer mix
        s = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda x, i: F.when(
                    ((i * F.lit(2654435761 + p * 40503) + F.lit(seed))
                     .bitwiseAND(F.lit(64))) == 0, x).otherwise(-x),
            ),
            F.lit(0.0), lambda acc, x: acc + x)
        bit = F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def ann_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 6) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    At 100 TB the corpus is hash-partitioned (or bucketed on disk) by
    ``bucket`` so a probe touches one partition; here it is an equi-join on
    the bucket id.  Recall is approximate by design — verified in tests
    against brute force with a recall floor, not exact equality.
    """
    base = embeddings.select(
        F.col(id_col),
        quantized(F.col(vec_col)).alias("q"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    queries = (base.filter(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"),
                       F.col("q").alias("qv"), "bucket"))
    scored = (
        base.join(F.broadcast(queries), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                int_dot(F.col("q"), F.col("qv")).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dot", "rank"))


def embedding_near_dup(embeddings: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       n_planes: int = 10, min_dot: int = 0) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: pairs sharing an LSH
    bucket with integer dot above threshold.  (doc pairs, exact integer
    score; bucket blocking keeps it linear.)"""
    base = embeddings.select(
        F.col(id_col),
        quantized(F.col(vec_col)).alias("q"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, "bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                int_dot(F.col("l.q"), F.col("r.q")).alias("dot"))
        .filter(F.col("dot") > min_dot)
    )
