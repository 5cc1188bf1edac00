"""Weighted priority sampling — exact-size weighted samples, no RNG.

Corpus curation constantly needs "draw k documents with probability
~proportional to weight" (token count, quality score, domain boost) —
at 100 TB that must be one pass, deterministic (re-runs and backfills
must pick the SAME sample), and never a global sort.

This is priority sampling (Duffield-Lund-Thorup, JACM '07) with the
repo's portable integer hash as the randomness source: each row gets

    priority = (hash31(key) * SCALE) DIV max(weight, 1)

(the integer analog of u/w with u ~ U(0,1) — hash31 is uniform on
[0, 2^31), SCALE keeps the division informative for large weights) and
the sample is the k SMALLEST priorities.  A row with twice the weight
halves its priority, doubling its odds of making the cut — the weighted
inclusion property — while the hash makes the draw a pure function of
the data: no RNG state, identical across engines, retries, and rounds
(the repo-wide determinism rule; ``stratified_sample`` uses the same
trick for per-stratum rate sampling, this one gives exact-k weighted).

Scale shape: ``orderBy(priority).limit(k)`` compiles to
TakeOrderedAndProject — per-partition k-heaps + a k-row driver merge,
never a single-partition sort.  One scan, zero shuffles.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1 << 20


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    k: int) -> DataFrame:
    """-> the k rows with smallest (hash31(key)*SCALE) DIV max(w,1)
    priority: a deterministic weighted-without-replacement sample.
    Output: (key, weight, priority), ties broken by ascending key."""
    # integer division throughout: (h*SCALE) DIV w via expr — never a
    # float '/' (floor(float-div) can be off by one at exact boundaries)
    out = df.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        F.expr(
            f"(pmod(CAST(conv(substring(md5(CAST({key_col} AS STRING)), "
            f"1, 8), 16, 10) AS BIGINT), 2147483647) * {SCALE}) "
            f"DIV greatest(CAST({weight_col} AS BIGINT), 1)"
        ).cast("long").alias("priority"))
    return out.orderBy(F.asc("priority"), F.asc("key")).limit(k)
