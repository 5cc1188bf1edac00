"""Bucketed tables — shuffle-free co-located joins for repeated big⨝big.

At 100 TB the expensive joins are fact⨝fact on a shared key (orders ⨝
customer activity, doc shards ⨝ doc scores): every query re-shuffles
both sides unless the STORAGE is already hash-partitioned on the key.
Spark's native answer is bucketing: ``bucketBy(n, key).sortBy(key)``
writes each output file as one hash bucket; a join of two tables
bucketed on the same key with the same bucket count reads co-located
buckets and sort-merge-joins them with ZERO Exchange on either side
(when buckets are pre-sorted, even the Sort disappears).  This is the
persistent-storage complement of the in-query strategies the engine
already uses (broadcast for small dims, AQE skew splitting) — pay one
layout write, amortize across every downstream join; the same layout
maps onto Iceberg's ``bucket(n, key)`` partition transform.

``tests/test_bucketed_join.py`` drives this end-to-end and asserts the
physical plan: bucketed scan on both sides, no ShuffleExchange.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   path: str) -> None:
    """Persist ``df`` as an external bucketed+sorted table: files are
    hash(key) % n_buckets partitions, rows sorted by key within each —
    the layout co-located joins and merge-scans need."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, key).sortBy(key)
     .option("path", path)
     .saveAsTable(table))


def cobucketed_join(spark: SparkSession, left: str, right: str,
                    key: str) -> DataFrame:
    """Inner join of two same-bucketed tables on their bucket key.
    With matching bucket counts Catalyst plans a SortMergeJoin whose
    children are bucketed FileScans — no Exchange, no re-sort."""
    return spark.table(left).join(spark.table(right), key)
