"""Token-budget corpus mixing: keep, per stratum (language/source), the
seeded-hash-ordered prefix of documents whose cumulative weight (token or
char count) fits a per-stratum budget.

Training-data pipelines mix sources by token quota ("2B tokens of de,
30B of en, ..."): the selection must be (a) deterministic across runs
and cluster sizes, (b) a uniform random subset (hash order), (c) an
exact prefix — the kept set is closed under the cumulative-sum cutoff,
so re-running with a larger budget strictly extends it (resumable
mixing).  The naive form is a running SUM() OVER (PARTITION BY stratum
ORDER BY hash) — a single partition per stratum, which collapses when a
stratum is most of the corpus (en at web scale).

This operator is the scale-correct two-pass distributed prefix sum
(same bucket-offset scheme as operators/ordering.py):

  1. portable 31-bit hash of (seed, doc_id); bucket = hash DIV width —
     hash-range buckets are monotone in hash, so bucket order == global
     order and per-bucket totals suffice to place every bucket;
  2. one tiny aggregate (n_strata x n_buckets rows) collected ONCE and
     turned into per-(stratum, bucket) cumulative offsets, broadcast
     back;
  3. bucket-level prune: a bucket whose offset already reaches the
     budget cannot contribute a kept row (weights are >= 1), so it is
     dropped BEFORE the expensive per-row work — at 100 TB with a 1%
     sampling budget this skips ~99% of the corpus after one cheap agg;
  4. cum = offset + running sum within (stratum, bucket); keep rows
     with cum <= budget.  Each window is a ~1/n_buckets hash-range
     block; all blocks rank in parallel.

Full-data cost: two corpus scans (one per pass — each a map-side hash
projection, no wide dependency) and one shuffle of the SURVIVING
buckets only.  The driver sees n_strata x n_buckets rows.  Caching the
hashed corpus between passes would trade the second scan for a 100 TB
cache — the re-scan is the right call at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ordering import DEFAULT_BUCKET_WIDTH, epoch_hash


def token_budget_mix(df: DataFrame, budget: int,
                     stratum_col: str = "lang",
                     weight_col: str = "n_chars",
                     id_col: str = "doc_id",
                     seed_prefix: str = "mix0:",
                     bucket_width: int = DEFAULT_BUCKET_WIDTH,
                     ) -> DataFrame:
    """Rows `stratum, doc_id, w, cum` for the kept prefix of each
    stratum: docs in seeded-hash order while the running weight total
    stays <= budget.  Weights must be >= 1 (the bucket prune relies on
    a dropped bucket's first row already exceeding the budget)."""
    spark = df.sparkSession
    hashed = (df.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        F.col(weight_col).cast("long").alias("w"),
        epoch_hash(seed_prefix, F.col(id_col)).alias("h"))
        .withColumn("bucket", F.expr(f"h DIV {int(bucket_width)}")
                    .cast("long")))

    # pass 1: per-(stratum, bucket) weight totals — tiny, collected once
    sums = (hashed.groupBy("stratum", "bucket").agg(F.sum("w").alias("bw"))
            .orderBy("stratum", "bucket").collect())
    offsets, running = [], {}
    for r in sums:
        off = running.get(r["stratum"], 0)
        offsets.append((r["stratum"], r["bucket"], off))
        running[r["stratum"]] = off + r["bw"]
    off_df = spark.createDataFrame(
        offsets, "stratum string, bucket long, off long")
    # bucket-level prune: off >= budget means every row in the bucket
    # lands past the cutoff (w >= 1) — drop it before the window
    live = F.broadcast(off_df.filter(F.col("off") < F.lit(int(budget))))

    # pass 2: running sum inside each (stratum, bucket) block + offset
    w = (Window.partitionBy("stratum", "bucket").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (hashed.join(live, ["stratum", "bucket"])
            .withColumn("cum", (F.col("off") + F.sum("w").over(w))
                        .cast("long"))
            .filter(F.col("cum") <= F.lit(int(budget)))
            .select("stratum", "doc_id", "w", "cum"))
