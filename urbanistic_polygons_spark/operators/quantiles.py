"""Exact distributed quantiles WITHOUT a global sort.

``percentile_approx`` is a sketch (rank error); a naive exact quantile is
a global sort (single-partition window — the 100 TB killer).  This
operator computes EXACT nearest-rank quantiles with the same two-pass
bucket-offset scheme as ``operators/ordering.py``:

1. bucket every value by ``value DIV bucket_width`` and hash-aggregate a
   per-bucket histogram (one partial-agg shuffle; the histogram is
   #buckets rows — value_range / bucket_width, chosen small);
2. collect the histogram ONCE (scalar-size driver data), walk the
   cumulative counts to find, for each requested quantile, the bucket
   holding its global rank and the residual in-bucket rank;
3. broadcast-join the (bucket, residual-rank) targets back and take each
   bucket's residual-rank-th smallest via a PER-BUCKET window — every
   window partition is bounded by one bucket's row count, never the
   corpus.

Nearest-rank definition (the one DuckDB can reproduce verbatim):
``k = max(1, ceil(q * N))`` over the ascending multiset; ties make any
row choice yield the same VALUE, so the output is deterministic even
though the chosen row is not.

Scale note: at 10^12 rows pick ``bucket_width`` so the histogram stays
~1e6 rows (still driver-safe) and the hottest bucket stays executor-sized;
a skewed value distribution shows up IN the histogram, so the job can
re-bucket adaptively before pass 3 without rescanning (not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def grouped_quantiles(df: DataFrame, group_col: str, value_col: str,
                      qs_permyriad: list[int],
                      bucket_width: int = 16) -> DataFrame:
    """Exact nearest-rank quantiles PER GROUP — the fully-distributed
    variant of :func:`exact_quantiles`: nothing is ever collected, so it
    works for 10^9 groups where the driver-walk form can't.

    Same two-pass selection, but the histogram walk happens IN-FRAME:

    1. per-(group, bucket) histogram (one partial-agg shuffle);
    2. running counts via a window over each group's BUCKETS (a few
       hundred rows per group, never its values), giving each bucket its
       global-rank interval [lo, hi); each requested quantile's target
       rank k = ceil(q*N_g/10000) lands in exactly one bucket via an
       equi-join on group + an interval filter;
    3. join the (group, bucket, residual rank) targets back (broadcast —
       |groups|·|qs| rows) and take the residual-rank-th smallest inside
       each target bucket with a bucket-bounded window.

    Output: (group, q_permyriad, global_rank, value), one row per group
    per requested quantile."""
    if not qs_permyriad:
        # zero-arg F.array() is an ARRAY<VOID> literal that fails analysis
        # on explode (repo rule) — refuse early instead
        raise ValueError("qs_permyriad must be non-empty")
    g = F.col(group_col).alias("g")
    vals = df.select(g, F.col(value_col).cast("long").alias("v"),
                     F.expr(f"CAST({value_col} AS BIGINT)"
                            f" DIV {int(bucket_width)}").alias("b"))
    hist = vals.groupBy("g", "b").agg(F.count("*").alias("c"))
    wb = Window.partitionBy("g").orderBy("b")
    cum = (hist.withColumn("hi", F.sum("c").over(wb))
           .withColumn("lo", F.col("hi") - F.col("c")))
    totals = hist.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    qarr = F.array(*[F.lit(int(q)).cast("long") for q in qs_permyriad])
    targets = (totals.select(
        "g", "n", F.explode_outer(qarr).alias("q_permyriad"))
        .withColumn("k", F.least(F.greatest(
            F.lit(1),
            F.expr("(q_permyriad * n + 9999) DIV 10000")), F.col("n"))))
    # each k lands in exactly one bucket: lo < k <= hi
    tb = (targets.join(cum, "g")
          .filter((F.col("k") > F.col("lo")) & (F.col("k") <= F.col("hi")))
          .select("g", "b", "q_permyriad",
                  (F.col("k") - F.col("lo")).alias("k_in_bucket"),
                  F.col("k").alias("global_rank")))
    joined = vals.join(F.broadcast(tb), ["g", "b"])
    w = Window.partitionBy("g", "b", "q_permyriad").orderBy("v")
    return (joined.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") == F.col("k_in_bucket"))
            .select(F.col("g").alias(group_col), "q_permyriad",
                    "global_rank", F.col("v").alias("value")))


def exact_quantiles(df: DataFrame, value_col: str,
                    qs_permyriad: list[int],
                    bucket_width: int = 16) -> DataFrame:
    """-> (q_permyriad, global_rank, value), one row per requested
    quantile (integer permyriad, e.g. 5000 = median), exact nearest-rank
    over the ascending values."""
    spark = df.sparkSession
    vals = df.select(F.col(value_col).cast("long").alias("v"),
                     F.expr(f"CAST({value_col} AS BIGINT)"
                            f" DIV {int(bucket_width)}").alias("b"))
    # pass 1: per-bucket histogram — collected ONCE (scalar-size), shared
    # by every quantile target
    hist = sorted((r["b"], r["c"]) for r in
                  vals.groupBy("b").agg(F.count("*").alias("c")).collect())
    n = sum(c for _, c in hist)
    out_schema = T.StructType([
        T.StructField("q_permyriad", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("k_in_bucket", T.LongType()),
        T.StructField("global_rank", T.LongType()),
    ])
    targets = []
    for q in qs_permyriad:
        if n == 0:
            continue
        k = max(1, -(-(q * n) // 10000))  # ceil(q*N/10000), clamped >= 1
        k = min(k, n)
        cum = 0
        for b, c in hist:
            if cum + c >= k:
                targets.append((int(q), int(b), int(k - cum), int(k)))
                break
            cum += c
    if not targets:
        # empty input: empty result with the output schema (the catalog
        # rule: never build a zero-arg F.array / empty literal frame
        # implicitly)
        return spark.createDataFrame([], T.StructType([
            T.StructField("q_permyriad", T.LongType()),
            T.StructField("global_rank", T.LongType()),
            T.StructField("value", T.LongType()),
        ]))
    tl = spark.createDataFrame(targets, out_schema)
    # pass 3: inner broadcast join keeps ONLY target buckets' rows; the
    # window partitions by (bucket, quantile) so two quantiles landing in
    # one bucket don't share a row_number sequence
    joined = vals.join(F.broadcast(tl), "b")
    w = Window.partitionBy("b", "q_permyriad").orderBy("v")
    return (joined.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") == F.col("k_in_bucket"))
            .select("q_permyriad", "global_rank", F.col("v").alias("value")))
