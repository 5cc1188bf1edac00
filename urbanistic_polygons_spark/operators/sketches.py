"""Heavy hitters via a mergeable Misra-Gries sketch + exact verify pass.

A training-data pipeline needs "what are the hot tokens / URLs / shingles"
over corpora where the distinct-key set is itself too large to shuffle
(10^11 distinct shingles at 100 TB).  The classic answer is sketch-prune-
verify:

1. **map side** — every partition folds its token stream into a k-counter
   Misra-Gries summary (``mapInPandas``; batch value_counts folded with
   the MG merge rule, so the per-batch cost is one pandas value_counts +
   an O(k) merge, not per-row Python).
2. **merge** — partition summaries (≤ partitions × k rows, scalar-size)
   are merged with the Agarwal et al. (SIGMOD'12, "Mergeable Summaries")
   rule: sum counters, subtract the (k+1)-th largest, drop non-positive.
   The merged summary keeps the MG guarantee: estimated count is within
   n/(k+1) of true, so EVERY item with true frequency > n/(k+1) survives
   as a candidate.  The candidate set (≤ k rows) is collected once.
3. **verify** — one more scan counts the ≤ k candidates EXACTLY (the
   filter makes the final aggregation map-side-tiny) and keeps those with
   true count · (k+1) > n.

The output is therefore a pure function of the input multiset — exact
counts of exactly the items above the frequency threshold — independent
of partitioning and stream order, even though the intermediate sketches
are not.  The naive plan shuffles every distinct key; this plan shuffles
partitions × k candidate rows plus a k-row aggregate.

Reference analog: none (the reference has no sketch layer); this is the
LLM-pipeline extension surface (SURVEY §2.8).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_merge(counts: dict, k: int) -> dict:
    """Misra-Gries reduction: if more than k counters, subtract the
    (k+1)-th largest count from all and drop the non-positive ones.
    Merging two summaries = sum dicts, then reduce (Agarwal et al.)."""
    if len(counts) <= k:
        return dict(counts)
    vs = sorted(counts.values(), reverse=True)
    sub = vs[k]
    return {t: c - sub for t, c in counts.items() if c > sub}


_SKETCH_SCHEMA = T.StructType([
    T.StructField("token", T.StringType()),
    T.StructField("c", T.LongType()),
])


def _partial_sketches(k: int):
    def fn(batches):
        import pandas as pd
        sketch: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            vc = pdf["token"].value_counts()
            # a batch's exact counts are themselves a valid MG summary;
            # fold them in with the merge rule (O(k + batch distinct))
            for t, c in vc.items():
                sketch[t] = sketch.get(t, 0) + int(c)
            sketch = mg_merge(sketch, k)
        # the null-token row carries this partition's row count, so the
        # sketch pass doubles as the COUNT pass (2 scans total, not 3)
        rows = list(sketch.items()) + [(None, n)]
        yield pd.DataFrame(rows, columns=["token", "c"])
    return fn


def heavy_hitters(df: DataFrame, token_col: str, k: int = 32) -> DataFrame:
    """-> (token, cnt): EXACT counts of every token whose frequency
    exceeds n/(k+1), found without ever shuffling the distinct-key set.

    ``df[token_col]`` is one token per row (explode upstream)."""
    toks = df.select(F.col(token_col).cast("string").alias("token"))
    partial = toks.mapInPandas(_partial_sketches(k), schema=_SKETCH_SCHEMA)
    # partition summaries are scalar-size (partitions x k); merge once on
    # the driver and share the candidate list as a literal (repo rule:
    # collect scalar-size results ONCE)
    summary_rows = partial.collect()  # scalar-size: partitions x (k+1)
    merged: dict = {}
    n = 0
    for row in summary_rows:
        if row["token"] is None:
            n += row["c"]
        else:
            merged[row["token"]] = merged.get(row["token"], 0) + row["c"]
    cand = list(mg_merge(merged, k).keys())
    if not cand:
        return toks.groupBy("token").agg(
            F.count("*").cast("long").alias("cnt")).filter(F.lit(False))
    exact = (toks.filter(F.col("token").isin(cand))
             .groupBy("token").agg(F.count("*").cast("long").alias("cnt")))
    return exact.filter(F.col("cnt") * (k + 1) > F.lit(n))
