"""Sequence packing for training-data pipelines: greedy fill of documents
into fixed token-budget bins (context windows), the standard pre-training
batching step ("example packing").

Spark-side design (the part that must be real at 100 TB):

- Packing is inherently sequential *within* a bin stream, so the scale
  unit is the SHARD: documents are assigned to shards by a portable
  content-free hash of ``doc_id`` (reproducible on any engine/cluster
  size — no RNG), and each shard is packed independently by an
  Arrow-batched ``applyInPandas`` kernel.  One shuffle on ``shard``; at
  100 TB you raise ``n_shards`` proportionally (shards ≫ executors), so
  the sequential unit stays bounded and the stage is embarrassingly
  parallel.  Cross-shard bin numbering is deliberately per-shard
  (``(shard, bin_id)`` is the global bin key) — a global sequential scan
  would serialize the cluster for zero training benefit.
- The kernel's O(rows-per-shard) Python loop is the intrinsic sequential
  recurrence (bin fill depends on every prior doc in the shard); it runs
  once per group on an Arrow batch, not per-row through the JVM boundary.
- Deterministic: shard = hash31('pack:'||doc_id) % n_shards, order within
  a shard is ascending ``doc_id``, tokens are the whitespace tokenization
  shared with ``functions.text`` — every value is bit-reproducible by the
  DuckDB recursive-CTE oracle (catalog entry ``pack_sequences``).

Greedy rule (first-fit in doc_id order): a document is appended to the
current bin if its tokens still fit inside ``budget``; otherwise it opens
a new bin.  A document longer than ``budget`` therefore always sits alone
in its own (oversized) bin — real pipelines would chunk it upstream; the
packer must not silently drop it.

Reference parity note: the reference is an OSM geometry engine and has no
corpus batching; this operator is part of the north_star training-data
extension (BASELINE.json input_hint), alongside dedup/similarity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X

PACK_SCHEMA = ("doc_id long, shard long, n_tokens long, "
               "bin_id long, bin_offset long")


def _pack_kernel_for(budget: int):
    """Per-shard greedy packer: rows arrive as one Arrow batch per shard;
    the loop is the sequential recurrence itself (fill_i depends on
    fill_{i-1}), so it is O(n) with no vectorizable form."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        nt = pdf["n_tokens"].to_numpy()
        bin_id = [0] * len(nt)
        bin_off = [0] * len(nt)
        b, fill = 0, 0
        for i, t in enumerate(nt):
            t = int(t)
            if i > 0 and fill + t > budget:
                b, fill = b + 1, 0
            bin_id[i], bin_off[i] = b, fill
            fill += t
        pdf["bin_id"] = pd.Series(bin_id, dtype="int64")
        pdf["bin_offset"] = pd.Series(bin_off, dtype="int64")
        return pdf[["doc_id", "shard", "n_tokens", "bin_id", "bin_offset"]]

    return kernel


def pack_sequences(docs: DataFrame, budget: int = 256,
                   n_shards: int = 8) -> DataFrame:
    """Pack ``docs(doc_id, text)`` into ``(shard, bin_id)`` context bins of
    at most ``budget`` whitespace tokens (oversized docs solo).

    Returns one row per document:
    ``doc_id, shard, n_tokens, bin_id, bin_offset`` where ``bin_offset``
    is the token offset of the document inside its bin.
    """
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.pmod(X.hash31(F.concat(F.lit("pack:"),
                                 F.col("doc_id").cast("string"))),
               F.lit(n_shards)).cast("long").alias("shard"),
        X.n_tokens(F.col("text")).cast("long").alias("n_tokens"))
    return d.groupBy("shard").applyInPandas(
        _pack_kernel_for(budget), PACK_SCHEMA)


def bin_stats(packed: DataFrame, budget: int = 256) -> DataFrame:
    """Per-bin utilisation summary (map-side-aggregable): docs per bin,
    filled tokens, and integer-permille utilisation of the budget."""
    return (packed.groupBy("shard", "bin_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("fill_tokens"))
            .withColumn("util_permille",
                        F.floor(F.lit(1000) * F.col("fill_tokens")
                                / F.lit(budget)).cast("long")))
