"""Context-window chunking and BPE-style pair statistics for the
training-data pipeline.

Both operators are pure map-side token-array manipulation (JVM Column
expressions end-to-end — the only shuffle in :func:`bpe_pair_counts` is
the final partial-aggregable count).  Reference workload analog: the
per-way tag/geometry span decomposition the reference performs per tile
(``src/ANYWAYS.UrbanisticPolygons/Tiles/TileStatic.cs`` quantization
loop) — here applied to the document corpus the engine's LLM-pipeline
side processes.

Scale notes (100 TB):
- :func:`chunk_documents` emits ~n_tokens/stride rows per doc with NO
  shuffle at all — chunk rows inherit the scan partitioning, so a
  downstream writer sees the same parallelism as the scan.
- :func:`bpe_pair_counts` shuffles only (pair, partial-count) rows after
  map-side combine: the reduce-side key space is the distinct adjacent
  pair vocabulary, not the corpus.  The ``min_count`` filter happens
  post-aggregation (a pre-filter would need the same aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def chunk_documents(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", window: int = 32,
                    stride: int = 24) -> DataFrame:
    """Split each document into overlapping token windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + window)``; the last
    chunk may be shorter (slice clamps at the end of the document) and
    chunk starts run through ``ceil((n_tokens - window) / stride)`` so
    every token lands in at least one chunk.  Zero-token documents emit
    no chunks.

    Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text) — all exactly
    reproducible in the DuckDB oracle (integer arithmetic + string join).

    Perf: tokens and chunk-start sequence are materialized as columns
    BEFORE any higher-order function consumes them (HOF lambdas are
    interpreted and re-evaluate referenced expressions per element — see
    dedup.shingles_of_tokens).  ``explode_outer`` avoids the
    InferFiltersFromGenerate pushdown trap; the start sequence is never
    empty for n_tokens > 0 rows, which the filter below guarantees.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = (docs.select(F.col(id_col), X.tokens(F.col(text_col)).alias("toks"))
            .withColumn("n", F.size("toks"))
            .filter(F.col("n") > 0))
    # number of extra chunks past the first: ceil(max(n - window, 0) / stride)
    extra = F.floor((F.greatest(F.col("n") - F.lit(window), F.lit(0))
                     + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    starts = toks.withColumn("starts", F.sequence(F.lit(0), extra))
    ex = starts.select(
        id_col, "toks", "n",
        F.explode_outer("starts").alias("chunk_id"))
    chunk = F.slice(F.col("toks"), F.col("chunk_id") * F.lit(stride) + F.lit(1),
                    F.lit(window))
    return (ex.withColumn("chunk", chunk)
            .select(F.col(id_col),
                    F.col("chunk_id").cast("long").alias("chunk_id"),
                    F.size("chunk").cast("long").alias("n_chunk_tokens"),
                    F.concat_ws(" ", "chunk").alias("chunk_text")))


def bpe_pair_counts(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    min_count: int = 2) -> DataFrame:
    """Corpus-wide adjacent token-pair frequencies — the counting step of
    one BPE vocabulary-induction round (Sennrich et al., ACL'16): the
    highest-count pair is the next merge candidate.

    Output: (pair, cnt) for every adjacent pair occurring at least
    ``min_count`` times, where ``pair`` is ``left || ' ' || right``.
    Counts are per OCCURRENCE (a pair repeated inside one document counts
    each time), matching the BPE definition.

    Plan: tokens materialized, the two shifted slices materialized, then
    one interpreted zip_with whose lambda only concatenates its element
    arguments (scalar work per element — the trap is referencing outer
    expressions, not using element vars).  One partial-aggregable groupBy.
    """
    toks = (docs.select(F.col(id_col), X.tokens(F.col(text_col)).alias("toks"))
            .withColumn("n", F.size("toks"))
            .filter(F.col("n") >= 2))
    shifted = toks.select(
        id_col,
        F.col("toks").alias("ltoks"),
        F.expr("slice(toks, 2, n - 1)").alias("rtoks"),
        "n")
    # ltoks is 1 longer than rtoks; zip_with pads the short side with
    # NULL, and concat_ws skips nulls, so the LAST zipped element is the
    # lone final ltok — dropped by POSITION (pos < n-1), not by value.
    pairs = shifted.withColumn(
        "pairs", F.zip_with("ltoks", "rtoks",
                            lambda a, b: F.concat_ws(" ", a, b)))
    ex = (pairs.select(
        F.col(id_col), F.col("n"),
        F.posexplode_outer("pairs").alias("pos", "pair"))
        .filter(F.col("pos") < F.col("n") - 1))
    return (ex.groupBy("pair")
            .agg(F.count("*").cast("long").alias("cnt"))
            .filter(F.col("cnt") >= min_count))
