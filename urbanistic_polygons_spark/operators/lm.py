"""Corpus-trained bigram-LM surprisal scoring — the CCNet-style quality
signal (Wenzek et al., LREC'20 train an LM and keep low-perplexity
text; Gopher/MassiveText use the same shape).  Here the LM is trained
on the corpus itself in the same job, and the per-token "log prob" is
the integer BIT LENGTH of the counts, so the whole score is exact
BIGINT arithmetic and the DuckDB oracle reproduces it bit-for-bit:

    surprisal(doc) = sum over bigram occurrences (w1, w2) of
                     bitlen(c(w1, ·)) - bitlen(c(w1, w2))

— a floored integer log2 of the conditional 1/P(w2 | w1).  Common
continuations ("of the") contribute ~0 bits; rare ones contribute the
count ratio's magnitude.  High bits-per-bigram = unusual text (the
perplexity analog); `length(bin(v))` is the exact bit length in BOTH
engines (repo rule), so no float log ever enters.

Scale shape: the bigram occurrence table is materialized ONCE
(localCheckpoint — it feeds three consumers: the unigram-left
aggregation, the bigram aggregation, and the final scoring join; repo
two-consumer rule).  Both count tables are vocabulary-keyed and NARROW
(key + one small int — the posting-width rule), so the two scoring
joins shuffle the corpus occurrences against vocabulary-sized sides;
a hot bigram is a 1:N hash-join fan-out (AQE-splittable), never a
pair blowup.  No collect anywhere; one final partial-aggregable
per-doc sum.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def bigram_lm_score(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_bigrams, surprisal_bits, bits_permille) for every
    document with at least one bigram (sub-2-token docs have no defined
    conditional and are dropped, mirrored by the oracle)."""
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        X.tokens(F.col(text_col)).alias("toks"))
            .withColumn("n", F.size("toks"))
            .filter(F.col("n") >= 2))
    # shifted-slice zip (the bpe_pair_counts pattern): ltoks is one
    # longer, zip_with pads with NULL — the pad row is dropped below by
    # the w2 null filter (tokens themselves are never null/empty)
    shifted = toks.select(
        "doc_id",
        F.col("toks").alias("ltoks"),
        F.expr("slice(toks, 2, n - 1)").alias("rtoks"))
    occ = (shifted.select(
               "doc_id",
               F.explode_outer(F.arrays_zip("ltoks", "rtoks")).alias("bg"))
           .select("doc_id",
                   F.col("bg.ltoks").alias("w1"),
                   F.col("bg.rtoks").alias("w2"))
           .where(F.col("w2").isNotNull())
           .localCheckpoint(eager=True))
    blen = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
    uni = (occ.groupBy("w1")
           .agg(blen(F.count("*")).alias("bu")))
    big = (occ.groupBy("w1", "w2")
           .agg(blen(F.count("*")).alias("bb")))
    return (occ.join(big, ["w1", "w2"]).join(uni, ["w1"])
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum(F.col("bu") - F.col("bb")).cast("long")
                 .alias("surprisal_bits"))
            .withColumn(
                "bits_permille",
                F.expr("surprisal_bits * 1000 DIV n_bigrams")
                .cast("long")))
