"""BPE vocabulary induction (Sennrich et al., ACL'16) — the iterative
merge-learning loop on top of the counting step in ``chunking.py``.

The scale trick is WHERE the loop runs: the corpus is first compressed
to the (word, freq) vocabulary — ONE corpus-wide groupBy, after which
the corpus is never touched again — and every merge round operates on
the vocab table only (10^5-10^7 rows for any natural corpus, vs 10^12
corpus rows).  Each round is:

1. adjacent symbol-pair counts weighted by word freq (explode + one
   partial-aggregable groupBy over the vocab);
2. the argmax pair — max count, lexicographic (left, right) tie-break —
   collected as ONE scalar row;
3. leftmost-nonoverlapping merge of that pair inside every word's
   symbol array, as a JVM ``F.aggregate`` left fold (carry-one-symbol
   accumulator; arrays are word-length, so the interpreted HOF touches
   ~10 elements per word — scalar-size per row, the allowed HOF case);
4. eager ``localCheckpoint`` to cut the per-round plan growth
   (iterative-loop repo rule).

Deterministic: pure function of the corpus multiset — counts are exact,
ties break lexicographically, and the fold is position-defined.  Rounds
stop early when no pair occurs twice.

Verified against an independent pure-Python BPE reference in
``tests/test_bpe.py`` (same corpus, merge-by-merge equality).
Reference analog: none (geometry engine); LLM-pipeline surface
(SURVEY §2.8), sibling of ``chunking.bpe_pair_counts``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms): corpus vocabulary with each word split into
    its initial character symbols plus the </w> end marker."""
    w = (docs.select(F.explode_outer(X.tokens(F.col(text_col)))
                     .alias("word"))
         .filter(F.col("word").isNotNull() & (F.length("word") > 0))
         .groupBy("word").agg(F.count("*").cast("long").alias("freq")))
    return w.withColumn(
        "syms",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit("</w>"))))


def _merge_fold(a: str, b: str):
    """Leftmost-nonoverlapping merge of the adjacent pair (a, b) in a
    symbol array, as one aggregate fold: the accumulator carries the
    output array plus the one pending symbol; '' marks "no carry"
    (symbols are never empty by construction)."""
    merged = a + b
    init = F.struct(F.array().cast("array<string>").alias("out"),
                    F.lit("").alias("carry"))

    def step(acc, s):
        is_pair = (acc["carry"] == F.lit(a)) & (s == F.lit(b))
        return F.struct(
            F.when(is_pair,
                   F.concat(acc["out"], F.array(F.lit(merged))))
            .when(acc["carry"] == F.lit(""), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["carry"])))
            .alias("out"),
            F.when(is_pair, F.lit("")).otherwise(s).alias("carry"))

    def finish(acc):
        return F.when(acc["carry"] == F.lit(""), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"])))

    return lambda col: F.aggregate(col, init, step, finish)


def learn_bpe(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """-> the learned merge table (step, left, right, merged, cnt),
    one row per merge in order.  Stops early when the best remaining
    pair occurs fewer than 2 times."""
    spark = docs.sparkSession
    vocab = word_freqs(docs, text_col).localCheckpoint(eager=True)
    merges = []
    for step_i in range(n_merges):
        pairs = vocab.select(
            "freq", F.col("syms").alias("l"),
            F.expr("slice(syms, 2, size(syms) - 1)").alias("r"))
        ex = (pairs.select(
            "freq",
            F.posexplode_outer(F.zip_with(
                "l", "r", lambda x, y: F.struct(x.alias("pa"),
                                                y.alias("pb"))))
            .alias("pos", "p"))
            .filter(F.col("p.pb").isNotNull())
            .select(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"),
                    "freq"))
        best = (ex.groupBy("pa", "pb")
                .agg(F.sum("freq").cast("long").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pa"), F.asc("pb"))
                .limit(1).collect())
        if not best or best[0]["cnt"] < 2:
            break
        pa, pb, cnt = best[0]["pa"], best[0]["pb"], int(best[0]["cnt"])
        merges.append((step_i, pa, pb, pa + pb, cnt))
        fold = _merge_fold(pa, pb)
        vocab = (vocab.select("word", "freq", fold(F.col("syms"))
                              .alias("syms"))
                 .localCheckpoint(eager=True))
    schema = "step long, left string, right string, merged string, cnt long"
    return spark.createDataFrame(merges, schema)


def segment_words(vocab_after: DataFrame) -> DataFrame:
    """(word, freq, n_syms, segmentation): the post-merge symbol split —
    what the learned vocab does to each word."""
    return vocab_after.select(
        "word", "freq", F.size("syms").cast("long").alias("n_syms"),
        F.concat_ws(" ", "syms").alias("segmentation"))
