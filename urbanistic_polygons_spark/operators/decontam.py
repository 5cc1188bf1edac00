"""Eval-set n-gram decontamination — flag training docs that leak
benchmark content.

The standard pretraining hygiene step (GPT-3 appendix C / PaLM /
Llama-style): a training document is CONTAMINATED if it shares at least
one token n-gram with any document of a held-out evaluation set.  The
repo already covers duplicate-level contamination
(``cross_source_overlap`` — exact fingerprint matches across sources);
this operator covers the much finer n-gram-overlap criterion that
catches partial quotes and embedded eval items.

Spark-first shape — the eval side is SMALL by construction (an eval
suite is thousands of docs, the corpus is billions), so the plan is the
classic asymmetric semi-join:

1. eval docs -> distinct n-gram shingles (``dedup.shingles_of_tokens``,
   the exact machinery the dedup stack shuffles on) — a set that is
   tiny relative to the corpus;
2. ``broadcast`` that set and INNER-join the corpus's exploded distinct
   shingles against it: the corpus-sized stream is filtered map-side to
   |hits| rows before the only shuffle (the per-doc aggregation);
3. aggregate per corpus doc: how many distinct n-grams hit, and how many
   distinct eval docs are implicated (the triage signal: 1 eval doc ×
   many grams = embedded item; many eval docs × 1 gram each = a common
   phrase worth allow-listing).

Scale note (100 TB): if the eval shingle set outgrows a broadcast
(~10^8+ grams), drop the hint and let AQE pick a shuffle join, or ship a
runtime Bloom filter first and keep the exact join as the verify pass —
the semantics here don't change, only the join strategy.  The corpus
side never self-joins and is never collected.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _exploded_shingles


def ngram_decontaminate(corpus: DataFrame, evalset: DataFrame,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_hit_ngrams, n_eval_docs) for every corpus doc
    sharing >= 1 token 3-gram shingle with any eval doc."""
    # NOTE: no corpus-side dropDuplicates — that would shuffle the FULL
    # corpus shingle set before the broadcast filter.  The final
    # count_distinct aggregation absorbs duplicate (doc, shingle) rows,
    # so the only corpus-wide shuffle stays the per-doc hit agg.
    corp = _exploded_shingles(corpus, id_col, text_col)
    ev = (_exploded_shingles(
            evalset.select(F.col(id_col).alias("eval_id"),
                           F.col(text_col)),
            "eval_id", text_col)
          .dropDuplicates(["eval_id", "sh"]))
    hits = corp.join(F.broadcast(ev), "sh")
    return (hits.groupBy(id_col)
            .agg(F.count_distinct("sh").cast("long").alias("n_hit_ngrams"),
                 F.count_distinct("eval_id").cast("long")
                 .alias("n_eval_docs")))
