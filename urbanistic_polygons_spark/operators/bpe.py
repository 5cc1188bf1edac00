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


def _apply_merges(vocab: DataFrame, ordered_pairs) -> DataFrame:
    """Apply a rank-ordered list of merges to every word's symbol array
    in ONE vocabulary-sized pass.

    len == 1 uses the JVM ``_merge_fold`` (stays in codegen, no Python
    boundary for the flat-count worst case); longer batches run as an
    Arrow ``mapInPandas`` kernel — the per-word loop over k merges is
    data-dependent, and the table is the vocabulary, never the corpus.
    Sequential-application semantics: pair i+1 is merged AFTER pair i
    within each word (exactly the order the one-merge-per-round loop
    would apply them)."""
    pairs = [(a, b) for a, b in ordered_pairs]
    if len(pairs) == 1:
        fold = _merge_fold(*pairs[0])
        return vocab.select("word", "freq",
                            fold(F.col("syms")).alias("syms"))

    import pandas as pd

    def _kernel(batches):
        for pdf in batches:
            out_col = []
            for syms in pdf["syms"]:
                syms = list(syms)
                for a, b in pairs:
                    out, i, n = [], 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                out_col.append(syms)
            yield pd.DataFrame({"word": pdf["word"], "freq": pdf["freq"],
                                "syms": out_col})

    return vocab.mapInPandas(
        _kernel, "word string, freq long, syms array<string>")


def learn_bpe(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text", batch: int = 64) -> DataFrame:
    """-> the learned merge table (step, left, right, merged, cnt),
    one row per merge in order.  Stops early when the best remaining
    pair occurs fewer than 2 times.

    BATCHED merge rounds (r4 verdict item 3 — the one-Spark-job-per-
    merge loop would mean 32k-100k sequential driver round-trips for a
    production vocabulary).  Each round runs ONE pair-count job,
    collects the top ``batch`` ranked candidates (scalar-size), and
    accepts a contiguous prefix of them that provably replays the
    sequential argmax order:

    1. candidates are ranked exactly like the sequential tie-break
       (cnt DESC, left ASC, right ASC);
    2. the scan stops at the first candidate sharing ANY symbol (left,
       right, or merged output string) with an already-accepted pair —
       merging (a,b) only changes counts of pairs containing a or b,
       so every still-unseen candidate's count is unchanged, and a
       contiguous symbol-disjoint prefix keeps its relative ranking;
    3. the prefix is then truncated to candidates with cnt STRICTLY
       greater than the stopping candidate's cnt (always keeping the
       top-1, which is the true argmax unconditionally).  Strictness
       closes the tie hole: a NEW pair created by an accepted merge
       (one containing the merged symbol) is count-bounded by an
       affected old pair, which — being a conflict — ranks at or after
       the stop point, so its count is <= cnt_stop < every accepted
       cnt; it can therefore never tie (and lexicographically steal)
       an accepted step.

    The accepted merges are applied in rank order in one
    vocabulary-sized pass (``_apply_merges``) behind an eager
    localCheckpoint.  Worst case (all counts tied / all candidates
    overlapping) degenerates to the old one-merge-per-round behavior;
    natural-language count distributions accept tens of merges per
    round, so a 32k-merge vocabulary is ~10^2-10^3 jobs, not 32k."""
    spark = docs.sparkSession
    vocab = word_freqs(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple] = []
    while len(merges) < n_merges:
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
        top = (ex.groupBy("pa", "pb")
               .agg(F.sum("freq").cast("long").alias("cnt"))
               .orderBy(F.desc("cnt"), F.asc("pa"), F.asc("pb"))
               .limit(max(batch, 1)).collect())       # scalar-size: <= batch
        if not top or top[0]["cnt"] < 2:
            break
        accepted: list[tuple] = []
        used: set[str] = set()
        for r in top:
            pa, pb, cnt = r["pa"], r["pb"], int(r["cnt"])
            if cnt < 2 or ({pa, pb, pa + pb} & used):
                break
            accepted.append((pa, pb, cnt))
            used |= {pa, pb, pa + pb}
            if len(merges) + len(accepted) >= n_merges:
                break
        # cnt_stop = count of the first candidate NOT accepted (the
        # conflicting one, or the first past the n_merges cap); if the
        # whole collected list was accepted, rank batch+1 is unseen —
        # bound it by the last seen count.
        if len(accepted) < len(top):
            cnt_stop = int(top[len(accepted)]["cnt"])
        elif len(top) == max(batch, 1):
            cnt_stop = int(top[-1]["cnt"])
        else:
            # the ENTIRE pair ranking was seen and accepted without a
            # conflict: no pair shares a symbol with any other, so no
            # merge affects any other count — no truncation needed
            cnt_stop = None
        if cnt_stop is not None:
            strict = [m for m in accepted if m[2] > cnt_stop]
            accepted = strict if strict else accepted[:1]
        for pa, pb, cnt in accepted:
            merges.append((len(merges), pa, pb, pa + pb, cnt))
        vocab = (_apply_merges(vocab, [(pa, pb) for pa, pb, _ in accepted])
                 .localCheckpoint(eager=True))
    schema = "step long, left string, right string, merged string, cnt long"
    return spark.createDataFrame(merges, schema)


def segment_words(vocab_after: DataFrame) -> DataFrame:
    """(word, freq, n_syms, segmentation): the post-merge symbol split —
    what the learned vocab does to each word."""
    return vocab_after.select(
        "word", "freq", F.size("syms").cast("long").alias("n_syms"),
        F.concat_ws(" ", "syms").alias("segmentation"))


def encode_bpe(docs: DataFrame, merges, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Tokenizer APPLICATION — the other half of the BPE story: apply a
    learned ranked merge table to every document (subword-nmt
    semantics: repeatedly merge the lowest-rank adjacent pair present,
    leftmost-first, until none applies — the re-scan makes merges that
    enable earlier-rank pairs fire, which a single in-order pass would
    miss on unseen words).

    -> (doc_id, n_words, n_pieces, pieces_fp) where ``pieces_fp`` is the
    md5 of the order-sensitive piece sequence — piece-stream equality
    per doc, the same shape as the span-sequence invariant.

    Scale shape: the per-word loop is data-dependent (not expressible as
    fixed JVM folds), so it runs as an Arrow ``mapInPandas`` kernel —
    but over the DISTINCT-WORD table only (vocabulary-sized, 10^5-10^7
    rows for any natural corpus), never the corpus; the ranked merge
    list is scalar-size (collected once, shipped inside the kernel
    closure — the ``_assign_lists`` pattern).  The corpus is touched
    exactly twice: the word explode and the join back against the
    encoded vocab (AQE broadcasts it when small); per-doc reassembly is
    one sort_array(collect_list) over word-count-sized groups.

    ``merges``: the DataFrame returned by :func:`learn_bpe`, or a ranked
    ``[(left, right), ...]`` list.

    Documents that tokenize to ZERO words (empty/whitespace-only text)
    are DROPPED from the output — the posexplode_outer null row is
    filtered before the join/groupBy, so such docs produce no
    ``n_words=0`` row (same contract as ``bigram_lm_score``'s sub-2-token
    drop; left-join against the doc table if total-doc coverage is
    needed).
    """
    import pandas as pd

    if isinstance(merges, DataFrame):
        rows = merges.orderBy("step").collect()       # scalar-size: one
        pair_list = [(r["left"], r["right"]) for r in rows]  # collect only
    else:
        pair_list = [(a, b) for a, b in merges]
    ranks = {p: i for i, p in enumerate(pair_list)}

    def _encode_word(word: str) -> list:
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            a, b = pair_list[best_rank]
            # merge ALL leftmost-nonoverlapping occurrences of the pair
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def _kernel(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "word": pdf["word"],
                "pieces": [_encode_word(w) for w in pdf["word"]],
            })

    tok = (docs.select(F.col(id_col).alias("doc_id"),
                       F.posexplode_outer(X.tokens(F.col(text_col)))
                       .alias("pos", "word"))
           .filter(F.col("word").isNotNull()))
    words = tok.select("word").distinct()
    encoded = words.mapInPandas(
        _kernel, "word string, pieces array<string>")
    return (tok.join(encoded, "word")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.flatten(F.array_sort(F.collect_list(
                     F.struct("pos", "pieces"))).pieces)
                 .alias("allp"))
            .select("doc_id", "n_words",
                    F.size("allp").cast("long").alias("n_pieces"),
                    F.md5(F.concat_ws("\x1f", "allp")).alias("pieces_fp")))
