"""Eval-set n-gram decontamination: planted-overlap unit tests."""
from urbanistic_polygons_spark.operators.decontam import ngram_decontaminate


def test_decontam_planted(spark):
    corpus = spark.createDataFrame([
        # embeds the full eval item e1 (many shared 3-grams)
        (1, "intro words the quick brown fox jumps over outro words"),
        # shares exactly one 3-gram with e2
        (2, "completely different until lazy dog sleeps appears here"),
        # clean
        (3, "nothing in common with any held out item at all"),
        # shares grams with BOTH eval docs
        (4, "the quick brown fox and lazy dog sleeps together"),
    ], "doc_id long, text string")
    evalset = spark.createDataFrame([
        (100, "the quick brown fox jumps"),
        (200, "lazy dog sleeps soundly"),
    ], "doc_id long, text string")

    got = {r["doc_id"]: (r["n_hit_ngrams"], r["n_eval_docs"])
           for r in ngram_decontaminate(corpus, evalset).collect()}

    # e1 grams: {the quick brown, quick brown fox, brown fox jumps}
    # doc 1 contains all 3; doc 4 contains the first two
    # e2 grams: {lazy dog sleeps, dog sleeps soundly}
    # doc 2 and doc 4 each contain 'lazy dog sleeps'
    assert got == {
        1: (3, 1),
        2: (1, 1),
        4: (3, 2),
    }


def test_decontam_short_eval_doc(spark):
    # eval doc with < 3 tokens shingles to its whole text; only an exact
    # whole-phrase... actually the corpus shingle must EQUAL that 2-token
    # string, which a 3-gram shingle never does unless the corpus doc is
    # itself short
    corpus = spark.createDataFrame([
        (1, "tiny pair"),
        (2, "tiny pair of words"),
    ], "doc_id long, text string")
    evalset = spark.createDataFrame([(9, "tiny pair")],
                                    "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hit_ngrams"], r["n_eval_docs"])
           for r in ngram_decontaminate(corpus, evalset).collect()}
    assert got == {1: (1, 1)}
