"""Semantics tests for operators/chunking.py (context-window chunking and
BPE adjacent-pair counts) and dedup.ngram_novelty — hand-computed
expectations on tiny frames; corpus-level oracle parity is covered
uncapped by tests/test_catalog_oracle.py (chunk_docs / bpe_pairs /
ngram_novelty entries)."""

import pytest
from pyspark.sql import functions as F

from urbanistic_polygons_spark.operators.chunking import (
    bpe_pair_counts, chunk_documents)
from urbanistic_polygons_spark.operators.dedup import ngram_novelty


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_chunk_windows_cover_and_overlap(spark):
    # 10 tokens, window 4, stride 3 -> starts 0,3,6 (ceil((10-4)/3)=2) + 0
    toks = [f"t{i}" for i in range(10)]
    out = (chunk_documents(_docs(spark, [("a", " ".join(toks))]),
                           window=4, stride=3)
           .orderBy("chunk_id").collect())
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[1].chunk_text == "t3 t4 t5 t6"
    assert out[2].chunk_text == "t6 t7 t8 t9"
    # every token appears in at least one chunk
    seen = set(" ".join(r.chunk_text for r in out).split())
    assert seen == set(toks)
    assert all(r.n_chunk_tokens == 4 for r in out)


def test_chunk_short_last_and_small_docs(spark):
    rows = [("short", "a b"),            # < window -> one short chunk
            ("exact", "a b c d"),        # == window -> exactly one chunk
            ("tail", "a b c d e"),       # window 4 stride 3 -> 0,1 (tail len 2)
            ("empty", "   ")]            # zero tokens -> no chunks
    out = chunk_documents(_docs(spark, rows), window=4, stride=3)
    got = {(r.doc_id, r.chunk_id): (r.n_chunk_tokens, r.chunk_text)
           for r in out.collect()}
    assert got[("short", 0)] == (2, "a b")
    assert got[("exact", 0)] == (4, "a b c d")
    assert got[("tail", 0)] == (4, "a b c d")
    assert got[("tail", 1)] == (2, "d e")
    assert not any(k[0] == "empty" for k in got)


def test_chunk_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [("a", "x")]), window=0, stride=1)


def test_bpe_pair_counts_occurrences(spark):
    # "low low low lower" -> pairs: low low (x2), low lower
    rows = [("a", "low low low lower"), ("b", "low lower"), ("c", "solo")]
    out = {r.pair: r.cnt
           for r in bpe_pair_counts(_docs(spark, rows), min_count=1).collect()}
    assert out == {"low low": 2, "low lower": 2}
    # min_count filter
    out2 = {r.pair: r.cnt
            for r in bpe_pair_counts(_docs(spark, rows), min_count=2).collect()}
    assert out2 == {"low low": 2, "low lower": 2}


def test_ngram_novelty_shared_vs_unique(spark):
    # doc a and b share their only shingle; doc c is unique
    rows = [("a", "x y z"), ("b", "x y z"), ("c", "p q r s")]
    out = {r.doc_id: (r.n_shingles, r.n_novel, r.novelty_permille)
           for r in ngram_novelty(_docs(spark, rows)).collect()}
    assert out["a"] == (1, 0, 0)
    assert out["b"] == (1, 0, 0)
    # c: shingles {p q r, q r s} both df==1
    assert out["c"] == (2, 2, 1000)
