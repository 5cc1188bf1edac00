"""Integer TF-IDF retrieval (operators/retrieval.py): closed-form scores
on a tiny corpus, tie-break determinism, and the absent-term edge.  The
catalog entry ``tfidf_topk`` is additionally hash-compared against the
DuckDB oracle at sf0.01 by test_catalog_oracle.py."""

import pandas as pd

from urbanistic_polygons_spark.operators.retrieval import SCALE, tfidf_topk


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts}))


def test_tfidf_closed_form(spark):
    docs = _docs(spark, [
        "spark spark join",     # tf(spark)=2
        "spark table",          # tf(spark)=1
        "join merge table",     # tf(merge)=1
        "sort filter",          # no hits
    ])
    out = {r["doc_id"]: r["score"]
           for r in tfidf_topk(docs, ["spark", "merge"], k=10).collect()}
    n = 4
    w_spark = n * SCALE // 2   # df(spark)=2
    w_merge = n * SCALE // 1   # df(merge)=1
    assert out == {1: 2 * w_spark, 2: w_spark, 3: w_merge}


def test_tfidf_tiebreak_and_k(spark):
    docs = _docs(spark, ["spark", "spark", "spark"])
    got = [r["doc_id"] for r in tfidf_topk(docs, ["spark"], k=2).collect()]
    assert got == [1, 2]  # equal scores -> ascending doc_id, k enforced


def test_tfidf_absent_terms(spark):
    docs = _docs(spark, ["table join", "sort scan"])
    assert tfidf_topk(docs, ["nosuchterm"], k=5).count() == 0
