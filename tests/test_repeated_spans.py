"""repeated_substring_spans (Lee et al. 2022 token-gram form) semantics.

The catalog oracle (test_catalog_oracle.py / driver) checks the full
gaps-and-islands SQL at sf0.01; these pin hand-computable cases.
"""

from urbanistic_polygons_spark.operators.dedup import (
    repeated_substring_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(spark, rows, k=5):
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens, r.n_grams)
        for r in repeated_substring_spans(_docs(spark, rows), k=k).collect()
    }


def test_cross_doc_shared_run(spark):
    # doc 2 contains doc 1's tokens 2..8 (0-based): shared 5-grams sit at
    # doc-1 positions 2,3,4 -> one span [2, 8] (7 tokens, 3 grams); in
    # doc 2 the same grams sit at positions 0,1,2 -> span [0, 6].
    d1 = "t0 t1 s0 s1 s2 s3 s4 s5 s6 t9 t10"
    d2 = "s0 s1 s2 s3 s4 s5 s6 u7 u8 u9"
    got = _spans(spark, [(1, d1), (2, d2)])
    assert got == {
        (1, 2, 8, 7, 3),
        (2, 0, 6, 7, 3),
    }


def test_within_doc_repeat_merges_across_gap(spark):
    # "a b c d e f a b c d e f": grams at pos 0,1 repeat at pos 6,7.
    # pos 6 <= 1 + k(5), so the covered runs touch -> ONE span [0, 11].
    got = _spans(spark, [(1, "a b c d e f a b c d e f")])
    assert got == {(1, 0, 11, 12, 4)}


def test_split_spans_and_no_dup_doc(spark):
    # two shared 5-gram regions separated by > k unique tokens -> TWO
    # spans in doc 1; doc 3 shares nothing and emits no rows.
    d1 = "s0 s1 s2 s3 s4 x0 x1 x2 x3 x4 x5 x6 q0 q1 q2 q3 q4"
    d2 = "s0 s1 s2 s3 s4 y0 y1 q0 q1 q2 q3 q4"
    d3 = "z0 z1 z2 z3 z4 z5 z6 z7"
    got = _spans(spark, [(1, d1), (2, d2), (3, d3)])
    assert got == {
        (1, 0, 4, 5, 1), (1, 12, 16, 5, 1),
        (2, 0, 4, 5, 1), (2, 7, 11, 5, 1),
    }


def test_short_docs_excluded(spark):
    # < k tokens: no grams, no spans, no crash
    got = _spans(spark, [(1, "a b c"), (2, "a b c")])
    assert got == set()
