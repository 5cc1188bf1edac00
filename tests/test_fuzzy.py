"""Semantics tests for operators/fuzzy.py (blocked Levenshtein near-dup
pairs): known distances, blocking scope, length-bound prefilter, and the
hot-block cap with observation counters.  Catalog-level oracle parity
(fuzzy_dedup) is covered by tests/test_catalog_oracle.py."""

from pyspark.sql import Observation

from urbanistic_polygons_spark.operators.fuzzy import edit_distance_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, lang string, text string")


def test_known_distances_and_case_fold(spark):
    rows = [("a", "en", "kitten and dog"),
            ("b", "en", "SITTING and dog"),   # lev(lower) = 3
            ("c", "en", "kitten and dog"),    # identical -> 0
            ("d", "en", "totally different text here")]
    out = {(r.doc_a, r.doc_b): r.lev
           for r in edit_distance_pairs(
               _docs(spark, rows), max_dist=5, len_bucket=64,
               max_group=64).collect()}
    assert out[("a", "b")] == 3
    assert out[("a", "c")] == 0
    assert out[("b", "c")] == 3
    assert not any("d" in k for k in out)
    # ordered pairs, each exactly once
    assert all(a < b for a, b in out)


def test_blocking_scope_lang_and_length(spark):
    # same text, different lang -> different block -> never compared
    rows = [("a", "en", "abcdef"), ("b", "fr", "abcdef"),
            # same lang, lengths straddling the bucket boundary -> split
            ("c", "en", "x" * 63), ("d", "en", "x" * 65)]
    out = edit_distance_pairs(_docs(spark, rows), max_dist=16,
                              len_bucket=64, max_group=64).collect()
    assert out == []


def test_length_bound_prefilter(spark):
    # |len diff| > max_dist -> excluded even inside one block
    rows = [("a", "en", "x" * 10), ("b", "en", "x" * 30)]
    out = edit_distance_pairs(_docs(spark, rows), max_dist=5,
                              len_bucket=64, max_group=64).collect()
    assert out == []
    # but within the bound the pure-insertion distance is exact
    out2 = edit_distance_pairs(_docs(spark, rows), max_dist=20,
                               len_bucket=64, max_group=64).collect()
    assert [(r.doc_a, r.doc_b, r.lev) for r in out2] == [("a", "b", 20)]


def test_hot_block_cap_drops_and_counts(spark):
    rows = [(f"d{i:02d}", "en", "same text") for i in range(5)]
    obs = Observation("fuzzy")
    out = edit_distance_pairs(_docs(spark, rows), max_dist=2,
                              len_bucket=64, max_group=4,
                              observation=obs).collect()
    assert out == []  # block of 5 > cap 4 -> dropped entirely
    got = obs.get
    assert got["dropped_blocks"] == 1 and got["dropped_members"] == 5
