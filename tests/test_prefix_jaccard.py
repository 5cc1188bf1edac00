"""prefix_jaccard_pairs (AllPairs/PPJoin prefix filtering) unit semantics.

The catalog oracle (test_catalog_oracle.py / driver) proves losslessness
against a brute-force Jaccard join over the documents table; these tests
pin the operator's semantics on hand-computable inputs.
"""

from urbanistic_polygons_spark.operators.dedup import prefix_jaccard_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_pairs_above_threshold(spark):
    # A={a b c d e}, B={a b c d f}: inter=4, union=6 -> J=666 permille
    # C={a b c d e x}: vs A inter=5 union=6 -> J=833
    rows = [
        (1, "a b c d e"),
        (2, "a b c d f"),
        (3, "a b c d e x"),
    ]
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.n_a, r.n_b)
        for r in prefix_jaccard_pairs(
            _docs(spark, rows), threshold_permille=650).collect()
    }
    # J(1,2)=4/6=666, J(1,3)=5/6=833 (both >= 650); J(2,3)=4/7=571 (out)
    assert got == {
        (1, 2): (4, 5, 5),
        (1, 3): (5, 5, 6),
    }


def test_matches_brute_force_on_random_corpus(spark):
    # 40 docs over a 12-token vocabulary: dense enough that many pairs
    # clear 500 permille; compare against an in-Python brute force.
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(40):
        toks = sorted({vocab[(d * 7 + k * k) % 12] for k in range(3 + d % 6)})
        rows.append((d, " ".join(toks)))
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.n_a, r.n_b)
        for r in prefix_jaccard_pairs(
            _docs(spark, rows), threshold_permille=500).collect()
    }
    sets = {d: set(t.split()) for d, t in rows}
    want = {}
    for a in range(40):
        for b in range(a + 1, 40):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 1000 * inter >= 500 * union:
                want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert got == want
    assert len(want) > 20  # non-trivial


def test_identical_docs_and_empty_doc(spark):
    rows = [(1, "x y z"), (2, "x y z"), (3, "")]
    got = prefix_jaccard_pairs(_docs(spark, rows),
                               threshold_permille=1000).collect()
    assert len(got) == 1 and (got[0].doc_a, got[0].doc_b) == (1, 2)
    assert (got[0].inter, got[0].n_a, got[0].n_b) == (3, 3, 3)


def test_two_empty_docs_never_pair(spark):
    # empty token arrays explode_outer to a NULL item; group-collect must
    # drop it (the brute-force oracle's unnest emits nothing), otherwise
    # empty docs "pair" via NULL + array_intersect's null-safe equality
    rows = [(1, ""), (2, ""), (3, "a b")]
    got = prefix_jaccard_pairs(_docs(spark, rows),
                               threshold_permille=500).collect()
    assert got == []
