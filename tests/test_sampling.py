"""Weighted priority sampling: determinism, inclusion monotonicity, and
the hash-priority formula vs a Python reference."""
import hashlib

from urbanistic_polygons_spark.operators.sampling import (SCALE,
                                                          weighted_sample)


def py_priority(key, w):
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 2147483647
    return (h * SCALE) // max(w, 1)


def test_formula_matches_python_reference(spark):
    rows = [(i, (i * 37) % 500 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, "doc_id", "w", k=200).collect()
    for r in got:
        assert r["priority"] == py_priority(r["key"], r["weight"]), r
    # k smallest, ordered
    pris = [r["priority"] for r in got]
    assert pris == sorted(pris)


def test_exact_k_and_determinism(spark):
    rows = [(i, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = [r["key"] for r in weighted_sample(df, "doc_id", "w", 7).collect()]
    b = [r["key"] for r in
         weighted_sample(df.repartition(13), "doc_id", "w", 7).collect()]
    assert len(a) == 7 and a == b  # partitioning-independent


def test_weight_monotonicity(spark):
    # same key set, one row's weight boosted -> its priority divides down,
    # so it can only move INTO the sample, never out
    base = [(i, 10) for i in range(50)]
    df = spark.createDataFrame(base, "doc_id long, w long")
    small = {r["key"] for r in
             weighted_sample(df, "doc_id", "w", 10).collect()}
    outsider = sorted(set(range(50)) - small)[0]
    boosted = [(i, 10 ** 6 if i == outsider else w) for i, w in base]
    df2 = spark.createDataFrame(boosted, "doc_id long, w long")
    big = {r["key"] for r in weighted_sample(df2, "doc_id", "w", 10).collect()}
    assert outsider in big


def test_zero_weight_guard(spark):
    df = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, w long")
    got = {r["key"]: r["priority"]
           for r in weighted_sample(df, "doc_id", "w", 2).collect()}
    assert got[1] == py_priority(1, 0)  # max(w,1): no div-by-zero
