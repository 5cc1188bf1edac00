"""Misra-Gries heavy hitters: merge-rule units, the frequency guarantee
on skewed streams, exactness of the verified output, and partitioning
invariance (the sketch is partition-dependent; the OUTPUT must not be)."""
import collections

import pytest

from urbanistic_polygons_spark.operators.sketches import mg_merge


def _expected(tokens, k):
    n = len(tokens)
    c = collections.Counter(tokens)
    return {t: m for t, m in c.items() if m * (k + 1) > n}


def test_mg_merge_reduces_to_k_and_keeps_order():
    counts = {f"t{i}": 100 - i for i in range(10)}
    out = mg_merge(counts, 4)
    assert len(out) <= 4
    # the heaviest items survive with counts reduced by the (k+1)-th
    # largest (= 96 here); t4's counter hits zero and is dropped
    assert out == {"t0": 100 - 96, "t1": 99 - 96, "t2": 98 - 96,
                   "t3": 97 - 96}


def test_mg_merge_noop_when_small():
    counts = {"a": 3, "b": 1}
    assert mg_merge(counts, 4) == counts


def test_guarantee_and_exact_counts(spark):
    from urbanistic_polygons_spark.operators.sketches import heavy_hitters
    # zipf: token i appears 2000/(i+1) times, plus a long uniform tail —
    # the head is a constant fraction of n, so both k=8 and k=32 have
    # non-trivial hitters above n/(k+1)
    tokens = []
    for i in range(50):
        tokens += [f"hot{i}"] * (2000 // (i + 1))
    tokens += [f"tail{j}" for j in range(5000)]
    assert _expected(tokens, 8) and len(_expected(tokens, 32)) >= 3
    # deterministic interleave so hot items are spread across partitions
    tokens.sort(key=lambda t: hash(t) % 9973)
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    for k in (8, 32):
        got = {r["token"]: r["cnt"]
               for r in heavy_hitters(df.repartition(16), "token",
                                      k=k).collect()}
        assert got == _expected(tokens, k), k


def test_partitioning_invariance(spark):
    from urbanistic_polygons_spark.operators.sketches import heavy_hitters
    tokens = (["x"] * 400 + ["y"] * 150 + ["z"] * 90
              + [f"t{j}" for j in range(300)])
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    outs = []
    for parts in (1, 7, 32):
        rows = heavy_hitters(df.repartition(parts), "token", k=5).collect()
        outs.append(sorted((r["token"], r["cnt"]) for r in rows))
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == sorted(_expected(tokens, 5).items())


def test_no_hitters_above_threshold(spark):
    from urbanistic_polygons_spark.operators.sketches import heavy_hitters
    # perfectly uniform: nothing exceeds n/(k+1) for k=3 (each freq = n/8)
    tokens = [f"u{j}" for j in range(8)] * 10
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    assert heavy_hitters(df, "token", k=3).count() == 0


def test_hll_estimate_accuracy_and_invariance(spark):
    from urbanistic_polygons_spark.operators.sketches import hll_distinct
    # two groups with very different cardinalities; values repeated so the
    # estimate must be cardinality- (not row-)driven
    rows = ([("big", f"k{j}") for j in range(2000)] * 2
            + [("small", f"s{j}") for j in range(40)] * 3)
    df = spark.createDataFrame(rows, "grp string, key string")
    outs = []
    for parts in (1, 13):
        got = {r.grp: r for r in
               hll_distinct(df.repartition(parts), "key", ["grp"]).collect()}
        outs.append({g: (r.n_exact, r.n_buckets, r.s_scaled, r.hll_est)
                     for g, r in got.items()})
    # registers are an algebraic MAX aggregation: partitioning-invariant
    assert outs[0] == outs[1]
    got = outs[0]
    assert got["big"][0] == 2000 and got["small"][0] == 40
    # m=64 raw HLL: std error ~13%; assert a generous 3-sigma band for
    # the large group (the small group sits in the uncorrected
    # small-range regime — only sanity-bound it)
    assert 0.6 * 2000 <= got["big"][3] <= 1.4 * 2000
    assert 0 < got["small"][3] <= 5 * 40
    # registers bounded by m
    assert got["big"][1] <= 64 and got["small"][1] <= 64


def test_cms_guarantee_and_exactness(spark):
    """CM one-sided guarantee: cnt <= est <= cnt + n/w per row (d rows of
    min tighten it); on a stream wider than w the sketch must actually
    collide (err > 0 somewhere) yet never undercount."""
    from pyspark.sql import functions as F
    from urbanistic_polygons_spark.operators.sketches import (
        CMS_W, cms_estimates, cms_table)
    tokens = []
    for i in range(40):
        tokens += [f"hot{i}"] * (500 // (i + 1))
    tokens += [f"tail{j}" for j in range(3 * CMS_W)]  # force collisions
    df = spark.createDataFrame([(t,) for t in tokens], ["token"])
    out = cms_estimates(df, probe_mod=5).toPandas()
    n = len(tokens)
    assert len(out) > 10
    assert (out.err >= 0).all()                      # never undercounts
    assert (out.est <= out.cnt + n // CMS_W * 4).all()  # loose upper bound
    exact = collections.Counter(tokens)
    assert all(exact[r.token] == r.cnt for r in out.itertuples())
    # the 4x512 table is bounded regardless of input size
    assert cms_table(df).count() <= 4 * CMS_W


def test_cms_partitioning_invariance(spark):
    """The table (and therefore every estimate) is a pure function of the
    input multiset — repartitioning must not change a single cell."""
    from urbanistic_polygons_spark.operators.sketches import cms_table
    tokens = [(f"t{i % 97}",) for i in range(2000)]
    df = spark.createDataFrame(tokens, ["token"])
    a = {(r.r, r.b): r.c for r in cms_table(df.repartition(1)).collect()}
    b = {(r.r, r.b): r.c for r in cms_table(df.repartition(16)).collect()}
    assert a == b and len(a) > 0
