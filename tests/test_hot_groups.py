"""Hot-group caps in pair-generation dedup: a boilerplate shingle or an
n-times-duplicated document must not produce an O(m^2) pair explosion —
oversized groups are dropped, and the drop is observable (never silent)."""

from pyspark.sql import Observation

from urbanistic_polygons_spark.operators.dedup import (
    minhash_lsh_pairs, ngram_jaccard_pairs,
)
from urbanistic_polygons_spark.operators.similarity import embedding_near_dup

BOILER = "all rights reserved copyright notice follows here"


def _docs(spark, n=40):
    # every doc shares the BOILER prefix (hot shingles, df = n); the tail
    # makes each doc distinct so full-signature buckets stay small
    rows = [(i, f"{BOILER} unique tail {i} alpha beta gamma delta", "en")
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_ngram_jaccard_hot_shingle_capped(spark):
    docs = _docs(spark)
    obs = Observation("jac")
    pairs = ngram_jaccard_pairs(docs, threshold_permille=100,
                                max_group=8, observation=obs)
    n_pairs = pairs.count()
    got = obs.get
    assert got["dropped_groups"] > 0          # the boiler shingles
    assert got["dropped_members"] >= got["dropped_groups"] * 9
    # without the boiler shingles no pair reaches 10% Jaccard
    assert n_pairs == 0


def test_ngram_jaccard_uncapped_differs(spark):
    docs = _docs(spark)
    capped = ngram_jaccard_pairs(docs, threshold_permille=100,
                                 max_group=8).count()
    uncapped = ngram_jaccard_pairs(docs, threshold_permille=100,
                                   max_group=10_000).count()
    assert uncapped > capped  # the cap really dropped hot groups


def test_minhash_lsh_hot_bucket_capped(spark):
    # 30 byte-identical docs -> identical signatures -> every band bucket
    # holds all 30 members
    rows = [(i, "same exact duplicated text body here ok", "en")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    obs = Observation("lsh")
    pairs = minhash_lsh_pairs(docs, k=16, bands=8, max_group=8,
                              observation=obs)
    assert pairs.count() == 0                 # all buckets over the cap
    got = obs.get
    assert got["dropped_groups"] == 8         # one per band
    assert got["dropped_members"] == 8 * 30


def test_embedding_near_dup_hot_bucket_capped(spark):
    # identical vectors all land in one bucket
    rows = [(i, [0.5, -0.25, 0.125, 1.0]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    obs = Observation("emb")
    pairs = embedding_near_dup(emb, n_planes=4, max_bucket=8,
                               observation=obs)
    assert pairs.count() == 0
    got = obs.get
    assert got["dropped_buckets"] == 1
    assert got["dropped_members"] == 20


def test_embedding_near_dup_pairs_found(spark):
    # two identical + distinct others: the identical pair must surface with
    # the exact integer self-dot
    vecs = [(0, [0.5, 0.5, 0.5, 0.5]), (1, [0.5, 0.5, 0.5, 0.5]),
            (2, [-1.0, 0.3, -0.2, 0.9]), (3, [0.1, -0.8, 0.7, -0.3])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    pairs = embedding_near_dup(emb, n_planes=2, min_dot=0).toPandas()
    match = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert len(match) == 1
    assert int(match.iloc[0]["dot"]) == 4 * 500 * 500


def test_near_dup_components(spark):
    from urbanistic_polygons_spark.operators.dedup import near_dup_components
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4),          # chain 1-2-3-4
         (10, 11),                         # pair
         (20, 21), (21, 22), (22, 20)],    # triangle
        "doc_a long, doc_b long")
    got = {(r.doc_id, r.component)
           for r in near_dup_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20)}


def test_winnow_fingerprints_semantics(spark):
    """Winnowing invariants: shared long runs of tokens produce shared
    fingerprints (plagiarism-detection property); disjoint texts share
    none; short docs fall back to a single hash."""
    from pyspark.sql import functions as F

    from urbanistic_polygons_spark.functions import text as X

    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "intro words alpha beta gamma delta epsilon zeta eta theta"),
            (3, "completely different content with other tokens here"),
            (4, "tiny doc")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    tok = d.select("doc_id", X.tokens(F.col("text")).alias("toks"))
    hs = tok.select("doc_id", X.winnow_token_hashes(F.col("toks")).alias("hs"))
    g = hs.select("doc_id", X.winnow_from_hashes(F.col("hs")).alias("grams"))
    fps = {r.doc_id: set(r.fps) for r in
           g.select("doc_id", X.winnow_windows(F.col("grams")).alias("fps"))
           .collect()}
    assert fps[1] & fps[2]           # shared run -> shared fingerprints
    assert not (fps[1] & fps[3])     # disjoint texts -> no overlap
    assert len(fps[4]) == 1          # < k tokens -> single-hash fallback


def test_star_contraction_long_chain(spark):
    """r3 verdict item 10: a 10^4-node chain (diameter 10^4 — the
    propagate loop's worst case) converges under algorithm='star' within
    16 alternations (O(log^2 n)) to the single component labeled by the
    minimum node id."""
    from pyspark.sql import functions as F

    from urbanistic_polygons_spark.operators.dedup import near_dup_components

    pairs = spark.range(9999).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    out = near_dup_components(pairs, max_rounds=16,
                              algorithm="star").toPandas()
    assert len(out) == 10000
    assert set(out.doc_id) == set(range(10000))
    assert (out.component == 0).all()


def test_star_contraction_matches_propagate(spark):
    """Star and propagate agree exactly (same min-id component semantics)
    on a multi-component graph with chains, cliques and singetons-by-merge,
    for numeric AND string ids."""
    from pyspark.sql import functions as F

    from urbanistic_polygons_spark.operators.dedup import near_dup_components

    raw = [(0, 1), (1, 2), (2, 3),          # chain -> comp 0
           (10, 11), (11, 12), (10, 12),    # triangle -> comp 10
           (20, 21),                        # pair -> comp 20
           (3, 0)]                          # cycle back
    pairs = spark.createDataFrame(raw, "doc_a long, doc_b long")
    star = {(r.doc_id, r.component)
            for r in near_dup_components(pairs, algorithm="star").collect()}
    prop = {(r.doc_id, r.component)
            for r in near_dup_components(pairs).collect()}
    assert star == prop

    spairs = pairs.select(F.concat(F.lit("n"), F.format_string("%02d", "doc_a")).alias("doc_a"),
                          F.concat(F.lit("n"), F.format_string("%02d", "doc_b")).alias("doc_b"))
    star_s = {(r.doc_id, r.component)
              for r in near_dup_components(spairs, algorithm="star").collect()}
    prop_s = {(r.doc_id, r.component)
              for r in near_dup_components(spairs).collect()}
    assert star_s == prop_s
