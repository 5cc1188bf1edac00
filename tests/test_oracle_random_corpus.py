"""Randomized-corpus oracle gate: the driver's sf0.01 comparison runs on a
well-behaved synthetic corpus; this gate re-runs the documents-reading
catalog queries against their DuckDB oracles on seeded RANDOM corpora
packed with the boundary cases that have historically diverged the two
engines (empty text, whitespace-only docs, single tokens, exact and
near duplicates, long single-token repeats, punctuation glued to words,
mild accents) — the empty-token-array/null-key-group and
shingle-of-empty-doc traps in CLAUDE.md all came from exactly this
class of input.

Deterministic (fixed seeds, not hypothesis): each failure reproduces
bit-for-bit.  The non-documents tables are symlinked from the real
sf0.001 so any query can run; only documents.parquet is randomized."""

import os
import random

import duckdb
import pandas as pd
import pytest

from urbanistic_polygons_spark.catalog import TABLES, build_catalog

from test_catalog_oracle import canon

CATALOG = build_catalog()

# documents-reading queries spanning the distinct machinery families:
# fingerprint dedup, MinHash LSH + components, shingle Jaccard, prefix
# filtering, sub-document spans, sketches (MG / CM), winnowing, chunking,
# novelty, and the plain text-stats expressions.
DOC_QUERIES = [
    "exact_dedup_docs", "minhash_lsh_pairs", "dedup_components",
    "ngram_jaccard", "prefix_jaccard", "repeated_spans", "heavy_hitters",
    "cms_counts", "winnow_fp", "chunk_docs", "ngram_novelty", "text_stats",
    "simhash", "minhash_sig", "fuzzy_dedup", "repetition_ratio",
    "line_dedup", "pii_redact", "bpe_pairs", "pack_sequences",
    "tfidf_topk", "ngram_decontam", "token_budget_mix", "lang_id",
    "quality_score", "span_seq_fp", "spans_explode", "stratified_sample",
    "cross_source_overlap", "weighted_sample", "gopher_rules",
    "lm_score",
]
# queries whose result must be non-empty on every generated corpus (the
# generator plants exact duplicates and hot tokens); pair-finding queries
# may legitimately return zero pairs on an unlucky seed, so for those the
# check is equality only.
MUST_BE_NONEMPTY = {"exact_dedup_docs", "heavy_hitters", "cms_counts",
                    "chunk_docs", "text_stats", "gopher_rules"}

VOCAB = ["table", "row", "scan", "hash", "merge", "spark", "query",
         "café", "naïve", "end.", "mid,dle", "a", "zz",
         "longtoken" * 6]

SEEDS = [11, 23, 47]


def _gen_corpus(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(150):
        p = rng.random()
        if p < 0.05:
            text = ""                                   # empty doc
        elif p < 0.10:
            text = "   "                                # whitespace only
        elif p < 0.15:
            text = rng.choice(VOCAB)                    # single token
        elif p < 0.22:
            text = (rng.choice(VOCAB) + " ") * rng.randint(30, 80)
        elif p < 0.30 and rows:
            text = rows[rng.randrange(len(rows))][1]    # exact duplicate
        elif p < 0.38 and rows and rows[-1][1]:
            text = rows[-1][1][: max(1, 9 * len(rows[-1][1]) // 10)]
        else:
            text = " ".join(rng.choice(VOCAB)
                            for _ in range(rng.randint(1, 40)))
        if rng.random() < 0.1:
            text = text.replace(" ", "  ", 1)           # double space
        rows.append((i, text, rng.choice(["en", "de", "fr"]),
                     rng.choice(["web", "books", "code"]), len(text)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    dirs = {}
    for seed in SEEDS:
        d = tmp_path_factory.mktemp(f"rc{seed}")
        _gen_corpus(seed).to_parquet(d / "documents.parquet", index=False)
        for t in TABLES:
            if t != "documents":
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           d / f"{t}.parquet")
        dirs[seed] = str(d)
    return dirs


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("name", DOC_QUERIES)
def test_random_corpus_oracle(spark, corpus_dirs, name, seed):
    sf_dir = corpus_dirs[seed]
    spec = CATALOG[name]
    got = canon(spec["spark"](spark, sf_dir).toArrow(), name, "spark")
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        exp = canon(con.execute(spec["oracle"]).arrow(), name, "oracle")
    finally:
        con.close()
    assert list(got.columns) == list(exp.columns), (
        f"{name}@seed{seed}: columns {list(got.columns)} != "
        f"{list(exp.columns)}")
    assert len(got) == len(exp), (
        f"{name}@seed{seed}: {len(got)} rows != {len(exp)}")
    if name in MUST_BE_NONEMPTY:
        assert len(got) > 0, f"{name}@seed{seed}: empty result"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True, obj=f"{name}@{seed}")
