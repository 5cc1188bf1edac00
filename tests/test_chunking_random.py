"""Randomized cross-check for operators/chunking.py: 240 seeded random
documents (varied token counts incl. 0, 1, window-1, window, window+1,
long) run through chunk_documents / bpe_pair_counts in ONE Spark job
each and compared against an independent pure-Python reference.
Deterministic seeds — no flaky generation."""

import random
from collections import Counter

from urbanistic_polygons_spark.operators.chunking import (
    bpe_pair_counts, chunk_documents)

W, S = 7, 4
VOCAB = ["aa", "bb", "cc", "dd", "ee", "f", "gg0", "x"]


def _gen_docs():
    rng = random.Random(42)
    docs = []
    sizes = ([0, 1, W - 1, W, W + 1, 2 * W, 5 * W + 3]
             + [rng.randrange(0, 60) for _ in range(233)])
    for i, n in enumerate(sizes):
        toks = [rng.choice(VOCAB) for _ in range(n)]
        # vary whitespace: double spaces and padding must not matter
        sep = "  " if i % 5 == 0 else " "
        docs.append((f"d{i:03d}", sep.join(toks) + (" " if i % 7 == 0 else ""),
                     toks))
    return docs


def _ref_chunks(toks):
    n = len(toks)
    if n == 0:
        return []
    extra = max(n - W, 0)
    n_chunks = 1 + (extra + S - 1) // S
    return [(cid, toks[cid * S: cid * S + W]) for cid in range(n_chunks)]


def test_chunk_documents_matches_reference(spark):
    docs = _gen_docs()
    df = spark.createDataFrame([(d, t) for d, t, _ in docs],
                               "doc_id string, text string")
    got = {(r.doc_id, r.chunk_id): (r.n_chunk_tokens, r.chunk_text)
           for r in chunk_documents(df, window=W, stride=S).collect()}
    want = {}
    for d, _, toks in docs:
        for cid, chunk in _ref_chunks(toks):
            want[(d, cid)] = (len(chunk), " ".join(chunk))
    assert got == want
    # invariant: every token position of every doc is covered by a chunk
    for d, _, toks in docs:
        covered = set()
        for cid, chunk in _ref_chunks(toks):
            covered.update(range(cid * S, cid * S + len(chunk)))
        assert covered == set(range(len(toks)))


def test_bpe_pair_counts_matches_reference(spark):
    docs = _gen_docs()
    df = spark.createDataFrame([(d, t) for d, t, _ in docs],
                               "doc_id string, text string")
    got = {r.pair: r.cnt
           for r in bpe_pair_counts(df, min_count=1).collect()}
    want = Counter()
    for _, _, toks in docs:
        for a, b in zip(toks, toks[1:]):
            want[f"{a} {b}"] += 1
    assert got == dict(want)
