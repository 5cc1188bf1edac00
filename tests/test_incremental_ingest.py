"""Incremental ingest-dedup (operators/incremental.py): arrival-order
exactly-once acceptance over LineageStore snapshots."""

import pyspark.sql.functions as F
import pytest

from urbanistic_polygons_spark.operators.incremental import (
    accepted_corpus, ingest_batch)
from urbanistic_polygons_spark.plans.lineage import LineageStore

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _batches(docs, n=3):
    return [docs.filter(F.col("doc_id") % n == i) for i in range(n)]


def test_sequential_ingest_matches_global_dedup(spark, docs, tmp_path):
    store = LineageStore(str(tmp_path))
    for b in _batches(docs):
        ingest_batch(store, "corpus", b)
    acc = store.read("corpus").toPandas()
    # exactly one accepted row per distinct corpus fingerprint
    from urbanistic_polygons_spark.functions import text as X
    all_fps = (docs.select(X.fingerprint(F.col("text")))
               .distinct().toPandas())
    assert sorted(acc.fingerprint) == sorted(all_fps.fingerprint)
    assert acc.fingerprint.is_unique
    # every accepted id really carries the fingerprint of its own text
    joined = accepted_corpus(store, "corpus", docs)
    bad = joined.filter(
        X.fingerprint(F.col("text")) != F.col("fingerprint")).count()
    assert bad == 0
    assert joined.count() == len(acc)


def test_arrival_order_precedence(spark, tmp_path):
    store = LineageStore(str(tmp_path))
    b1 = spark.createDataFrame([(10, "same text"), (11, "only one")],
                               ["doc_id", "text"])
    b2 = spark.createDataFrame([(2, "same text"), (3, "fresh")],
                               ["doc_id", "text"])
    ingest_batch(store, "c", b1)
    ingest_batch(store, "c", b2)
    acc = {r.id: r.batch_id for r in store.read("c").collect()}
    # batch 1 owns "same text" even though batch 2's id (2) is smaller
    assert 10 in acc and 2 not in acc
    assert acc[10] == 0 and acc[3] == 1
    assert set(acc) == {10, 11, 3}


def test_reingest_is_idempotent(spark, docs, tmp_path):
    store = LineageStore(str(tmp_path))
    b = _batches(docs)[0]
    ingest_batch(store, "c", b)
    n1 = store.read("c").count()
    ingest_batch(store, "c", b)        # crash-retry of the same batch
    assert store.read("c").count() == n1
    # in-batch keeper is the min doc_id of each fingerprint group
    ids = {r.id for r in store.read("c").collect()}
    mins = {r[0] for r in b.groupBy(
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))))
        .agg(F.min("doc_id")).select(F.col("min(doc_id)")).collect()}
    assert ids == mins


def test_rollback_then_reingest_converges(spark, docs, tmp_path):
    store = LineageStore(str(tmp_path))
    b1, b2, b3 = _batches(docs)
    ingest_batch(store, "c", b1)
    snap1 = store.snapshots("c")[-1]["snapshot_id"]
    ingest_batch(store, "c", b2)
    before = sorted(r.fingerprint for r in store.read("c").collect())
    store.rollback("c", snap1)
    ingest_batch(store, "c", b2)       # replay the lost batch
    after = sorted(r.fingerprint for r in store.read("c").collect())
    assert after == before
