"""Sequence-packing invariants (operators/packing.py).

The catalog oracle gate (tests/test_catalog_oracle.py::pack_sequences)
checks bit-for-bit equality with the recursive-CTE greedy recurrence; this
file pins the SEMANTIC contract on both real and adversarial inputs:
bins never exceed the budget except oversized singletons, offsets are the
running fill, and nothing is dropped or duplicated.
"""

import pandas as pd
import pyspark.sql.functions as F

from urbanistic_polygons_spark.operators.packing import (
    bin_stats, pack_sequences)

SF_DIR = "/root/testdata/sf0.001"


def test_packing_invariants_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    budget = 256
    packed = pack_sequences(docs, budget=budget, n_shards=8).toPandas()

    # total preservation: every doc packed exactly once
    assert len(packed) == docs.count()
    assert packed["doc_id"].is_unique

    # per-bin invariants
    for (_, _), g in packed.groupby(["shard", "bin_id"]):
        g = g.sort_values("doc_id").reset_index(drop=True)
        fill = g["n_tokens"].sum()
        assert fill <= budget or len(g) == 1, "overfull multi-doc bin"
        # offsets are the running fill in doc_id order
        expect_off = g["n_tokens"].cumsum().shift(fill_value=0)
        assert (g["bin_offset"] == expect_off).all()

    # greedy tightness: a bin (except the last per shard) plus the FIRST
    # doc of the next bin must overflow the budget — otherwise the packer
    # opened a bin early
    for _, sh in packed.groupby("shard"):
        sh = sh.sort_values(["bin_id", "doc_id"]).reset_index(drop=True)
        fills = sh.groupby("bin_id")["n_tokens"].sum()
        firsts = sh.groupby("bin_id")["n_tokens"].first()
        for b in range(len(fills) - 1):
            assert fills[b] + firsts[b + 1] > budget


def test_packing_oversized_doc_sits_alone(spark):
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c", "w " * 50, "d e", "f g h i"],
    })
    packed = (pack_sequences(spark.createDataFrame(pdf), budget=8,
                             n_shards=1)
              .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert (packed["shard"] == 0).all()
    # doc 2 (50 tokens > budget 8) must open and occupy its own bin
    by_doc = packed.set_index("doc_id")
    solo_bin = by_doc.loc[2, "bin_id"]
    assert (packed["bin_id"] == solo_bin).sum() == 1
    assert by_doc.loc[2, "bin_offset"] == 0
    # docs 3+4 (2+4 tokens) share the following bin
    assert by_doc.loc[3, "bin_id"] == by_doc.loc[4, "bin_id"] == solo_bin + 1
    assert by_doc.loc[4, "bin_offset"] == 2


def test_bin_stats_consistent(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    packed = pack_sequences(docs, budget=256, n_shards=8)
    stats = bin_stats(packed, budget=256).toPandas()
    base = (packed.groupBy("shard", "bin_id")
            .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("s"))
            .toPandas())
    m = stats.merge(base, on=["shard", "bin_id"])
    assert len(m) == len(stats) == len(base)
    assert (m["n_docs"] == m["n"]).all()
    assert (m["fill_tokens"] == m["s"]).all()
    assert (m["util_permille"] == m["fill_tokens"] * 1000 // 256).all()
