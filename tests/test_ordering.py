"""Deterministic epoch shuffle (operators/ordering.py): the two-pass
bucket-offset rank must equal the single-window global ROW_NUMBER and be
a dense permutation per epoch."""

import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from urbanistic_polygons_spark.operators.ordering import (
    assign_global_positions, epoch_hash)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(200))}))


def test_dense_permutation_per_epoch(spark, docs):
    out = assign_global_positions(docs, epochs=3).toPandas()
    assert len(out) == 600
    for e in range(3):
        pos = sorted(out[out["epoch"] == e]["pos"])
        assert pos == list(range(1, 201))


def test_matches_single_window_oracle(spark, docs):
    """Bucket-offset rank == the global window rank (tiny-scale oracle),
    including across bucket boundaries (narrow width -> many buckets)."""
    got = (assign_global_positions(docs, epochs=2, bucket_width=1 << 22)
           .toPandas().sort_values(["epoch", "doc_id"]).reset_index(drop=True))
    hashed = docs.select(
        F.lit(0).alias("epoch"), "doc_id",
        epoch_hash("ord0:", F.col("doc_id")).alias("h")).unionByName(
        docs.select(F.lit(1).alias("epoch"), "doc_id",
                    epoch_hash("ord1:", F.col("doc_id")).alias("h")))
    w = Window.partitionBy("epoch").orderBy("h", "doc_id")
    exp = (hashed.withColumn("pos", F.row_number().over(w).cast("long"))
           .toPandas().sort_values(["epoch", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["epoch", "doc_id", "h", "pos"]],
                                  exp[["epoch", "doc_id", "h", "pos"]],
                                  check_dtype=False)


def test_epochs_differ_and_are_stable(spark, docs):
    a = assign_global_positions(docs, epochs=2).toPandas()
    b = assign_global_positions(docs, epochs=2).toPandas()
    key = ["epoch", "doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    e0 = a[a["epoch"] == 0].set_index("doc_id")["pos"]
    e1 = a[a["epoch"] == 1].set_index("doc_id")["pos"]
    assert (e0 != e1.reindex(e0.index)).any()
