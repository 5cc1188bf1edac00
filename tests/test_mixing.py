"""Token-budget mixing (operators/mixing.py): the two-pass bucket-offset
prefix sum must equal the single-window running-sum oracle, the kept set
must be a budget-monotone prefix, and the bucket prune must be lossless."""

import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from urbanistic_polygons_spark.operators.mixing import token_budget_mix
from urbanistic_polygons_spark.operators.ordering import epoch_hash


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(300)),
        "lang": [["en", "de", "fr"][i % 3] for i in range(300)],
        "n_chars": [1 + (i * 37) % 200 for i in range(300)],
    }))


def _window_oracle(docs, budget):
    hashed = docs.select(
        "doc_id", F.col("lang").alias("stratum"),
        F.col("n_chars").cast("long").alias("w"),
        epoch_hash("mix0:", F.col("doc_id")).alias("h"))
    w = (Window.partitionBy("stratum").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (hashed.withColumn("cum", F.sum("w").over(w).cast("long"))
            .filter(F.col("cum") <= budget)
            .select("stratum", "doc_id", "w", "cum"))


@pytest.mark.parametrize("width", [1 << 26, 1 << 22])
def test_matches_single_window_oracle(spark, docs, width):
    """Narrow width -> many buckets -> the prune and the offset join are
    both exercised; result must equal the per-stratum global window."""
    budget = 5000
    got = (token_budget_mix(docs, budget, bucket_width=width)
           .toPandas().sort_values(["stratum", "doc_id"])
           .reset_index(drop=True))
    exp = (_window_oracle(docs, budget)
           .toPandas().sort_values(["stratum", "doc_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) > 0


def test_budget_monotone_prefix(spark, docs):
    """A larger budget strictly extends the kept set (resumable mixing),
    and every kept row's cum is within budget."""
    small = token_budget_mix(docs, 2000).toPandas()
    large = token_budget_mix(docs, 8000).toPandas()
    assert set(small["doc_id"]) < set(large["doc_id"])
    assert (small["cum"] <= 2000).all() and (large["cum"] <= 8000).all()


def test_budget_below_min_weight_empty(spark, docs):
    assert token_budget_mix(docs, 0).count() == 0


def test_per_stratum_isolation(spark, docs):
    """Each stratum consumes its own budget: per-stratum max cum is
    independent and close to the budget (gap < max single weight)."""
    out = token_budget_mix(docs, 5000).toPandas()
    for s, grp in out.groupby("stratum"):
        assert grp["cum"].max() <= 5000
        assert grp["cum"].max() > 5000 - 201  # next doc would overflow
