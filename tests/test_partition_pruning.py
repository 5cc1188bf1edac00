"""Evidence that cell-partitioned checkpoints actually partition-prune:
a read with a cell filter must show PartitionFilters on the scan and touch
only the matching partition directories (the scale contract of the
lineage/resume design, SURVEY.md §4)."""

from pyspark.sql import functions as F


def test_cell_partitioned_read_prunes(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 8).alias("cell_bucket"),
        (F.col("id") * 7919 % 100).alias("val"))
    out = str(tmp_path / "cells")
    df.write.partitionBy("cell_bucket").parquet(out)

    rd = spark.read.parquet(out).filter(F.col("cell_bucket") == 3)
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell_bucket" in plan.split("PartitionFilters")[1][:200]
    assert rd.count() == 125

    # column pruning: selecting one column must shrink ReadSchema
    narrow = spark.read.parquet(out).select("val")
    nplan = narrow._jdf.queryExecution().executedPlan().toString()
    read_schema = nplan.split("ReadSchema:")[1].splitlines()[0]
    assert "val" in read_schema and "id" not in read_schema
