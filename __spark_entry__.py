"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (interleaved spans ->
cell-index encode -> broadcast tiled polygon index -> PIP refine -> kNN
orphan snap) on sf0.001.  ``queries()``/``oracle_sql()`` expose the full
operator catalog (urbanistic_polygons_spark/catalog.py) with DuckDB oracle
SQL for every SQL-expressible operator.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: synthesize the
    interleaved-spans documents table (input_hint shape) from the flat
    documents parquet, assign every geo span to a polygon via the broadcast
    tiled index + PIP + kNN snap, and return span-sequence-preserving
    assignments."""
    from pyspark.sql import functions as F

    from urbanistic_polygons_spark import datagen
    from urbanistic_polygons_spark.catalog import q_spans_spark
    from urbanistic_polygons_spark.operators.spatial_join import assign_documents

    sf_dir = "/root/testdata/sf0.001"
    # interleaved spans rows -> documents(doc_id, spans) in input_hint shape
    spans = q_spans_spark(spark, sf_dir)
    docs = (
        spans
        # geo spans carry micro-coords; convert to lon/lat for the engine
        .withColumn("content", F.when(
            F.col("kind") == "geo",
            F.concat(
                ((F.split("content", ",").getItem(0).cast("double") / 10000 + 8300)
                 / 16384 * 360 - 180).cast("string"),
                F.lit(","),
                (F.lit(51.0) - F.split("content", ",").getItem(1).cast("double")
                 / 10000 * 0.01).cast("string"))).otherwise(F.col("content")))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("span_offset").alias("offset"),
            F.col("kind").alias("kind"),
            F.col("content").alias("text"),
            F.col("media_ref").alias("media_ref")))).alias("raw"))
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.transform("raw", lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].cast("int").alias("offset"))).alias("spans"))
    )
    polygons = datagen.polygons_df(spark, 300, seed=43)
    return assign_documents(docs, polygons)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from urbanistic_polygons_spark.catalog import build_catalog
    return {name: spec["spark"] for name, spec in build_catalog().items()}


def oracle_sql() -> dict[str, str]:
    from urbanistic_polygons_spark.catalog import build_catalog
    return {name: spec["oracle"] for name, spec in build_catalog().items()
            if spec["oracle"] is not None}
