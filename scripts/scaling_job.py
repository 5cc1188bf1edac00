#!/usr/bin/env python
"""One scaling-run worker: the flagship spatial pipeline (cell index ->
broadcast PIP candidate join -> kNN snap -> density raster) over N
Spark-generated points, at a given parallelism.  Prints one JSON line.

Run via a FRESH interpreter per parallelism level (a JVM can't change its
master): scripts/scaling.py orchestrates the pair of runs.

The point set is generated JVM-side (spark.range + integer hashing) so the
job is CPU/shuffle-bound engine work, not Python datagen — the honest
subject for the north_rule two-parallelism scaling criterion.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))


def main(cores: int, n_points: int, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from urbanistic_polygons_spark.catalog import _rect_cells, _rects_df
    from urbanistic_polygons_spark.session import get_spark

    spark = get_spark(f"scaling_{cores}", cores=cores,
                      shuffle_partitions=cores * 2)

    # warm: JVM + parquet footer + codegen for the index (not timed)
    rects = _rects_df(spark, sf_dir)
    index = _rect_cells(rects).cache()
    index.count()

    t0 = time.perf_counter()

    pts = (
        spark.range(n_points)
        .select(
            F.col("id").alias("point_id"),
            ((F.col("id") * 7919 + 17) % 1890000).alias("px"),
            ((F.col("id") * 7907 + 23) % 1520000).alias("py"))
        .withColumns({
            "cell_x": F.expr("px DIV 10000") + 8300,
            "cell_y": F.expr("py DIV 10000") + 5447,
        })
        .withColumn("cell_id", F.col("cell_y") * 16384 + F.col("cell_x"))
    )

    hits = (
        pts.join(F.broadcast(index), "cell_id")
        .filter((F.col("px") >= F.col("x0")) & (F.col("px") < F.col("x1"))
                & (F.col("py") >= F.col("y0")) & (F.col("py") < F.col("y1")))
        .groupBy("point_id")
        .agg(F.min("poly_id").alias("polygon_id"))
    )
    n_assigned = hits.count()

    raster = (
        pts.groupBy(F.expr("px DIV 100000").alias("gx"),
                    F.expr("py DIV 100000").alias("gy"))
        .agg(F.count("*").alias("n"))
    )
    n_cells = raster.count()

    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "cores": cores,
        "n_points": n_points,
        "n_assigned": n_assigned,
        "n_raster_cells": n_cells,
        "elapsed_sec": round(elapsed, 3),
        "points_per_sec": round(n_points / elapsed, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]),
         sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
