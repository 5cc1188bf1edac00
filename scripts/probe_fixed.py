#!/usr/bin/env python
"""Decompose the scaling job's fixed per-iteration cost: run pipeline
variants at tiny n_points (compute ~0) and compare.
Usage: python scripts/probe_fixed.py <cores> [n_points]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from urbanistic_polygons_spark.session import get_spark  # noqa: E402
from scripts.scaling_job import (  # noqa: E402
    N_RECTS, build_rect_index, make_refine_kernel)
from scripts.probe_tail import build_points  # noqa: E402


def timeit(fn, reps=6):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return min(ts), ts


def main():
    cores = int(sys.argv[1])
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    parts = cores * 4
    spark = get_spark(
        f"probefix-{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.driver.extraJavaOptions":
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={cores} "
                "-XX:+AlwaysPreTouch",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
        })
    index = build_rect_index(spark, N_RECTS)
    kern = make_refine_kernel()
    i = [0]

    def pts():
        i[0] += 1
        return build_points(spark, n_points, parts, i[0] * 1000_000)

    # warm all paths
    p = pts()
    (p.mapInPandas(kern, "cell_id long, px long, py long")
     .join(F.broadcast(index), "cell_id").groupBy("cell_id")
     .agg(F.count("*").alias("n")).agg(F.count("*"), F.sum("n")).collect())

    out = {}
    out["bare_agg"] = timeit(lambda: pts().agg(F.sum("px")).collect())[0]
    out["kernel_only"] = timeit(lambda: (
        pts().mapInPandas(kern, "cell_id long, px long, py long")
        .agg(F.sum("cell_id")).collect()))[0]
    out["join_only"] = timeit(lambda: (
        pts().withColumn("cell_id",
                         (F.col("py") / 10000 + 5447).cast("long") * 16384
                         + (F.col("px") / 10000 + 8300).cast("long"))
        .join(F.broadcast(index), "cell_id")
        .groupBy("cell_id").agg(F.count("*").alias("n"))
        .agg(F.count("*"), F.sum("n")).collect()))[0]
    out["full"] = timeit(lambda: (
        pts().mapInPandas(kern, "cell_id long, px long, py long")
        .join(F.broadcast(index), "cell_id")
        .groupBy("cell_id").agg(F.count("*").alias("n"))
        .agg(F.count("*"), F.sum("n")).collect()))[0]
    print(json.dumps({"cores": cores, "n_points": n_points, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
