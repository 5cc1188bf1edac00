#!/usr/bin/env python
"""One-off diagnostic: where does local[4] lose ~2s/iter vs ideal T1/4
on the scaling job?  Runs the IDENTICAL pipeline as scripts/scaling_job.py
but with the point-partition count as a parameter, to separate
task-granularity tail effects from any per-core stall.

Usage: python scripts/probe_tail.py <cores> <n_points> <parts> [iters]
Prints one JSON line.  Scratch tool — not part of the bench contract
(scaling_job.py is job_sha-gated; this file deliberately leaves it
untouched).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from urbanistic_polygons_spark.session import get_spark  # noqa: E402
from scripts.scaling_job import (  # noqa: E402
    N_RECTS, build_rect_index, make_refine_kernel)


def build_points(spark, n, parts, nonce=0):
    r = spark.range(1 + nonce, n + 1 + nonce, 1, numPartitions=parts)
    px = (F.col("id") * 7919) % 1890000
    py = (F.col("id") * 7907 + F.col("id") * 13) % 1520000
    return r.select(px.alias("px"), py.alias("py"))


def run_once(spark, n_points, parts, nonce, index):
    pts = build_points(spark, n_points, parts, nonce)
    t0 = time.perf_counter()
    core_pts = pts.mapInPandas(
        make_refine_kernel(), "cell_id long, px long, py long")
    hits = (
        core_pts.join(F.broadcast(index), "cell_id")
        .filter((F.col("px") >= F.col("x0")) & (F.col("px") < F.col("x1"))
                & (F.col("py") >= F.col("y0")) & (F.col("py") < F.col("y1")))
        .select("cell_id", "poly_id"))
    agg = hits.groupBy("cell_id").agg(F.count("*").alias("n_hits"))
    row = agg.agg(F.count("*"), F.sum("n_hits")).collect()[0]
    return time.perf_counter() - t0, tuple(row)


def main():
    cores = int(sys.argv[1])
    n_points = int(sys.argv[2])
    parts = int(sys.argv[3])
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    spark = get_spark(
        f"probe-{cores}-{parts}", cores=cores, shuffle_partitions=cores,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.driver.extraJavaOptions":
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={cores} "
                "-XX:+AlwaysPreTouch",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
        })
    index = build_rect_index(spark, N_RECTS)
    if "--cache-index" in sys.argv:
        index = index.cache()
        index.count()
    run_once(spark, 200_000, parts, 10_000_000_000, index)
    times, out = [], None
    for i in range(iters):
        el, out = run_once(spark, n_points, parts, i, index)
        times.append(round(el, 3))
    print(json.dumps({"cores": cores, "parts": parts,
                      "n_points": n_points, "iters": times,
                      "best": min(times), "out": list(out)}))
    spark.stop()


if __name__ == "__main__":
    main()
