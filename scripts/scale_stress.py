#!/usr/bin/env python
"""Scale-stress the expensive catalog tail at ~sf1.0 (r4 verdict item 4).

The sandbox's largest driver-generated dataset is sf0.1, so this script
derives a 10x dataset from it DETERMINISTICALLY (no external data): each
scaled table is 10 key-offset replicas of the sf0.1 table, with text and
embeddings perturbed per replica (every 7th word suffixed / every 5th
dim sign-flipped, replica-keyed) so the dedup/similarity workloads keep
a realistic duplicate rate instead of a pathological 10-way exact-dup
blowup; replica 0 is bit-identical to sf0.1.  Unscaled dims are
symlinked.  The scaled tables mean MORE DATA IN THE SAME KEY/CELL SPACE
(density x10) — the honest fixed-region growth scenario; DBSCAN's
epsilon-join candidate volume is density-bounded, so its expected growth
is super-linear by design and is reported as such.

For each stress query the script records wall time (min of 2 after one
discarded warm-up), output rows, and the physical plan shape (broadcast
/ sort-merge / cartesian / exchange counts) at BOTH scales, so a
broadcast->SMJ flip or an AQE plan change at 10x is visible directly.

Usage: python scripts/scale_stress.py [queries...]  (default: the r4
verdict list).  Writes one JSON line; BENCH.md records the snapshot.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

SRC = "/root/testdata/sf0.1"
DST = str(_REPO / ".scale" / "sf1.0")
REPS = 10
OFF = 100_000_000  # key offset per replica (>> any sf0.1 key)

STRESS = ["dbscan", "cms_counts", "semdedup", "prefix_jaccard",
          "dedup_components", "pagerank"]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    dst = Path(DST)
    if (dst / "_SCALE_OK").exists():
        return
    dst.mkdir(parents=True, exist_ok=True)

    def reps_union(df, key_cols, extra=None):
        parts = []
        for r in range(REPS):
            d = df
            for k in key_cols:
                d = d.withColumn(k, F.col(k) + F.lit(r * OFF))
            if extra is not None:
                d = extra(d, r)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def perturb_text(d, r):
        # replica 0 untouched; else suffix every 7th word (offset r) so
        # cross-replica shingle Jaccard drops below the dedup thresholds
        if r == 0:
            return d
        words = F.split(F.col("text"), " ")
        mutated = F.transform(
            words,
            lambda w, i: F.when((i + F.lit(r)) % 7 == 0,
                                F.concat(w, F.lit(f"r{r}"))).otherwise(w))
        return d.withColumn("text", F.concat_ws(" ", mutated))

    def perturb_emb(d, r):
        if r == 0:
            return d
        return d.withColumn(
            "embedding",
            F.transform(F.col("embedding"),
                        lambda x, i: F.when((i + F.lit(r)) % 5 == 0,
                                            -x).otherwise(x)))

    read = lambda t: spark.read.parquet(f"{SRC}/{t}.parquet")
    jobs = {
        "orders": reps_union(read("orders"), ["o_orderkey", "o_custkey"]),
        "documents": reps_union(read("documents"), ["doc_id"],
                                extra=perturb_text),
        "embeddings": reps_union(read("embeddings"), ["vec_id"],
                                 extra=perturb_emb),
        "events": reps_union(read("events"), ["event_id", "user_id"]),
    }
    for t, df in jobs.items():
        df.coalesce(8).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem"]:
        link = dst / f"{t}.parquet"
        if not link.exists():
            link.symlink_to(f"{SRC}/{t}.parquet")
    (dst / "_SCALE_OK").touch()


def plan_shape(df) -> dict:
    p = df._jdf.queryExecution().executedPlan().toString()
    return {"bhj": p.count("BroadcastHashJoin"),
            "smj": p.count("SortMergeJoin"),
            "cartesian": p.count("CartesianProduct")
            + p.count("BroadcastNestedLoop"),
            "exchanges": p.count("Exchange ")}


def run(queries) -> None:
    from urbanistic_polygons_spark.catalog import build_catalog
    from urbanistic_polygons_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale_stress", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    build_sf1(spark)
    cat = build_catalog()

    out = {"reps": REPS, "sf_base": SRC, "sf_big": DST, "queries": {}}
    for name in queries:
        q = cat[name]["spark"]
        rec = {}
        for label, sf in (("sf0.1", SRC), ("sf1.0", DST)):
            df = q(spark, sf)
            rows = df.count()          # warm-up, discarded
            times = []
            for _ in range(int(os.environ.get("SCALE_STRESS_RUNS", "2"))):
                t0 = time.perf_counter()
                q(spark, sf).count()
                times.append(round(time.perf_counter() - t0, 2))
            rec[label] = {"sec": min(times), "runs": times, "rows": rows,
                          "plan": plan_shape(df)}
        r = rec["sf1.0"]["sec"] / max(rec["sf0.1"]["sec"], 1e-9)
        rec["time_ratio_10x"] = round(r, 2)
        rec["rows_ratio"] = round(
            rec["sf1.0"]["rows"] / max(rec["sf0.1"]["rows"], 1), 2)
        rec["plan_flip"] = rec["sf0.1"]["plan"] != rec["sf1.0"]["plan"]
        out["queries"][name] = rec
        print(f"# {name}: {rec['sf0.1']['sec']}s -> {rec['sf1.0']['sec']}s "
              f"(x{rec['time_ratio_10x']}), rows x{rec['rows_ratio']}, "
              f"flip={rec['plan_flip']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    run(sys.argv[1:] or STRESS)
