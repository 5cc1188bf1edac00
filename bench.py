#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

HEADLINE = [
    # geospatial core (micro space, 150k points at sf0.1)
    "cell_index", "pip_assign", "knn_snap", "density_raster",
    "raster_vectorize", "tile_assign", "cell_halo", "convex_hull",
    "zorder_layout",
    # relational (incl. broadcast-dim joins and as-of)
    "q1_pricing", "topk_per_group", "sessionize",
    "q3_shipping", "q5_region", "asof_join", "range_join",
    "bloom_semi_join",
    # training-data ops
    "simhash", "minhash_lsh_pairs", "dedup_components", "ngram_jaccard",
    "embedding_topk", "embedding_ivf", "embedding_near_dup",
    "fingerprint", "exact_dedup_docs", "pack_sequences",
    "repetition_ratio", "training_order", "token_budget_mix",
    "line_dedup", "pii_redact", "tfidf_topk", "exact_quantiles",
    "ngram_decontam", "weighted_sample", "grouped_quantiles",
    "heavy_hitters", "skyline", "triangle_count", "pagerank",
    # r4g additions: chunking / BPE pairs / novelty / fuzzy dedup / IDW /
    # HyperLogLog
    "chunk_docs", "bpe_pairs", "ngram_novelty", "fuzzy_dedup", "idw_grid",
    "hll_distinct",
    # r4h: prefix-filtered set-similarity join (AllPairs/PPJoin) +
    # repeated-substring dedup spans (Lee et al. 2022) + JSON
    # schema-on-read
    "prefix_jaccard", "repeated_spans", "json_props",
    # r4i: distributed DBSCAN (grid epsilon join + components) + SemDeDup
    # (IVF cluster-then-dedup) + CDC MERGE/upsert
    "dbscan", "semdedup", "cdc_upsert",
    # r4j: count-min sketch point-frequency estimates (shingle key space)
    "cms_counts",
    # r4k: Gopher word-statistics quality rules + PQ-ADC quantized top-k +
    # area-weighted areal interpolation
    "gopher_rules", "pq_topk", "areal_interp",
    # r4l: cell-cover compaction (H3 compact analog) + HDR-histogram
    # quantile sketch
    "cell_compact", "hdr_quantiles",
    # r4m: bigram-LM surprisal (CCNet perplexity-filter analog) +
    # trajectory trip segmentation (gap+jump splits); sssp stays
    # un-benched — like dbscan, per-round fixed costs dominate at the
    # 350-node test-graph size, and the suite is a throughput headline,
    # not the correctness gate
    "lm_score", "trip_segments", "morans_i",
    # multimodal binary columns
    "media_meta", "media_features",
    # interleaved spans synthesis
    "spans_explode",
]


def _cpu_probe() -> float:
    """Fixed-work NumPy matmul seconds — a noise thermometer for the
    shared host (measured quiet ~0.6s, noisy bursts 2.4s+).  Reported in
    the JSON so a slow suite reading can be attributed to ambient load."""
    import numpy as np
    a = np.random.default_rng(1).random((2000, 2000))
    t0 = time.perf_counter()
    (a @ a).sum()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    t_start = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    probe_before = _cpu_probe()

    from urbanistic_polygons_spark.catalog import build_catalog
    from urbanistic_polygons_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    cat = build_catalog()

    # warm-up sweep, DISCARDED (r3 verdict item 1): the first execution of
    # each query pays JVM class-load, codegen compilation, parquet footer
    # and Arrow/python-worker startup that min-of-N should never see —
    # r3's rep-1 was globally 2-4x slow (knn_snap 21.3s vs 4.8s) and the
    # contamination leaked into the min.  Every query runs once untimed
    # (timings kept separately for transparency), then the timed sweeps
    # measure steady state only.
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    warmup: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        cat[name]["spark"](spark, sf_dir).count()
        warmup[name] = round(time.perf_counter() - t0, 3)

    # steady-state timing: three executions per query (the callable
    # rebuilds the plan each call; verified that rebuilt-plan count()
    # re-executes, no result reuse), report the min, keep all runs for
    # transparency — the sandbox host has bursty ambient neighbor load
    # (measured: identical code 3.8s vs 6.5s across quiet/noisy windows),
    # so min-of-3 is the noise control
    # each repetition sweeps the queries in a DIFFERENT deterministic
    # order (forward / reversed / half-rotated), so an ambient burst
    # pinned to one wall-clock segment cannot land on the same queries'
    # runs every sweep — min-of-3 then always has a clean reading
    half = len(HEADLINE) // 2
    orders = [list(HEADLINE), list(reversed(HEADLINE)),
              HEADLINE[half:] + HEADLINE[:half]]
    # time-budget guard: the driver runs bench.py under a wall-clock cap;
    # with 40 headline queries a noisy-host run of warmup + 3 sweeps can
    # blow it and lose the whole artifact.  After each sweep, if the
    # elapsed total plus one more projected sweep would cross the budget,
    # stop sweeping (min-of-2 beats no JSON line at all); the emitted
    # "sweeps" field makes any downgrade visible round-over-round.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "520"))
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rows: dict[str, int] = {}
    sweeps = 0
    for order in orders:
        sweep_t0 = time.perf_counter()
        for name in order:
            fn = cat[name]["spark"]
            t0 = time.perf_counter()
            rows[name] = fn(spark, sf_dir).count()
            runs[name].append(round(time.perf_counter() - t0, 3))
        sweeps += 1
        sweep_len = time.perf_counter() - sweep_t0
        if (sweeps >= 2
                and time.perf_counter() - t_start + sweep_len > budget):
            break
    timings = {name: min(ts) for name, ts in runs.items()}

    # flagship docs/sec: geo-span -> polygon assignment throughput over the
    # spans synthesized from the sf documents table
    n_points = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    total = round(sum(timings.values()), 3)
    pip_knn = timings["pip_assign"] + timings["knn_snap"]
    docs_per_sec = round(n_points / pip_knn, 1) if pip_knn > 0 else None

    sf = sf_dir.rstrip("/").split("sf")[-1]
    # The driver that records this run keeps only the LAST ~2000 chars of
    # stdout and parses the JSON line out of that window — r2/r3 artifacts
    # came back "parsed: null" because rows/runs/warmup detail pushed the
    # line past the window.  The stdout line is therefore the compact
    # headline only; full per-run detail goes to BENCH_DETAIL.json
    # (temp-file + os.replace so a crash mid-write can't truncate it).
    headline = {
        "metric": "headline suite wall time (spatial + relational + "
                  "dedup + similarity)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": cpus,
        "docs_per_sec_spatial": docs_per_sec,
        "sweeps": sweeps,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(headline)
    if len(line) > 1900:  # stay inside the capture window, whatever grows
        headline["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(headline)
    detail_path = _REPO / "BENCH_DETAIL.json"
    tmp = detail_path.with_suffix(".json.tmp")
    with open(tmp, "w") as f:
        json.dump({**headline, "rows": rows, "runs": runs,
                   "warmup_runs": warmup,
                   "cpu_probe_sec": [probe_before, _cpu_probe()]}, f,
                  indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, detail_path)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
