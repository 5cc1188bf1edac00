import sys, re
sys.path.insert(0, "/root/repo")
from urbanistic_polygons_spark.session import get_spark
from urbanistic_polygons_spark import catalog as C
import __spark_entry__ as E
spark = get_spark("plans", cores=8, shuffle_partitions=8)
sf = "/root/testdata/sf0.01"
cat = C.build_catalog()

AUDIT = ["pip_assign", "knn_snap", "tile_assign", "q3_shipping", "q5_region",
         "minhash_lsh_pairs", "ngram_jaccard", "cell_halo", "media_meta",
         "embedding_ivf", "embedding_near_dup", "embedding_ann", "asof_join",
         "salted_agg", "tile_pyramid", "global_topk", "landuse_rollup",
         "density_mvt", "winnow_fp", "stratified_sample",
         "cross_source_overlap", "embedding_topk", "tile_serve_pyramid",
         "faces_landuse", "merge_faces", "landuse_serve",
         "range_join", "pack_sequences", "repetition_ratio",
         "training_order", "token_budget_mix", "line_dedup", "pii_redact",
         "tfidf_topk", "exact_quantiles", "zorder_layout", "region_dissolve",
         "ngram_decontam", "convex_hull", "weighted_sample",
         "grouped_quantiles", "heavy_hitters", "span_seq_fp", "skyline",
         "bloom_semi_join", "triangle_count", "pagerank",
         "chunk_docs", "bpe_pairs", "ngram_novelty", "fuzzy_dedup",
         "idw_grid", "hll_distinct", "prefix_jaccard", "repeated_spans",
         "json_props", "dbscan", "semdedup", "cdc_upsert", "cms_counts",
         "gopher_rules", "pq_topk", "areal_interp", "cell_compact",
         "hdr_quantiles", "sssp", "lm_score", "trip_segments", "morans_i"]
out = ["""# Physical plan audit

Generated from `.explain`/`executedPlan` at sf0.01 (regenerate with
`python docs/gen_plans.py` — this file is the committed snapshot).  Checks:
broadcast joins on `cell_id`/dim keys, no cartesian products, parquet scans
with DataFilters + pruned ReadSchema, partial+final hash aggregation.

| query | broadcast join | sort-merge | cartesian/NLJ | exchanges |
|---|---|---|---|---|"""]
details = []
for name in AUDIT:
    df = cat[name]["spark"](spark, sf)
    p = df._jdf.queryExecution().executedPlan().toString()
    bhj = "yes" if "BroadcastHashJoin" in p else "-"
    smj = "yes" if "SortMergeJoin" in p else "-"
    cart = "YES" if ("CartesianProduct" in p or "BroadcastNestedLoop" in p) else "-"
    out.append(f"| {name} | {bhj} | {smj} | {cart} | {p.count('Exchange ')} |")
df = cat["pip_assign"]["spark"](spark, sf)
p = df._jdf.queryExecution().executedPlan().toString()
scan_lines = [l.strip() for l in p.splitlines() if "FileScan" in l]
out.append(f"""
The flagship `entry()` plan (spans synthesis -> PIP assign -> kNN snap)
holds {E.entry(spark)._jdf.queryExecution().executedPlan().toString().count("Exchange ")} exchanges after the single-pass kNN rewrite (was 118 with the
iterative ring loop).

`embedding_topk` is size-gated (similarity.SMALL_TOPK_SCORED_ROWS): at this
audit's sf0.01 the scored-row hint is below the gate, so the snapshot shows
the single-merge-shuffle small path; above the gate the Arrow mapInPandas
phase-1 reduction runs per partition before the same merge (still 1
exchange — the gate trades only constant Arrow overhead, never shuffle
shape).  `faces_landuse` dropped 9 -> 4 exchanges in r4 (2 of the 4 are broadcast exchanges): memoized landuse
rings, the dropDuplicates pair-dedup replaced by a shuffle-free canonical
meeting-cell filter, the pct>0 filter moved post-agg (a pre-agg filter made
Catalyst evaluate the Arrow clip UDF twice), and the dominance window
replaced by a struct-min argmax aggregation.

`range_join` is the banded interval join: the window side explodes into
10-minute bands, so the audit must show a hash equi-join on
`(band, user_id)` and NO BroadcastNestedLoopJoin — the plain
`ts BETWEEN s AND e` formulation Spark would otherwise pick (also
lint-pinned by tests/test_interval_join.py).  `pack_sequences` is one
shuffle on `shard` into the greedy applyInPandas fill kernel — the
sequential recurrence is bounded per shard by construction.

`repetition_ratio` must show two hash aggregates (partial+final on
(doc_id, gram), then on doc_id) and zero joins/windows.
`line_dedup` must show exactly the explode + three partial-agg shuffles
(line winners, kept-per-doc, totals-per-doc) + one doc-keyed join of two
doc-sized aggregates — the exploded line set never self-joins; a window
or a join back to the line set would be the 100 TB regression to watch
for.
`pii_redact` must be a single projection stage: zero exchanges, zero
ArrowEvalPython (the regexes are JVM `regexp_count`/`regexp_replace`).
`training_order` is the two-pass global rank: the audit should show the
per-(epoch, bucket) window (each window a ~1/32 hash-range block) and a
BroadcastHashJoin against the 64-row offsets table — never a global
single-partition window.  `token_budget_mix` is the same two-pass shape
as a prefix sum: per-(stratum, bucket) running-sum window plus a
BroadcastHashJoin against the pruned offsets table (off < budget) — the
prune must sit on the offsets side, before the big join.

r4c-r4e additions: `tfidf_topk` filters the corpus to query terms BEFORE
any shuffle, broadcasts the integer-idf weight table, and ends in
TakeOrderedAndProject (per-partition heaps, k-row merge).
`exact_quantiles` / `grouped_quantiles` are bucket-histogram selection:
aggs over (group, bucket) histograms — the window in the grouped form
runs over each group's BUCKETS (hundreds of rows), never its values, and
the target ranks join back broadcast; a global values sort anywhere is
the regression to watch for.  `ngram_decontam` must show the eval
shingle set on the BUILD side of a BroadcastHashJoin with the corpus
stream filtered map-side — the only exchange is the per-doc hit agg.
`convex_hull` is mapInPandas partial hulls into ONE groupBy-applyInPandas
(single exchange carrying hull vertices only).  `weighted_sample` is a
projection into TakeOrderedAndProject — zero exchanges.  `heavy_hitters`'
audited plan is the verify pass: an isin(candidates) filter into a
partial+final agg (1 exchange); the sketch pass is a separate scalar-size
action by design.  `span_seq_fp` is one per-doc collect_list agg
(1 exchange) with the order supplied by sort_array, not a window.

`dedup_components` is iterative (min-label propagation) and is audited by
construction, not by its final plan snapshot: each round is one message
join + one min-aggregation with the lineage cut by an eager
localCheckpoint, and convergence is detected by the monotone label sum
(numeric ids) or an exact node-keyed changed-row probe (string ids, e.g.
the merge phase's face GUIDs) — no cartesian anywhere in the loop.

`pagerank` shows 0 exchanges for the same reason: the snapshot is the
plan OVER the last iteration's localCheckpoint; each iteration inside
the loop is one edge⨝rank hash join + one partial+final sum + one
left join back to nodes (audited in tests via the integer-model
parity, not the final-plan string).  `triangle_count`'s broadcast rows
are the two degree joins and the closing-edge probe at sf0.01 scale;
at web scale the closing join keys on (v, w) both sides and shuffles
hash-partitioned — no adjacency list is ever collected.
`bloom_semi_join`'s plan is the refine semi-join over the map-side
bloom Filter (the bitmap build is a separate ≤m/64-row job).

r4i additions: `dbscan`'s exchanges are the role-assignment stages, each
corpus-proportional and therefore correctly SMJ (NOT broadcast: every
side — points, epsilon pairs, cores, labels — scales with the corpus at
100 TB): the grid epsilon equi-join on the cell key, the neighbor-count
agg, the two core semi-joins, the border min-agg, and the noise
anti-join.  The iterative component loop sits behind eager
localCheckpoints (audited by construction like `dedup_components`).
`semdedup` shows 2 exchanges — the per-cluster collect and the final
keeper join — because centroid train/assign is the zero-shuffle Arrow
argmin path shared with `embedding_ivf`.  `cdc_upsert` is the struct-max
reduction (one partial+final agg on the key) plus the full-outer apply
(one co-partitioned join) — a window over the change stream or a
broadcast of the corpus-sized base would be the scale regressions to
watch for.

r4j: `cms_counts` is the sketch-then-verify shape — 3 exchanges total:
the d x w cell aggregation (partial-aggregable, shuffle bounded at
partitions x 2048 cell rows regardless of corpus size), the filtered
probe count, and the final per-token min; the 2048-row table correctly
BROADCASTS to the probe side (the one broadcast in the plan).  A
distinct-key shuffle of the shingle space would be the scale
regression to watch for — the whole point of the sketch is that it
never happens.

## Scan pushdown evidence (pip_assign)

Column-pruned parquet scans with pushed data filters:

```""")
for l in scan_lines[:2]:
    out.append(l[:250])
out.append("```\n")
open("/root/repo/docs/PLANS.md", "w").write("\n".join(out))
print("written")
spark.stop()
