"""SemDeDup: semantic deduplication over an embedding column
(Abbas et al. 2023, arXiv:2303.09540) — the cluster-then-dedup shape
that makes embedding-cosine dedup tractable at corpus scale.

Brute-force cosine near-dup is O(n^2); LSH (``embedding_near_dup``)
buckets by random hyperplanes.  SemDeDup instead partitions the corpus
by a k-means coarse quantizer and only compares WITHIN a cluster —
semantically identical documents land in the same cluster by
construction, so the quadratic term is bounded by the cluster size,
which the operator controls via ``n_lists`` (real deployments scale
k with sqrt(n); the knob is explicit here).

Pipeline (every stage reused from the engine's existing primitives):

1. quantize to exact int64 vectors (``similarity.quantized``) and train
   the deterministic IVF coarse quantizer (``similarity.ivf_train`` —
   lowest-id seeds + one floored-mean Lloyd pass, bit-reproducible);
2. zero-shuffle nearest-centroid assignment (``_assign_lists`` Arrow
   argmin kernel);
3. per-cluster group-collect + in-group pair enumeration (the
   ``embedding_near_dup`` pattern — never a self-join), cluster-size
   cap mirrored in the oracle;
4. exact integer cosine-squared threshold: a pair is a semantic dup iff
   ``dot > 0 AND dot^2 * t_den^2 >= t_num^2 * |a|^2 * |b|^2`` — all
   int64 (unit-norm 1e3-quantized 64-dim vectors keep every term below
   ~1e14), so cos >= t_num/t_den with NO float anywhere;
5. connected components over dup pairs (``near_dup_components``);
   keeper = min vec_id of the component (the SemDeDup paper keeps one
   representative per epsilon-ball; min-id is the deterministic choice).

Output: one row per vector — (vec_id, list_id, keeper, is_kept).

Scale shape at 100 TB: centroid training/assignment is map-side (the
corpus never shuffles for it); the only wide stages are the per-cluster
collect (bounded by the cap) and the component propagation over dup
pairs (tiny: near-dup graphs are sparse).  Reference analog: none (the
reference is a geometry engine); this is the LLM-pipeline extension
surface (SURVEY §2.8), sibling of dedup.py/similarity.py.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import near_dup_components
from .similarity import (_assign_lists, _collect_centroids, ivf_train,
                         pair_dot, quantized)


def semantic_dup_pairs(assigned: DataFrame, t_num: int, t_den: int,
                       max_cluster: int = 4096) -> DataFrame:
    """In-cluster pairs above the exact integer cosine threshold:
    -> (id_a, id_b).  ``assigned``: (vec_id, q, list_id).  Clusters with
    more than ``max_cluster`` members are dropped (cap mirrored in the
    oracle; at scale raise ``n_lists`` instead of the cap)."""
    grouped = (assigned.groupBy("list_id")
               .agg(F.array_sort(F.collect_list(
                   F.struct(F.col("vec_id").alias("id"),
                            F.col("q").alias("q")))).alias("ms"))
               .filter((F.size("ms") > 1) & (F.size("ms") <= max_cluster)))
    pairs = grouped.select(F.explode(F.flatten(F.transform(
        F.col("ms"),
        lambda x, i: F.transform(
            F.slice(F.col("ms"), i + F.lit(2),
                    F.greatest(F.size(F.col("ms")) - i - F.lit(1), F.lit(0))),
            lambda y: F.struct(x["id"].alias("id_a"), x["q"].alias("qa"),
                               y["id"].alias("id_b"), y["q"].alias("qb")))))
    ).alias("p"))
    # norms are JVM-side scalar folds; the corpus-scale dot goes through
    # the Arrow pandas kernel (repo rule: interpreted HOFs ~1us/element)
    na = F.aggregate(F.col("p.qa"), F.lit(0).cast("long"),
                     lambda acc, x: acc + x * x)
    nb = F.aggregate(F.col("p.qb"), F.lit(0).cast("long"),
                     lambda acc, x: acc + x * x)
    scored = pairs.select(
        F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"),
        pair_dot(F.col("p.qa"), F.col("p.qb")).alias("dot"),
        na.alias("na"), nb.alias("nb"))
    # the exact cosine cross-multiplication dot^2*t_den^2 >= t_num^2*na*nb
    # overflows int64 once quantized norms pass ~38k (int64^(1/4) head
    # room; caught by tests/test_oracle_random_embeddings.py's 40x
    # outlier vectors) — decimal(38,0) keeps it EXACT for quantized
    # coords up to ~1e6 (raw magnitude ~1000); the oracle mirrors with
    # HUGEINT
    dec = "decimal(38,0)"
    return (scored
            .filter((F.col("dot") > 0)
                    & (F.col("dot").cast(dec) * F.col("dot").cast(dec)
                       * F.lit(t_den * t_den).cast(dec)
                       >= F.lit(t_num * t_num).cast(dec)
                       * F.col("na").cast(dec) * F.col("nb").cast(dec)))
            .select("id_a", "id_b"))


def semdedup(embeddings: DataFrame, n_lists: int = 16,
             t_num: int = 9, t_den: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_cluster: int = 4096) -> DataFrame:
    """-> (vec_id, list_id, keeper, is_kept): SemDeDup over the corpus
    at cosine threshold ``t_num/t_den``.  ``is_kept`` = 1 for the
    component representative (min vec_id), 0 for its semantic dups."""
    base = (embeddings.select(F.col(id_col).alias("vec_id"),
                              quantized(F.col(vec_col)).alias("q"))
            .localCheckpoint(eager=True))
    cent_rows = _collect_centroids(
        ivf_train(embeddings, n_lists, "vec_id", vec_col,
                  base=base.select(F.col("vec_id").alias(id_col), "q")
                  if id_col != "vec_id" else base))
    # checkpoint the assignment: it feeds pair generation AND the final
    # per-vector output (two consumers would re-run the Arrow argmin)
    inv = (_assign_lists(base, cent_rows, "vec_id")
           .localCheckpoint(eager=True))
    # checkpoint the dup pairs: near_dup_components symmetrizes them
    # (two selects over the subtree would re-run the Arrow dot kernel)
    dups = (semantic_dup_pairs(inv, t_num, t_den, max_cluster)
            .localCheckpoint(eager=True))
    comp = near_dup_components(dups, id_a="id_a", id_b="id_b").select(
        F.col("doc_id").alias("vec_id"), F.col("component").alias("keeper"))
    return (inv.join(comp, "vec_id", "left")
            .select("vec_id", "list_id",
                    F.coalesce("keeper", "vec_id").alias("keeper"))
            .withColumn("is_kept",
                        (F.col("keeper") == F.col("vec_id"))
                        .cast("long")))
