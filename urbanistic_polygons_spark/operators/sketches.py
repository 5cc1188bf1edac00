"""Heavy hitters via a mergeable Misra-Gries sketch + exact verify pass.

A training-data pipeline needs "what are the hot tokens / URLs / shingles"
over corpora where the distinct-key set is itself too large to shuffle
(10^11 distinct shingles at 100 TB).  The classic answer is sketch-prune-
verify:

1. **map side** — every partition folds its token stream into a k-counter
   Misra-Gries summary (``mapInPandas``; batch value_counts folded with
   the MG merge rule, so the per-batch cost is one pandas value_counts +
   an O(k) merge, not per-row Python).
2. **merge** — partition summaries (≤ partitions × k rows, scalar-size)
   are merged with the Agarwal et al. (SIGMOD'12, "Mergeable Summaries")
   rule: sum counters, subtract the (k+1)-th largest, drop non-positive.
   The merged summary keeps the MG guarantee: estimated count is within
   n/(k+1) of true, so EVERY item with true frequency > n/(k+1) survives
   as a candidate.  The candidate set (≤ k rows) is collected once.
3. **verify** — one more scan counts the ≤ k candidates EXACTLY (the
   filter makes the final aggregation map-side-tiny) and keeps those with
   true count · (k+1) > n.

The output is therefore a pure function of the input multiset — exact
counts of exactly the items above the frequency threshold — independent
of partitioning and stream order, even though the intermediate sketches
are not.  The naive plan shuffles every distinct key; this plan shuffles
partitions × k candidate rows plus a k-row aggregate.

Reference analog: none (the reference has no sketch layer); this is the
LLM-pipeline extension surface (SURVEY §2.8).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X


def mg_merge(counts: dict, k: int) -> dict:
    """Misra-Gries reduction: if more than k counters, subtract the
    (k+1)-th largest count from all and drop the non-positive ones.
    Merging two summaries = sum dicts, then reduce (Agarwal et al.)."""
    if len(counts) <= k:
        return dict(counts)
    vs = sorted(counts.values(), reverse=True)
    sub = vs[k]
    return {t: c - sub for t, c in counts.items() if c > sub}


_SKETCH_SCHEMA = T.StructType([
    T.StructField("token", T.StringType()),
    T.StructField("c", T.LongType()),
])


def _partial_sketches(k: int):
    def fn(batches):
        import pandas as pd
        sketch: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            vc = pdf["token"].value_counts()
            # a batch's exact counts are themselves a valid MG summary;
            # fold them in with the merge rule (O(k + batch distinct))
            for t, c in vc.items():
                sketch[t] = sketch.get(t, 0) + int(c)
            sketch = mg_merge(sketch, k)
        # the null-token row carries this partition's row count, so the
        # sketch pass doubles as the COUNT pass (2 scans total, not 3)
        rows = list(sketch.items()) + [(None, n)]
        yield pd.DataFrame(rows, columns=["token", "c"])
    return fn


def heavy_hitters(df: DataFrame, token_col: str, k: int = 32) -> DataFrame:
    """-> (token, cnt): EXACT counts of every token whose frequency
    exceeds n/(k+1), found without ever shuffling the distinct-key set.

    ``df[token_col]`` is one token per row (explode upstream)."""
    toks = df.select(F.col(token_col).cast("string").alias("token"))
    partial = toks.mapInPandas(_partial_sketches(k), schema=_SKETCH_SCHEMA)
    # partition summaries are scalar-size (partitions x k); merge once on
    # the driver and share the candidate list as a literal (repo rule:
    # collect scalar-size results ONCE)
    summary_rows = partial.collect()  # scalar-size: partitions x (k+1)
    merged: dict = {}
    n = 0
    for row in summary_rows:
        if row["token"] is None:
            n += row["c"]
        else:
            merged[row["token"]] = merged.get(row["token"], 0) + row["c"]
    cand = list(mg_merge(merged, k).keys())
    if not cand:
        return toks.groupBy("token").agg(
            F.count("*").cast("long").alias("cnt")).filter(F.lit(False))
    exact = (toks.filter(F.col("token").isin(cand))
             .groupBy("token").agg(F.count("*").cast("long").alias("cnt")))
    return exact.filter(F.col("cnt") * (k + 1) > F.lit(n))


# -- HyperLogLog with deterministic portable registers ----------------------
# The second classic mergeable sketch (Flajolet et al., AofA'07): distinct
# counting where the distinct-key set is itself too large to shuffle.  The
# registers are derived from the repo's portable md5 hash, so the whole
# computation — bucket, rank, register max, integer estimator — is
# bit-for-bit reproducible in the DuckDB oracle (unlike Spark's built-in
# approx_count_distinct, whose sketch is engine-internal).

HLL_P = 6                       # 2^6 = 64 registers; std error ~1.04/8 = 13%
HLL_ALPHA_PERMILLE = 709        # alpha_64 from the HLL paper
_HLL_SCALE = 1 << 40            # integer 2^-rho arithmetic: term = 2^40 >> rho


def _rho(rest):
    """1 + count-trailing-zeros of the post-bucket hash bits, as a branch-
    free divisibility sum (ctz = max b with rest % 2^b == 0, monotone in
    b) — the same 40-term expression renders in any SQL dialect."""
    ctz = None
    for b in range(1, 41):
        term = F.when(rest % F.lit(1 << b) == 0, F.lit(1)).otherwise(F.lit(0))
        ctz = term if ctz is None else ctz + term
    return (F.lit(1) + ctz).alias("rho")


def hll_distinct(df: DataFrame, key_col: str,
                 group_cols: list[str]) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate PLUS the exact count
    for verification: (group..., n_exact, n_buckets, s_scaled, hll_est).

    Scale shape (100 TB): the register aggregation is two partial-
    aggregable groupBys whose reduce key space is groups x 64 buckets —
    the distinct-key set is NEVER shuffled (registers merge with MAX, so
    this extends to any pre-aggregated/mergeable layout).  ``n_exact``
    (a real distinct shuffle) is included for estimate verification in
    the catalog/oracle; a production rollup reads the registers only.

    Estimator: raw HLL, alpha_64 * m^2 / sum(2^-rho), computed entirely
    in BIGINT (term = 2^40 >> rho, empty buckets contribute 2^40, final
    alpha multiply in permille) — deterministic in both engines.  No
    small-range linear-counting correction (it needs a float log;
    determinism is worth more here than the small-range bias, and the
    registers themselves are the durable artifact).
    """
    m = 1 << HLL_P
    h = X.hash60(F.col(key_col).cast("string"))
    keyed = (df.select(*group_cols, h.alias("h"))
             .select(*group_cols,
                     (F.col("h") % m).alias("bucket"),
                     F.expr(f"h DIV {m}").alias("rest")))
    reg = (keyed.select(*group_cols, "bucket", _rho(F.col("rest")))
           .groupBy(*group_cols, "bucket")
           .agg(F.max("rho").alias("rho")))
    per = (reg.withColumn(
        "term", F.expr(f"{_HLL_SCALE} DIV shiftleft(1L, rho)"))
        .groupBy(*group_cols)
        .agg(F.count("*").cast("long").alias("n_buckets"),
             F.sum("term").cast("long").alias("s_nonempty")))
    per = per.withColumn(
        "s_scaled",
        (F.lit(m) - F.col("n_buckets")) * F.lit(_HLL_SCALE)
        + F.col("s_nonempty"))
    # raw = min(alpha-free ratio m^2 * 2^40 / S, 2^40) keeps the permille
    # multiply below inside int64
    hll = per.select(
        *group_cols, "n_buckets", "s_scaled",
        F.expr(f"({HLL_ALPHA_PERMILLE} * "
               f"least(CAST({m * m} AS BIGINT) * {_HLL_SCALE} "
               f"DIV greatest(s_scaled, 1), {_HLL_SCALE})) DIV 1000")
        .cast("long").alias("hll_est"))
    exact = (df.groupBy(*group_cols)
             .agg(F.count_distinct(F.col(key_col)).cast("long")
                  .alias("n_exact")))
    return (exact.join(hll, group_cols)
            .select(*group_cols, "n_exact", "n_buckets", "s_scaled",
                    "hll_est"))


# -- Count-min sketch --------------------------------------------------------
# The third classic mergeable sketch (Cormode & Muthukrishnan, J.Alg'05):
# point-frequency estimation over a key space too large to shuffle.  Unlike
# Misra-Gries (which keeps only the top-k survivors) the CM table answers
# est(x) for ANY x after the fact, with the one-sided guarantee
# cnt(x) <= est(x) <= cnt(x) + e*n/w (w buckets, probability 1 - 2^-d).
# Buckets come from the repo's portable md5 hash, so the whole table —
# and therefore every estimate — is bit-for-bit reproducible in the DuckDB
# oracle, unlike a sketch built on engine-internal hashing.

CMS_D = 4                       # depth: 4 independent hash rows
CMS_W = 512                     # width: e*n/512 overcount bound per row


def cms_buckets(token: F.Column, d: int = CMS_D, w: int = CMS_W) -> F.Column:
    """Array of the token's d row-salted portable buckets (row r uses
    hash31('cms<r>:' || token) mod w — same literal salt in the oracle)."""
    return F.array(*[
        F.pmod(X.hash31(F.concat(F.lit(f"cms{r}:"), token)), F.lit(w))
        for r in range(d)])


def cms_table(toks: DataFrame, token_col: str = "token",
              d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """-> (r, b, c): the d x w count-min table.  ONE pass: every token
    occurrence increments d cells via posexplode; the groupBy is
    partially aggregable, so the shuffle carries at most
    partitions x d x w cell rows no matter the corpus size, and the
    result is a pure function of the input multiset (merge two corpora =
    sum their tables cell-wise)."""
    tok = F.col(token_col)
    # posexplode_outer, not posexplode: the bucket array is never
    # null/empty, and plain explode lets InferFiltersFromGenerate push an
    # inlined copy of the d-hash generator into an interpreted Filter
    # (repo rule)
    return (toks.filter(tok.isNotNull())
            .select(F.posexplode_outer(cms_buckets(tok, d, w))
                    .alias("r", "b"))
            .groupBy("r", "b").agg(F.count("*").cast("long").alias("c")))


def cms_estimates(toks: DataFrame, token_col: str = "token",
                  d: int = CMS_D, w: int = CMS_W,
                  probe_mod: int = 11) -> DataFrame:
    """-> (token, est, cnt, err) for a deterministic probe subset of the
    distinct tokens (those with hash31('cmsprobe:'||token) % probe_mod
    == 0): est = min over the d rows of the token's cell, cnt = exact
    count (one filtered counting pass — the same sketch-then-verify shape
    as heavy_hitters), err = est - cnt (>= 0 by the CM guarantee; the
    invariant is asserted in tests and visible in the output).

    Scale shape: two corpus scans (table pass + filtered probe pass);
    the d x w table (<= 2048 rows) broadcasts to the probe side; nothing
    shuffles the distinct-key set."""
    tok = F.col(token_col)
    cells = cms_table(toks, token_col, d, w)
    probes = (toks.filter(tok.isNotNull())
              .filter(F.pmod(X.hash31(F.concat(F.lit("cmsprobe:"), tok)),
                             F.lit(probe_mod)) == 0)
              .groupBy(tok.alias("token"))
              .agg(F.count("*").cast("long").alias("cnt")))
    probed = (probes
              .select("token", "cnt",
                      F.posexplode_outer(cms_buckets(F.col("token"), d, w))
                      .alias("r", "b"))
              .join(F.broadcast(cells), ["r", "b"]))
    return (probed.groupBy("token")
            .agg(F.min("cnt").alias("cnt"), F.min("c").alias("est"))
            .select("token", "est", "cnt",
                    (F.col("est") - F.col("cnt")).alias("err")))


# -- HDR-histogram quantile sketch -------------------------------------------
# The fourth mergeable sketch: quantiles over a value set too large to
# sort (exact_quantiles/grouped_quantiles shuffle the values or their
# fine buckets; at 100 TB even the bucket table can be bigger than the
# answer needs).  HdrHistogram's layout (Tene, hdrhistogram.org) buckets
# a non-negative integer by (exponent, top mantissa bits): with s
# sub-bucket bits every bucket spans a 2^-s relative range, so any
# quantile is answered with <= 2^-s relative error from a table of at
# most 64 * 2^s cells per group — mergeable cell-wise (counts add), so
# sketches of shards combine without re-reading data.
#
# Everything is integer: exponent = length(bin(v)) - 1 (exact bit length
# in both engines — no float log anywhere), mantissa = v >> (e - s), and
# (e, m) ascending is value ascending, so rank selection is a window
# cumsum over the CELLS, never the values.  The reported bounds
# [est_lo, est_hi] bracket the true rank-k value by construction; the
# pytest gate asserts the exact quantile lands inside and that the
# sketch of a union equals the cell-wise sum of the shard sketches.

HDR_SUBBITS = 5                 # relative error <= 2^-5 (~3.1%)


def hdr_cells(df: DataFrame, group_col: str, value_col: str,
              subbits: int = HDR_SUBBITS) -> DataFrame:
    """-> (g, e, m, c): the per-group HDR cell table.  ONE partially-
    aggregable groupBy; the shuffle carries at most
    groups x 64 x 2^subbits cell rows regardless of input size.
    Negative values are the caller's bug (asserted away in tests);
    v = 0 lands in cell (0, 0)."""
    base = df.select(F.col(group_col).alias("g"),
                     F.col(value_col).cast("long").alias("v"))
    b = (base
         .withColumn("e", (F.length(F.bin(F.col("v"))) - 1).cast("long"))
         .withColumn("m", F.expr(
             f"shiftright(v, cast(greatest(e - {subbits}, 0) as int))")))
    return (b.groupBy("g", "e", "m")
            .agg(F.count("*").cast("long").alias("c")))


def hdr_quantiles(df: DataFrame, group_col: str, value_col: str,
                  q_permyriad: list[int],
                  subbits: int = HDR_SUBBITS) -> DataFrame:
    """Per-group quantile brackets from the HDR cell table:
    (g, q_permyriad, n, k, est_lo, est_hi) — est_lo/est_hi are the
    bucket bounds containing the exact rank-k value (ceil-rank, the same
    k formula as grouped_quantiles), so
    est_lo <= true quantile <= est_hi <= est_lo * (1 + 2^-subbits).

    Scale shape: one cell-table shuffle (bounded above), a window over
    the CELLS of each group (<= 64 * 2^subbits rows), and a broadcast
    join of the groups x |q| target ranks against the cells — the value
    set itself is never sorted or shuffled."""
    cells = hdr_cells(df, group_col, value_col, subbits)
    wc = Window.partitionBy("g").orderBy("e", "m")
    cum = (cells
           .withColumn("cum", F.sum("c").over(wc).cast("long")))
    n = cells.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    qs = F.array(*[F.lit(q) for q in q_permyriad])
    targets = (n.select("g", "n",
                        F.explode_outer(qs).alias("q_permyriad"))
               .withColumn("q_permyriad",
                           F.col("q_permyriad").cast("long"))
               .withColumn(
                   "k",
                   F.expr("least(greatest(1L, "
                          "(q_permyriad * n + 9999) DIV 10000), n)")))
    # explicit alias on the broadcast side: cum and targets share the
    # cells lineage, and the bare self-join key triggers Spark's
    # "trivially true equals" warning even though plan-id resolution
    # disambiguates it correctly
    targets = targets.withColumnRenamed("g", "tg")
    hit = cum.join(
        F.broadcast(targets),
        (F.col("g") == F.col("tg"))
        & (F.col("cum") >= F.col("k"))
        & (F.col("cum") - F.col("c") < F.col("k")))
    return hit.select(
        F.col("g").alias(group_col), "q_permyriad", "n", "k",
        F.expr(f"shiftleft(m, cast(greatest(e - {subbits}, 0) as int))")
        .cast("long").alias("est_lo"),
        (F.expr(f"shiftleft(m, cast(greatest(e - {subbits}, 0) as int))")
         + F.expr(f"shiftleft(1L, cast(greatest(e - {subbits}, 0) as int))")
         - F.lit(1)).cast("long").alias("est_hi"))
