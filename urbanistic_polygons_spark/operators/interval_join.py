"""Banded interval join: point-in-interval joins without a BNLJ.

Spark has no native range-join strategy in local builds: a join whose only
condition is ``p.ts BETWEEN i.start AND i.end`` falls back to
BroadcastNestedLoopJoin (or a cartesian when neither side broadcasts) —
the classic 100 TB scale-killer.  The standard fix, used by every
warehouse engine that offers "range join optimization", is BANDING:

1. pick a band width ``W`` (time bucketing granularity);
2. explode each interval into the bands it covers — replication factor is
   ``len/W + 1``, bounded by choosing ``W`` near the typical interval
   length;
3. a POINT lives in exactly one band, so an equi-join on
   ``(band, *keys)`` followed by the exact range refine finds every
   matching pair EXACTLY ONCE — no post-join dedup, by construction
   (the landuse cell-grid joins use the same canonical-meeting-cell
   argument in 2-D).

The equi-join shuffles on ``(band, keys)``, partial-aggregates map-side,
and AQE's skew handling applies if one band is hot — every piece is plan-
optimizable, unlike a BNLJ.

Reference parity note: the reference has no temporal joins (OSM geometry
engine); this is an engine extra under SURVEY.md §2.3's join family,
built from the same banding idea as its cell-grid spatial joins.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_banded(
        points: DataFrame, intervals: DataFrame,
        band: int, keys: list[str],
        ts: str = "ts_us", start: str = "s_us",
        end: str = "e_us", how: str = "left",
        extra: Optional[Callable[[DataFrame, DataFrame], Column]] = None,
) -> DataFrame:
    """Join ``points`` (integer event-time column ``ts``) to ``intervals``
    (half-open ``[start, end)``, same unit) on containment plus the
    ``keys`` equi-columns, banded at width ``band``.

    Returns intervals joined to their contained points. With
    ``how='left'`` every interval survives (its unmatched band rows carry
    null point columns — aggregate with null-skipping COUNT/SUM, exactly
    one null row per empty band, never a duplicate match).  ``extra`` is
    an optional callable ``(interval_side, point_side) -> Column`` adding
    a join predicate over both sides (e.g. a self-exclusion).
    """
    # a half-open interval [s, e) with e > s covers bands
    # s DIV W .. (e-1) DIV W (integer division — exact at any epoch-micros
    # magnitude, where floor(x/W) in doubles would ride on 53-bit rounding;
    # assumes non-negative times, as DIV truncates toward zero); the
    # sequence is never empty, so explode_outer (the plain explode would
    # let Catalyst inline the generator into an interpreted pushed-down
    # filter — CLAUDE.md rule)
    ib = intervals.withColumn(
        "band", F.explode_outer(F.sequence(
            F.expr(f"`{start}` DIV {band}"),
            F.expr(f"(`{end}` - 1) DIV {band}"))))
    # the two sides often share lineage (e.g. intervals filtered out of the
    # points table): ib[k] == pb[k] would then resolve to the SAME
    # attribute — a trivially-true predicate that silently drops the
    # equi-key (Spark only warns).  Renaming the point side's join columns
    # makes every predicate unambiguous by construction.
    pb = points.withColumn("__pt_band", F.expr(f"`{ts}` DIV {band}"))
    for k in keys:
        pb = pb.withColumnRenamed(k, f"__pt_{k}")
    cond = (ib["band"] == pb["__pt_band"])
    for k in keys:
        cond = cond & (ib[k] == pb[f"__pt_{k}"])
    cond = cond & (pb[ts] >= ib[start]) & (pb[ts] < ib[end])
    if extra is not None:
        cond = cond & extra(ib, pb)
    j = ib.join(pb, cond, how).drop("band", "__pt_band",
                                    *[f"__pt_{k}" for k in keys])
    return j
