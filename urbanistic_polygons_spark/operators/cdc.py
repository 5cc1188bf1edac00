"""Change-data-capture application: MERGE/upsert and SCD type-2 history
— the lakehouse write patterns a production table maintained by this
engine needs (the reference's tables are rebuilt from scratch per tile,
TiledBarrierGraphBuilder.cs:45-79; a 100 TB deployment applies deltas).

Both operators are pure DataFrame compositions with the scale shape that
matters:

* ``latest_changes`` — per-key last-writer-wins reduction of a change
  stream as ONE aggregation: max over the struct (orde..., payload)
  (partial-aggregable map-side; never a window sort over the stream).
* ``merge_upsert`` — MERGE INTO semantics (Iceberg/Delta ``WHEN MATCHED
  UPDATE / DELETE, WHEN NOT MATCHED INSERT``): the reduced change set
  full-outer-joins the base on the key — one co-partitioned shuffle
  each side, AQE-skew-safe; deletes filter, upserts project.  The base
  never passes through a window or a collect.
* ``scd2_history`` — slowly-changing-dimension type 2: each key's
  change sequence becomes versioned rows with ``valid_from``/
  ``valid_to``/``is_current`` via one per-key window ``lead`` (bounded
  by a key's change count, never the corpus).

Determinism: ties inside one key break by the full (order..., payload)
struct comparison, so the result is a pure function of the change
multiset — reproducible in the DuckDB oracle bit-for-bit (integer
cents, epoch-micro timestamps).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(changes: DataFrame, key_cols: list[str],
                   order_cols: list[str],
                   payload_cols: list[str]) -> DataFrame:
    """Last-writer-wins per key: one struct-max aggregation (the engine's
    standard argmax — no window, both phases partial-aggregable)."""
    s = F.struct(*[F.col(c) for c in order_cols],
                 *[F.col(c) for c in payload_cols])
    best = changes.groupBy(*key_cols).agg(F.max(s).alias("_b"))
    return best.select(*key_cols,
                       *[F.col(f"_b.{c}").alias(c)
                         for c in order_cols + payload_cols])


def merge_upsert(base: DataFrame, changes: DataFrame, key_cols: list[str],
                 order_cols: list[str], payload_cols: list[str],
                 op_col: str = "op") -> DataFrame:
    """MERGE the change stream into ``base``: the latest change per key
    wins; op 'D' deletes the key, any other op upserts the payload.
    Keys untouched by changes pass through.  Output: key cols + payload
    cols + ``src`` ('base' | 'upsert').

    ``base`` must carry the same payload columns; unmatched inserts take
    the change payload (full-outer join, null-safe on both sides)."""
    latest = latest_changes(changes, key_cols,
                            order_cols, payload_cols + [op_col])
    b = base.select(*key_cols,
                    *[F.col(c).alias(f"_base_{c}") for c in payload_cols])
    merged = b.join(latest, key_cols, "full_outer")
    no_change = F.col(op_col).isNull()
    deleted = F.col(op_col) == "D"
    out_cols = [
        F.when(no_change, F.col(f"_base_{c}")).otherwise(F.col(c)).alias(c)
        for c in payload_cols]
    return (merged.filter(no_change | ~deleted)
            .select(*key_cols, *out_cols,
                    F.when(no_change, F.lit("base")).otherwise(
                        F.lit("upsert")).alias("src")))


def scd2_history(changes: DataFrame, key_cols: list[str],
                 order_col: str, payload_cols: list[str],
                 open_end: int = 2 ** 62) -> DataFrame:
    """SCD type-2 version chain per key: one row per change with
    ``valid_from`` = its order value, ``valid_to`` = the next change's
    (or ``open_end``), ``is_current`` on the last.  One per-key window
    ``lead`` — partition size = a key's change count."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    nxt = F.lead(order_col).over(w)
    return changes.select(
        *key_cols, *payload_cols,
        F.col(order_col).cast("long").alias("valid_from"),
        F.coalesce(nxt.cast("long"), F.lit(open_end).cast("long"))
        .alias("valid_to"),
        nxt.isNull().cast("long").alias("is_current"))
