"""Zoom-dependent ring simplification (Douglas-Peucker) for vector-tile
serving.

The reference serves rings at full resolution at every zoom
(``API/Controllers/TileController.cs:78-141`` re-encodes the same ring
set per request); at low zooms a 4096-extent MVT tile cannot resolve
sub-tolerance vertices, so generalization before encoding is pure win at
scale — fewer bytes shuffled, fewer commands encoded, identical rendered
pixels.

Spark shape: one Arrow-batched ``mapInPandas`` pass.  Each row carries one
ring as coordinate arrays; the kernel applies the stack-based
:func:`kernels.dp_keep_mask` per ring (numpy inner loops over the ring's
vertices, no per-vertex Python).  No shuffle at all: simplification is
embarrassingly parallel over rings, so the operator preserves the input
partitioning for whatever join/encode follows.

Degenerate-collapse contract: a CLOSED ring (first == last) that
simplifies below 4 points (3 distinct vertices + closing duplicate) can no
longer bound area; it is emitted with ``collapsed = true`` and its
ORIGINAL coordinates so the caller decides (drop for polygon layers, keep
for line layers) — silent drops hide mass, per the no-silent-caps rule.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels as K

_OUT_SCHEMA = T.StructType([
    T.StructField("ring_id", T.StringType()),
    T.StructField("xs", T.ArrayType(T.DoubleType())),
    T.StructField("ys", T.ArrayType(T.DoubleType())),
    T.StructField("n_before", T.LongType()),
    T.StructField("n_after", T.LongType()),
    T.StructField("collapsed", T.BooleanType()),
])


def simplify_rings(rings: DataFrame, tol: float,
                   id_col: str = "ring_id",
                   x_col: str = "xs", y_col: str = "ys") -> DataFrame:
    """rings(ring_id, xs, ys) -> (ring_id, xs, ys, n_before, n_after,
    collapsed) with Douglas-Peucker tolerance ``tol`` (same units as the
    coordinates; for quantized tile space pass quant-cell multiples)."""
    cols = rings.select(F.col(id_col).cast("string").alias("ring_id"),
                        F.col(x_col).cast("array<double>").alias("xs"),
                        F.col(y_col).cast("array<double>").alias("ys"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, xs, ys in zip(pdf["ring_id"], pdf["xs"], pdf["ys"]):
                x = np.asarray(xs, dtype=np.float64)
                y = np.asarray(ys, dtype=np.float64)
                n = x.size
                closed = n > 0 and x[0] == x[-1] and y[0] == y[-1]
                mask = K.dp_keep_mask(x, y, tol)
                kept = int(mask.sum())
                if closed and kept < 4:
                    out.append((rid, x, y, n, n, True))
                else:
                    out.append((rid, x[mask], y[mask], n, kept, False))
            yield pd.DataFrame(out, columns=[
                "ring_id", "xs", "ys", "n_before", "n_after", "collapsed"])

    return cols.mapInPandas(kernel, _OUT_SCHEMA)


def simplification_stats(simplified: DataFrame) -> DataFrame:
    """Per-collapse rollup: rings, vertices before/after, collapse count —
    the counters a 100 TB tiling job logs per zoom level."""
    return simplified.agg(
        F.count("*").cast("long").alias("n_rings"),
        F.sum("n_before").cast("long").alias("vertices_before"),
        F.sum("n_after").cast("long").alias("vertices_after"),
        F.sum(F.col("collapsed").cast("long")).cast("long")
        .alias("n_collapsed"))
