"""Z-order (Morton) data layout — spatial locality for 100 TB scans.

At production scale the dominant cost of every spatial query is the
SCAN: a query window touches a set of z14 cells, and if the table
layout scatters each cell's rows across every file, min/max column
statistics prune nothing and the whole table is read.  Interleaving the
quantized coordinates into a single Morton key and range-partitioning +
sorting the write on it makes file key-ranges disjoint and spatially
compact, so cell/bbox predicates prune to a handful of files (the same
reason Iceberg ships a z-order rewrite action; this is the engine-native
form for plain parquet sinks, and `write_zordered` maps 1:1 onto
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``
when the Iceberg jars are present).

Everything is a static JVM Column expression (shift/mask/sum unrolled
per bit — whole-stage-codegen friendly, no UDF), and the oracle SQL is
generated from the SAME bit loop so both engines evaluate the identical
arithmetic.

Reference tie-in: the reference keys its tile store by (z, x, y) path
components (TileStatic.cs tile math) — a z-order key is the flattened,
sortable generalization that survives being a single Iceberg/parquet
sort column.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: px < 1,890,000 < 2^21 in the catalog micro space
DEFAULT_BITS = 21


def zorder_key(x: Column | str, y: Column | str,
               bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave two non-negative integer columns: bit i of x
    lands at key bit 2i, bit i of y at 2i+1.  Bijective on
    [0,2^bits)^2 -> [0,4^bits), monotone within each quadrant."""
    xc = F.col(x).cast("long") if isinstance(x, str) else x.cast("long")
    yc = F.col(y).cast("long") if isinstance(y, str) else y.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftright(xc, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * i)))
        terms.append(F.shiftright(yc, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * i + 1)))
    return reduce(lambda a, b: a + b, terms).alias("zkey")


def zorder_key_sql(x_expr: str, y_expr: str,
                   bits: int = DEFAULT_BITS) -> str:
    """The SAME interleave as DuckDB-dialect integer arithmetic (// and %
    instead of shift/mask — identical values for non-negative inputs)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_expr}) // {1 << i}) % 2 * {1 << (2 * i)}")
        terms.append(f"(({y_expr}) // {1 << i}) % 2 * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(df: DataFrame, x: str, y: str, path: str,
                   num_files: int, bits: int = DEFAULT_BITS) -> None:
    """Write ``df`` as parquet laid out along the z-order curve:
    repartitionByRange on the Morton key (disjoint per-file key ranges,
    AQE-sampled boundaries absorb skew) + sortWithinPartitions (compact
    per-rowgroup min/max stats), so downstream cell/bbox scans prune at
    BOTH the file and the row-group level."""
    keyed = df.withColumn("zkey", zorder_key(x, y, bits))
    (keyed.repartitionByRange(num_files, "zkey")
     .sortWithinPartitions("zkey")
     .write.mode("overwrite").parquet(path))
