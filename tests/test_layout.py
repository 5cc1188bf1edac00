"""Z-order layout (operators/layout.py): key correctness vs a pure-Python
interleave, and the write path's pruning contract (disjoint per-file key
ranges, rows preserved, sorted within files).  The catalog entry
``zorder_layout`` is additionally hash-compared against the DuckDB
arithmetic oracle by test_catalog_oracle.py."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from urbanistic_polygons_spark.operators.layout import (
    zorder_key, write_zordered)


def _morton_py(x: int, y: int, bits: int = 21) -> int:
    k = 0
    for i in range(bits):
        k |= ((x >> i) & 1) << (2 * i)
        k |= ((y >> i) & 1) << (2 * i + 1)
    return k


def test_zorder_key_matches_python(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 21, 300)
    ys = rng.integers(0, 1 << 21, 300)
    pdf = pd.DataFrame({"x": xs, "y": ys}).drop_duplicates()
    df = spark.createDataFrame(pdf)
    got = (df.select("x", "y", zorder_key("x", "y"))
           .toPandas().set_index(["x", "y"])["zkey"])
    for x, y in pdf.itertuples(index=False):
        assert got.loc[(int(x), int(y))] == _morton_py(int(x), int(y))


def test_zorder_locality_adjacent_cells_share_prefix(spark):
    # quadrant monotonicity: all keys of the low quadrant sort before any
    # key of the high quadrant — the property file pruning relies on
    df = spark.createDataFrame(
        pd.DataFrame({"x": [0, 1, 2, 3, 1 << 20, (1 << 20) + 1],
                      "y": [0, 1, 2, 3, 1 << 20, (1 << 20) + 5]}))
    keys = [r["zkey"] for r in df.select(zorder_key("x", "y")).collect()]
    low, high = keys[:4], keys[4:]
    assert max(low) < min(high)


def test_write_zordered_disjoint_file_ranges(spark, tmp_path):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"px": rng.integers(0, 1 << 18, 4000),
                        "py": rng.integers(0, 1 << 18, 4000)})
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "zordered")
    write_zordered(df, "px", "py", out, num_files=8)
    back = (spark.read.parquet(out)
            .withColumn("f", F.input_file_name()))
    assert back.count() == 4000
    ranges = (back.groupBy("f")
              .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
              .collect())
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    assert len(spans) > 1
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # disjoint => min/max stats prune files
