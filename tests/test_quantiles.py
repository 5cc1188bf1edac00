"""Exact distributed quantiles (operators/quantiles.py): equality with a
plain sorted-list nearest-rank oracle across widths, tie handling, rank
clamping, and the empty-input schema contract.  The catalog entry
``exact_quantiles`` is additionally hash-compared against the DuckDB
ROW_NUMBER oracle by test_catalog_oracle.py."""

import numpy as np
import pandas as pd
import pytest

from urbanistic_polygons_spark.operators.quantiles import exact_quantiles


def _oracle(values, qs_permyriad):
    s = sorted(values)
    n = len(s)
    out = {}
    for q in qs_permyriad:
        k = min(max(1, -(-(q * n) // 10000)), n)
        out[q] = (k, s[k - 1])
    return out


@pytest.mark.parametrize("width", [1, 16, 1000])
def test_matches_sorted_oracle(spark, width):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 500, 400).tolist() + [7] * 50  # heavy tie mass
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    qs = [1, 2500, 5000, 9000, 9999, 10000]
    got = {r["q_permyriad"]: (r["global_rank"], r["value"])
           for r in exact_quantiles(df, "x", qs, bucket_width=width).collect()}
    assert got == _oracle(vals, qs)


def test_single_row_and_clamp(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [42]}))
    got = {r["q_permyriad"]: (r["global_rank"], r["value"])
           for r in exact_quantiles(df, "x", [1, 10000]).collect()}
    assert got == {1: (1, 42), 10000: (1, 42)}


def test_empty_input_keeps_schema(spark):
    df = spark.createDataFrame([], "x long")
    out = exact_quantiles(df, "x", [5000])
    assert out.columns == ["q_permyriad", "global_rank", "value"]
    assert out.count() == 0


def test_grouped_matches_per_group_oracle(spark):
    from urbanistic_polygons_spark.operators.quantiles import (
        grouped_quantiles)
    rng = np.random.default_rng(5)
    rows = []
    sizes = {"a": 1, "b": 7, "c": 400}
    for g, n in sizes.items():
        for v in rng.integers(0, 300, n):
            rows.append((g, int(v)))
    df = spark.createDataFrame(rows, "g string, x long")
    qs = [2500, 5000, 9000, 10000]
    for width in (1, 16, 512):
        got = {(r["g"], r["q_permyriad"]): (r["global_rank"], r["value"])
               for r in grouped_quantiles(df, "g", "x", qs,
                                          bucket_width=width).collect()}
        want = {}
        for g in sizes:
            vals = [v for gg, v in rows if gg == g]
            for q, (k, val) in _oracle(vals, qs).items():
                want[(g, q)] = (k, val)
        assert got == want, width


def test_grouped_empty_qs_raises(spark):
    from urbanistic_polygons_spark.operators.quantiles import (
        grouped_quantiles)
    df = spark.createDataFrame([("a", 1)], "g string, x long")
    with pytest.raises(ValueError):
        grouped_quantiles(df, "g", "x", [])
