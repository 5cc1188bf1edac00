"""Banded interval join (operators/interval_join.py).

The catalog oracle gate (test_catalog_oracle.py::range_join) checks
bit-for-bit equality with the plain theta-join; this file pins the two
properties the banding exists for: the PLAN contains no nested-loop /
cartesian join, and matches are found exactly once even when an interval
spans many bands.
"""

import pandas as pd
import pyspark.sql.functions as F

from urbanistic_polygons_spark.operators.interval_join import (
    interval_join_banded)


def test_no_nested_loop_in_plan(spark):
    from urbanistic_polygons_spark.catalog import build_catalog
    df = build_catalog()["range_join"]["spark"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_exactly_once_across_bands(spark):
    # interval [5, 95) spans bands 0..9 at width 10; each point matches
    # exactly once no matter which band it falls in (incl. band edges)
    iv = spark.createDataFrame(pd.DataFrame(
        {"iid": [1], "k": [7], "s_us": [5], "e_us": [95]}))
    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": [10, 11, 12, 13, 14, 15], "k": [7, 7, 7, 7, 7, 9],
         "ts_us": [5, 10, 50, 94, 95, 50]}))
    j = interval_join_banded(pts, iv, band=10, keys=["k"],
                             how="inner").toPandas()
    # ts 5,10,50,94 match (95 is outside the half-open end; k=9 wrong key)
    assert sorted(j["pid"]) == [10, 11, 12, 13]
    assert j["pid"].is_unique


def test_randomized_vs_brute_force(spark):
    # seeded stress: interval lengths 0..70 (0-7 bands at width 10, incl.
    # degenerate empty), timestamps clustered so band boundaries are hit,
    # multiple keys — banded result must equal the brute-force theta join
    import numpy as np
    rng = np.random.default_rng(7)
    n_iv, n_pt = 200, 500
    iv = pd.DataFrame({
        "iid": np.arange(n_iv),
        "k": rng.integers(0, 5, n_iv),
        "s_us": rng.integers(0, 300, n_iv),
    })
    iv["e_us"] = iv["s_us"] + rng.integers(0, 71, n_iv)
    pts = pd.DataFrame({
        "pid": np.arange(n_pt),
        "k": rng.integers(0, 5, n_pt),
        "ts_us": rng.integers(0, 380, n_pt),
    })
    got = (interval_join_banded(spark.createDataFrame(pts),
                                spark.createDataFrame(iv),
                                band=10, keys=["k"], how="inner")
           .select("iid", "pid").toPandas()
           .sort_values(["iid", "pid"]).reset_index(drop=True))
    m = iv.merge(pts, on="k")
    exp = (m[(m["ts_us"] >= m["s_us"]) & (m["ts_us"] < m["e_us"])]
           [["iid", "pid"]].sort_values(["iid", "pid"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_left_keeps_empty_intervals(spark):
    iv = spark.createDataFrame(pd.DataFrame(
        {"iid": [1, 2], "k": [1, 2], "s_us": [0, 100], "e_us": [50, 150]}))
    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": [9], "k": [1], "ts_us": [25]}))
    out = (interval_join_banded(pts, iv, band=10, keys=["k"], how="left")
           .groupBy("iid").agg(F.count("pid").alias("n")).toPandas()
           .set_index("iid")["n"])
    assert out[1] == 1 and out[2] == 0
