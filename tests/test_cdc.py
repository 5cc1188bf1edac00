"""MERGE/upsert and SCD2 semantics on hand-built change streams."""
from pyspark.sql import functions as F

from urbanistic_polygons_spark.operators.cdc import (
    latest_changes, merge_upsert, scd2_history)


def _base(spark):
    return spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "k long, v long")


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k long, ts long, v long, op string")


def test_merge_upsert_all_branches(spark):
    # k=1 updated twice (last wins), k=2 deleted, k=3 untouched,
    # k=4 inserted, k=5 inserted then deleted (no row), k=6 delete of a
    # key that never existed (no row)
    ch = _changes(spark, [
        (1, 10, 111, "U"), (1, 20, 122, "U"),
        (2, 10, 999, "D"),
        (4, 10, 400, "U"),
        (5, 10, 500, "U"), (5, 20, 0, "D"),
        (6, 10, 0, "D")])
    out = merge_upsert(_base(spark), ch, ["k"], ["ts"], ["v"])
    got = {r["k"]: (r["v"], r["src"]) for r in out.collect()}
    assert got == {1: (122, "upsert"), 3: (300, "base"), 4: (400, "upsert")}


def test_latest_changes_tiebreak_is_full_struct(spark):
    # equal ts -> the struct comparison falls through to the payload
    ch = _changes(spark, [(1, 10, 5, "U"), (1, 10, 9, "U")])
    got = latest_changes(ch, ["k"], ["ts"], ["v", "op"]).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, 9)]


def test_delete_then_reinsert_order(spark):
    # D at ts 10, U at ts 20 -> the key survives with the later payload
    ch = _changes(spark, [(2, 10, 0, "D"), (2, 20, 222, "U")])
    out = merge_upsert(_base(spark), ch, ["k"], ["ts"], ["v"])
    got = {r["k"]: (r["v"], r["src"]) for r in out.collect()}
    assert got[2] == (222, "upsert")


def test_scd2_history_chain(spark):
    ch = _changes(spark, [(1, 10, 100, "U"), (1, 30, 130, "U"),
                          (1, 20, 120, "U"), (7, 5, 70, "U")])
    hist = scd2_history(ch, ["k"], "ts", ["v"], open_end=99)
    got = sorted((r["k"], r["valid_from"], r["valid_to"], r["v"],
                  r["is_current"]) for r in hist.collect())
    assert got == [(1, 10, 20, 100, 0), (1, 20, 30, 120, 0),
                   (1, 30, 99, 130, 1), (7, 5, 99, 70, 1)]


def test_merge_upsert_empty_changes(spark):
    out = merge_upsert(_base(spark), _changes(spark, []),
                       ["k"], ["ts"], ["v"])
    got = {r["k"]: (r["v"], r["src"]) for r in out.collect()}
    assert got == {1: (100, "base"), 2: (200, "base"), 3: (300, "base")}
