"""Line-level corpus dedup (operators/dedup.py line_dedup_stats) and PII
count/redaction (functions/text.py).  The catalog oracle gate
(test_catalog_oracle.py) hash-checks both against DuckDB; these tests pin
the hand-checkable semantics."""

import pandas as pd

from pyspark.sql import functions as F

from urbanistic_polygons_spark.functions import text as X
from urbanistic_polygons_spark.operators.dedup import line_dedup_stats


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_line_dedup_first_occurrence_wins(spark):
    # doc 0: 10 tokens -> lines [t0..t7], [t8 t9]
    base = " ".join(f"w{i}" for i in range(10))
    rows = [
        (0, base),                      # both lines first occurrences
        (1, base),                      # exact clone: keeps nothing
        (2, "x y z"),                   # unique single line: keeps it
        # shares doc 0's FIRST line exactly (8 tokens), then a new line
        (3, " ".join(f"w{i}" for i in range(8)) + " q r s"),
    ]
    got = {r["doc_id"]: r for r in
           line_dedup_stats(_docs(spark, rows)).collect()}
    assert (got[0]["n_lines"], got[0]["n_kept"], got[0]["n_dropped"]) == (2, 2, 0)
    assert (got[1]["n_lines"], got[1]["n_kept"], got[1]["n_dropped"]) == (2, 0, 2)
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (1, 1)
    # doc 3: line 0 == doc 0's line 0 (dropped), line 1 "q r s" kept
    assert (got[3]["n_lines"], got[3]["n_kept"], got[3]["n_dropped"]) == (2, 1, 1)


def test_line_dedup_position_breaks_ties_within_doc(spark):
    # one doc whose two lines are IDENTICAL: the first position wins, the
    # doc still keeps exactly one copy
    line = " ".join(f"t{i}" for i in range(8))
    got = line_dedup_stats(_docs(spark, [(7, line + " " + line)])).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_lines"], r["n_kept"], r["n_dropped"]) == (2, 1, 1)


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "s": ["mail a1@ex0.com and b@c.org via 10.1.2.3 call +1-555-0042",
              "clean text with no pii at all",
              "two ips 192.168.0.1 8.8.8.8 one mail z9@q7.net"],
    }))
    out = df.select(*X.pii_counts(F.col("s")),
                    X.redact_pii(F.col("s")).alias("red")).collect()
    assert [(r["n_emails"], r["n_ips"], r["n_phones"]) for r in out] == [
        (2, 1, 1), (0, 0, 0), (1, 2, 0)]
    assert out[0]["red"] == "mail <EMAIL> and <EMAIL> via <IP> call <PHONE>"
    assert out[1]["red"] == "clean text with no pii at all"
    assert out[2]["red"] == "two ips <IP> <IP> one mail <EMAIL>"
