"""Streaming form of the HDR quantile sketch: because the batch sketch
is one partially-aggregable groupBy, the identical cell table maintains
incrementally under Structured Streaming — asserted by parity with the
batch hdr_cells over the same documents, plus append-mode close-once
semantics on the window."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from urbanistic_polygons_spark.operators.sketches import hdr_cells
from urbanistic_polygons_spark.streaming.ingest import (
    DOC_STREAM_SCHEMA, stream_documents, streaming_hdr_cells)


def _doc(i, ts, texts):
    return (f"doc_{i}", ts,
            [{"kind": "text", "text": t, "media_ref": "", "offset": j}
             for j, t in enumerate(texts)])


def _rows():
    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        # lengths spread across several HDR cells (3 .. ~600 chars)
        texts = ["x" * (3 + 7 * (i % 5)), "y" * (20 * (i % 3))]
        rows.append(_doc(i, t0 + timedelta(minutes=i), texts))
    return rows


def test_streaming_cells_match_batch_sketch(spark, tmp_path):
    rows = _rows()
    src = str(tmp_path / "docs")
    df = spark.createDataFrame(rows, DOC_STREAM_SCHEMA)
    df.write.parquet(src)

    agg = streaming_hdr_cells(stream_documents(spark, src))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("hdr_cells_stream").start())
    q.processAllAvailable()
    q.stop()
    got = {(r["window_start"], r["e"], r["m"]): r["c"]
           for r in spark.sql("SELECT * FROM hdr_cells_stream").collect()}

    # batch reference: same v per doc, same cells, grouped by the same
    # tumbling window via the batch operator
    batch = (df.select(
        F.window("event_time", "10 minutes")["start"].alias("g"),
        F.aggregate(F.transform("spans",
                                lambda s: F.length(s["text"])),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x.cast("long")).alias("v")))
    want = {(r["g"], r["e"], r["m"]): r["c"]
            for r in hdr_cells(batch, "g", "v").collect()}
    assert got == want and len(got) > 5


def test_streaming_hdr_append_close_once(spark, tmp_path):
    src = tmp_path / "docs_append"
    src.mkdir()
    t0 = datetime(2024, 1, 1)

    def write_batch(rows):
        spark.createDataFrame(rows, DOC_STREAM_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))

    agg = streaming_hdr_cells(stream_documents(spark, str(src)),
                              window="10 minutes", watermark="30 minutes")
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("hdr_append")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        # window [00:00, 00:10) gets two docs of length 8
        write_batch([_doc(0, t0, ["x" * 8]),
                     _doc(1, t0 + timedelta(minutes=1), ["y" * 8])])
        q.processAllAvailable()
        # nothing emitted: watermark has not passed the window end
        assert spark.sql("SELECT * FROM hdr_append").count() == 0
        # advance event time far enough to close it
        write_batch([_doc(2, t0 + timedelta(minutes=50), ["z" * 100])])
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM hdr_append").collect()
        assert [(r["e"], r["m"], r["c"]) for r in out] == [(3, 8, 2)]
        # a late doc below the watermark is dropped, not re-emitted
        write_batch([_doc(3, t0 + timedelta(minutes=2), ["w" * 8])])
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM hdr_append").count() == 1
    finally:
        q.stop()
