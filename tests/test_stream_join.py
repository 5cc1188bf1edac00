"""Watermarked stream-stream join: doc image spans x media-availability
feed with an explicit event-time range (the state-bounding contract)."""
from datetime import datetime, timedelta


def _doc(i, t, refs):
    spans = [{"kind": "image", "text": "", "media_ref": r, "offset": j}
             for j, r in enumerate(refs)]
    spans.append({"kind": "text", "text": "hello", "media_ref": "",
                  "offset": 99})
    return (f"doc_{i}", t, spans)


def test_stream_stream_media_join(spark, tmp_path):
    from urbanistic_polygons_spark.streaming.ingest import (
        DOC_STREAM_SCHEMA, MEDIA_STREAM_SCHEMA, run_media_join_to_memory)
    t0 = datetime(2024, 1, 1)
    docs = [
        _doc(1, t0, ["blob://a"]),                      # media 5 min later
        _doc(2, t0 + timedelta(minutes=10), ["blob://b", "blob://c"]),
        _doc(3, t0 + timedelta(minutes=20), ["blob://d"]),  # media too late
        _doc(4, t0 + timedelta(minutes=30), ["blob://e"]),  # media EARLIER
        _doc(5, t0 + timedelta(minutes=40), []),            # no image spans
    ]
    media = [
        ("blob://a", t0 + timedelta(minutes=5), 100),
        ("blob://b", t0 + timedelta(minutes=11), 200),
        # blob://c never arrives
        ("blob://d", t0 + timedelta(minutes=40), 400),   # 20 min > horizon
        ("blob://e", t0 + timedelta(minutes=29), 500),   # before the doc
        ("blob://zz", t0, 999),                          # no doc wants it
    ]
    dsrc, msrc = str(tmp_path / "docs"), str(tmp_path / "media")
    spark.createDataFrame(docs, DOC_STREAM_SCHEMA).write.parquet(dsrc)
    spark.createDataFrame(media, MEDIA_STREAM_SCHEMA).write.parquet(msrc)
    out = run_media_join_to_memory(spark, dsrc, msrc,
                                   query_name="media_join_t",
                                   join_horizon="15 minutes")
    got = {(r["doc_id"], r["media_ref"], r["n_bytes"])
           for r in out.collect()}
    assert got == {("doc_1", "blob://a", 100), ("doc_2", "blob://b", 200)}
