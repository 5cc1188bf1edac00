"""Structured Streaming ingest of interleaved documents.

The reference is purely batch + request-memoization (no streaming anywhere,
SURVEY.md §2.8) — this module is the engine's forward-looking ingest path
for continuous document arrival: stream documents -> extract geo spans ->
cell-index -> windowed per-cell counts (the density-raster analog) with
watermarked late-data handling.

Smoke-tested with the file source + ``processAllAvailable`` (no Kafka in
the sandbox); on a cluster the source swaps to kafka/iceberg-cdc with the
same query body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C

DOC_STREAM_SCHEMA = (
    "doc_id string, event_time timestamp, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    return (spark.readStream.schema(DOC_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 4).parquet(path))


def streaming_cell_counts(docs: DataFrame,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window per-cell geo-span counts."""
    pts = (
        docs.withWatermark("event_time", watermark)
        .select("doc_id", "event_time", F.explode("spans").alias("span"))
        .filter(F.col("span.kind") == "geo")
        .select(
            "doc_id", "event_time",
            F.split(F.col("span.text"), ",").getItem(0).cast("double").alias("lon"),
            F.split(F.col("span.text"), ",").getItem(1).cast("double").alias("lat"))
        .withColumn("cell_id", C.cell_id(F.col("lon"), F.col("lat")))
    )
    return (pts.groupBy(F.window("event_time", window), "cell_id")
            .agg(F.count("*").alias("n_docs"))
            .select(F.col("window.start").alias("window_start"),
                    "cell_id", "n_docs"))


def streaming_sessionize(docs: DataFrame,
                         gap: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Session-window aggregation — the streaming analog of the batch
    ``sessionize`` catalog query: events from the same actor (doc_id
    prefix) within ``gap`` of each other merge into ONE session whose
    window end extends to last-event + gap; a longer silence starts a
    new session.  Uses Spark's native ``F.session_window`` (merging
    interval state per actor, no custom stateful operator needed); the
    watermark both drops late events and CLOSES sessions so append mode
    emits each finished session exactly once.  State is bounded by the
    open sessions inside the watermark horizon — the 10^12-doc shape.
    """
    keyed = (docs.withWatermark("event_time", watermark)
             .select(F.substring_index("doc_id", "_", 1).alias("actor"),
                     "event_time"))
    return (keyed.groupBy(F.session_window("event_time", gap), "actor")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "actor", "n_events"))


MEDIA_STREAM_SCHEMA = "media_ref string, ready_time timestamp, n_bytes long"


def stream_media(spark: SparkSession, path: str) -> DataFrame:
    return (spark.readStream.schema(MEDIA_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 4).parquet(path))


def streaming_media_join(docs: DataFrame, media: DataFrame,
                         join_horizon: str = "15 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream INNER join: a document's image spans join the
    media-availability stream on ``media_ref``, accepting a media blob
    that becomes ready within ``join_horizon`` AFTER the document event
    (the ingest race: docs and their media land on separate feeds).

    The canonical watermarked stream-stream join shape: BOTH sides carry
    an event-time watermark and the join condition carries an explicit
    event-time range, so Spark can bound the buffered state on each side
    (docs expire ``join_horizon`` past their watermark, media expires at
    its watermark) — without the range, state grows forever.  Output:
    one row per (doc image span x ready media) match, append-mode safe.
    """
    d = (docs.withWatermark("event_time", watermark)
         .select("doc_id", "event_time", F.explode("spans").alias("span"))
         .filter(F.col("span.kind") == "image")
         .select("doc_id", "event_time",
                 F.col("span.media_ref").alias("media_ref")))
    m = media.withWatermark("ready_time", watermark)
    cond = ((d["media_ref"] == m["media_ref"])
            & (m["ready_time"] >= d["event_time"])
            & (m["ready_time"] <= d["event_time"]
               + F.expr(f"INTERVAL {join_horizon}")))
    return (d.join(m, cond, "inner")
            .select("doc_id", d["media_ref"].alias("media_ref"),
                    "event_time", "ready_time", "n_bytes"))


def run_media_join_to_memory(spark: SparkSession, docs_path: str,
                             media_path: str,
                             query_name: str = "media_join",
                             join_horizon: str = "15 minutes"):
    """Drive the stream-stream join synchronously (test/smoke harness)."""
    out = streaming_media_join(stream_documents(spark, docs_path),
                               stream_media(spark, media_path),
                               join_horizon=join_horizon)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def _duration_ms(text: str) -> int:
    n, unit = text.split()
    mult = {"millisecond": 1, "second": 1000, "minute": 60_000,
            "hour": 3_600_000, "day": 86_400_000}[unit.rstrip("s")]
    return int(n) * mult


def streaming_exact_dedup(docs: DataFrame,
                          watermark: str = "1 hour",
                          state_ttl: str | None = None) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): streaming exact
    dedup — emit each document fingerprint the FIRST time it is seen,
    with a running duplicate count on later sightings suppressed.

    State: one GroupState per fingerprint holding (first_doc_id, n_seen).
    The reference has no streaming at all (SURVEY.md §2.8); this is the
    continuous-ingest analog of operators/dedup.exact_dedup, the shape a
    training-data pipeline needs when documents arrive forever: the keyed
    state store shards by fingerprint across executors, and the watermark
    bounds state via the GroupStateTimeout below.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout)

    fp = (docs.withWatermark("event_time", watermark)
          .select(
              "doc_id", "event_time",
              F.md5(F.concat_ws("\x00", F.transform(
                  "spans", lambda s: F.concat_ws("|", s["kind"], s["text"],
                                                 s["media_ref"])))).alias("fp")))

    ttl_ms = _duration_ms(state_ttl) if state_ttl else None

    def dedup_fn(key, batches, state: GroupState):
        (fingerprint,) = key
        if ttl_ms is not None and state.hasTimedOut:
            # watermark passed last-seen + TTL: the fingerprint's state is
            # dropped — a later re-sighting counts as first-seen again.
            # This is what BOUNDS total state at 10^12 docs: live state is
            # only the fingerprints seen within the TTL horizon.
            state.remove()
            return
        if state.exists:
            first_doc, n_seen = state.get
        else:
            first_doc, n_seen = None, 0
        newly_seen = first_doc is None
        # vectorized per batch: count + min doc_id (deterministic pick when
        # several duplicates arrive in the same trigger)
        max_ev_ms = None
        for pdf in batches:
            if len(pdf):
                n_seen += len(pdf)
                m = pdf["doc_id"].min()
                # accumulate across ALL chunks of this trigger — a smaller
                # doc_id can arrive in a later Arrow chunk
                if newly_seen and (first_doc is None or m < first_doc):
                    first_doc = m
                ev = int(pdf["event_time"].max().value // 1_000_000)
                if max_ev_ms is None or ev > max_ev_ms:
                    max_ev_ms = ev
        state.update((first_doc, n_seen))
        if ttl_ms is not None and max_ev_ms is not None:
            state.setTimeoutTimestamp(max_ev_ms + ttl_ms)
        if newly_seen and first_doc is not None:
            yield pd.DataFrame({"fp": [fingerprint],
                                "first_doc_id": [first_doc]})

    return fp.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        outputStructType="fp string, first_doc_id string",
        stateStructType="first_doc_id string, n_seen long",
        outputMode="append",
        # EventTimeTimeout (when a TTL is given) expires per-fingerprint
        # state once the watermark passes last-seen + TTL; NoTimeout keeps
        # the no-TTL path exactly as before
        timeoutConf=(GroupStateTimeout.EventTimeTimeout if ttl_ms is not None
                     else GroupStateTimeout.NoTimeout))


def run_dedup_stream_to_memory(spark: SparkSession, path: str,
                               query_name: str = "stream_dedup",
                               state_ttl: str | None = None,
                               watermark: str = "1 hour"):
    """Drive the stateful dedup query synchronously (test/smoke harness)."""
    out = streaming_exact_dedup(stream_documents(spark, path),
                                watermark=watermark, state_ttl=state_ttl)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_to_memory(spark: SparkSession, path: str,
                         query_name: str = "cell_counts"):
    """Drive the streaming query synchronously over whatever files exist
    (test/smoke harness)."""
    agg = streaming_cell_counts(stream_documents(spark, path))
    # complete mode so open (not-yet-watermark-closed) windows are visible
    # in the smoke check; production sinks use append + real event flow
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def streaming_hdr_cells(docs: DataFrame,
                        window: str = "10 minutes",
                        watermark: str = "30 minutes",
                        subbits: int = 5) -> DataFrame:
    """Streaming HDR-histogram cells of the per-document span-text-length
    distribution, per tumbling event-time window.

    The batch sketch (operators/sketches.py::hdr_quantiles) is ONE
    partially-aggregable groupBy over (exponent, mantissa) cells, so it
    streams FOR FREE as a standard watermarked streaming aggregation —
    no custom stateful operator, state bounded by windows x 64 x 2^s
    cells, late data handled by the watermark, and per-window cell
    tables merge cell-wise downstream (mergeable summaries).  Quantile
    extraction stays a tiny batch read over the cell sink (the same
    cumsum walk as the batch operator).  The length HOF runs on the
    scalar-size spans array (JVM-HOF rule: fine below corpus scale)."""
    lens = (docs.withWatermark("event_time", watermark)
            .select(
                "doc_id", "event_time",
                F.aggregate(
                    F.transform(
                        F.col("spans"),
                        lambda s: F.length(F.coalesce(s["text"],
                                                      F.lit("")))),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x.cast("long")).alias("v")))
    b = (lens
         .withColumn("e", (F.length(F.bin(F.col("v"))) - 1).cast("long"))
         .withColumn("m", F.expr(
             f"shiftright(v, cast(greatest(e - {subbits}, 0) as int))")))
    return (b.groupBy(F.window("event_time", window), "e", "m")
            .agg(F.count("*").cast("long").alias("c"))
            .select(F.col("window.start").alias("window_start"),
                    "e", "m", "c"))
