"""Incremental corpus ingest — content dedup against the committed
lineage, the continuous-crawl pattern a 100 TB training pipeline runs
every day: batches keep arriving forever, and each batch must be deduped
against EVERYTHING already accepted without ever rescanning the
accepted corpus's text.

Each call to :func:`ingest_batch`:

1. fingerprints the incoming batch (md5 over whitespace-normalized
   lowercase text — the same portable fingerprint as exact_dedup_docs);
2. keeps one row per fingerprint INSIDE the batch (min id — the
   deterministic in-batch keeper);
3. anti-joins the survivors against the COMMITTED fingerprint set —
   the committed table stores (id, fingerprint, batch_id) only, so the
   committed side is a column-pruned scan of a narrow table, never the
   text; the anti-join shuffles on fingerprint with map-side partials;
4. commits the novel rows as ONE atomic LineageStore snapshot,
   partitioned by a fresh ``batch_id`` (= number of prior snapshots).

Semantics: ARRIVAL-ORDER precedence — the first batch to present a
fingerprint owns it forever; within a batch the min id wins.  The final
state is a pure function of the batch sequence.  Re-running an
already-committed batch is IDEMPOTENT (every fingerprint anti-joins
away; the empty commit is the guarded empty-todo case), and a crash
between write and record is resolved by the store's atomic snapshot
log, so exactly-once acceptance holds without any coordinator.

Scale shape: per batch, one narrow shuffle (fingerprint groupBy) + one
narrow anti-join; committed text bytes are never re-read.  Reference
analog: the per-tile skip-if-exists checkpoints
(TiledBarrierGraphBuilder.cs:45-46, 77-79) lifted from "tile already
built" to "content already accepted".
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ..plans.lineage import LineageStore


def ingest_batch(store: LineageStore, stage: str, batch: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Dedup ``batch`` against itself and the committed corpus, commit
    the novel rows as one snapshot; returns the manifest-scoped
    read-back of the commit (id, fingerprint, batch_id)."""
    fps = batch.select(F.col(id_col).cast("long").alias("id"),
                       X.fingerprint(F.col(text_col)))
    keep = (fps.groupBy("fingerprint")
            .agg(F.min("id").alias("id")))
    if store.snapshots(stage):
        committed = store.read(stage).select("fingerprint")
        keep = keep.join(committed, "fingerprint", "left_anti")
    batch_id = len(store.snapshots(stage))
    novel = keep.select("id", "fingerprint",
                        F.lit(batch_id).cast("long").alias("batch_id"))
    return store.checkpoint(novel, stage, "batch_id")


def accepted_corpus(store: LineageStore, stage: str,
                    docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The deduped corpus view: join the accepted (id, batch_id) back to
    the full document table — the only time text is touched, and it is
    a plain equi-join on the id, prunable by the consumer's columns."""
    acc = store.read(stage).select(F.col("id").alias(id_col),
                                   "fingerprint", "batch_id")
    return docs.join(acc, id_col)
