"""Maintained latest-per-key side table — the map-topic pattern.

The reference keeps a separate compacted topic so "read the latest
state" is a point-read instead of a log scan
(docs/en/game2-use-mq.md:62-76; SURVEY §4.1 "point lookup of latest
record instead of scan"). The Spark analog: a small serving table,
incrementally maintained from the event stream, that answers
latest-state queries without touching the log.

``foreachBatch`` merge strategy: each micro-batch's latest-per-key
rows are combined with the current view and re-compacted. The view
is O(|keys|), not O(|log|) — at 100 TB of events the view stays
megabytes, and every batch's work is proportional to the batch, never
to history. (With a transactional table format — Delta/Iceberg, not
in this image — the overwrite becomes MERGE INTO; the logic is
unchanged.)
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from .compaction import latest_per_key


class LatestStateView:
    """Incrementally-maintained latest-per-key view over an event
    stream (batch or streaming via foreachBatch)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Sequence[str],
        order_cols: Sequence[str],
        payload_cols: Sequence[str] | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.payload_cols = payload_cols

    def _exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def update(self, batch: DataFrame) -> None:
        """Fold one batch into the view: compact the batch, union with
        the current view, re-compact, atomically replace. Work is
        O(|batch| + |keys|)."""
        compacted = latest_per_key(
            batch, self.key_cols, self.order_cols, self.payload_cols
        )
        if self._exists():
            current = self.read()
            merged = latest_per_key(
                current.unionByName(compacted),
                self.key_cols,
                self.order_cols,
                [c for c in compacted.columns if c not in self.key_cols],
            )
        else:
            merged = compacted
        tmp = self.path + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        final_df = self.spark.read.parquet(tmp)
        final_df.write.mode("overwrite").parquet(self.path)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` — the S7 connector
        export path."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.update(batch_df)

        return fn
