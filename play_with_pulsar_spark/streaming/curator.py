"""Continuous corpus curation: streaming ingest + incremental dedup.

The end-to-end shape a training-data pipeline actually runs: crawl
shards arrive as a stream; every micro-batch is screened for
near-duplicates against everything ACCEPTED so far WITHOUT re-reading
the corpus (the materialized shingle index from
``operators.dedup.build_ngram_index`` carries all history); survivors
are appended to the corpus and their shingles to the index, so the
next batch screens against them too.

Greedy first-writer-wins semantics (the standard streaming-dedup
contract, matching ``exact_dedup``'s min-id convention within a
batch):

- a new doc that near-dups any ACCEPTED doc is rejected, whatever
  the relative ids (acceptance time wins, not id order);
- among near-dup pairs arriving in the SAME batch, the smaller
  doc_id survives;
- rejected docs are NOT indexed, so a later doc that resembles only
  a rejected doc (and not its accepted ancestor) is accepted — the
  greedy rule every sequential deduper (e.g. a Bloom/LSH gate in a
  crawler) exhibits.

State is two parquet tables (``accepted/``, ``grams/``), each laid
out as one ``ingest_batch=<id>`` partition directory per micro-batch
— at cluster scale, bucket ``grams`` by ``g`` so each batch's probe
join is shuffle-free on the index side, and compact periodically with
``operators.layout.cluster_by_range``.

Exactly-once appends: ``foreachBatch`` is AT-LEAST-once (a retry
after a partial commit re-delivers the same ``batch_id``), so each
table writes its batch into a batch-id-named partition directory with
``mode=overwrite`` — a replay overwrites the same directory instead
of appending duplicate rows, and a batch whose ``_SUCCESS`` marker
already exists is skipped outright. Duplicated appends would not just
double rows: replayed doc_ids violate
``incremental_jaccard_pairs``'s disjoint-id precondition (doubled
shingle rows skew sizes and Jaccard), so idempotence here is a
correctness requirement, not bookkeeping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    _banded,
    build_ngram_index,
    incremental_jaccard_pairs,
    incremental_minhash_pairs,
    minhash_signatures,
    release_intermediates,
)

# default (id_type="long") state schemas; instances derive their own
# from the declared id type (self.grams_schema / self.banded_schema)


class StreamingCorpusCurator:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 3,
        threshold: float = 0.8,
        max_shingle_freq: int | None = 50,
        screen: str = "jaccard",
        num_hashes: int = 64,
        num_bands: int = 16,
        seed: int = 42,
        id_type: str = "long",
    ) -> None:
        """``screen``: ``"jaccard"`` (exact capped-Jaccard incremental
        screen — the default, exhaustive) or ``"minhash"`` (LSH-blocked
        screen: candidates only from band-bucket collisions against a
        third state table ``banded/``, exact Jaccard verify of
        candidates only — the cheaper screen when the accepted corpus
        is large; recall follows the banding curve).

        ``max_shingle_freq`` applies ONLY to the jaccard screen. The
        minhash screen ignores it entirely: signatures and the exact
        Jaccard verify both run on UNCAPPED grams, so the two screens
        differ not just in LSH recall but in the Jaccard scores
        themselves (a stop-shingle shared by many docs counts toward
        minhash-screen similarity but not capped-jaccard similarity).
        Decisions from the two screens are therefore not comparable
        doc-by-doc when a cap is set.

        ``id_type``: Spark type name of the document id column — the
        state tables are read back with an ENFORCED schema (see
        ``_read_state``), so a non-long id (string crawl ids, …) must
        be declared here or every post-first-batch read fails with a
        parquet conversion error."""
        if screen not in ("jaccard", "minhash"):
            raise ValueError(f"unknown screen {screen!r}")
        self.spark = spark
        self.accepted_dir = os.path.join(base_dir, "accepted")
        self.grams_dir = os.path.join(base_dir, "grams")
        self.banded_dir = os.path.join(base_dir, "banded")
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self.threshold, self.max_shingle_freq = threshold, max_shingle_freq
        self.screen = screen
        self.num_hashes, self.num_bands, self.seed = num_hashes, num_bands, seed
        self.grams_schema = f"doc_id {id_type}, g long"
        self.banded_schema = f"doc_id {id_type}, band int, bucket long"

    def _read_state(
        self, path: str, schema: str, exclude_batch: int | None = None
    ) -> DataFrame:
        """State read with the schema ENFORCED (a stray/corrupt file
        fails at the read boundary, not as a mid-join cast error) and,
        inside ``process_batch``, this batch's own partition EXCLUDED:
        a replay after a partial commit must screen against exactly
        the pre-batch state — rows this same batch already wrote would
        violate the incremental screen's disjoint-id precondition and
        skew every Jaccard (doubled gram rows score a true-0.5 pair
        as 1.0+)."""
        from pyspark.errors import AnalysisException

        full_schema = schema + ", ingest_batch int"
        cols = [c.split()[0] for c in schema.split(",")]
        try:
            df = self.spark.read.schema(full_schema).parquet(path)
        except AnalysisException:  # PATH_NOT_FOUND: first batch yet
            return self.spark.createDataFrame([], schema)
        if exclude_batch is not None:
            df = df.filter(F.col("ingest_batch") != exclude_batch)
        return df.select(*cols)

    def _index(self, exclude_batch: int | None = None) -> DataFrame:
        return self._read_state(self.grams_dir, self.grams_schema, exclude_batch)

    def _index_banded(self, exclude_batch: int | None = None) -> DataFrame:
        return self._read_state(self.banded_dir, self.banded_schema, exclude_batch)

    def accepted(self) -> DataFrame:
        """Accepted corpus (the ``ingest_batch`` layout column is an
        implementation detail and is dropped)."""
        return self.spark.read.parquet(self.accepted_dir).drop("ingest_batch")

    def _batch_dir(self, base: str, batch_id: int) -> str:
        return os.path.join(base, f"ingest_batch={batch_id}")

    def _committed(self, base: str, batch_id: int) -> bool:
        """True iff this batch's partition already committed (its
        ``_SUCCESS`` marker exists). Checked through the Hadoop FS API
        so object-store deployments behave like local runs."""
        path = os.path.join(self._batch_dir(base, batch_id), "_SUCCESS")
        try:
            jvm = self.spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(
                self.spark._jsc.hadoopConfiguration()
            )
            return bool(fs.exists(hpath))
        except Exception:
            return os.path.exists(path)

    def _rejected_ids(self, pairs: DataFrame, new_ids: DataFrame) -> DataFrame:
        """Apply the greedy rule to the touching-new pair set.
        ``pairs`` is (id_a < id_b); either side may be the new doc."""
        a_new = pairs.join(new_ids.withColumnRenamed("nid", "id_a"), "id_a", "semi")
        b_new = pairs.join(new_ids.withColumnRenamed("nid", "id_b"), "id_b", "semi")
        both = a_new.join(
            new_ids.withColumnRenamed("nid", "id_b"), "id_b", "semi"
        ).select(F.col("id_b").alias("doc_id"))  # new-new: larger id loses
        a_vs_old = a_new.join(
            new_ids.withColumnRenamed("nid", "id_b"), "id_b", "anti"
        ).select(F.col("id_a").alias("doc_id"))  # new id_a dups accepted id_b
        b_vs_old = b_new.join(
            new_ids.withColumnRenamed("nid", "id_a"), "id_a", "anti"
        ).select(F.col("id_b").alias("doc_id"))  # new id_b dups accepted id_a
        return both.unionByName(a_vs_old).unionByName(b_vs_old).distinct()

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: screen, reject, write survivors into this
        batch's partition (idempotent on ``batch_id`` — see module
        docstring)."""
        minhash = self.screen == "minhash"
        acc_done = self._committed(self.accepted_dir, batch_id)
        grams_done = self._committed(self.grams_dir, batch_id)
        banded_done = not minhash or self._committed(self.banded_dir, batch_id)
        if acc_done and grams_done and banded_done:  # committed replay
            return
        docs = batch.persist()  # screened once, written once
        if minhash:
            pairs = incremental_minhash_pairs(
                self._index(exclude_batch=batch_id),
                None,
                docs,
                text_col=self.text_col,
                id_col=self.id_col,
                n=self.n,
                num_hashes=self.num_hashes,
                num_bands=self.num_bands,
                threshold=self.threshold,
                seed=self.seed,
                index_banded=self._index_banded(exclude_batch=batch_id),
            )
        else:
            pairs = incremental_jaccard_pairs(
                self._index(exclude_batch=batch_id),
                docs,
                text_col=self.text_col,
                id_col=self.id_col,
                n=self.n,
                threshold=self.threshold,
                max_shingle_freq=self.max_shingle_freq,
            )
        new_ids = docs.select(F.col(self.id_col).alias("nid"))
        rejected = self._rejected_ids(pairs, new_ids)
        keep = docs.join(
            rejected.withColumnRenamed("doc_id", self.id_col), self.id_col, "anti"
        ).persist()
        # overwrite (not append) into the batch partition: a replay
        # after a PARTIAL commit rewrites that directory cleanly
        if not acc_done:
            keep.write.mode("overwrite").parquet(
                self._batch_dir(self.accepted_dir, batch_id)
            )
        # one shingling of the kept docs feeds BOTH index writes;
        # persist only when both consumers will actually run (a
        # partial-commit replay may have one write left)
        keep_grams = build_ngram_index(keep, self.text_col, self.id_col, self.n)
        two_consumers = minhash and not grams_done and not banded_done
        if two_consumers:
            keep_grams = keep_grams.persist()
        if not grams_done:
            keep_grams.write.mode("overwrite").parquet(
                self._batch_dir(self.grams_dir, batch_id)
            )
        if minhash and not banded_done:
            keep_sigs = minhash_signatures(
                None, num_hashes=self.num_hashes, seed=self.seed, grams=keep_grams
            )
            _banded(
                keep_sigs, self.num_bands, self.num_hashes // self.num_bands
            ).write.mode("overwrite").parquet(self._batch_dir(self.banded_dir, batch_id))
        if two_consumers:
            keep_grams.unpersist()
        keep.unpersist()
        docs.unpersist()
        release_intermediates(pairs)  # the screen's cached intermediates

    def _committed_batch_dirs(self, base: str) -> list[str]:
        """Partition directories of ``base`` whose ``_SUCCESS`` marker
        exists — the committed subset a concurrent reader may trust
        (a live micro-batch's partial partition is excluded)."""
        dirs: list[str] = []
        try:
            jvm = self.spark._jvm
            hbase = jvm.org.apache.hadoop.fs.Path(base)
            fs = hbase.getFileSystem(self.spark._jsc.hadoopConfiguration())
            if not fs.exists(hbase):
                return []
            for status in fs.listStatus(hbase):
                p = status.getPath()
                if status.isDirectory() and p.getName().startswith("ingest_batch="):
                    if fs.exists(jvm.org.apache.hadoop.fs.Path(p, "_SUCCESS")):
                        dirs.append(p.toString())
        except Exception:
            if os.path.isdir(base):
                for d in os.listdir(base):
                    full = os.path.join(base, d)
                    if d.startswith("ingest_batch=") and os.path.exists(
                        os.path.join(full, "_SUCCESS")
                    ):
                        dirs.append(full)
        return dirs

    def _read_committed(self, base: str, schema: str) -> DataFrame:
        dirs = self._committed_batch_dirs(base)
        cols = [c.split()[0] for c in schema.split(",")]
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.schema(schema + ", ingest_batch int")
            .option("basePath", base)
            .parquet(*dirs)
            .select(*cols)
        )

    def export_bucketed_index(self, prefix: str, n_buckets: int = 32) -> None:
        """One-way export of the accumulated dedup state into the
        bucketed catalog layout batch probes consume, matching the
        canonical writers exactly: the jaccard screen exports
        ``{prefix}_grams_by_g`` via ``dedup.write_ngram_index``
        (bucketed by ``g`` — the jaccard probe's join key); the
        minhash screen exports the ``dedup.write_minhash_index``
        pair — ``{prefix}_grams`` bucketed by ``doc_id`` (the verify
        side's join key) and ``{prefix}_banded`` bucketed by
        ``(band, bucket)`` — readable with ``dedup.read_minhash_index``.

        Only COMMITTED batch partitions are read (``_SUCCESS``
        present), so a scheduled export racing a live micro-batch can
        never ship a partial batch's rows.

        This is the compaction story without mutating streaming state:
        the per-batch partitions stay the source of truth. NOTE:
        ``mode=overwrite`` + ``saveAsTable`` is drop-then-recreate,
        NOT an atomic swap — a reader mid-scan during a refresh can
        see a missing table. Export to a fresh versioned prefix and
        flip consumers, or schedule refreshes in a maintenance
        window."""
        from ..operators.dedup import write_minhash_index, write_ngram_index

        grams = self._read_committed(self.grams_dir, self.grams_schema)
        if self.screen == "minhash":
            banded = self._read_committed(self.banded_dir, self.banded_schema)
            write_minhash_index(
                grams,
                None,
                prefix,
                num_bands=self.num_bands,
                rows_per_band=self.num_hashes // self.num_bands,
                n_buckets=n_buckets,
                banded=banded,
            )
        else:
            write_ngram_index(grams, f"{prefix}_grams_by_g", n_buckets=n_buckets)

    def attach(self, stream: DataFrame, checkpoint_dir: str, **trigger):
        """Wire the curator into a streaming DataFrame; the returned
        query appends exactly-once per micro-batch. ``trigger`` kwargs
        pass through (default drain-and-stop ``availableNow``; use
        ``processingTime='30 seconds'`` for a continuous curator)."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
