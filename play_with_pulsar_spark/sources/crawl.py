"""JSONL crawl-shard ingestion — the messy-input front door.

Web-scale training corpora arrive as JSONL shards (Common Crawl
derivatives, WARC extractions, API dumps): line-delimited records
with an explicit schema contract, a long tail of malformed lines, and
duplicate records across shard re-uploads. A 100 TB ingest that
DROPS malformed lines silently (or dies on the first one) is not
operable; this module is the validated front door the curator's
``process_batch`` expects clean batches from:

- ``read_jsonl_docs(spark, path, schema)`` — schema-ENFORCED read
  with the raw text of every unparseable or contract-violating line
  captured in a quarantine frame: one scan yields BOTH frames,
  nothing is silently lost (accounting law: clean + quarantined ==
  input lines; tested).
- Contract checks beyond JSON well-formedness: required keys
  non-null; id uniqueness WITHIN the shard (first occurrence by line
  order wins — deterministic; later duplicates quarantine with
  reason 'duplicate_id').
- Quarantine rows carry (reason, raw) — the operator triage view.

Scale shape: the parse is Spark's native from_json (JVM expression,
one scan, splittable shards); the id-dedup is one window over the id
key — the only exchange; the quarantine split is a filter, not a
second read. Cite: the reference ingests through the broker's
schema-validated producer (game-code/pulsar.go:133-167); this is the
batch-world twin of that path (sources/event_log.py:100 implements
the streaming envelope form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: the default crawl-record contract: the documents-table shape
DOC_SCHEMA = "doc_id long, text string, lang string, source string"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    id_col: str = "doc_id",
    required: tuple[str, ...] = ("doc_id", "text"),
    order_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL shard under the crawl contract → ``(clean,
    quarantine)``. See :func:`triage_jsonl` for the contract; this is
    the batch entry point (one ``spark.read.text`` scan)."""
    return triage_jsonl(
        spark.read.text(path),
        schema=schema,
        id_col=id_col,
        required=required,
        order_col=order_col,
    )


def read_csv_docs(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    id_col: str = "doc_id",
    required: tuple[str, ...] = ("doc_id", "text"),
    order_col: str | None = None,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV sibling of :func:`read_jsonl_docs` — the other format crawl
    metadata dumps actually arrive in. Same quarantine contract via
    the same one-scan triage (``from_csv`` instead of ``from_json``)."""
    return triage_csv(
        spark.read.text(path),
        schema=schema,
        id_col=id_col,
        required=required,
        order_col=order_col,
        sep=sep,
    )


def triage_csv(
    lines: DataFrame,
    schema: str = DOC_SCHEMA,
    id_col: str = "doc_id",
    required: tuple[str, ...] = ("doc_id", "text"),
    order_col: str | None = None,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Triage a DataFrame of raw CSV lines (column ``value``) under
    the crawl contract → ``(clean, quarantine)`` — the
    :func:`triage_jsonl` contract verbatim (accounting law, reason
    taxonomy, content-deterministic duplicate survivor), with the
    parse swapped to Spark's native ``from_csv`` (JVM expression, one
    scan, PERMISSIVE corrupt-record capture). No header handling:
    crawl shards are headerless record streams; strip a header line
    upstream if a dump carries one."""
    raw = lines.select(F.col("value").alias("_raw"))
    parsed = raw.select(
        "_raw",
        F.from_csv(
            F.col("_raw"),
            f"{schema}, _corrupt string",
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt",
                "sep": sep,
            },
        ).alias("_r"),
    )
    reason = F.when(
        F.col("_r").isNull() | F.col("_r._corrupt").isNotNull(),
        F.lit("unparseable"),
    )
    for r in required:
        reason = reason.when(F.col(f"_r.{r}").isNull(), F.lit(f"missing:{r}"))
    flagged = parsed.withColumn("_reason", reason)
    bad = flagged.filter(F.col("_reason").isNotNull()).select(
        F.col("_reason").alias("reason"), F.col("_raw").alias("raw")
    )
    ok = flagged.filter(F.col("_reason").isNull())
    keys = [F.col("_raw")]
    if order_col is not None:
        keys.insert(0, F.col(f"_r.{order_col}"))
    w = Window.partitionBy(F.col(f"_r.{id_col}")).orderBy(*keys)
    ranked = ok.withColumn("_rn", F.row_number().over(w))
    dup = ranked.filter(F.col("_rn") > 1).select(
        F.lit("duplicate_id").alias("reason"), F.col("_raw").alias("raw")
    )
    clean = ranked.filter(F.col("_rn") == 1).select("_r.*").drop("_corrupt")
    return clean, bad.unionByName(dup)


def triage_jsonl(
    lines: DataFrame,
    schema: str = DOC_SCHEMA,
    id_col: str = "doc_id",
    required: tuple[str, ...] = ("doc_id", "text"),
    order_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Triage a DataFrame of raw JSONL lines (column ``value``) under
    the crawl contract → ``(clean, quarantine)``.

    ``clean``: rows that parsed as JSON, carry every ``required``
    field non-null, and are the CANONICAL occurrence of their
    ``id_col`` in the frame. ``quarantine``: ``(reason, raw)`` for
    everything else — ``unparseable`` (not a JSON object),
    ``missing:<field>`` (parsed but violates the contract; first
    failing field wins in ``required`` order), or ``duplicate_id``.
    One underlying scan; the accounting law clean + quarantine ==
    input lines is tested.

    Duplicate-id survivor rule — deterministic BY CONTENT, never by
    physical position: a distributed text scan has no stable per-row
    offset (``monotonically_increasing_id`` depends on partition
    layout and changes under task retry / stage recomputation — the
    round-7 ADVICE finding), so "first line wins" is not a
    well-defined rule at scale. Instead the survivor is the minimum
    by ``(record[order_col], raw line text)`` — pass ``order_col``
    (e.g. a crawl ``fetch_time`` field in the schema) to keep the
    operationally-first record; without it the lexicographically
    smallest raw line is the canonical pick. Rows tied on the full
    key are byte-identical, so the output is deterministic under any
    partitioning either way.

    DataFrame-in/DataFrame-out so it composes with streaming: inside
    a ``foreachBatch`` hook, triage the micro-batch's lines and hand
    ``clean`` to ``StreamingCorpusCurator.process_batch`` — the
    continuous crawl-ingest loop (tested end-to-end in
    test_crawl_source.py).
    """
    raw = lines.select(F.col("value").alias("_raw"))
    parsed = raw.select(
        "_raw",
        F.from_json(
            F.col("_raw"),
            f"{schema}, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("_r"),
    )
    # PERMISSIVE from_json returns a null-FIELD struct (not a null
    # struct) for malformed lines, so 'unparseable' is detected via
    # the corrupt-record column, distinguishing it from 'parsed but
    # missing a required field'
    reason = F.when(
        F.col("_r").isNull() | F.col("_r._corrupt").isNotNull(),
        F.lit("unparseable"),
    )
    for r in required:
        reason = reason.when(F.col(f"_r.{r}").isNull(), F.lit(f"missing:{r}"))
    flagged = parsed.withColumn("_reason", reason)
    bad = flagged.filter(F.col("_reason").isNotNull()).select(
        F.col("_reason").alias("reason"), F.col("_raw").alias("raw")
    )
    ok = flagged.filter(F.col("_reason").isNull())
    keys = [F.col("_raw")]
    if order_col is not None:
        keys.insert(0, F.col(f"_r.{order_col}"))
    w = Window.partitionBy(F.col(f"_r.{id_col}")).orderBy(*keys)
    ranked = ok.withColumn("_rn", F.row_number().over(w))
    dup = ranked.filter(F.col("_rn") > 1).select(
        F.lit("duplicate_id").alias("reason"), F.col("_raw").alias("raw")
    )
    clean = ranked.filter(F.col("_rn") == 1).select("_r.*").drop("_corrupt")
    return clean, bad.unionByName(dup)
