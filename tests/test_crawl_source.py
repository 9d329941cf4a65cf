"""JSONL crawl front door (sources/crawl.py): nothing silently lost,
contract violations triaged with reasons, deterministic first-
occurrence dedup — the properties a 100 TB ingest is operable on."""

from __future__ import annotations

import json

from play_with_pulsar_spark.sources.crawl import read_jsonl_docs


def _write(tmp_path, lines):
    p = tmp_path / "shard.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_accounting_and_triage(spark, tmp_path):
    good = [
        {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0"},
        {"doc_id": 2, "text": "gamma", "lang": "en", "source": "s0"},
        {"doc_id": 3, "text": "delta", "lang": "de", "source": "s1"},
    ]
    lines = [json.dumps(g) for g in good]
    lines.insert(1, "{not json at all")  # unparseable
    lines.insert(3, json.dumps({"doc_id": 9}))  # missing:text
    lines.append(json.dumps({"text": "orphan"}))  # missing:doc_id
    lines.append(json.dumps({"doc_id": 2, "text": "REUPLOAD", "lang": "xx"}))
    path = _write(tmp_path, lines)

    clean, quarantine = read_jsonl_docs(spark, path)
    crows = {r.doc_id: r for r in clean.collect()}
    qrows = [(r.reason, r.raw) for r in quarantine.collect()]

    # accounting law: every input line lands exactly once
    assert clean.count() + quarantine.count() == len(lines)
    assert set(crows) == {1, 2, 3}
    # canonical occurrence wins: min raw line text, deterministic
    # under any partitioning ("line order" is not a stable key in a
    # distributed scan — r7 ADVICE)
    assert crows[2].text == "REUPLOAD"
    reasons = sorted(r for r, _ in qrows)
    assert reasons == ["duplicate_id", "missing:doc_id", "missing:text", "unparseable"]
    # quarantine keeps the raw line for triage
    raw_by_reason = dict(qrows)
    assert raw_by_reason["unparseable"] == "{not json at all"
    assert json.loads(raw_by_reason["duplicate_id"])["text"] == "gamma"


def test_jsonl_duplicate_survivor_by_order_col(spark, tmp_path):
    """With order_col the survivor is the operationally-first record
    (min fetch_time), whatever the raw-text ordering says."""
    from play_with_pulsar_spark.sources.crawl import triage_jsonl

    lines = [
        json.dumps({"doc_id": 7, "text": "zz-late", "lang": "en", "source": "b"}),
        json.dumps({"doc_id": 7, "text": "aa-early", "lang": "en", "source": "a"}),
    ]
    path = _write(tmp_path, lines)
    # source doubles as the timestamp here: 'b' uploaded after 'a'
    clean, quarantine = triage_jsonl(
        spark.read.text(path),
        order_col="source",
    )
    rows = clean.collect()
    assert len(rows) == 1 and rows[0].text == "aa-early"
    assert [r.reason for r in quarantine.collect()] == ["duplicate_id"]
    # clean frame carries the declared schema
    assert clean.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string>"
    )


def test_jsonl_clean_shard_passes_whole(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": i, "text": f"t{i}", "lang": "en", "source": "s"})
        for i in range(20)
    ]
    path = _write(tmp_path, lines)
    clean, quarantine = read_jsonl_docs(spark, path)
    assert clean.count() == 20 and quarantine.count() == 0


def test_jsonl_feeds_curator_batch(spark, tmp_path):
    """The front door composes with the curator: a shard with a junk
    line and an intra-shard duplicate ingests cleanly; the curator
    sees only contract-clean rows."""
    from play_with_pulsar_spark.streaming.curator import StreamingCorpusCurator

    lines = [
        json.dumps({"doc_id": i, "text": f"unique tokens w{i}a w{i}b w{i}c w{i}d", "lang": "en", "source": "s"})
        for i in range(6)
    ]
    lines.append("garbage line")
    lines.append(json.dumps({"doc_id": 3, "text": "dup reupload"}))
    path = _write(tmp_path, lines)
    clean, quarantine = read_jsonl_docs(spark, path)
    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    cur.process_batch(clean.select("doc_id", "text"), 0)
    acc = {r.doc_id for r in cur.accepted().select("doc_id").collect()}
    assert acc == set(range(6))
    assert quarantine.count() == 2


def test_streaming_crawl_ingest_end_to_end(spark, tmp_path):
    """The continuous crawl loop, last mile: readStream.text over a
    shard directory → per-micro-batch JSONL triage → curator
    process_batch via foreachBatch (availableNow). Clean rows land in
    the accepted corpus exactly once; quarantine rows append to a
    triage table; junk and contract violations never reach the
    curator's state."""
    import json

    from play_with_pulsar_spark.sources.crawl import triage_jsonl
    from play_with_pulsar_spark.streaming.curator import StreamingCorpusCurator

    shards = tmp_path / "shards"
    shards.mkdir()
    lines = [
        json.dumps({"doc_id": i, "text": f"unique w{i}a w{i}b w{i}c w{i}d", "lang": "en", "source": "s"})
        for i in range(8)
    ]
    lines.insert(3, "junk {{{")
    lines.append(json.dumps({"text": "orphan"}))
    (shards / "a.jsonl").write_text("\n".join(lines) + "\n")

    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    qdir = str(tmp_path / "quarantine")

    def ingest(batch_df, batch_id):
        clean, quarantine = triage_jsonl(batch_df)
        quarantine.write.mode("append").parquet(qdir)
        cur.process_batch(clean.select("doc_id", "text"), batch_id)

    q = (
        spark.readStream.text(str(shards))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    acc = {r.doc_id for r in cur.accepted().select("doc_id").collect()}
    assert acc == set(range(8))
    reasons = sorted(r.reason for r in spark.read.parquet(qdir).collect())
    assert reasons == ["missing:doc_id", "unparseable"]


def test_csv_front_door_triage_and_accounting(spark, tmp_path):
    """CSV sibling of the JSONL front door: same accounting law, same
    reason taxonomy, same content-deterministic duplicate rule."""
    from play_with_pulsar_spark.sources.crawl import read_csv_docs

    lines = [
        "1,alpha beta,en,s0",
        "2,gamma,en,s0",
        'x,"not a number id",en,s0',      # type violation -> unparseable
        "3,delta,de,s1",
        ",orphan,en,s0",                   # missing doc_id
        "2,REUPLOAD,xx,s9",                # duplicate id
    ]
    p = tmp_path / "shard.csv"
    p.write_text("\n".join(lines) + "\n")
    clean, quarantine = read_csv_docs(spark, str(p))
    assert clean.count() + quarantine.count() == len(lines)
    crows = {r.doc_id: r for r in clean.collect()}
    assert set(crows) == {1, 2, 3}
    # canonical (min-raw) survivor: "2,REUPLOAD..." < "2,gamma..."
    assert crows[2].text == "REUPLOAD"
    reasons = sorted(r.reason for r in quarantine.collect())
    # from_csv PERMISSIVE marks a failed BIGINT conversion as a corrupt
    # RECORD (unlike from_json's null field) — a type violation is
    # "unparseable", a present-but-empty field is "missing:<field>"
    assert reasons == ["duplicate_id", "missing:doc_id", "unparseable"]
    assert clean.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string>"
    )


def test_csv_front_door_feeds_curator(spark, tmp_path):
    from play_with_pulsar_spark.sources.crawl import read_csv_docs
    from play_with_pulsar_spark.streaming.curator import StreamingCorpusCurator

    lines = [f"{i},unique tokens w{i}a w{i}b w{i}c w{i}d,en,s" for i in range(6)]
    lines.append("3,dup reupload,en,s")
    p = tmp_path / "shard.csv"
    p.write_text("\n".join(lines) + "\n")
    clean, quarantine = read_csv_docs(spark, str(p))
    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    cur.process_batch(clean.select("doc_id", "text"), 0)
    assert {r.doc_id for r in cur.accepted().collect()} == set(range(6))
    assert quarantine.count() == 1
