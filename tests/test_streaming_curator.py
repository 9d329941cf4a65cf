"""Streaming corpus curator (streaming/curator.py): greedy
first-writer-wins dedup across micro-batches, append-only corpus +
shingle-index state, real foreachBatch wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from play_with_pulsar_spark.streaming.curator import StreamingCorpusCurator


def _w(seed: int, n: int = 30) -> str:
    # unique-vocabulary doc: no shingle overlap across seeds
    return " ".join(f"w{seed}x{i}" for i in range(n))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curator_greedy_across_batches(spark, tmp_path):
    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    batches = [
        [(1, _w(1)), (2, _w(2))],
        # 10 duplicates ACCEPTED doc 1 (smaller new id vs bigger old
        # id is irrelevant — acceptance time wins) → rejected
        [(10, _w(1)), (11, _w(11))],
        # 20 dups accepted 11 → rejected; 21 fresh → kept;
        # 22 dups 21 within the same batch → larger id loses
        [(20, _w(11)), (21, _w(21)), (22, _w(21))],
    ]
    for i, rows in enumerate(batches):
        cur.process_batch(_docs(spark, rows), i)
    kept = {r["doc_id"] for r in cur.accepted().collect()}
    assert kept == {1, 2, 11, 21}
    # rejected docs must NOT have been indexed
    indexed = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "c/grams")).select("doc_id").distinct().collect()
    }
    assert indexed == {1, 2, 11, 21}


def test_curator_via_real_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    _docs(spark, [(1, _w(1)), (2, _w(2))]).write.parquet(src + "/f1")
    _docs(spark, [(3, _w(1)), (4, _w(4))]).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    q = cur.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in cur.accepted().collect()}
    # docs 1 and 3 are identical: exactly one survives (whichever
    # micro-batch ran first); 2 and 4 are unique and both survive
    assert {2, 4} <= kept
    assert len(kept & {1, 3}) == 1 and len(kept) == 3


def test_curator_batch_internal_chain_rule(spark, tmp_path):
    # edge-wise rule: in pairs (21,22) and (22,23) with no (21,23)
    # edge, both 22 and 23 lose (each has an edge to a smaller id) —
    # the documented min-of-each-edge convention, same as the batch
    # pipeline's anti-join on id_b
    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    # 22 == 21; 23 == 21 too (identical text ⇒ the chain is a clique
    # here); a genuinely transitive-only chain needs ~0.8 overlap
    # which unique-vocab fixtures can't express — the clique case
    # still pins that only the minimum survives
    cur.process_batch(_docs(spark, [(21, _w(21)), (22, _w(21)), (23, _w(21))]), 0)
    kept = {r["doc_id"] for r in cur.accepted().collect()}
    assert kept == {21}


def test_curator_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a committed batch_id
    must not duplicate accepted rows or index grams (duplicated grams
    would skew every later batch's Jaccard)."""
    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    batch = _docs(spark, [(1, _w(1)), (2, _w(2))])
    cur.process_batch(batch, 0)
    first_accepted = sorted(r["doc_id"] for r in cur.accepted().collect())
    first_grams = cur._index().count()

    cur.process_batch(batch, 0)  # replay, same batch_id
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == first_accepted
    assert cur._index().count() == first_grams

    # a NEW batch id still appends
    cur.process_batch(_docs(spark, [(3, _w(3))]), 1)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1, 2, 3]


def test_curator_storage_released_per_batch(spark, tmp_path):
    """The per-batch screen must leave no persisted RDDs behind — the
    long-lived-session hygiene contract. Delta-based: the assertion is
    that the CURATOR adds nothing, independent of whatever storage
    other tests sharing this session legitimately hold."""
    spark.catalog.clearCache()
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    for i in range(3):
        cur.process_batch(_docs(spark, [(10 + i, _w(10 + i))]), i)
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after <= before


def test_curator_minhash_screen_matches_jaccard(spark, tmp_path):
    """The LSH-blocked screen accepts/rejects identically to the exact
    screen on this corpus (banding recall is 1.0 at these sizes) —
    cross-batch rejection included."""
    jac = StreamingCorpusCurator(spark, str(tmp_path / "jac"))
    mh = StreamingCorpusCurator(spark, str(tmp_path / "mh"), screen="minhash")
    batches = [
        [(1, _w(1)), (2, _w(1)), (3, _w(3))],       # 2 dups 1 in-batch
        [(4, _w(1)), (5, _w(5))],                   # 4 dups accepted 1
        [(6, _w(3)), (7, _w(7))],                   # 6 dups accepted 3
    ]
    for i, rows in enumerate(batches):
        jac.process_batch(_docs(spark, rows), i)
        mh.process_batch(_docs(spark, rows), i)
    kept_j = sorted(r["doc_id"] for r in jac.accepted().collect())
    kept_m = sorted(r["doc_id"] for r in mh.accepted().collect())
    assert kept_m == kept_j
    assert kept_j == [1, 3, 5, 7]
    # minhash replay is idempotent across all three state tables
    mh.process_batch(_docs(spark, batches[2]), 2)
    assert sorted(r["doc_id"] for r in mh.accepted().collect()) == kept_m


def test_curator_partial_commit_replay_consistent(spark, tmp_path):
    """Crash between the grams write and the banded write: the replay
    must screen against the PRE-batch state (its own committed
    partitions excluded), reach the same keep decision, and complete
    the missing banded partition for exactly the kept docs."""
    import shutil

    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"), screen="minhash")
    cur.process_batch(_docs(spark, [(1, _w(1)), (2, _w(2))]), 0)
    batch1 = _docs(spark, [(3, _w(1)), (4, _w(4))])  # 3 dups accepted 1
    cur.process_batch(batch1, 1)
    kept_before = sorted(r["doc_id"] for r in cur.accepted().collect())
    assert kept_before == [1, 2, 4]

    # simulate the partial commit: banded partition of batch 1 lost
    shutil.rmtree(cur._batch_dir(cur.banded_dir, 1))
    cur.process_batch(batch1, 1)  # redelivery

    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == kept_before
    banded_docs = {
        r["doc_id"]
        for r in spark.read.parquet(cur._batch_dir(cur.banded_dir, 1))
        .select("doc_id").distinct().collect()
    }
    assert banded_docs == {4}  # exactly batch 1's kept docs
    # grams state has ONE copy of each kept doc's shingles (no dup skew)
    grams = cur._index()
    per_doc = {r["doc_id"]: r["cnt"] for r in
               grams.groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()}
    from play_with_pulsar_spark.operators.dedup import build_ngram_index

    ref = {r["doc_id"]: r["cnt"] for r in
           build_ngram_index(_docs(spark, [(1, _w(1)), (2, _w(2)), (4, _w(4))]))
           .groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()}
    assert per_doc == ref


def test_curator_export_bucketed_index_probe(spark, tmp_path):
    """The exported bucketed tables drive the SAME screening decision
    as the curator's live state — the streaming->batch index bridge."""
    from play_with_pulsar_spark.operators.dedup import (
        incremental_minhash_pairs,
        release_intermediates,
    )

    from play_with_pulsar_spark.operators.dedup import read_minhash_index

    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"), screen="minhash")
    cur.process_batch(_docs(spark, [(1, _w(1)), (2, _w(2))]), 0)
    # an uncommitted (partial) partition must NOT reach the export
    import os as _os
    partial = cur._batch_dir(cur.grams_dir, 99)
    _os.makedirs(partial, exist_ok=True)  # no _SUCCESS marker
    cur.export_bucketed_index("pwp_cur_export")
    try:
        grams, banded = read_minhash_index(spark, "pwp_cur_export")
        batch = _docs(spark, [(3, _w(1)), (4, _w(4))])
        stored = incremental_minhash_pairs(
            grams, None, batch, index_banded=banded,
            num_hashes=cur.num_hashes, num_bands=cur.num_bands,
            threshold=cur.threshold, seed=cur.seed,
        )
        live = incremental_minhash_pairs(
            cur._index(), None, batch, index_banded=cur._index_banded(),
            num_hashes=cur.num_hashes, num_bands=cur.num_bands,
            threshold=cur.threshold, seed=cur.seed,
        )
        key = lambda df: sorted((r.id_a, r.id_b) for r in df.collect())  # noqa: E731
        assert key(stored) == key(live) and len(key(live)) > 0
        release_intermediates(stored)
        release_intermediates(live)
    finally:
        spark.sql("DROP TABLE IF EXISTS pwp_cur_export_grams")
        spark.sql("DROP TABLE IF EXISTS pwp_cur_export_banded")


# ----------------------------------------------------------------------
# compaction tier


def _dirs_of(base):
    import os

    if not os.path.isdir(base):
        return []
    return [d for d in os.listdir(base) if d.startswith("ingest_batch=")]


def test_compaction_bounds_dirs_same_decisions(spark, tmp_path):
    """N batches with threshold-triggered compaction end at <=K live
    dirs per state table, and every accept/reject decision matches an
    uncompacted curator fed the identical stream."""
    plain = StreamingCorpusCurator(spark, str(tmp_path / "plain"))
    comp = StreamingCorpusCurator(
        spark, str(tmp_path / "comp"), compact_after=2, n_buckets=4
    )
    batches = [
        [(1, _w(1)), (2, _w(2))],
        [(10, _w(1)), (11, _w(11))],      # 10 dups accepted 1
        [(20, _w(11)), (21, _w(21))],     # 20 dups accepted 11
        [(30, _w(21)), (31, _w(31))],     # 30 dups accepted 21
        [(40, _w(2)), (41, _w(41))],      # 40 dups accepted 2 (from the
                                          # COMPACTED tier by now)
        [(50, _w(31)), (51, _w(51))],
    ]
    for i, rows in enumerate(batches):
        plain.process_batch(_docs(spark, rows), i)
        comp.process_batch(_docs(spark, rows), i)
    kept_plain = sorted(r["doc_id"] for r in plain.accepted().collect())
    kept_comp = sorted(r["doc_id"] for r in comp.accepted().collect())
    assert kept_comp == kept_plain == [1, 2, 11, 21, 31, 41, 51]
    # uncompacted: one dir per batch; compacted: bounded by threshold
    # plus ONE retained generation (folded dirs are deleted one
    # compaction later as reader grace) — still O(compact_after), not
    # O(stream length)
    assert len(_dirs_of(plain.grams_dir)) == 6
    for base in (comp.accepted_dir, comp.grams_dir):
        assert len(_dirs_of(base)) <= 2 * (2 + 1)
    man = comp._manifest()
    assert man is not None and man["covered_upto"] >= 3
    # the index tiers agree row-for-row with the uncompacted state
    a = sorted((r.doc_id, r.g) for r in comp._index().collect())
    b = sorted((r.doc_id, r.g) for r in plain._index().collect())
    assert a == b


def test_compaction_minhash_screen(spark, tmp_path):
    """Same bound + same decisions for the three-table minhash screen."""
    plain = StreamingCorpusCurator(spark, str(tmp_path / "p"), screen="minhash")
    comp = StreamingCorpusCurator(
        spark, str(tmp_path / "m"), screen="minhash", compact_after=1, n_buckets=4
    )
    batches = [
        [(1, _w(1)), (2, _w(1)), (3, _w(3))],
        [(4, _w(1)), (5, _w(5))],
        [(6, _w(3)), (7, _w(7))],
        [(8, _w(5)), (9, _w(9))],
    ]
    for i, rows in enumerate(batches):
        plain.process_batch(_docs(spark, rows), i)
        comp.process_batch(_docs(spark, rows), i)
    kept_p = sorted(r["doc_id"] for r in plain.accepted().collect())
    kept_c = sorted(r["doc_id"] for r in comp.accepted().collect())
    assert kept_c == kept_p == [1, 3, 5, 7, 9]
    # threshold bound + one retained grace generation (see above)
    for base in (comp.accepted_dir, comp.grams_dir, comp.banded_dir):
        assert len(_dirs_of(base)) <= 2 * (1 + 1)
    # banded tier intact: a dup of a long-compacted doc still rejects
    comp.process_batch(_docs(spark, [(100, _w(1)), (101, _w(101))]), 4)
    kept = sorted(r["doc_id"] for r in comp.accepted().collect())
    assert 100 not in kept and 101 in kept


def test_compaction_replay_after_partial_compaction(spark, tmp_path):
    """Crash DURING compaction (before the manifest flip): state reads
    are unchanged, a replayed batch reaches the same decisions, and a
    re-run compact() completes. Crash AFTER the flip (before cleanup):
    reads exclude covered dirs via the watermark — no double-count —
    and the interrupted cleanup resumes."""
    import json
    import os
    import shutil

    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"), n_buckets=4)
    batches = [
        [(1, _w(1)), (2, _w(2))],
        [(10, _w(1)), (11, _w(11))],
        [(20, _w(11)), (21, _w(21))],
    ]
    for i, rows in enumerate(batches):
        cur.process_batch(_docs(spark, rows), i)
    kept_before = sorted(r["doc_id"] for r in cur.accepted().collect())
    assert kept_before == [1, 2, 11, 21]
    grams_before = sorted((r.doc_id, r.g) for r in cur._index().collect())

    # ---- crash BEFORE the flip: vdir written, manifest absent
    vdir = os.path.join(cur.compacted_dir, "v0")
    from play_with_pulsar_spark.operators.dedup import write_ngram_index

    write_ngram_index(
        cur._read_committed(cur.grams_dir, cur.grams_schema, -1, 2),
        f"{cur.catalog_prefix}_v0_grams_by_g",
        n_buckets=4,
        path=os.path.join(vdir, "grams_by_g"),
    )
    assert cur._manifest() is None
    assert sorted((r.doc_id, r.g) for r in cur._index().collect()) == grams_before
    # replay of a committed batch is still a no-op
    cur.process_batch(_docs(spark, batches[2]), 2)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == kept_before
    # the re-run completes from scratch (clears the leftover vdir)
    assert cur.compact() is True
    assert sorted((r.doc_id, r.g) for r in cur._index().collect()) == grams_before
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == kept_before

    # ---- crash AFTER the flip, before cleanup: resurrect a covered dir
    man = cur._manifest()
    assert man["covered_upto"] == 2
    zombie = cur._batch_dir(cur.grams_dir, 0)
    os.makedirs(zombie, exist_ok=True)
    # stage a fake committed copy of batch 0's grams (double-count bait)
    src = StreamingCorpusCurator(spark, str(tmp_path / "c2"), n_buckets=4)
    src.process_batch(_docs(spark, batches[0]), 0)
    for f in os.listdir(src._batch_dir(src.grams_dir, 0)):
        shutil.copy(os.path.join(src._batch_dir(src.grams_dir, 0), f), zombie)
    # watermark filter: the zombie's rows must NOT be read twice
    assert sorted((r.doc_id, r.g) for r in cur._index().collect()) == grams_before
    # replay of covered batch 0 is a no-op even though dirs were cleaned
    cur.process_batch(_docs(spark, batches[0]), 0)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == kept_before
    # next compact() resumes the interrupted cleanup
    cur.compact()
    assert _dirs_of(cur.grams_dir) == []

    # decisions against compacted-only state: dup of doc 1 rejected
    cur.process_batch(_docs(spark, [(30, _w(1)), (31, _w(31))]), 3)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == kept_before + [31]


def test_compaction_reader_grace_one_generation(spark, tmp_path):
    """A lazy accepted() frame resolved against committed live dirs
    BEFORE a compaction must still collect AFTER it — folded dirs are
    deleted one compaction later, not at the flip (without the grace
    this read dies with FileNotFound mid-stream)."""
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "g"), compact_after=1, n_buckets=4
    )
    cur.process_batch(_docs(spark, [(1, _w(1)), (2, _w(2))]), 0)
    assert cur._manifest() is None  # below threshold: not compacted yet
    lazy = cur.accepted()  # plan resolves against live ingest_batch=0
    cur.process_batch(_docs(spark, [(3, _w(3))]), 1)
    cur.process_batch(_docs(spark, [(4, _w(4))]), 2)  # triggers compact
    assert cur._manifest() is not None  # compaction really happened
    assert sorted(r.doc_id for r in lazy.collect()) == [1, 2]


def test_compaction_partial_batch_handling(spark, tmp_path):
    """A TRAILING partially-committed batch (crash mid-batch, not yet
    replayed) stays above the watermark — compaction folds only the
    fully-committed prefix. A partial batch BELOW a later committed
    one (should be impossible under sequential micro-batches) aborts
    compaction instead of silently folding around it."""
    import os
    import shutil

    import pytest

    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"), n_buckets=4)
    for i in range(3):
        cur.process_batch(_docs(spark, [(i + 1, _w(i + 1))]), i)

    def break_batch(bid):
        shutil.rmtree(cur._batch_dir(cur.accepted_dir, bid))
        os.makedirs(cur._batch_dir(cur.accepted_dir, bid))  # no _SUCCESS

    # trailing partial: batch 2 broken -> fold covers only 0..1
    break_batch(2)
    assert cur.compact() is True
    assert cur._manifest()["covered_upto"] == 1
    # replaying batch 2 completes it; state is whole again
    cur.process_batch(_docs(spark, [(3, _w(3))]), 2)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1, 2, 3]

    # partial BELOW a committed batch: 3 broken, 4 committed -> refuse
    cur.process_batch(_docs(spark, [(4, _w(4))]), 3)
    cur.process_batch(_docs(spark, [(5, _w(5))]), 4)
    break_batch(3)
    with pytest.raises(RuntimeError, match="partially committed"):
        cur.compact()
    # after replay the batch re-commits and compaction succeeds
    cur.process_batch(_docs(spark, [(4, _w(4))]), 3)
    assert cur.compact() is True
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1, 2, 3, 4, 5]


def test_compaction_fresh_session_reattach(spark, tmp_path):
    """A curator constructed anew over an existing compacted state dir
    (the restart path) reads the compacted tier and keeps screening
    correctly, even though the session catalog may not know the
    tables; catalog re-registration restores the bucketed read."""
    base = str(tmp_path / "c")
    cur = StreamingCorpusCurator(spark, base, compact_after=0, n_buckets=4)
    cur.process_batch(_docs(spark, [(1, _w(1)), (2, _w(2))]), 0)
    man = cur._manifest()
    assert man is not None  # compact_after=0 folds every batch
    # drop the catalog entry to simulate a fresh session's catalog
    spark.sql(f"DROP TABLE IF EXISTS {man['grams']['table']}")

    cur2 = StreamingCorpusCurator(spark, base, compact_after=0, n_buckets=4)
    cur2.process_batch(_docs(spark, [(3, _w(1)), (4, _w(4))]), 1)  # 3 dups 1
    assert sorted(r["doc_id"] for r in cur2.accepted().collect()) == [1, 2, 4]
    # the re-registered table is back in the catalog as a bucketed table
    man2 = cur2._manifest()
    desc = spark.sql(f"DESCRIBE EXTENDED {man2['grams']['table']}").collect()
    text = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
    assert "Bucket Columns" in text


def test_compaction_export_includes_compacted_tier(spark, tmp_path):
    """export_bucketed_index after compaction must carry the FULL
    corpus (compacted + residual), not just live batch dirs."""
    from play_with_pulsar_spark.operators.dedup import (
        incremental_jaccard_pairs,
        release_intermediates,
    )

    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"), n_buckets=4)
    cur.process_batch(_docs(spark, [(1, _w(1)), (2, _w(2))]), 0)
    cur.compact()
    cur.process_batch(_docs(spark, [(3, _w(3))]), 1)  # residual dir
    cur.export_bucketed_index("pwp_cur_comp_export", n_buckets=4)
    try:
        grams = spark.table("pwp_cur_comp_export_grams_by_g")
        docs = {r["doc_id"] for r in grams.select("doc_id").distinct().collect()}
        assert docs == {1, 2, 3}
        batch = _docs(spark, [(9, _w(1))])
        pairs = incremental_jaccard_pairs(grams, batch, max_shingle_freq=None)
        got = [(r.id_a, r.id_b) for r in pairs.collect()]
        release_intermediates(pairs)
        assert got == [(1, 9)]
    finally:
        spark.sql("DROP TABLE IF EXISTS pwp_cur_comp_export_grams_by_g")


# ---------------------------------------------------------------------------
# embedding screen


import math


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "doc_id long, embedding array<double>",
    )


def _emb_curator(spark, path, **kw):
    kw.setdefault("threshold", 0.95)
    return StreamingCorpusCurator(
        spark, path, screen="embedding", emb_dim=2,
        num_planes=2, num_tables=16, **kw
    )


def _deg(d):
    return (math.cos(math.radians(d)), math.sin(math.radians(d)))


def test_embedding_curator_greedy_and_rejected_not_indexed(spark, tmp_path):
    """Greedy first-writer-wins over cosine similarity at τ=0.95
    (angle ≤ ~18.2°), including the rejected-not-indexed rule: v5 at
    30° resembles ONLY the rejected v2 (14°, Δ16°), not the accepted
    v1 (0°, Δ30°), so v5 is accepted — a Bloom/LSH crawler gate's
    exact behavior."""
    cur = _emb_curator(spark, str(tmp_path / "e"))
    cur.process_batch(_vecs(spark, [(1, _deg(0)), (2, _deg(14))]), 0)
    cur.process_batch(_vecs(spark, [(5, _deg(30)), (6, _deg(110))]), 1)
    # batch 2: 7 dups the ACCEPTED 5 -> rejected; 8 fresh -> kept
    cur.process_batch(_vecs(spark, [(7, _deg(31)), (8, _deg(200))]), 2)
    kept = {r["doc_id"] for r in cur.accepted().collect()}
    assert kept == {1, 5, 6, 8}
    indexed = {
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "e/vec"))
        .select("vec_id").distinct().collect()
    }
    assert indexed == {1, 5, 6, 8}


def test_embedding_curator_replay_idempotent(spark, tmp_path):
    cur = _emb_curator(spark, str(tmp_path / "e"))
    batch = _vecs(spark, [(1, _deg(0)), (2, _deg(90))])
    cur.process_batch(batch, 0)
    first = sorted(r["doc_id"] for r in cur.accepted().collect())
    n_vec = spark.read.parquet(str(tmp_path / "e/vec")).count()
    cur.process_batch(batch, 0)  # replay, same batch id
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == first
    assert spark.read.parquet(str(tmp_path / "e/vec")).count() == n_vec
    cur.process_batch(_vecs(spark, [(3, _deg(45))]), 1)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1, 2, 3]


def test_embedding_curator_compaction_preserves_decisions(spark, tmp_path):
    """compact-every-batch == never-compact, and the live batch-dir
    count stays bounded."""
    seq = [
        [(1, _deg(0)), (2, _deg(5))],
        [(10, _deg(2)), (11, _deg(120))],
        [(20, _deg(119)), (21, _deg(240)), (22, _deg(241))],
        [(30, _deg(60))],
    ]
    plain = _emb_curator(spark, str(tmp_path / "p"))
    comp = _emb_curator(spark, str(tmp_path / "q"), compact_after=0, n_buckets=4)
    try:
        for i, rows in enumerate(seq):
            plain.process_batch(_vecs(spark, rows), i)
            comp.process_batch(_vecs(spark, rows), i)
        a = sorted(r["doc_id"] for r in plain.accepted().collect())
        b = sorted(r["doc_id"] for r in comp.accepted().collect())
        assert a == b and len(a) > 0
        man = comp._manifest()
        assert man is not None and man["covered_upto"] == 3
        # bounded live dirs: everything below the previous watermark is
        # folded; at most one generation of reader-grace dirs survives
        live = comp._batch_dirs(comp.vec_dir)
        assert len(live) <= 2
        # post-compaction: a new batch screens against the compacted
        # tier (10 dups accepted 1 via the bucketed index)
        comp.process_batch(_vecs(spark, [(40, _deg(1))]), 4)
        assert 40 not in {r["doc_id"] for r in comp.accepted().collect()}
    finally:
        for v in range(6):
            for sfx in ("_vec", "_sig"):
                spark.sql(
                    f"DROP TABLE IF EXISTS {comp.catalog_prefix}_v{v}{sfx}"
                )


def test_embedding_curator_auto_geometry_frozen(spark, tmp_path):
    """Round-6: expected_corpus sizes the hyperplane geometry via
    lsh_auto_geometry and FREEZES it in base_dir/geometry.json — a
    re-attach with a different (or absent) expected_corpus loads the
    sidecar, because state signatures were computed under it, and
    screening decisions survive the restart unchanged."""
    import json
    import os

    from play_with_pulsar_spark.operators.similarity import lsh_auto_geometry

    path = str(tmp_path / "auto")
    cur = StreamingCorpusCurator(
        spark, path, screen="embedding", emb_dim=2, threshold=0.95,
        expected_corpus=100_000,
    )
    want = lsh_auto_geometry(100_000, threshold=0.95)
    assert (cur.num_planes, cur.num_tables) == want
    with open(os.path.join(path, "geometry.json")) as f:
        assert json.load(f) == {"num_planes": want[0], "num_tables": want[1], "vec_format": "int8", "retention": "first"}

    cur.process_batch(_vecs(spark, [(1, _deg(0)), (2, _deg(90))]), 0)
    before = sorted(r["doc_id"] for r in cur.accepted().collect())

    # restart with a WILDLY different expected_corpus: sidecar wins
    cur2 = StreamingCorpusCurator(
        spark, path, screen="embedding", emb_dim=2, threshold=0.95,
        expected_corpus=100,
    )
    assert (cur2.num_planes, cur2.num_tables) == want
    cur2.process_batch(_vecs(spark, [(3, _deg(1)), (4, _deg(45))]), 1)
    kept = sorted(r["doc_id"] for r in cur2.accepted().collect())
    assert kept == before + [4]  # 3 at 1° dups accepted 1 at 0°


def test_embedding_curator_explicit_geometry_frozen_and_conflict(spark, tmp_path):
    """Round-7 advice fix: geometry is frozen into geometry.json
    WHATEVER its source — explicitly passed num_planes/num_tables are
    persisted exactly like auto-derived ones — and a re-attachment
    whose EXPLICIT args conflict with the sidecar raises instead of
    silently changing geometry mid-state (which would stop past state
    signatures colliding with future ones)."""
    import json
    import os

    import pytest

    path = str(tmp_path / "explicit")
    cur = StreamingCorpusCurator(
        spark, path, screen="embedding", emb_dim=2, threshold=0.95,
        num_planes=6, num_tables=10,
    )
    assert (cur.num_planes, cur.num_tables) == (6, 10)
    with open(os.path.join(path, "geometry.json")) as f:
        assert json.load(f) == {"num_planes": 6, "num_tables": 10, "vec_format": "int8", "retention": "first"}

    cur.process_batch(_vecs(spark, [(1, _deg(0)), (2, _deg(90))]), 0)
    before = sorted(r["doc_id"] for r in cur.accepted().collect())

    # conflicting explicit re-attach: loud failure, state untouched
    with pytest.raises(ValueError, match="frozen LSH geometry"):
        StreamingCorpusCurator(
            spark, path, screen="embedding", emb_dim=2, threshold=0.95,
            num_planes=12, num_tables=4,
        )

    # arg-less re-attach loads the sidecar and decisions continue
    cur2 = StreamingCorpusCurator(
        spark, path, screen="embedding", emb_dim=2, threshold=0.95,
    )
    assert (cur2.num_planes, cur2.num_tables) == (6, 10)
    cur2.process_batch(_vecs(spark, [(3, _deg(1)), (4, _deg(45))]), 1)
    kept = sorted(r["doc_id"] for r in cur2.accepted().collect())
    assert kept == before + [4]  # 3 at 1° dups accepted 1 at 0°

    # default-geometry curators freeze 8/8 on first construction too
    path2 = str(tmp_path / "default")
    StreamingCorpusCurator(spark, path2, screen="embedding", emb_dim=2)
    with open(os.path.join(path2, "geometry.json")) as f:
        assert json.load(f) == {"num_planes": 8, "num_tables": 8, "vec_format": "int8", "retention": "first"}


def test_curator_quality_screen_gates_dedup(spark, tmp_path):
    """Round-7: quality_model_path pre-screens every batch with the
    learned filter BEFORE the dedup screen. Low-quality docs are
    rejected and NEVER indexed (so they also never reject a later
    near-dup); replay of a committed batch is a no-op; a partial
    commit replays to the identical state; and a model-sidecar swap
    (atomic save_model over the same path) is picked up on the next
    batch without restarting the curator."""
    import shutil

    from play_with_pulsar_spark.operators import classifier

    # hand-built model: identity stats + weight only on log_tokens ⇒
    # score >= 0.5 iff ln(1+n_tokens) >= 3.258 iff n_tokens >= 25
    model = str(tmp_path / "model.json")
    stats = {name: (0.0, 1.0) for name in classifier.FEATURES}
    classifier.save_model(model, [-32.58, 10.0, 0.0, 0.0, 0.0, 0.0], stats)

    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "c"), quality_model_path=model
    )
    # doc 1 long (30 tokens, passes), doc 2 short (5 tokens, fails)
    b0 = _docs(spark, [(1, _w(1, 30)), (2, _w(2, 5))])
    cur.process_batch(b0, 0)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1]
    indexed = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "c/grams"))
        .select("doc_id").distinct().collect()
    }
    assert indexed == {1}  # quality-rejected doc 2 never indexed

    # 3 near-dups accepted 1 → dedup-rejected; 4 long unique → kept;
    # 5 short → quality-rejected
    b1 = _docs(spark, [(3, _w(1, 30)), (4, _w(4, 30)), (5, _w(5, 5))])
    cur.process_batch(b1, 1)
    kept = sorted(r["doc_id"] for r in cur.accepted().collect())
    assert kept == [1, 4]

    # committed replay: no-op
    cur.process_batch(b1, 1)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == kept

    # partial-commit replay: grams partition of batch 1 lost → the
    # redelivery must rebuild exactly the kept docs' shingles
    shutil.rmtree(cur._batch_dir(cur.grams_dir, 1))
    cur.process_batch(b1, 1)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == kept
    indexed = {
        r["doc_id"]
        for r in cur._index().select("doc_id").distinct().collect()
    }
    assert indexed == {1, 4}

    # model swap (atomic overwrite): next batch scored by NEW weights
    # — bias +100 accepts everything, so a short doc now survives
    classifier.save_model(model, [100.0, 0.0, 0.0, 0.0, 0.0, 0.0], stats)
    cur.process_batch(_docs(spark, [(6, _w(6, 5))]), 2)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1, 4, 6]


def test_curator_maintained_df_tier(spark, tmp_path):
    """Round-7: the jaccard screen's stop-shingle cap reads the
    maintained per-batch df tier (sum of kept-gram dfs) instead of
    recounting the corpus gram table. The maintained aggregate must
    equal a fresh recount of the gram index after every batch, survive
    compaction through the fast fold, fall back (None) when a df
    partition is missing — decisions unchanged — and be HEALED by the
    next compaction (the pre-round-7-state migration path)."""
    import shutil

    from play_with_pulsar_spark.operators.dedup import build_df_index

    def df_of(cur):
        ix = cur._index_df()
        return None if ix is None else {(r.g, r.df) for r in ix.collect()}

    def recount(cur):
        return {(r.g, r.df) for r in build_df_index(cur._index()).collect()}

    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "c"), n_buckets=4, compact_after=None
    )
    batches = [
        [(1, _w(1)), (2, _w(2))],
        [(10, _w(1)), (11, _w(11))],
        [(20, _w(11)), (21, _w(21))],
    ]
    for i, rows in enumerate(batches):
        cur.process_batch(_docs(spark, rows), i)
        assert df_of(cur) == recount(cur)  # maintained == fresh recount
    kept = sorted(r["doc_id"] for r in cur.accepted().collect())
    assert kept == [1, 2, 11, 21]

    # compaction folds the df tier (fast path) and equality holds
    assert cur.compact() is True
    assert cur._manifest()["df"] is not None
    assert df_of(cur) == recount(cur)

    # fallback: a post-compaction batch whose df partition is lost →
    # _index_df refuses (alignment check) but decisions are unchanged
    cur.process_batch(_docs(spark, [(30, _w(21)), (31, _w(31))]), 3)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1, 2, 11, 21, 31]
    shutil.rmtree(cur._batch_dir(cur.df_dir, 3))
    assert cur._index_df() is None
    cur.process_batch(_docs(spark, [(40, _w(31)), (41, _w(41))]), 4)  # recount path
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1, 2, 11, 21, 31, 41]

    # healing: the next compaction derives df from the gram table
    # (batch 3's df partition is still missing → slow path), after
    # which the maintained read works again
    assert cur.compact() is True
    assert cur._manifest()["df"] is not None
    assert df_of(cur) == recount(cur)

    for v in range(3):
        for sfx in ("grams_by_g", "df_by_g"):
            spark.sql(f"DROP TABLE IF EXISTS {cur.catalog_prefix}_v{v}_{sfx}")


def test_curator_contamination_screen(spark, tmp_path):
    """Round-7 Bloom decontamination pre-screen: a doc sharing ≥10%
    of its shingles with the benchmark set is rejected BEFORE the
    dedup screen (and never indexed, so a later near-dup of it is
    accepted); clean docs flow through; a committed-batch replay is
    a no-op; refreshing the benchmark artifact re-screens later
    batches under the new filter."""
    from play_with_pulsar_spark.operators import sketch

    bench_path = str(tmp_path / "bench_bloom")
    bench = _docs(spark, [(900, _w(900)), (901, _w(901))])
    from play_with_pulsar_spark.operators.textops import exploded_ngrams

    geo = dict(m_bits=4096, k=3)
    sketch.write_bloom(
        exploded_ngrams(bench, n=3).select("g").distinct(),
        bench_path, key="g", **geo,
    )

    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "c"),
        contamination_bloom_path=bench_path,
        contamination_max_fraction=0.1,
    )
    # 1 is a verbatim copy of benchmark doc 900 → rejected; 2 clean
    cur.process_batch(_docs(spark, [(1, _w(900)), (2, _w(2))]), 0)
    assert {r.doc_id for r in cur.accepted().collect()} == {2}
    # contaminated docs are never indexed: doc 3 duplicates the
    # CONTAMINATED doc 1's text → it is screened by the bloom too
    # (same text), but doc 4 duplicating ACCEPTED 2 is dedup-rejected
    cur.process_batch(_docs(spark, [(3, _w(900)), (4, _w(2)), (5, _w(5))]), 1)
    assert {r.doc_id for r in cur.accepted().collect()} == {2, 5}
    indexed = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "c/grams"))
        .select("doc_id").distinct().collect()
    }
    assert indexed == {2, 5}  # 1 and 3 never touched the index
    # committed replay: no-op
    cur.process_batch(_docs(spark, [(1, _w(900)), (2, _w(2))]), 0)
    assert {r.doc_id for r in cur.accepted().collect()} == {2, 5}
    # refresh the artifact to ALSO cover _w(5)'s vocabulary (sidecar
    # mtime re-read). Doc 6 = 10 tokens of _w(5) + 20 fresh ones:
    # Jaccard vs accepted 5 is ~0.17 (dedup passes it) but its bloom
    # hit fraction is 8/28 ≈ 0.29 — ONLY the refreshed filter rejects
    # it, so the assertion isolates the refresh path from dedup
    sketch.write_bloom(
        exploded_ngrams(
            bench.unionByName(_docs(spark, [(902, _w(5))])), n=3
        ).select("g").distinct(),
        bench_path, key="g", **geo,
    )
    diluted = " ".join(_w(5).split()[:10] + [f"f6x{i}" for i in range(20)])
    cur.process_batch(_docs(spark, [(6, diluted), (7, _w(7))]), 2)
    assert {r.doc_id for r in cur.accepted().collect()} == {2, 5, 7}


def test_curator_vocab_hll_monitor(spark, tmp_path):
    """Round-7 vocabulary monitor: vocab_estimate reads the
    maintained per-batch HLL registers (within the HLL error bound of
    the exact distinct-gram count); a missing partition falls back to
    the derive path with the IDENTICAL estimate (register-max over
    the same grams is idempotent); compaction folds the registers
    into the manifest and heals the gap; the estimate is stable
    across a committed-batch replay."""
    import os
    import shutil

    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    batches = [[(1, _w(1)), (2, _w(2))], [(3, _w(3))]]
    for i, rows in enumerate(batches):
        cur.process_batch(_docs(spark, rows), i)
    exact = cur._index(None).select("g").distinct().count()
    est = cur.vocab_estimate()
    assert abs(est / exact - 1) < 4 * 1.04 / (256**0.5), (est, exact)
    # the maintained tier is really there (and bounded)
    h1 = str(tmp_path / "c/hll/ingest_batch=1")
    assert os.path.isdir(h1)
    assert spark.read.parquet(h1).count() <= 256
    # gap => the derive fallback returns the IDENTICAL estimate
    shutil.rmtree(h1)
    assert cur.vocab_estimate() == est
    # compaction heals the tier (derive path inside the fold) and the
    # manifest-backed read agrees
    assert cur.compact() is True
    assert cur._manifest().get("hll") is not None
    assert cur.vocab_estimate() == est
    # a post-compaction batch extends the registers incrementally
    cur.process_batch(_docs(spark, [(4, _w(4))]), 2)
    exact2 = cur._index(None).select("g").distinct().count()
    est2 = cur.vocab_estimate()
    assert abs(est2 / exact2 - 1) < 4 * 1.04 / (256**0.5)
    # committed replay: estimate unchanged (idempotent max)
    cur.process_batch(_docs(spark, [(4, _w(4))]), 2)
    assert cur.vocab_estimate() == est2


def test_embedding_geometry_rollover_preserves_decisions(spark, tmp_path):
    """Round-7: rollover_geometry re-signs the full vec state under a
    new geometry behind one atomic manifest flip. Decisions continue
    correctly across the cutover (a post-rollover near-dup of a
    PRE-rollover accepted doc is still rejected), the re-signed sig
    state equals a from-scratch signing under the new geometry, and a
    no-op rollover (same geometry) returns False."""
    from play_with_pulsar_spark.operators.similarity import (
        hyperplane_signatures_multi,
    )

    path = str(tmp_path / "roll")
    cur = _emb_curator(spark, path, compact_after=None, n_buckets=4)
    cur.process_batch(_vecs(spark, [(1, _deg(0)), (2, _deg(90))]), 0)
    cur.process_batch(_vecs(spark, [(3, _deg(1)), (4, _deg(180))]), 1)
    kept0 = sorted(r["doc_id"] for r in cur.accepted().collect())
    assert kept0 == [1, 2, 4]  # 3 at 1 degree dups accepted 1

    assert cur.rollover_geometry(num_planes=3, num_tables=8) is True
    assert (cur.num_planes, cur.num_tables) == (3, 8)
    assert cur._manifest()["geometry"] == {"num_planes": 3, "num_tables": 8}

    # re-signed state == from-scratch signing of the vec state
    vecs = cur._index_vec()
    want = {
        (r.vec_id, r.tbl, r.bucket)
        for r in hyperplane_signatures_multi(
            vecs, dim=2, num_planes=3, num_tables=8, seed=cur.seed,
            id_col="vec_id", vec_col="v",
        ).collect()
    }
    got = {(r.vec_id, r.tbl, r.bucket) for r in cur._index_sig().collect()}
    assert got == want != set()

    # decisions continue across the cutover: 5 dups pre-rollover 4;
    # 6 is fresh
    cur.process_batch(_vecs(spark, [(5, _deg(181)), (6, _deg(270))]), 2)
    assert sorted(r["doc_id"] for r in cur.accepted().collect()) == [1, 2, 4, 6]

    # no-op rollover
    assert cur.rollover_geometry(num_planes=3, num_tables=8) is False

    for v in range(5):
        for sfx in ("_vec", "_sig"):
            spark.sql(f"DROP TABLE IF EXISTS {cur.catalog_prefix}_v{v}{sfx}")


def test_embedding_geometry_rollover_reattach_and_stale_sidecar(spark, tmp_path):
    """The manifest's geometry record wins at attach: a re-attach
    after rollover picks the new geometry even when geometry.json is
    stale (the crash-between-flips window), heals the sidecar, and an
    explicit-args conflict is judged against the NEW geometry. An
    empty-state rollover (nothing signed yet) just re-freezes."""
    import json
    import os

    path = str(tmp_path / "roll2")
    cur = _emb_curator(spark, path, compact_after=None, n_buckets=4)
    cur.process_batch(_vecs(spark, [(1, _deg(0)), (2, _deg(90))]), 0)
    assert cur.rollover_geometry(num_planes=4, num_tables=6) is True

    # simulate the crash window: sidecar reverted to the OLD geometry
    geo_path = os.path.join(path, "geometry.json")
    with open(geo_path, "w") as f:
        json.dump({"num_planes": 2, "num_tables": 16}, f)

    cur2 = StreamingCorpusCurator(
        spark, path, screen="embedding", emb_dim=2, threshold=0.95
    )
    assert (cur2.num_planes, cur2.num_tables) == (4, 6)  # manifest wins
    with open(geo_path) as f:
        healed = json.load(f)
        assert (healed["num_planes"], healed["num_tables"]) == (4, 6)  # healed

    import pytest as _pytest

    with _pytest.raises(ValueError, match="frozen LSH geometry"):
        StreamingCorpusCurator(
            spark, path, screen="embedding", emb_dim=2, threshold=0.95,
            num_planes=2, num_tables=16,
        )

    # decisions continue under the rolled geometry on the re-attach
    cur2.process_batch(_vecs(spark, [(3, _deg(1)), (4, _deg(200))]), 1)
    assert sorted(r["doc_id"] for r in cur2.accepted().collect()) == [1, 2, 4]

    # empty-state rollover: sidecar-only cutover
    path3 = str(tmp_path / "roll3")
    cur3 = _emb_curator(spark, path3)
    assert cur3.rollover_geometry(num_planes=5, num_tables=5) is True
    assert (cur3.num_planes, cur3.num_tables) == (5, 5)
    assert cur3._manifest() is None

    for v in range(5):
        for sfx in ("_vec", "_sig"):
            spark.sql(f"DROP TABLE IF EXISTS {cur.catalog_prefix}_v{v}{sfx}")


def test_curator_perplexity_screen_rejects_gibberish(spark, tmp_path):
    """CCNet-style LM screen (round 7 continued): gibberish (unseen
    vocabulary) is rejected before the dedup screen and never
    indexed; clean docs pass; committed batches replay as no-ops;
    a refit artifact is picked up on mtime change."""
    from pyspark.sql import functions as F

    from play_with_pulsar_spark.operators import textops
    from play_with_pulsar_spark.streaming.curator import StreamingCorpusCurator

    clean = [(i, f"alpha beta gamma delta epsilon tok{i} zeta eta theta") for i in range(30)]
    ref = _docs(spark, clean)
    lmdir = str(tmp_path / "lm")
    uc, ctx, bc, meta = textops.fit_bigram_lm(ref)
    textops.write_bigram_lm(lmdir, uc, ctx, bc, meta)

    gibberish = [(100 + i, f"zzq{i} qxv wvu utr rqp pon") for i in range(5)]
    stream = _docs(spark, clean + gibberish)
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "cur"), threshold=0.8,
        perplexity_lm_path=lmdir, perplexity_max_xent=5.0,
    )
    for k in range(2):
        cur.process_batch(stream.filter(F.col("doc_id") % 2 == k), k)
    acc = {r.doc_id for r in cur.accepted().select("doc_id").collect()}
    assert not acc & {100 + i for i in range(5)}
    assert set(range(30)) <= acc
    # replay of a committed batch is a no-op (idempotent)
    before = sorted(acc)
    cur.process_batch(stream.filter(F.col("doc_id") % 2 == 0), 0)
    assert sorted(r.doc_id for r in cur.accepted().select("doc_id").collect()) == before
    # live artifact swap: refit on the gibberish slice -> the same
    # docs now score in-domain and a NEW batch of them passes
    uc2, ctx2, bc2, meta2 = textops.fit_bigram_lm(_docs(spark, gibberish))
    textops.write_bigram_lm(lmdir, uc2, ctx2, bc2, meta2)
    more_gib = _docs(spark, [(200, "zzq0 qxv wvu utr rqp pon")])
    cur.process_batch(more_gib, 2)
    acc2 = {r.doc_id for r in cur.accepted().select("doc_id").collect()}
    assert 200 in acc2


def test_curator_hdr_length_monitor(spark, tmp_path):
    """Round-7 doc-length monitor: length_quantiles reads the
    maintained per-batch HDR buckets and equals the one-shot sketch
    over the accepted corpus EXACTLY (additive merge law); a missing
    partition falls back to the derive path with the identical
    result; compaction folds the buckets into the manifest and heals
    the gap; a committed-batch replay changes nothing (no
    double-count in the additive tier)."""
    import os
    import shutil

    from play_with_pulsar_spark.operators.sketch import hdr_build, hdr_quantiles
    from play_with_pulsar_spark.operators.textops import token_count
    from play_with_pulsar_spark.streaming.curator import LEN_HDR_SUB_BITS

    cur = StreamingCorpusCurator(spark, str(tmp_path / "c"))
    # varied lengths so the quantiles are non-trivial
    batches = [
        [(1, _w(1, 10)), (2, _w(2, 40))],
        [(3, _w(3, 100)), (4, _w(4, 25))],
    ]
    for i, rows in enumerate(batches):
        cur.process_batch(_docs(spark, rows), i)

    def oneshot():
        sk = hdr_build(
            cur.accepted().select(token_count("text").cast("long").alias("v")),
            "v",
            sub_bits=LEN_HDR_SUB_BITS,
        )
        return {
            float(r.q): int(r.est)
            for r in hdr_quantiles(
                sk, [0.5, 0.9, 0.99], sub_bits=LEN_HDR_SUB_BITS
            ).collect()
        }

    got = cur.length_quantiles()
    assert got == oneshot()
    # the maintained tier is really there (and sketch-width bounded)
    h1 = str(tmp_path / "c/hdr/ingest_batch=1")
    assert os.path.isdir(h1)
    assert spark.read.parquet(h1).count() <= (53 - LEN_HDR_SUB_BITS + 1) * (
        1 << LEN_HDR_SUB_BITS
    )
    # gap => derive fallback, identical result
    shutil.rmtree(h1)
    assert cur.length_quantiles() == got
    # compaction heals the tier; manifest-backed read agrees
    assert cur.compact() is True
    assert cur._manifest().get("hdr") is not None
    assert cur.length_quantiles() == got
    # a post-compaction batch extends the buckets incrementally
    cur.process_batch(_docs(spark, [(5, _w(5, 200))]), 2)
    got2 = cur.length_quantiles()
    assert got2 == oneshot()
    assert got2[0.99] > got[0.99]  # the long doc moved the tail
    # committed replay: additive tier unchanged (overwrite discipline)
    cur.process_batch(_docs(spark, [(5, _w(5, 200))]), 2)
    assert cur.length_quantiles() == got2


def test_curator_adaptive_length_band_screen(spark, tmp_path):
    """Round-7 length_band screen: warmup accepts everything; once the
    tier covers >= min_docs accepted docs, a batch's extreme-length
    docs (far outside the [q05, q95] token-count band of the corpus
    so far) are rejected BEFORE the dedup screen while in-band docs
    pass; a committed replay is a no-op; a partial-commit replay
    (missing hdr partition) re-decides identically because the screen
    consults the PRE-batch tier."""
    import os
    import shutil

    cur = StreamingCorpusCurator(
        spark,
        str(tmp_path / "c"),
        length_band=(0.05, 0.95),
        length_band_min_docs=10,
    )
    # warmup batch: 12 docs, lengths 20..42 — tier empty, all accepted
    warm = [(i, _w(i, 20 + 2 * i)) for i in range(12)]
    cur.process_batch(_docs(spark, warm), 0)
    acc = {r.doc_id for r in cur.accepted().select("doc_id").collect()}
    assert acc == set(range(12))

    # screened batch: two in-band docs, one 500-token, one 2-token
    b1 = [(100, _w(100, 30)), (101, _w(101, 25)), (102, _w(102, 500)), (103, _w(103, 2))]
    cur.process_batch(_docs(spark, b1), 1)
    acc1 = {r.doc_id for r in cur.accepted().select("doc_id").collect()}
    assert {100, 101} <= acc1 and 102 not in acc1 and 103 not in acc1

    # committed replay: nothing changes
    cur.process_batch(_docs(spark, b1), 1)
    assert {r.doc_id for r in cur.accepted().select("doc_id").collect()} == acc1

    # partial-commit replay: drop batch 1's hdr partition; the replay
    # must re-decide identically (pre-batch tier) and heal the tier
    h1 = str(tmp_path / "c/hdr/ingest_batch=1")
    assert os.path.isdir(h1)
    shutil.rmtree(h1)
    cur.process_batch(_docs(spark, b1), 1)
    assert os.path.isdir(h1)
    assert {r.doc_id for r in cur.accepted().select("doc_id").collect()} == acc1
    # the maintained quantiles reflect accepted docs only (no 500/2)
    q = cur.length_quantiles([0.05, 0.95])
    assert q[0.95] < 100 and q[0.05] >= 19


# ---------------------------------------------------------------------
# retention='best' (round 8 — r7 verdict #1): value-aware retention
# with idempotent tombstone evictions

def _rdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, score double")


_DUP = "w0 w1 w2 w3 w4 w5"
_UNIQ = "u0 u1 u2 u3 u4"


def _rcur(spark, path, **kw):
    kw.setdefault("threshold", 0.8)
    kw.setdefault("max_shingle_freq", 50)
    return StreamingCorpusCurator(
        spark, str(path), retention="best", score_col="score", **kw
    )


def test_retention_best_validation(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="score_col"):
        StreamingCorpusCurator(spark, str(tmp_path / "a"), retention="best")
    with pytest.raises(ValueError, match="retention"):
        StreamingCorpusCurator(spark, str(tmp_path / "c"), retention="bogus")


def test_retention_best_eviction_tie_and_unindex(spark, tmp_path):
    """A later higher-scoring near-dup REPLACES the incumbent (the
    batch dedup_survivors_best policy, streamed); ties keep the
    incumbent; the evicted doc leaves accepted() AND the gram index
    (a later copy is judged against the survivor's score only)."""
    cur = _rcur(spark, tmp_path / "c")
    cur.process_batch(_rdocs(spark, [(10, _DUP, 1.0), (11, _UNIQ, 5.0)]), 0)
    # tie -> incumbent 10 keeps, 5 rejected
    cur.process_batch(_rdocs(spark, [(5, _DUP, 1.0)]), 1)
    assert {r.doc_id for r in cur.accepted().collect()} == {10, 11}
    # strictly better -> evicts 10
    cur.process_batch(_rdocs(spark, [(7, _DUP, 2.0)]), 2)
    assert {r.doc_id for r in cur.accepted().collect()} == {7, 11}
    assert {r.doc_id for r in cur._index().collect()} == {7, 11}
    # the evicted doc's score no longer gates anything: 1.5 < 2.0
    cur.process_batch(_rdocs(spark, [(20, _DUP, 1.5)]), 3)
    assert {r.doc_id for r in cur.accepted().collect()} == {7, 11}
    # rejected docs were never indexed; evicted doc is tombstoned
    assert {r.doc_id for r in cur._tombstones().collect()} == {10}


def test_retention_within_batch_best_wins_ties_min_id(spark, tmp_path):
    cur = _rcur(spark, tmp_path / "c")
    cur.process_batch(
        _rdocs(spark, [(3, _DUP, 1.0), (4, _DUP, 5.0), (9, _DUP, 5.0)]), 0
    )
    assert {r.doc_id for r in cur.accepted().collect()} == {4}


def test_retention_rejected_challenger_does_not_evict(spark, tmp_path):
    """A challenger beaten by its own in-batch twin must not knock
    out an incumbent it merely tied pairs with. Non-transitive
    fixture: T2 near-dups both T10 and T1, but T1 !~ T10 (first/last
    token swaps of a 12-token doc; jaccard 9/11 = 0.82 vs 8/12 =
    0.67 at threshold 0.8)."""
    base = [f"t{i}" for i in range(12)]
    t2 = " ".join(base)
    t10 = " ".join(["x0"] + base[1:])
    t1 = " ".join(base[:-1] + ["x1"])
    cur = _rcur(spark, tmp_path / "c")
    cur.process_batch(_rdocs(spark, [(10, t10, 5.0)]), 0)
    # doc 2 (score 6) would evict 10, but loses to in-batch doc 1
    # (score 7), which itself does NOT pair with 10
    cur.process_batch(_rdocs(spark, [(2, t2, 6.0), (1, t1, 7.0)]), 1)
    assert {r.doc_id for r in cur.accepted().collect()} == {10, 1}
    assert cur._tombstones().count() == 0


def test_retention_replay_idempotent(spark, tmp_path):
    """Replaying the eviction batch after a partial commit decides
    identically: same accepted set, same tombstones, no duplicate
    index rows, df tier still sums to the surviving corpus."""
    import os

    cur = _rcur(spark, tmp_path / "c")
    cur.process_batch(_rdocs(spark, [(10, _DUP, 1.0), (11, _UNIQ, 2.0)]), 0)
    b1 = _rdocs(spark, [(5, _DUP, 3.0), (6, _UNIQ, 1.0)])
    cur.process_batch(b1, 1)  # evicts 10, rejects 6
    want_acc = {r.doc_id for r in cur.accepted().collect()}
    assert want_acc == {5, 11}
    want_idx = sorted(map(tuple, cur._index().collect()))
    want_tomb = {r.doc_id for r in cur._tombstones().collect()}
    want_df = sorted(map(tuple, cur._index_df().collect()))
    for tier in ("accepted", "grams", "df", "hll", "hdr", "tombstones"):
        m = os.path.join(str(tmp_path / "c"), tier, "ingest_batch=1", "_SUCCESS")
        if os.path.exists(m):
            os.remove(m)
    cur.process_batch(b1, 1)  # replay
    assert {r.doc_id for r in cur.accepted().collect()} == want_acc
    assert sorted(map(tuple, cur._index().collect())) == want_idx
    assert {r.doc_id for r in cur._tombstones().collect()} == want_tomb
    assert sorted(map(tuple, cur._index_df().collect())) == want_df


def test_retention_compaction_physical_removal_and_transparency(spark, tmp_path):
    """Compaction applies covered tombstones PHYSICALLY (the folded
    gram/accepted tables never contain evicted rows), sweeps the
    applied tombstone dirs, and later decisions are identical to an
    uncompacted twin's."""
    batches = [
        [(10, _DUP, 1.0), (11, _UNIQ, 2.0)],
        [(5, _DUP, 3.0)],           # evicts 10
        [(20, _DUP, 2.5)],          # rejected by 5
        [(30, _DUP, 9.0)],          # evicts 5
    ]
    plain = _rcur(spark, tmp_path / "plain")
    comp = _rcur(spark, tmp_path / "comp", compact_after=1, n_buckets=4)
    for k, rows in enumerate(batches):
        plain.process_batch(_rdocs(spark, rows), k)
        comp.process_batch(_rdocs(spark, rows), k)
    assert {r.doc_id for r in comp.accepted().collect()} == {
        r.doc_id for r in plain.accepted().collect()
    } == {11, 30}
    assert comp.compact() in (True, False)
    # folded tables: no evicted ids physically present
    man = comp._manifest()
    acc_raw = {r.doc_id for r in spark.read.parquet(man["accepted_path"]).collect()}
    assert 10 not in acc_raw and 5 not in acc_raw
    gr = comp._compacted_state("grams")
    assert gr.filter(F.col("doc_id").isin(10, 5)).count() == 0
    # df tier of both curators sums to the surviving corpus
    assert sorted(map(tuple, comp._index_df().collect())) == sorted(
        map(tuple, plain._index_df().collect())
    )
    # decisions continue identically post-compaction: 40 rejected by
    # incumbent 30 (5 < 9); 41 EVICTS incumbent 11 (9 > 2) — an
    # eviction whose incumbent lives in the COMPACTED tier
    nxt = _rdocs(spark, [(40, _DUP, 5.0), (41, _UNIQ, 9.0)])
    plain.process_batch(nxt, 4)
    comp.process_batch(nxt, 4)
    assert {r.doc_id for r in comp.accepted().collect()} == {
        r.doc_id for r in plain.accepted().collect()
    } == {30, 41}


def test_retention_df_fallback_decisions_identical(spark, tmp_path):
    """The maintained df tier (with its negative eviction deltas) and
    the recount fallback gate the SAME decisions — delete the df dirs
    mid-stream and the next batch still decides identically."""
    import shutil

    a = _rcur(spark, tmp_path / "a")
    b = _rcur(spark, tmp_path / "b")
    batches = [
        [(10, _DUP, 1.0), (11, _UNIQ, 2.0)],
        [(5, _DUP, 3.0)],  # evicts 10
    ]
    for k, rows in enumerate(batches):
        a.process_batch(_rdocs(spark, rows), k)
        b.process_batch(_rdocs(spark, rows), k)
    shutil.rmtree(str(tmp_path / "b" / "df"), ignore_errors=True)
    assert b._index_df() is None  # fallback engaged
    nxt = _rdocs(spark, [(20, _DUP, 2.0), (21, _DUP, 4.0)])
    a.process_batch(nxt, 2)
    b.process_batch(nxt, 2)
    assert {r.doc_id for r in a.accepted().collect()} == {
        r.doc_id for r in b.accepted().collect()
    } == {11, 21}


def test_retention_minhash_screen_evicts_and_unindexes(spark, tmp_path):
    cur = _rcur(spark, tmp_path / "c", screen="minhash", max_shingle_freq=None)
    cur.process_batch(_rdocs(spark, [(10, _DUP, 1.0)]), 0)
    cur.process_batch(_rdocs(spark, [(5, _DUP, 3.0)]), 1)  # evicts 10
    assert {r.doc_id for r in cur.accepted().collect()} == {5}
    assert {r.doc_id for r in cur._index_banded().collect()} == {5}
    cur.process_batch(_rdocs(spark, [(20, _DUP, 2.0)]), 2)  # rejected by 5
    assert {r.doc_id for r in cur.accepted().collect()} == {5}


def test_retention_length_sketch_tracks_survivors(spark, tmp_path):
    """The maintained HDR tier (negative deltas applied) equals a
    fresh derive over the surviving accepted corpus."""
    cur = _rcur(spark, tmp_path / "c")
    long_dup = " ".join(f"w{i}" for i in range(40))
    cur.process_batch(_rdocs(spark, [(10, long_dup, 1.0), (11, _UNIQ, 2.0)]), 0)
    cur.process_batch(_rdocs(spark, [(5, long_dup, 3.0)]), 1)  # evicts 10
    maintained = {
        (r.idx, r.cnt)
        for r in cur._length_sketch().collect()
        if r.cnt != 0
    }
    from play_with_pulsar_spark.operators.sketch import hdr_build
    from play_with_pulsar_spark.operators.textops import token_count
    from play_with_pulsar_spark.streaming.curator import LEN_HDR_SUB_BITS

    derived = {
        (r.idx, r.cnt)
        for r in hdr_build(
            cur.accepted().select(token_count("text").cast("long").alias("v")),
            "v",
            sub_bits=LEN_HDR_SUB_BITS,
        ).collect()
    }
    assert maintained == derived


# ---------------------------------------------------------------------
# int8-compressed embedding state (round 8 — r7 verdict #2)

def _cvecs(spark, ids, cluster, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed * 1000 + cluster)
    rows = []
    for i in ids:
        base = np.zeros(8)
        base[cluster] = 1.0
        v = base + 0.05 * rng.randn(8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


_EKW = dict(screen="embedding", emb_dim=8, threshold=0.9, id_col="vec_id")


def test_vec_format_int8_matches_float64_decisions(spark, tmp_path):
    """At near-dup margins (within-cluster ~0.99 vs threshold 0.9)
    the compressed state decides identically to float64 state, and
    the stored tier really is int8 codes + scale. (At razor-thin
    margins the int8 path has its own exact oracle —
    pipeline_embedding_curation_int8 replays the quantizer.)"""
    a = StreamingCorpusCurator(spark, str(tmp_path / "a"), **_EKW)  # int8 default
    b = StreamingCorpusCurator(
        spark, str(tmp_path / "b"), vec_format="float64", **_EKW
    )
    assert (a.vec_format, b.vec_format) == ("int8", "float64")
    batches = [
        _cvecs(spark, [1, 2], 0, 1).unionByName(_cvecs(spark, [3], 1, 1)),
        _cvecs(spark, [10], 0, 2).unionByName(_cvecs(spark, [12], 2, 2)),
    ]
    for k, bt in enumerate(batches):
        a.process_batch(bt, k)
        b.process_batch(bt, k)
    aa = sorted(r.vec_id for r in a.accepted().collect())
    assert aa == sorted(r.vec_id for r in b.accepted().collect()) == [1, 3, 12]
    sch = spark.read.parquet(str(tmp_path / "a" / "vec")).schema.simpleString()
    assert "qc:array<tinyint>" in sch and "qs:double" in sch
    # replay idempotence on the compressed tier
    import os

    os.remove(os.path.join(str(tmp_path / "a"), "vec", "ingest_batch=1", "_SUCCESS"))
    a.process_batch(batches[1], 1)
    assert sorted(r.vec_id for r in a.accepted().collect()) == aa


def test_vec_format_frozen_conflict_and_legacy(spark, tmp_path):
    import json
    import os

    import pytest

    a = StreamingCorpusCurator(spark, str(tmp_path / "a"), **_EKW)
    a.process_batch(_cvecs(spark, [1], 0), 0)
    # re-attach inherits; explicit conflicting format raises
    a2 = StreamingCorpusCurator(spark, str(tmp_path / "a"), **_EKW)
    assert a2.vec_format == "int8"
    with pytest.raises(ValueError, match="vec_format"):
        StreamingCorpusCurator(
            spark, str(tmp_path / "a"), vec_format="float64", **_EKW
        )
    # a pre-round-8 sidecar (no vec_format key) attaches as float64
    geo = os.path.join(str(tmp_path / "a"), "geometry.json")
    with open(geo) as f:
        d = json.load(f)
    d.pop("vec_format")
    with open(geo, "w") as f:
        json.dump(d, f)
    a3 = StreamingCorpusCurator(spark, str(tmp_path / "a"), **_EKW)
    assert a3.vec_format == "float64"


def test_migrate_vec_format_cutover(spark, tmp_path):
    """float64 → int8 migration: versioned rewrite + manifest flip,
    re-signed-from-v̂ signatures, decisions continue, format survives
    re-attach, and int8 → anything is refused."""
    import os

    import pytest
    from pyspark.sql import functions as F

    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "m"), vec_format="float64", **_EKW
    )
    cur.process_batch(_cvecs(spark, [1, 2], 0).unionByName(_cvecs(spark, [3], 1)), 0)
    cur.process_batch(_cvecs(spark, [10], 2), 1)
    assert cur.migrate_vec_format("int8") is True
    assert cur.vec_format == "int8"
    man = cur._manifest()
    assert man["vec_format"] == "int8"
    sch = spark.read.parquet(man["vec"]["path"]).schema.simpleString()
    assert "qc:array<tinyint>" in sch
    # re-signed state == signing the dequantized state from scratch
    from play_with_pulsar_spark.operators.similarity import (
        dequantized_vecs,
        hyperplane_signatures_multi,
    )

    fresh = hyperplane_signatures_multi(
        dequantized_vecs(cur._compacted_state("vec")),
        dim=8, num_planes=cur.num_planes, num_tables=cur.num_tables,
        seed=cur.seed, id_col="vec_id", vec_col="v",
    )
    assert sorted(map(tuple, cur._index_sig().collect())) == sorted(
        map(tuple, fresh.collect())
    )
    # decisions continue: dup of accepted 1 rejected, novel accepted
    cur.process_batch(_cvecs(spark, [20], 0).unionByName(_cvecs(spark, [21], 5)), 2)
    assert {r.vec_id for r in cur.accepted().collect()} == {1, 3, 10, 21}
    # format survives re-attach; downgrade refused; no-op returns False
    cur2 = StreamingCorpusCurator(spark, str(tmp_path / "m"), **_EKW)
    assert cur2.vec_format == "int8"
    assert cur2.migrate_vec_format("int8") is False
    with pytest.raises(ValueError, match="unrecoverable"):
        cur2.migrate_vec_format("float64")


def test_embedding_retention_evicts_and_unindexes(spark, tmp_path):
    """retention='best' on the embedding screen (round 8): a later
    higher-scoring semantic near-dup evicts its incumbent from the
    accepted tier AND both index tiers; ties keep the incumbent;
    replay decides identically; compaction applies the tombstones
    physically and later evictions still work."""
    import os

    def vx(rows):  # (id, cluster, score)
        import numpy as np

        out = []
        for i, c, s in rows:
            base = [0.0] * 8
            base[c] = 1.0
            rng = np.random.RandomState(i)
            v = [float(b + 0.05 * g) for b, g in zip(base, rng.randn(8))]
            out.append((i, v, float(s)))
        return spark.createDataFrame(
            out, "vec_id long, embedding array<double>, score double"
        )

    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "c"), screen="embedding", emb_dim=8,
        threshold=0.9, id_col="vec_id", retention="best", score_col="score",
    )
    cur.process_batch(vx([(10, 0, 1.0), (11, 1, 5.0)]), 0)
    b1 = vx([(5, 0, 3.0)])
    cur.process_batch(b1, 1)  # evicts 10
    assert {r.vec_id for r in cur.accepted().collect()} == {5, 11}
    assert {r.vec_id for r in cur._index_vec().collect()} == {5, 11}
    assert {r.vec_id for r in cur._index_sig().collect()} == {5, 11}
    # replay idempotence
    for tier in ("accepted", "vec", "sig", "tombstones"):
        m = os.path.join(str(tmp_path / "c"), tier, "ingest_batch=1", "_SUCCESS")
        if os.path.exists(m):
            os.remove(m)
    cur.process_batch(b1, 1)
    assert {r.vec_id for r in cur.accepted().collect()} == {5, 11}
    assert {r.doc_id for r in cur._tombstones().collect()} == {10}
    # tie keeps incumbent
    cur.process_batch(vx([(20, 0, 3.0)]), 2)
    assert {r.vec_id for r in cur.accepted().collect()} == {5, 11}
    # compaction applies tombstones physically; evictions continue
    assert cur.compact() is True
    man = cur._manifest()
    assert 10 not in {
        r.vec_id for r in spark.read.parquet(man["accepted_path"]).collect()
    }
    assert cur._compacted_state("vec").filter(F.col("vec_id") == 10).count() == 0
    cur.process_batch(vx([(30, 0, 9.0)]), 3)  # evicts compacted incumbent 5
    assert {r.vec_id for r in cur.accepted().collect()} == {11, 30}


# ---------------------------------------------------------------------
# simhash screen (round 8): the 8-byte/doc dedup state

def _shcur(spark, path, **kw):
    kw.setdefault("max_hamming", 3)
    return StreamingCorpusCurator(spark, str(path), screen="simhash", **kw)


def test_simhash_screen_greedy_and_compaction(spark, tmp_path):
    """Cross-batch rejection from the stored signature table, replay
    idempotence, compaction transparency (decisions equal an
    uncompacted twin, manifest carries the folded shsig tier)."""
    import os

    W = " ".join(f"w{i}" for i in range(30))
    U = " ".join(f"u{i}" for i in range(30))
    batches = [
        [(1, W), (2, U)],
        [(10, W), (11, "fresh text " + " ".join(f"f{i}" for i in range(20)))],
        [(20, U), (21, W)],
    ]
    plain = _shcur(spark, tmp_path / "plain")
    comp = _shcur(spark, tmp_path / "comp", compact_after=1)
    for k, rows in enumerate(batches):
        b = _docs(spark, rows)
        plain.process_batch(b, k)
        comp.process_batch(b, k)
    want = {1, 2, 11}
    assert {r.doc_id for r in plain.accepted().collect()} == want
    assert {r.doc_id for r in comp.accepted().collect()} == want
    # rejected docs never indexed
    assert {r.doc_id for r in plain._index_shsig().collect()} == want
    man = comp._manifest()
    assert man is not None and man.get("shsig") is not None
    # replay idempotence on the plain curator
    for tier in ("accepted", "shsig", "hdr"):
        m = os.path.join(str(tmp_path / "plain"), tier, "ingest_batch=2", "_SUCCESS")
        if os.path.exists(m):
            os.remove(m)
    plain.process_batch(_docs(spark, batches[2]), 2)
    assert {r.doc_id for r in plain.accepted().collect()} == want
    idx = plain._index_shsig()
    assert idx.count() == idx.distinct().count() == 3


def test_simhash_screen_retention_best(spark, tmp_path):
    W = " ".join(f"w{i}" for i in range(30))
    d = spark.createDataFrame(
        [(10, W, 1.0)], "doc_id long, text string, score double"
    )
    cur = _shcur(spark, tmp_path / "r", retention="best", score_col="score")
    cur.process_batch(d, 0)
    cur.process_batch(
        spark.createDataFrame([(5, W, 3.0)], "doc_id long, text string, score double"),
        1,
    )  # evicts 10
    assert {r.doc_id for r in cur.accepted().collect()} == {5}
    assert {r.doc_id for r in cur._index_shsig().collect()} == {5}
    assert {r.doc_id for r in cur._tombstones().collect()} == {10}


def test_simhash_screen_equals_batch_rotated_law(spark, tmp_path, sf_dir):
    """One batch containing the whole fixture == the batch operator's
    pair-driven greedy rejection (min-id survives each hamming-<=3
    pair edge) — the screen's pair set is pigeonhole-exact."""
    from play_with_pulsar_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cur = _shcur(spark, tmp_path / "one", sh_hash_fn="md5_60")
    cur.process_batch(docs, 0)
    got = {r.doc_id for r in cur.accepted().collect()}
    from play_with_pulsar_spark.operators import dedup

    pairs = dedup.simhash_near_pairs(docs, max_hamming=3, hash_fn="md5_60")
    rejected = {r.id_b for r in pairs.collect()}  # both-new: larger id loses
    want = {r.doc_id for r in docs.collect()} - rejected
    assert got == want


def test_simhash_screen_via_real_stream_with_retention(spark, tmp_path):
    """The new screen + retention through REAL structured streaming
    (readStream → attach → availableNow): the higher-scoring file-2
    duplicate evicts the file-1 incumbent regardless of which
    micro-batch order the engine picks, because eviction is
    value-driven, not arrival-driven."""
    W = " ".join(f"w{i}" for i in range(30))
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, W, 1.0), (2, "u0 u1 u2 u3 u4", 2.0)],
        "doc_id long, text string, score double",
    ).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(9, W, 9.0)], "doc_id long, text string, score double"
    ).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema("doc_id long, text string, score double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "c"), screen="simhash", max_hamming=3,
        retention="best", score_col="score",
    )
    q = cur.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    kept = {r.doc_id for r in cur.accepted().collect()}
    # doc 9 (score 9) survives the W cluster whatever the batch order;
    # doc 2 is untouched
    assert kept == {2, 9}


# ---------------------------------------------------------------------
# property test: the retention='best' fold vs a pure-python reference
# over RANDOM corpora and batch splits (the fold family's hypothesis
# discipline applied to the greedy-with-replacement rule)

def _ref_retention_fold(batches, threshold=0.5):
    """Pure-python greedy-with-replacement over exact token-set
    Jaccard (no df cap — the test drives the curator with
    max_shingle_freq=None and n=1 so shingles ARE tokens): per batch,
    pairs over accepted ∪ batch; both-new → lower score loses (tie:
    larger id); new-vs-old → tie-or-lower rejected, higher marks the
    old for eviction, applied only when the challenger survived every
    pair; accepted = (accepted − evicted) ∪ survivors."""
    acc = {}  # id -> (tokens, score)
    for batch in batches:
        new = {i: (frozenset(t.split()), s) for i, t, s in batch}

        def j(a, b):
            u = len(a | b)
            return len(a & b) / u if u else 0.0

        rejected, ev_cand = set(), []
        ids = sorted(new)
        for k, i in enumerate(ids):
            ti, si = new[i]
            for i2 in ids[k + 1:]:
                t2, s2 = new[i2]
                if j(ti, t2) >= threshold:
                    if si < s2:
                        rejected.add(i)
                    elif s2 < si:
                        rejected.add(i2)
                    else:
                        rejected.add(max(i, i2))
            for o, (to, so) in acc.items():
                if j(ti, to) >= threshold:
                    if si > so:
                        ev_cand.append((i, o))
                    else:
                        rejected.add(i)
        evicted = {o for i, o in ev_cand if i not in rejected}
        acc = {o: v for o, v in acc.items() if o not in evicted}
        for i in ids:
            if i not in rejected:
                acc[i] = new[i]
    return set(acc)


def test_retention_fold_matches_reference_random(spark, tmp_path):
    """Randomized corpora (small token alphabet so near-dups are
    common), random scores, random 2-3-batch splits: the curator's
    distributed greedy-with-replacement equals the pure-python
    reference on every case. n=1 shingles + no df cap make the pair
    semantics exactly token-set Jaccard."""
    import random

    rng = random.Random(80)
    alphabet = [f"t{i}" for i in range(8)]
    for case in range(5):
        docs = []
        for i in range(rng.randint(6, 12)):
            toks = rng.sample(alphabet, rng.randint(3, 5))
            docs.append((i, " ".join(toks), float(rng.randint(0, 4))))
        n_batches = rng.choice([2, 3])
        batches = [[] for _ in range(n_batches)]
        for d in docs:
            batches[rng.randrange(n_batches)].append(d)
        batches = [b for b in batches if b]
        want = _ref_retention_fold(batches, threshold=0.5)
        cur = StreamingCorpusCurator(
            spark, str(tmp_path / f"case{case}"),
            threshold=0.5, n=1, max_shingle_freq=None,
            retention="best", score_col="score",
        )
        for k, rows in enumerate(batches):
            cur.process_batch(
                spark.createDataFrame(
                    rows, "doc_id long, text string, score double"
                ),
                k,
            )
        got = {r.doc_id for r in cur.accepted().collect()}
        assert got == want, (case, batches, got, want)


def _ref_simhash_fold(batches, radius=3):
    """Pure-python simhash screen reference: the md5_60 vote chain
    (the dedup_simhash_checked oracle's arithmetic) + greedy
    first-writer-wins over hamming<=radius pairs per batch."""
    import hashlib

    def sig(text):
        votes = [0] * 60
        for tok in text.strip().lower().split():
            h = int(hashlib.md5((tok + ":sh").encode()).hexdigest()[:15], 16)
            for b in range(60):
                votes[b] += 2 * ((h >> b) & 1) - 1
        return sum(1 << b for b in range(60) if votes[b] > 0)

    acc = {}
    for batch in batches:
        new = {i: sig(t) for i, t in batch}
        rejected = set()
        ids = sorted(new)
        for k, i in enumerate(ids):
            for i2 in ids[k + 1:]:
                if bin(new[i] ^ new[i2]).count("1") <= radius:
                    rejected.add(max(i, i2))
            for o, so in acc.items():
                if bin(new[i] ^ so).count("1") <= radius:
                    rejected.add(i)
        for i in ids:
            if i not in rejected:
                acc[i] = new[i]
    return set(acc)


def test_simhash_screen_matches_reference_random(spark, tmp_path):
    """Randomized corpora with a tiny alphabet (exact and near dups
    common), random 2-3-batch splits: the curator's simhash screen
    (md5_60) equals the pure-python vote-chain + greedy-fold
    reference on every case — signatures, candidate coverage and the
    first-writer rule all pinned at once."""
    import random

    rng = random.Random(81)
    alphabet = [f"s{i}" for i in range(6)]
    for case in range(4):
        docs = []
        for i in range(rng.randint(6, 10)):
            toks = [rng.choice(alphabet) for _ in range(rng.randint(4, 7))]
            docs.append((i, " ".join(toks)))
        n_batches = rng.choice([2, 3])
        batches = [[] for _ in range(n_batches)]
        for d in docs:
            batches[rng.randrange(n_batches)].append(d)
        batches = [b for b in batches if b]
        want = _ref_simhash_fold(batches, radius=3)
        cur = StreamingCorpusCurator(
            spark, str(tmp_path / f"sh{case}"),
            screen="simhash", max_hamming=3, sh_hash_fn="md5_60",
        )
        for k, rows in enumerate(batches):
            cur.process_batch(_docs(spark, rows), k)
        got = {r.doc_id for r in cur.accepted().collect()}
        assert got == want, (case, batches, got, want)


# frozen policy record (round 9 — r8 advice, medium): retention /
# score_col / simhash params persist like geometry and vec_format


def test_retention_policy_frozen_in_sidecar_and_manifest(spark, tmp_path):
    """The failure mode the freeze closes: a retention='best' state dir
    re-attached with the old default retention='first' silently skipped
    the tombstone anti-join (evicted docs resurfaced in accepted() and
    the indexes) and the next compact() omitted covered_tombs, folding
    evicted rows back in PERMANENTLY. Now the default inherits the
    frozen policy, conflicts raise, and the manifest carries the record
    through compaction."""
    import json
    import os

    import pytest

    path = tmp_path / "c"
    cur = _rcur(spark, path)
    cur.process_batch(_rdocs(spark, [(10, _DUP, 1.0), (11, _UNIQ, 5.0)]), 0)
    cur.process_batch(_rdocs(spark, [(7, _DUP, 2.0)]), 1)  # evicts 10
    with open(os.path.join(str(path), "geometry.json")) as f:
        rec = json.load(f)
    assert rec["retention"] == "best" and rec["score_col"] == "score"
    # default re-attach INHERITS the frozen policy — the old silent
    # downgrade to first-wins is structurally impossible now
    cur2 = StreamingCorpusCurator(
        spark, str(path), threshold=0.8, max_shingle_freq=50
    )
    assert cur2.retention == "best" and cur2.score_col == "score"
    assert {r.doc_id for r in cur2.accepted().collect()} == {7, 11}
    # compaction under the inherited policy applies the tombstones
    # physically AND records the policy in the manifest
    assert cur2.compact()
    assert {r.doc_id for r in cur2.accepted().collect()} == {7, 11}
    with open(cur2._manifest_path) as f:
        man = json.load(f)
    assert man["retention"] == "best" and man["score_col"] == "score"
    # manifest-first: a stale/deleted sidecar still resolves 'best'
    os.remove(os.path.join(str(path), "geometry.json"))
    cur3 = StreamingCorpusCurator(
        spark, str(path), threshold=0.8, max_shingle_freq=50
    )
    assert cur3.retention == "best" and cur3.score_col == "score"
    # explicit conflicts raise instead of silently changing policy
    with pytest.raises(ValueError, match="frozen retention"):
        StreamingCorpusCurator(spark, str(path), retention="first")
    with pytest.raises(ValueError, match="frozen score_col"):
        StreamingCorpusCurator(
            spark, str(path), retention="best", score_col="other"
        )


def test_retention_legacy_dir_with_tombstones_refuses_first(spark, tmp_path):
    """A pre-round-9 'best' dir carries no frozen record, but committed
    tombstone batches are proof of retention='best' history — a 'first'
    attach (default or explicit) refuses instead of resurfacing every
    evicted doc."""
    import os

    import pytest

    path = tmp_path / "legacy"
    cur = _rcur(spark, path)
    cur.process_batch(_rdocs(spark, [(10, _DUP, 1.0)]), 0)
    cur.process_batch(_rdocs(spark, [(7, _DUP, 2.0)]), 1)  # evicts 10
    os.remove(os.path.join(str(path), "geometry.json"))  # legacy state
    with pytest.raises(ValueError, match="tombstone"):
        StreamingCorpusCurator(spark, str(path))
    # the documented recovery: re-attach with the original policy,
    # which re-freezes it
    cur2 = StreamingCorpusCurator(
        spark, str(path), retention="best", score_col="score",
        threshold=0.8, max_shingle_freq=50,
    )
    assert {r.doc_id for r in cur2.accepted().collect()} == {7}
    assert os.path.exists(os.path.join(str(path), "geometry.json"))


def test_simhash_params_frozen(spark, tmp_path):
    """sh_hash_fn is state-compat-critical (stored signatures were
    computed under it); max_hamming/sh_blocks are decision params —
    all three freeze at first construction and conflicting re-attach
    raises; defaults inherit."""
    import json
    import os

    import pytest

    path = tmp_path / "s"
    cur = _shcur(spark, path, sh_hash_fn="md5_60", max_hamming=6)
    assert cur.sh_blocks == 8
    cur.process_batch(_docs(spark, [(1, _w(1))]), 0)
    with open(os.path.join(str(path), "geometry.json")) as f:
        rec = json.load(f)
    assert rec["sh_hash_fn"] == "md5_60"
    assert rec["max_hamming"] == 6 and rec["sh_blocks"] == 8
    # default re-attach inherits all three (no helper: _shcur would
    # pass an explicit-but-equal max_hamming=3 and mask the conflict)
    cur2 = StreamingCorpusCurator(spark, str(path), screen="simhash")
    assert (cur2.sh_hash_fn, cur2.max_hamming, cur2.sh_blocks) == (
        "md5_60", 6, 8,
    )
    with pytest.raises(ValueError, match="frozen sh_hash_fn"):
        StreamingCorpusCurator(
            spark, str(path), screen="simhash", sh_hash_fn="xxhash64"
        )
    with pytest.raises(ValueError, match="frozen max_hamming"):
        StreamingCorpusCurator(
            spark, str(path), screen="simhash", max_hamming=3
        )


# vec_format='pq' (round 9): the third vec-state rung — m PQ codes per
# vector, codebooks frozen on first use, everything derived from the
# decoded v̂ (pipeline_embedding_curation_pq is the exact hash gate)


def test_vec_format_pq_state_and_freeze(spark, tmp_path):
    """PQ state decides like float64 at wide margins, stores only
    (vec_id, pc array<int>) + a books artifact, freezes pq geometry,
    inherits on re-attach, replays idempotently, and refuses to read
    codes without their codebooks."""
    import json
    import os
    import shutil

    import pytest

    a = StreamingCorpusCurator(
        spark, str(tmp_path / "a"), vec_format="pq", pq_m=2, pq_ksub=8, **_EKW
    )
    b = StreamingCorpusCurator(
        spark, str(tmp_path / "b"), vec_format="float64", **_EKW
    )
    assert a.vec_format == "pq" and (a.pq_m, a.pq_ksub) == (2, 8)
    # batch 0 carries the codebook's training diversity (the FAISS
    # train-on-a-sample contract): 4 clusters, 2 members each, so the
    # 8-entry books can reconstruct every cluster it will ever screen.
    # A tiny codebook degrades PQ dedup to cluster-level dedup — that
    # is the fidelity/memory dial, not a bug (the fixture-scale oracle
    # runs 16 entries over 8 subspaces and is fine-grained).
    b0 = _cvecs(spark, [1, 2], 0, 1)
    for cl, ids in ((1, [3, 4]), (2, [5, 6]), (3, [7, 8])):
        b0 = b0.unionByName(_cvecs(spark, ids, cl, 1))
    batches = [
        b0,
        _cvecs(spark, [10], 0, 2).unionByName(_cvecs(spark, [12], 2, 2)),
    ]
    for k, bt in enumerate(batches):
        a.process_batch(bt, k)
        b.process_batch(bt, k)
    aa = sorted(r.vec_id for r in a.accepted().collect())
    assert aa == sorted(r.vec_id for r in b.accepted().collect()) == [1, 3, 5, 7]
    sch = spark.read.parquet(str(tmp_path / "a" / "vec")).schema.simpleString()
    assert "pc:array<int>" in sch and "qc" not in sch and ",v:" not in sch
    assert os.path.exists(os.path.join(str(tmp_path / "a"), "pq_books.json"))
    with open(os.path.join(str(tmp_path / "a"), "geometry.json")) as f:
        rec = json.load(f)
    assert rec["vec_format"] == "pq" and (rec["pq_m"], rec["pq_ksub"]) == (2, 8)
    # default re-attach inherits format + pq geometry + books
    a2 = StreamingCorpusCurator(spark, str(tmp_path / "a"), **_EKW)
    assert a2.vec_format == "pq" and (a2.pq_m, a2.pq_ksub) == (2, 8)
    assert sorted(r.vec_id for r in a2.accepted().collect()) == aa
    with pytest.raises(ValueError, match="frozen pq_m"):
        StreamingCorpusCurator(
            spark, str(tmp_path / "a"), vec_format="pq", pq_m=8, **_EKW
        )
    # replay idempotence on the pq tier
    os.remove(os.path.join(str(tmp_path / "a"), "vec", "ingest_batch=1", "_SUCCESS"))
    a2.process_batch(batches[1], 1)
    assert sorted(r.vec_id for r in a2.accepted().collect()) == aa
    # stored codes without their books artifact are undecodable: the
    # screen refuses loudly instead of re-fitting different books
    shutil.copytree(str(tmp_path / "a"), str(tmp_path / "c"))
    os.remove(os.path.join(str(tmp_path / "c"), "pq_books.json"))
    c = StreamingCorpusCurator(spark, str(tmp_path / "c"), **_EKW)
    with pytest.raises(RuntimeError, match="pq_books"):
        c.process_batch(_cvecs(spark, [30], 3, 3), 2)


def test_migrate_vec_format_to_pq(spark, tmp_path):
    """int8 → pq migration: versioned cutover with books fit on the
    canonical v̂ corpus and frozen BEFORE the manifest flip, signatures
    re-derived from the decoded state, decisions continue, and pq →
    anything is refused (the precision ladder is one-way)."""
    import os

    import pytest

    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "m"), pq_m=4, pq_ksub=4, **_EKW
    )  # int8 default
    cur.process_batch(_cvecs(spark, [1, 2], 0).unionByName(_cvecs(spark, [3], 1)), 0)
    cur.process_batch(_cvecs(spark, [10], 2), 1)
    before = {r.vec_id for r in cur.accepted().collect()}
    assert cur.migrate_vec_format("pq") is True
    assert cur.vec_format == "pq"
    man = cur._manifest()
    assert man["vec_format"] == "pq" and (man["pq_m"], man["pq_ksub"]) == (4, 4)
    sch = spark.read.parquet(man["vec"]["path"]).schema.simpleString()
    assert "pc:array<int>" in sch
    assert os.path.exists(os.path.join(str(tmp_path / "m"), "pq_books.json"))
    # re-signed state == signing the decoded state from scratch
    from play_with_pulsar_spark.operators.pq import decoded_vecs
    from play_with_pulsar_spark.operators.similarity import (
        hyperplane_signatures_multi,
    )

    fresh = hyperplane_signatures_multi(
        decoded_vecs(cur._compacted_state("vec"), cur._require_pq_books()),
        dim=8, num_planes=cur.num_planes, num_tables=cur.num_tables,
        seed=cur.seed, id_col="vec_id", vec_col="v",
    )
    assert sorted(map(tuple, cur._index_sig().collect())) == sorted(
        map(tuple, fresh.collect())
    )
    # decisions continue across the cutover: dup of an accepted
    # cluster rejected; a NOVEL COMBINATION of known subspace patterns
    # (c0's spike in subspace 0 + c2's in subspace 1 — exactly the
    # product structure PQ represents: cos vs either pure cluster
    # ≈ 1/√2 < 0.9) accepted
    combo = spark.createDataFrame(
        [(21, [1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cur.process_batch(_cvecs(spark, [20], 0).unionByName(combo), 2)
    assert {r.vec_id for r in cur.accepted().collect()} == before | {21}
    # format survives re-attach; the ladder is one-way from pq
    cur2 = StreamingCorpusCurator(spark, str(tmp_path / "m"), **_EKW)
    assert cur2.vec_format == "pq"
    assert cur2.migrate_vec_format("pq") is False
    with pytest.raises(ValueError, match="migrate away"):
        cur2.migrate_vec_format("int8")


def test_pq_rollover_geometry_resigns_from_decoded(spark, tmp_path):
    """A geometry rollover on pq state re-signs from the DECODED v̂
    (the canonical vector a pq store represents) and decisions
    continue across the cutover."""
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "r"), vec_format="pq", pq_m=4, pq_ksub=4,
        **_EKW,
    )
    cur.process_batch(
        _cvecs(spark, [1, 2], 0)
        .unionByName(_cvecs(spark, [3], 1))
        .unionByName(_cvecs(spark, [4], 2)),
        0,
    )
    cur.process_batch(_cvecs(spark, [10], 2), 1)
    before = {r.vec_id for r in cur.accepted().collect()}
    assert cur.rollover_geometry(num_planes=6, num_tables=12) is True
    assert (cur.num_planes, cur.num_tables) == (6, 12)
    combo = spark.createDataFrame(
        [(21, [1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cur.process_batch(_cvecs(spark, [20], 0).unionByName(combo), 2)
    assert {r.vec_id for r in cur.accepted().collect()} == before | {21}


def test_url_screen_rejects_and_never_indexes(spark, tmp_path):
    """URL pre-screen (round 9): blocked provenance is rejected FIRST
    (before tokenization), rejected docs are never indexed — so a
    URL-rejected near-dup cannot block a later clean twin — and kept
    docs still dedup normally."""
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "u"),
        threshold=0.8, max_shingle_freq=50,
        url_col="url", url_blocked_domains=("blocked.com",),
    )

    def d(rows):
        return spark.createDataFrame(rows, "doc_id long, text string, url string")

    t = " ".join(f"w{i}" for i in range(12))
    cur.process_batch(d([
        (1, t, "https://u:p@BLOCKED.com/x"),      # blocked (case+userinfo too)
        (2, _w(2), "http://ok.example.org/a"),
        (3, _w(3), "http://10.1.2.3/x"),          # ip-host
        (4, _w(4), "http://spam.example.xyz/"),   # blocked tld (default list)
        (5, _w(5), "http://ok.example.net" + "/s" * 9),  # deep path
    ]), 0)
    assert {r.doc_id for r in cur.accepted().collect()} == {2}
    assert {r.doc_id for r in cur._index().collect()} == {2}
    # doc 1's text never entered the index: its clean twin is accepted
    cur.process_batch(d([(10, t, "https://ok.example.com/y")]), 1)
    assert {r.doc_id for r in cur.accepted().collect()} == {2, 10}
    # and kept docs still dedup: a near-dup of 10 with clean URL rejected
    cur.process_batch(d([(11, t, "https://ok2.example.com/z")]), 2)
    assert {r.doc_id for r in cur.accepted().collect()} == {2, 10}
    # replay idempotence through the URL stage: re-processing a
    # committed batch id (crash-retry) is a no-op — no re-screen, no
    # duplicate state (round 10, the full-stack-url composition gate)
    cur.process_batch(d([(11, t, "https://ok2.example.com/z")]), 2)
    assert {r.doc_id for r in cur.accepted().collect()} == {2, 10}
    assert {r.doc_id for r in cur._index().collect()} == {2, 10}


def test_pq_retention_best_evicts_and_unindexes(spark, tmp_path):
    """retention='best' composes with vec_format='pq': a later
    higher-scoring near-dup evicts its incumbent from the accepted
    tier AND the pq/sig tiers (tombstone-filtered by vec id), with
    decisions made over the decoded v̂."""
    import numpy as np

    def vx(rows):  # (id, cluster, score)
        out = []
        for i, c, s in rows:
            rng = np.random.RandomState(i)
            base = [0.0] * 8
            base[c] = 1.0
            v = [float(b + 0.02 * x) for b, x in zip(base, rng.randn(8))]
            out.append((i, v, float(s)))
        return spark.createDataFrame(
            out, "vec_id long, embedding array<double>, score double"
        )

    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "pr"), vec_format="pq", pq_m=2, pq_ksub=8,
        retention="best", score_col="score", **_EKW,
    )
    # books diversity batch: clusters 0..3, one survivor each
    cur.process_batch(vx([(1, 0, 1.0), (2, 0, 0.5), (3, 1, 1.0),
                          (5, 2, 1.0), (7, 3, 1.0)]), 0)
    assert {r.vec_id for r in cur.accepted().collect()} == {1, 3, 5, 7}
    # higher-scoring near-dup of 1 evicts it; lower-scoring of 3 loses
    cur.process_batch(vx([(10, 0, 2.0), (11, 1, 0.5)]), 1)
    assert {r.vec_id for r in cur.accepted().collect()} == {10, 3, 5, 7}
    assert {r.doc_id for r in cur._tombstones().collect()} == {1}
    assert {r.vec_id for r in cur._index_vec().collect()} == {10, 3, 5, 7}
    # compaction applies tombstones physically on the pq tier
    assert cur.compact()
    assert {r.vec_id for r in cur.accepted().collect()} == {10, 3, 5, 7}
    assert {r.vec_id for r in cur._index_vec().collect()} == {10, 3, 5, 7}


# --- DoReMi maintained excess tier (round 10 — r9 verdict #4) ---


def _doremi_lm(spark, docs, tmp_path, name="dlm"):
    from play_with_pulsar_spark.operators import textops

    lmdir = str(tmp_path / name)
    uc, ctx, bc, meta = textops.fit_bigram_lm(docs)
    textops.write_bigram_lm(lmdir, uc, ctx, bc, meta)
    return lmdir, (uc, ctx, bc, meta)


def _doremi_refit(cur, lm):
    """The from-scratch weights over the curator's CURRENT accepted
    corpus against the same stored LM — what the maintained tier must
    reproduce bit for bit on every prefix."""
    from play_with_pulsar_spark.operators import curation, textops
    from play_with_pulsar_spark.oracle import dsum

    uc, ctx, bc, meta = lm
    acc = cur.accepted()
    uni = textops.score_with_unigram_lm(acc, uc, meta).select(
        "doc_id", "mean_logprob"
    )
    bi = (
        textops.score_with_bigram_lm(acc, uc, ctx, bc, meta)
        .select("doc_id", "xent")
        .filter(F.col("xent").isNotNull())
    )
    ex = (
        acc.select("doc_id", F.col("source").alias("_dom"))
        .join(uni, "doc_id")
        .join(bi, "doc_id")
        .select(
            "_dom",
            F.round(
                F.greatest(
                    (-F.col("mean_logprob")) - F.col("xent"), F.lit(0.0)
                ),
                6,
            ).alias("_ex"),
        )
    )
    lam = ex.groupBy("_dom").agg(
        F.round(dsum("_ex") / F.count(F.lit(1)), 6).alias("excess")
    )
    return sorted(map(tuple, curation.doremi_mw_fold(lam).collect()))


def test_doremi_tier_prefix_refit_replay_compaction(spark, tmp_path):
    """The maintained per-domain excess tier: after EVERY batch the
    derived weights equal a from-scratch refit over the accepted
    prefix against the same stored LM (exact-decimal partials fold to
    the same total a global dsum produces); a committed-batch replay
    is a no-op; compaction folds the tier without moving a digit."""
    rows = [
        (i, _w(i), f"src{i % 4}") for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    lmdir, lm = _doremi_lm(spark, docs, tmp_path)
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "d"), threshold=0.8, max_shingle_freq=50,
        doremi_lm_path=lmdir, compact_after=1,
    )
    for k in range(3):
        cur.process_batch(docs.filter(F.col("doc_id") % 3 == k), k)
        got = sorted(map(tuple, cur.doremi_weights().collect()))
        assert got == _doremi_refit(cur, lm), f"prefix {k}"
    tier0 = sorted(map(tuple, cur._doremi_tier().collect()))
    cur.process_batch(docs.filter(F.col("doc_id") % 3 == 1), 1)  # replay
    assert sorted(map(tuple, cur._doremi_tier().collect())) == tier0
    assert cur.compact() or True  # fold whatever remains
    assert sorted(map(tuple, cur.doremi_weights().collect())) == \
        _doremi_refit(cur, lm)
    # weights sum to ~1 (MW + smoothing law)
    s = sum(w for _, _, w in sorted(map(tuple, cur.doremi_weights().collect())))
    assert abs(s - 1.0) < 1e-6


def test_doremi_tier_eviction_deltas(spark, tmp_path):
    """retention='best' composes with the tier: an evicted incumbent's
    excess/count SUBTRACT exactly (rescored from the accepted state —
    the df/hdr negative-delta convention), so the tier tracks the
    surviving corpus and the refit equality holds through evictions."""
    t = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, t, "a", 1.0), (2, _w(2), "a", 5.0), (3, _w(3), "b", 2.0),
        # batch 1: 10 is a higher-scoring near-dup of 1 -> evicts it
        (10, t, "b", 9.0), (11, _w(11), "b", 1.0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, score double"
    )
    lmdir, lm = _doremi_lm(spark, docs, tmp_path)
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "e"), threshold=0.8, max_shingle_freq=50,
        retention="best", score_col="score", doremi_lm_path=lmdir,
    )
    cur.process_batch(docs.filter(F.col("doc_id") < 10).drop("score")
                      .join(docs.select("doc_id", "score"), "doc_id"), 0)
    assert {r.doc_id for r in cur.accepted().collect()} == {1, 2, 3}
    w0 = sorted(map(tuple, cur.doremi_weights().collect()))
    assert w0 == _doremi_refit(cur, lm)
    cur.process_batch(docs.filter(F.col("doc_id") >= 10), 1)
    assert {r.doc_id for r in cur.accepted().collect()} == {2, 3, 10, 11}
    w1 = sorted(map(tuple, cur.doremi_weights().collect()))
    assert w1 == _doremi_refit(cur, lm)  # deltas cancelled exactly
    assert w1 != w0  # the eviction actually moved the mixture


def test_doremi_domain_col_freezes(spark, tmp_path):
    """The tier's domain keying freezes like score_col: re-attaching
    with a conflicting doremi_domain_col raises; attaching with the
    frozen value (or None) succeeds."""
    import pytest

    rows = [(i, _w(i), f"s{i % 2}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    lmdir, _ = _doremi_lm(spark, docs, tmp_path)
    base = str(tmp_path / "f")
    cur = StreamingCorpusCurator(
        spark, base, threshold=0.8, max_shingle_freq=50, doremi_lm_path=lmdir
    )
    cur.process_batch(docs, 0)
    with pytest.raises(ValueError, match="doremi_domain_col"):
        StreamingCorpusCurator(
            spark, base, threshold=0.8, max_shingle_freq=50,
            doremi_lm_path=lmdir, doremi_domain_col="other",
        )
    again = StreamingCorpusCurator(
        spark, base, threshold=0.8, max_shingle_freq=50, doremi_lm_path=lmdir
    )
    assert again.doremi_domain_col == "source"


def test_kn3_perplexity_screen_autodetect(spark, tmp_path):
    """The perplexity screen auto-detects a write_trigram_lm artifact
    (lm3.json) and scores with the stored KN3 scorer: planted
    gibberish (unseen words -> the continuation floor) is rejected,
    in-model docs pass, and a rejected doc is never indexed (its
    clean twin is accepted later)."""
    from play_with_pulsar_spark.operators import textops

    clean = [
        (i, "the cat sat on the mat and the dog ran far away " + _w(i, 6))
        for i in range(1, 7)
    ]
    docs = _docs(spark, clean)
    lmdir = str(tmp_path / "lm3")
    tc, meta = textops.fit_trigram_lm(docs)
    textops.write_trigram_lm(lmdir, tc, meta)
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "k"), threshold=0.8, max_shingle_freq=50,
        perplexity_lm_path=lmdir, perplexity_max_xent=2.5,
    )  # clean ~0.47, gibberish ~4.5 on this toy corpus
    gib = " ".join(f"zz{i}qq" for i in range(12))
    cur.process_batch(_docs(spark, clean[:3] + [(100, gib)]), 0)
    acc = {r.doc_id for r in cur.accepted().collect()}
    assert acc == {1, 2, 3}  # gibberish rejected, in-model docs pass
    assert {r.doc_id for r in cur._index().collect()} == {1, 2, 3}
    # later in-model batches are unaffected by the rejected doc
    cur.process_batch(_docs(spark, clean[3:]), 1)
    assert {r.doc_id for r in cur.accepted().collect()} == {1, 2, 3, 4, 5, 6}


def test_repetition_screen_rejects_and_never_indexes(spark, tmp_path):
    """Gopher repetition pre-screen (round 10): a self-repeating doc
    is rejected before the dedup screen, never indexed — so it cannot
    block a later clean near-twin — and kept docs still dedup."""
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "rep"),
        threshold=0.8, max_shingle_freq=50,
        repetition_rules=True,
    )

    def d(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    t = " ".join(f"w{i}" for i in range(30))
    # doc 1 = t twice: every interior n-gram duplicated -> rejected
    cur.process_batch(d([(1, t + " " + t)]), 0)
    assert cur.accepted().count() == 0
    assert cur._index().count() == 0
    # clean twin of the rejected doc's content is accepted (J(t, t+t)
    # on distinct 3-gram shingles = 28/30 >= 0.8 — it WOULD have been
    # blocked had doc 1 been indexed)
    cur.process_batch(d([(2, t)]), 1)
    assert {r.doc_id for r in cur.accepted().collect()} == {2}
    # kept docs still dedup: a clean near-dup of doc 2 is rejected
    cur.process_batch(d([(3, t + " w99")]), 2)
    assert {r.doc_id for r in cur.accepted().collect()} == {2}


def test_funnel_ledger_counts_and_replay(spark, tmp_path):
    """track_funnel commits a per-batch (batch_id, stage, n) ledger:
    ingress, each ACTIVE screen's survivor count (inactive screens
    never appear), and the post-dedup accepted count; a replayed
    committed batch is a no-op for the ledger too."""
    cur = StreamingCorpusCurator(
        spark, str(tmp_path / "fn"),
        threshold=0.8, max_shingle_freq=50,
        repetition_rules=True, track_funnel=True,
    )
    t = " ".join(f"w{i}" for i in range(30))

    def d(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    cur.process_batch(d([(1, t + " " + t), (2, t)]), 0)   # 1 repetitive
    cur.process_batch(d([(3, t + " w99")]), 1)            # near-dup of 2
    got = {(r.batch_id, r.stage): r.n for r in cur.funnel().collect()}
    assert got == {
        (0, "ingress"): 2, (0, "repetition"): 1, (0, "accepted"): 1,
        (1, "ingress"): 1, (1, "repetition"): 1, (1, "accepted"): 0,
    }
    # no inactive screens in the ledger
    assert {s for _, s in got} == {"ingress", "repetition", "accepted"}
    # replay of a committed batch id changes nothing
    cur.process_batch(d([(3, t + " w99")]), 1)
    assert {(r.batch_id, r.stage): r.n for r in cur.funnel().collect()} == got
