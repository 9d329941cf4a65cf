"""The curator's substr screen (round 12 — the r11 verdict's
composition ask): winnowed-anchor excision under the house state
conventions — fold equivalence with the standalone deduper, the
never-indexed contract for pre-screen rejects, replay idempotence,
compaction, and the frozen (substr_n, winnow_w) policy record."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from play_with_pulsar_spark.streaming.curator import StreamingCorpusCurator
from play_with_pulsar_spark.streaming.substr_dedup import IncrementalSubstrDeduper

RUN = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"  # 12 toks


def _corpus(spark):
    """The substr_dedup test corpus: a shared 12-token run (= n+w−1,
    the per-window guarantee threshold), a within-doc repeat, and
    unique fillers."""
    return spark.createDataFrame(
        [
            (1, RUN + " one two three four five"),
            (2, "x1 x2 x3 x4 x5 " + RUN),
            (3, RUN + " tail1 tail2 " + RUN),
            (4, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),
            (5, "v1 v2 v3 v4 v5 " + RUN + " v6 v7"),
        ],
        "doc_id long, text string",
    )


def _accepted(cur):
    return {r.doc_id: r.text for r in cur.accepted().collect()}


def _expected(spark, docs, batches):
    """What the curator must store: the IncrementalSubstrDeduper fold
    over the same batch split, with the ORIGINAL text kept byte-exact
    for docs that lost nothing."""
    original = {r.doc_id: r.text for r in docs.collect()}
    base = tempfile.mkdtemp(prefix="pwp_substr_ref_")
    try:
        d = IncrementalSubstrDeduper(spark, base, n=5, w=8)
        for i, b in enumerate(batches):
            d.process_batch(b, i)
        out = {}
        for r in d.deduped().collect():
            out[r.doc_id] = (
                original[r.doc_id] if r.n_tokens_dropped == 0 else r.clean_text
            )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_substr_screen_equals_deduper_fold(spark):
    """Curator accepted() == the standalone deduper's fold on the
    same batch split — excised docs carry the rewritten text, clean
    docs their original text byte-exact."""
    docs = _corpus(spark)
    batches = [
        docs.filter(F.col("doc_id") <= 2),
        docs.filter(F.col("doc_id").isin(3, 4)),
        docs.filter(F.col("doc_id") == 5),
    ]
    want = _expected(spark, docs, batches)
    base = tempfile.mkdtemp(prefix="pwp_cur_substr_")
    try:
        cur = StreamingCorpusCurator(spark, base, screen="substr")
        for i, b in enumerate(batches):
            cur.process_batch(b, i)
        got = _accepted(cur)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    assert got == want
    # the shared run is excised from every later copy, never doc 1
    assert got[1] == RUN + " one two three four five"
    assert got[4] == "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"
    assert all(RUN not in got[i] for i in (2, 3, 5))


def test_never_indexed_contract(spark):
    """A pre-screen REJECT's anchors are never claimed: the
    URL-blocked doc in batch 0 carries the run, but the clean doc in
    batch 1 keeps its copy untouched — and then CLAIMS the anchors,
    so the batch-2 copy is excised (positive control that the screen
    itself fires)."""
    docs = spark.createDataFrame(
        [
            (1, RUN + " spam1 spam2", "http://www.spamfarm.biz/a"),
            (2, "c1 c2 c3 " + RUN, "http://ok.example.org/b"),
            (3, RUN + " c4 c5 c6", "http://ok2.example.org/c"),
        ],
        "doc_id long, text string, url string",
    )
    base = tempfile.mkdtemp(prefix="pwp_cur_substr_url_")
    try:
        cur = StreamingCorpusCurator(
            spark,
            base,
            screen="substr",
            url_col="url",
            url_blocked_domains=("spamfarm.biz",),
        )
        for k in range(3):
            cur.process_batch(docs.filter(F.col("doc_id") == k + 1), k)
        got = _accepted(cur)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    assert 1 not in got                     # URL screen rejected it
    assert got[2] == "c1 c2 c3 " + RUN      # untouched: doc 1 never indexed
    assert RUN not in got[3]                # doc 2's claim excises doc 3


def test_substr_replay_idempotent(spark):
    """Committed replays are skipped; a replay after a lost _SUCCESS
    rewrites the identical output (the index read excludes the
    in-flight batch, so a doc never screens against itself)."""
    docs = _corpus(spark)
    base = tempfile.mkdtemp(prefix="pwp_cur_substr_rep_")
    try:
        cur = StreamingCorpusCurator(spark, base, screen="substr")
        cur.process_batch(docs.filter(F.col("doc_id") <= 3), 0)
        before = _accepted(cur)
        cur.process_batch(docs.filter(F.col("doc_id") <= 3), 0)  # skip
        assert _accepted(cur) == before
        os.remove(
            os.path.join(cur._batch_dir(cur.accepted_dir, 0), "_SUCCESS")
        )
        cur.process_batch(docs.filter(F.col("doc_id") <= 3), 0)  # rewrite
        assert _accepted(cur) == before
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_substr_compaction_preserves_screen_and_output(spark):
    """compact() folds the anchors tier (distinct union, manifest
    flip) without changing accepted() or the screening of later
    batches; a second compact folds the compacted tier + the new
    batch."""
    docs = _corpus(spark)
    batches = [
        docs.filter(F.col("doc_id") <= 2),
        docs.filter(F.col("doc_id").isin(3, 4)),
        docs.filter(F.col("doc_id") == 5),
    ]
    want = _expected(spark, docs, batches)
    base = tempfile.mkdtemp(prefix="pwp_cur_substr_cmp_")
    try:
        cur = StreamingCorpusCurator(spark, base, screen="substr")
        cur.process_batch(batches[0], 0)
        cur.process_batch(batches[1], 1)
        assert cur.compact()
        man = cur._manifest()
        assert man["covered_upto"] == 1 and man["anchors"] is not None
        cur.process_batch(batches[2], 2)
        assert _accepted(cur) == want
        assert cur.compact()
        assert cur._manifest()["covered_upto"] == 2
        assert _accepted(cur) == want
        assert not cur.compact()            # nothing left to fold
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_substr_policy_freeze_and_guards(spark):
    """(substr_n, winnow_w) freeze like the simhash params: a
    re-attach with a conflicting explicit value raises, a bare
    re-attach inherits the frozen record. retention='best' and
    non-numeric ids are refused outright."""
    base = tempfile.mkdtemp(prefix="pwp_cur_substr_frz_")
    try:
        StreamingCorpusCurator(spark, base, screen="substr", winnow_w=4)
        again = StreamingCorpusCurator(spark, base, screen="substr")
        assert again.winnow_w == 4 and again.substr_n == 5
        with pytest.raises(ValueError, match="winnow_w"):
            StreamingCorpusCurator(spark, base, screen="substr", winnow_w=8)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    with pytest.raises(ValueError, match="retention"):
        StreamingCorpusCurator(
            spark,
            tempfile.mkdtemp(prefix="pwp_cur_substr_g1_"),
            screen="substr",
            retention="best",
            score_col="score",
        )
    with pytest.raises(ValueError, match="numeric id_type"):
        StreamingCorpusCurator(
            spark,
            tempfile.mkdtemp(prefix="pwp_cur_substr_g2_"),
            screen="substr",
            id_type="string",
        )


def test_substr_compacted_index_probe_is_exchange_free(spark):
    """The compacted anchors tier is a gh-bucketed catalog table
    (round 12): with broadcast disabled, the per-batch probe join's
    INDEX side feeds the SortMergeJoin straight from the bucketed
    scan — no Exchange between the scan and the join
    (HashPartitioning(gh) satisfies the (gh, g) clustering; the
    write_ngram_index discipline). Steady state is modeled by
    clearing the folded live dirs the next compaction would sweep."""
    from play_with_pulsar_spark.operators.textops import (
        _winnowed_anchor_occurrences,
    )

    docs = _corpus(spark)
    base = tempfile.mkdtemp(prefix="pwp_cur_substr_bkt_")
    try:
        cur = StreamingCorpusCurator(spark, base, screen="substr")
        cur.process_batch(docs.filter(F.col("doc_id") <= 2), 0)
        cur.process_batch(docs.filter(F.col("doc_id") > 2), 1)
        assert cur.compact()
        man = cur._manifest()
        assert man["anchors"]["keys"] == ["gh", "g"]
        # reader-grace leftovers: the NEXT compaction sweeps these;
        # steady state has no live dirs below the watermark
        shutil.rmtree(cur.anchors_dir, ignore_errors=True)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            occ = _winnowed_anchor_occurrences(
                docs.filter(F.col("doc_id") == 5), "text", "doc_id", 5, 8
            )
            probe = occ.join(cur._index_anchors(), ["gh", "g"], "anti")
            plan = probe._jdf.queryExecution().executedPlan().toString()
            lines = plan.splitlines()
            tbl = man["anchors"]["table"]
            scan_idx = [
                i for i, ln in enumerate(lines)
                if tbl in ln and "Scan" in ln
            ]
            assert scan_idx, plan
            assert "SortMergeJoin" in plan, plan
            for i in scan_idx:
                # walk UP the scan's OWN operator chain to the join:
                # lines carrying a ':' continuation belong to the
                # OTHER (batch) side's subtree, whose Exchange is the
                # legitimate batch-side shuffle — skip those
                j = i
                while j > 0 and "Join" not in lines[j]:
                    own_chain = ":" not in lines[j].split("+-")[0]
                    assert not (own_chain and "Exchange" in lines[j]), (
                        "\n".join(lines[max(0, j - 4): i + 1])
                    )
                    j -= 1
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024),
            )
    finally:
        spark.sql(
            "DROP TABLE IF EXISTS "
            + cur._manifest()["anchors"]["table"]
        )
        shutil.rmtree(base, ignore_errors=True)


def test_substr_funnel_ledger(spark):
    """track_funnel composes: the ingress and accepted stages record
    per batch (the substr screen never drops docs itself, so with no
    pre-screens the two counts agree)."""
    docs = _corpus(spark)
    base = tempfile.mkdtemp(prefix="pwp_cur_substr_fnl_")
    try:
        cur = StreamingCorpusCurator(
            spark, base, screen="substr", track_funnel=True
        )
        cur.process_batch(docs, 0)
        rows = {(r.stage): r.n for r in cur.funnel().collect()}
    finally:
        shutil.rmtree(base, ignore_errors=True)
    assert rows["ingress"] == 5 and rows["accepted"] == 5
