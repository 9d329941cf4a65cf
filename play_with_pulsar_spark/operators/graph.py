"""Distributed graph centrality — PageRank (Page et al. 1999) as a
pure DataFrame iteration: one keyed join + one aggregation per step.

Why it lives in a training-data engine: link-graph centrality is the
classic crawl-prioritization / quality signal (CommonCrawl publishes
host-level harmonic centrality and PageRank ranks; CCNet-era
pipelines consume them as document priors), and the same iteration
ranks near-dup-cluster members by graph centrality when picking a
representative. The operator is generic over any (src, dst) edge
table.

Scale shape: each iteration is ONE shuffle join of the edge table
against the current rank vector (both partitioned by node key —
co-partitioning is reused across iterations) plus ONE map-side-
combined aggregation; nothing ever reaches the driver, the plan is
fully lazy end to end. This is exactly Pregel-style PageRank
expressed relationally, which is how GraphX/GraphFrames execute it
underneath.

Determinism protocol: per-edge contributions are rounded to 18
decimals and summed as DECIMAL(38,18) (exact, order-independent),
each iteration's rank rounded to 14 — so a 1000-executor run, a
local[32] run and the DuckDB oracle produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,18)"


def _dsum18(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    rank_round: int = 14,
    contrib_round: int = 18,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """PageRank over a DIRECTED edge list; run each undirected edge in
    both directions to avoid dangling-mass handling (an undirected
    graph has no sink nodes). Nodes are whatever appears as a source
    (callers materializing both directions cover every node).

    Returns (node, pagerank) for all nodes — uniform init 1/N,
    ``iters`` damped updates, the rounding protocol above.
    """
    from .dedup import _LocalCheckpointHandle, _register_cached

    # lineage control: the edge table is read every iteration and the
    # rank vector is referenced TWICE per iteration (contribution join
    # + carry-forward); without a shared materialization point the
    # nested plan re-executes upstream 2^iters times (measured 13 s vs
    # 1.5 s at sf0.1). LAZY localCheckpoints keep the operator
    # non-eager — the first job materializes each checkpoint once and
    # every other reference reads its blocks.
    # round 13 (guide §2.3/§2.4): out-degree rides the EDGE checkpoint
    # (one +8-byte column) instead of the rank vector — the rank table
    # narrows to (node, pr, nn), every per-iteration broadcast ships
    # less, and the per-iteration aggregate drops its max(outd) leg.
    # The initial rank vector is NOT checkpointed anymore: its two
    # iteration-0 references re-derive it from ed's materialized
    # blocks (one node-sized agg each) — cheaper than a dedicated
    # sequential stage-materialization round. The contribution
    # arithmetic (pr/outd at contrib_round, the DECIMAL(38,18) sum)
    # is unchanged, so ranks are bit-identical.
    from pyspark.sql import Window

    # out-degree attaches as ONE window pass over the edge rows (a
    # groupBy+join would reference — and re-execute — the upstream
    # edge-build subtree twice inside the checkpoint job)
    ed = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .withColumn("outd", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .localCheckpoint(eager=False)
    )
    deg = ed.select("src").distinct()
    n = deg.agg(F.count(F.lit(1)).alias("nn"))
    p = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"),
        F.round(F.lit(1.0) / F.col("nn"), rank_round).alias("pr"),
        "nn",
    )
    # each rank vector is referenced TWICE by the NEXT iteration
    # (contribution join + carry), so it must be a shared
    # materialization point — EXCEPT the last one, which the caller
    # consumes once: skipping its checkpoint drops one sequential
    # stage-materialization round per run (round 12, guide §2.4).
    # handles hold only ACTUAL checkpoints (r12 advice): with iters=0
    # p is never checkpointed.
    handles = [ed]
    if iters >= 1:
        p = p.localCheckpoint(eager=False)
        handles.append(p)
    for it in range(iters):
        # the rank vector is node-sized (≪ edges); broadcasting it
        # means the EDGE table is never shuffled — the only exchange
        # per iteration is the map-side-combined node-sized mass agg.
        # At node counts past broadcast range set broadcast_ranks=
        # False: both sides then hash-partition on the node key and
        # the co-partitioning is reused across iterations.
        #
        # Round 12 (optimization, guide §2.4): the carry-forward used
        # to be a SECOND join per iteration (contribs aggregated, then
        # p left-join contribs — one more broadcast build + join stage
        # each step). Instead the per-edge contributions and one
        # zero-mass carry row per node UNION into a SINGLE node-keyed
        # aggregation: SUM(DECIMAL) ignores the carry's NULL c (an
        # all-NULL group sums to NULL — the coalesce below is the old
        # left-join miss), outd/nn ride on MAX (only the carry row is
        # non-NULL there). Same exchange bytes (partial aggregation
        # still map-side-combines the edge contributions; the carry
        # adds one node-sized row per node), identical values (the
        # DECIMAL(38,18) sum is exact and order-independent, so
        # folding the carry into the same aggregate cannot change a
        # bit) — one join, one broadcast build and one AQE stage job
        # fewer per iteration.
        rank_side = F.broadcast(p) if broadcast_ranks else p
        contribs = ed.join(rank_side, ed.src == p.node).select(
            F.col("dst").alias("node"),
            F.round(F.col("pr") / F.col("outd"), contrib_round).alias("c"),
            F.lit(None).cast("long").alias("nn"),
        )
        carry = p.select(
            "node",
            F.lit(None).cast("double").alias("c"),
            F.col("nn").cast("long").alias("nn"),
        )
        p = (
            contribs.unionByName(carry)
            .groupBy("node")
            .agg(
                _dsum18("c").alias("mass"),
                F.max("nn").alias("nn"),
            )
            # a dst-only node (directed input, no carry row) was
            # invisible to the old p-side left join — keep it out
            .where(F.col("nn").isNotNull())
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("nn")
                    + damping * F.coalesce(F.col("mass"), F.lit(0.0)),
                    rank_round,
                ).alias("pr"),
                "nn",
            )
        )
        if it < iters - 1:
            p = p.localCheckpoint(eager=False)
            handles.append(p)
    out = p.select("node", F.col("pr").alias("pagerank"))
    # long-lived sessions release the checkpoint blocks through the
    # standard release_intermediates(result) contract
    return _register_cached(out, *[_LocalCheckpointHandle(h) for h in handles])
