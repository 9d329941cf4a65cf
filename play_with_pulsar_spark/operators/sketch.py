"""Mergeable frequency sketches — bounded-memory corpus statistics.

At 100 TB, exact per-token (or per-shingle) frequency tables grow
with the vocabulary — unbounded on web text. The count-min sketch
(Cormode & Muthukrishnan 2005) bounds that state at a FIXED
``depth x width`` integer matrix with two properties that matter for
a distributed pipeline:

- **Additive**: the sketch of a union of disjoint batches is the
  cell-wise sum of per-batch sketches (``cms_merge``), so it can be
  maintained incrementally exactly like the curator's per-batch
  ``(g, df)`` tier (``dedup.build_df_index``) — but with fixed-width
  state at any corpus size, where the exact tier grows with the
  vocabulary.
- **One-sided error**: every point estimate is >= the true count
  (never an undercount), so screens of the form "frequency > cap"
  (stop-shingles, boilerplate n-grams, over-represented domains) stay
  CONSERVATIVE under the sketch — nothing frequent is ever missed,
  only rare keys can be (bounded-probability) over-flagged.

Representation: a DataFrame ``(row int, bucket long, cnt long)`` with
at most ``depth * width`` rows — small enough to broadcast into every
estimate join regardless of corpus size. The bucket hash is the
engine-portable md5 uniform (same family as ``curation._md5_bucket``),
so an ANSI-SQL oracle reproduces the sketch bit-for-bit.

Plan shapes (the 100 TB contract):
- build: one scan of the item table; the depth-fold explode happens
  inside the scan stage and the groupBy partial-aggregates map-side,
  so the shuffle is bounded by ``depth * width`` rows PER TASK, not by
  the data.
- estimate: probe-side scalar projection + a broadcast left join
  against the (fixed-width) sketch — no corpus-scale shuffle.
- merge: a union of fixed-width frames + one tiny groupBy.

Reference linkage: the reference engine has no sketches (its state is
per-room game maps, `game-code/event.go`); this is part of the
LLM-curation surface the survey's north star demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_bucket(key: F.Column, width: int, i: int, salt: str) -> F.Column:
    """Row-``i`` bucket: integer prefix of md5(key ':cms<salt>:' i),
    mod width. Non-negative by construction (8 hex chars), so plain
    ``%`` matches the oracle's ``% width`` on UBIGINT."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":cms{salt}:{i}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_build(
    items: DataFrame,
    key: str = "tok",
    depth: int = 4,
    width: int = 2048,
    weight: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Count-min sketch of ``items[key]`` (one increment per row, or
    ``weight`` units when given) as a ``(row, bucket, cnt)`` frame.

    Geometry contract: ``depth``/``width``/``salt`` are part of the
    sketch's identity — estimates and merges are only meaningful
    between sketches built with identical geometry (the same
    frozen-geometry discipline as the curator's LSH sidecar). The
    caller owns pinning them; ``cms_estimate`` recomputes probe
    buckets from the same parameters.
    """
    k = F.col(key)
    w = (F.col(weight) if weight is not None else F.lit(1)).cast("long")
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    _cms_bucket(k, width, i, salt).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("rb")
    return (
        items.select(rb, w.alias("w"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-geometry sketches — EXACT for disjoint
    increment streams (counts add; the hash placement is a pure
    function of the key). This is the incremental-maintenance step:
    sketch each accepted batch, fold at compaction, and the combined
    sketch equals the one-shot sketch of the whole corpus (law pinned
    in test_sketch.py)."""
    if not sketches:
        raise ValueError("cms_merge: pass at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key: str = "tok",
    depth: int = 4,
    width: int = 2048,
    salt: str = "",
) -> DataFrame:
    """Point estimates for ``probes[key]``: ``est = min over rows of
    the key's cell`` (0 when a cell is absent — an empty cell proves
    count 0). Output: probes columns + ``est``.

    The sketch side is <= depth*width rows and is broadcast — the
    probe side never shuffles. Estimates are upper bounds on the true
    count (one-sided CMS guarantee)."""
    k = F.col(key)
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    _cms_bucket(k, width, i, salt).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("rb")
    probed = probes.select("*", rb).select(
        *probes.columns, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_stop_keys(
    sketch: DataFrame,
    probes: DataFrame,
    cap: int,
    key: str = "tok",
    depth: int = 4,
    width: int = 2048,
    salt: str = "",
) -> DataFrame:
    """Keys whose CMS-estimated frequency exceeds ``cap`` — the
    fixed-width form of the stop-shingle screen (`dedup`'s
    ``df > max_shingle_freq``). Because estimates never undercount,
    the flagged set is a SUPERSET of the exact ``df > cap`` set
    (law pinned in test_sketch.py): a frequency screen driven by the
    sketch is conservative — every truly-viral key is flagged; the
    cost of the bounded memory is that some rare keys may be
    over-flagged by collisions, which for a screen means slightly
    fewer candidates, never a missed cap. Use when even the
    vocabulary-sized exact (g, df) tier is too large to maintain."""
    return (
        cms_estimate(sketch, probes, key=key, depth=depth, width=width, salt=salt)
        .filter(F.col("est") > cap)
        .drop("est")
    )


def cms_heavy_hitters(
    items: DataFrame,
    key: str = "tok",
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
    salt: str = "",
) -> DataFrame:
    """Top-``k`` keys by CMS estimate: build the sketch, estimate
    every distinct key, rank (est desc, key asc). Output
    ``(key, est, rn)``.

    Because estimates never undercount, every true heavy hitter's
    estimate is >= its true count — a key can only be displaced from
    the top-k by collision-inflated rivals, whose probability the
    depth*width geometry bounds. The cut is ``orderBy().limit(k)``
    => TakeOrdered (never a global sort); the rank column is then a
    window over the k survivors only."""
    from pyspark.sql import Window

    sketch = cms_build(items, key=key, depth=depth, width=width, salt=salt)
    est = cms_estimate(
        sketch,
        items.select(key).distinct(),
        key=key,
        depth=depth,
        width=width,
        salt=salt,
    )
    top = est.orderBy(F.desc("est"), F.asc(key)).limit(k)
    w = Window.orderBy(F.desc("est"), F.asc(key))
    return top.withColumn("rn", F.row_number().over(w).cast("int")).select(
        key, "est", "rn"
    )
