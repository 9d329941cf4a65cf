"""As-of join: for each left row, the most recent right row per key.

The reference's TableView answers "latest value for key K as of now"
(pulsar.go:229-252); the as-of join generalizes it to "latest right
row for key K as of EACH left row's timestamp" — the standard shape
for enriching an event stream with slowly-changing dimension state
(market data, account snapshots, player state).

Spark-first design — NO theta join, NO per-row probe:

1. Tag both sides and UNION them on (key, ts) — right rows carry
   their payload, left rows carry null payload.
2. One window per key, ordered by (ts, side, tiebreak) with right
   rows sorting BEFORE a left row at the same ts (backward-inclusive
   semantics), carries the last non-null payload forward
   (``last(ignorenulls)`` over unbounded-preceding..current).
3. Keep only left rows.

Cost: ONE shuffle on the key (the union sorts within partitions) —
the same cost as a co-partitioned equi-join, regardless of how many
right rows precede each left row. A theta join (``r.ts <= l.ts``)
would be O(|L|·|R|) per key before the argmax; this is O((|L|+|R|)
log) per key and survives 100× scale. Skewed keys degrade exactly
like any keyed window — salt or split hot keys upstream if a single
key's history cannot fit a task.

Ties on (key, ts) among RIGHT rows are broken by ``tiebreak_cols``
(ascending; the LAST one wins), so the result is a pure function of
the data, never of partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str] | None = None,
    tiebreak_cols: Sequence[str] = (),
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join, both timestamps inclusive.

    ``direction="backward"`` (default): for every left row, the right
    row with the same key and the GREATEST ``right_ts <= left_ts``;
    equal ``right_ts`` resolved to the greatest ``tiebreak_cols``.
    ``direction="forward"``: the SMALLEST ``right_ts >= left_ts``;
    ties resolved to the smallest ``tiebreak_cols``. Left rows with
    no eligible right row get null payloads (left-outer semantics).
    Both directions are the same union + single-keyed-exchange +
    window-carry plan — only the sort order flips.

    Returns all left columns plus ``{prefix}{col}`` for each payload
    column (default: every non-key, non-ts right column).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (right_on, right_ts)]
    payload_cols = list(payload_cols)
    carry_cols = list(dict.fromkeys([*payload_cols, right_ts, *tiebreak_cols]))

    # one struct per right row so last(ignorenulls) carries ALL its
    # fields atomically — never a frankenrow mixing two right rows
    payload = F.struct(*[F.col(c).alias(c) for c in carry_cols])

    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(tiebreak_cols)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{i}")
            for i, c in enumerate(tiebreak_cols)
        ],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # right rows sort before left at equal ts (inclusive both
    # directions); the LAST right row in window order wins the carry:
    # backward = ts asc (latest <= ts), tiebreak asc (greatest wins);
    # forward = ts desc (earliest >= ts), tiebreak desc (smallest wins)
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc()] + [
            F.col(f"_tb_{i}").asc_nulls_first() for i in range(len(tiebreak_cols))
        ]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc()] + [
            F.col(f"_tb_{i}").desc_nulls_first() for i in range(len(tiebreak_cols))
        ]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        l.unionByName(r)
        .withColumn("_carry", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns] + [
        F.col(f"_carry.{c}").alias(f"{prefix}{c}")
        for c in dict.fromkeys([*payload_cols, right_ts])
    ]
    return joined.select(*out_cols)
