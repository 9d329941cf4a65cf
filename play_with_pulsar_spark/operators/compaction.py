"""Compaction / latest-per-key operators — Pulsar TableView semantics.

The reference materializes "latest value per key" twice: the score
TableView (game-code/pulsar.go:160-167, consumed at game.go:388-392)
and the map-topic latest-message read (pulsar.go:229-252, rationale
docs/en/game2-use-mq.md:62-76). These map to:

- ``latest_per_key``: ``max_by(struct(payload), order)`` — an
  *aggregation*, not a window. This matters at scale: the aggregate
  form gets map-side partial aggregation (each input partition
  collapses to ≤ one row per key before the shuffle), while the
  ``row_number() over (partition by ...)=1`` form shuffles every raw
  row and then sorts. For a changelog where keys repeat many times,
  max_by moves orders of magnitude less data.
- ``latest_message``: top-1 by order — Spark's TakeOrdered, a
  per-partition limit + driver merge; never a global sort.
- ``recency_top_k``: the LRU-of-5 display (game.go:57,372,388-392) as
  a recency top-k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """A3/S6: latest payload per key, ordered by ``order_cols``.

    Returns one row per key: key columns + payload columns (payload
    defaults to every non-key column, including the order columns).
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    if payload_cols is None:
        payload_cols = [c for c in df.columns if c not in key_cols]
    ord_expr = F.struct(*[F.col(c) for c in order_cols])
    m = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .agg(F.max_by(F.struct(*[F.col(c) for c in payload_cols]), ord_expr).alias("_latest"))
    )
    return m.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in payload_cols])


def latest_message(df: DataFrame, order_cols: Sequence[str]) -> DataFrame:
    """S4/O2: the single newest row of a log (new-joiner map init,
    pulsar.go:229-252)."""
    return df.orderBy(*[F.col(c).desc() for c in order_cols]).limit(1)


def recency_top_k(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """W2: the k most-recently-updated keys (LRU-of-5 scoreboard view,
    game.go:57,300-312) — latest-per-key, then top-k by recency."""
    latest = latest_per_key(df, key_cols, order_cols)
    return latest.orderBy(*[F.col(c).desc() for c in order_cols]).limit(k)
