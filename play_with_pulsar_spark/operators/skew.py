"""Skew-mitigation helpers: salting for hot keys.

AQE's skew-join handling (on in `session.py`) covers sort-merge join
skew at runtime; these helpers cover the two cases AQE does not:
aggregations with a dominant key, and broadcast-infeasible joins with
a known-hot key set. Both are pure plan rewrites with identical
results to their unsalted forms (asserted in tests).

At 100 TB: a single hot (room, killer) or a celebrity user_id would
otherwise pin one reducer; salting fans the partial state over
``n_salts`` reducers and combines — the combine input is ``n_salts``
rows per key, independent of data volume.

Salts are derived from ROW CONTENT (``pmod(xxhash64(*cols), n)``),
never from ``spark_partition_id``/``monotonically_increasing_id``:
those are nondeterministic across task retries, and a stage retry
after a fetch failure could re-salt rows differently between map
attempts (the SPARK-23207 class of repartition hazard), dropping or
double-counting rows. Content-derived salts are retry-stable; the
tradeoff is that byte-identical duplicate rows share a salt bucket,
which is irrelevant for the wide fixture rows salted here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, keys: Sequence[str], n_salts: int = 16, count_name: str = "n"
) -> DataFrame:
    """Two-phase grouped count: groupBy(keys + salt) partial →
    groupBy(keys) combine. Result == plain groupBy().count()."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").alias(count_name))


def salted_sum(
    df: DataFrame, keys: Sequence[str], value: Column | str, n_salts: int = 16,
    sum_name: str = "total",
) -> DataFrame:
    """Two-phase exact-decimal sum (order-independent, so salting
    cannot change the result)."""
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(v.cast("decimal(18,6)")).alias("_ps"))
    return partial.groupBy(*keys).agg(F.sum("_ps").cast("double").alias(sum_name))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side's key,
    replicate the small side ``n_salts``× with matching salts, join on
    (key, salt). Replication factor is bounded and explicit — use when
    the small side exceeds the broadcast threshold but a few big-side
    keys dominate."""
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)))
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    small_r = small.crossJoin(salts)
    out = big_s.join(small_r, [key, "_salt"], how)
    return out.drop("_salt")
