"""play_with_pulsar_spark — a PySpark-native event-log analytics engine.

Re-expresses the capability surface of labuladong/play-with-pulsar
(an event-sourced system whose backend is an ordered message log) as
idiomatic Spark: DataFrame/SQL on Catalyst for the relational surface,
a per-room fold operator for deterministic replay, Structured
Streaming for the live pipelines, and LLM-data-pipeline operators
(dedup / similarity / text analysis) designed to shard at 100 TB.
"""

from .session import get_spark

__all__ = ["get_spark"]
