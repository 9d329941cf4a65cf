"""Every declared query with an oracle must hash-match DuckDB at
sf0.01 — the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from play_with_pulsar_spark import parity
from play_with_pulsar_spark.queries import REGISTRY

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = parity.duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_dir, con):
    spec = REGISTRY[name]
    res = parity.compare(name, spark, sf_dir, spec.fn, spec.oracle, con=con)
    assert res.ok, res.detail


def test_all_queries_run_with_scalar_schemas(spark, sf_dir):
    """One pass over the whole registry (every query function is
    EXPENSIVE to build — some run multi-batch curator loops — so the
    smoke check and the schema audit share a single execution):

    - every registered query (oracle or not) runs and returns rows
      with a stable schema;
    - no output column is array/map/struct-typed — complex columns
      hash differently between Arrow and non-Arrow toPandas paths
      (ndarray vs list repr), so a query that passes the local
      engine-session parity could still fail the driver's
      plain-session compare (serialize or scale-to-int instead — see
      x_array_functions).

    Riding persisted intermediates are released after materializing:
    this loop shares one session with the whole suite, and
    un-released handles would accumulate across all declared queries
    (and trip the storage-hygiene assertions of later tests)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from play_with_pulsar_spark.operators.dedup import release_intermediates

    offenders = {}
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, sf_dir)
        assert df.columns, name
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
        df.limit(1).collect()
        release_intermediates(df)
    assert not offenders, offenders


def test_retention_policy_nonvacuous(spark, sf_dir):
    """The value-aware retention pipeline must actually DIVERGE from
    first-writer-wins on the fixture — if the two accepted sets were
    equal, the retention oracle would hash-pass without ever
    exercising an eviction or a score-based rejection."""
    a = {
        r.doc_id
        for r in REGISTRY["pipeline_streaming_retention"].fn(spark, sf_dir).collect()
    }
    b = {
        r.doc_id
        for r in REGISTRY["pipeline_streaming_curation"].fn(spark, sf_dir).collect()
    }
    assert a != b and len(a ^ b) >= 2  # at least one eviction swap
