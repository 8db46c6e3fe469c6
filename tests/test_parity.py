"""Driver-style parity gate: every registered query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.compare import assert_frames_match
from tests.conftest import SF_DIR


def _specs():
    from gas_data_pipeline_spark.registry import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    return q, o


QUERIES, ORACLES = _specs()

# Round-robin sharding for the sf0.1 gate (the serial run bottlenecks
# on the N^2 dedup oracles' DuckDB time): SPARK_GRAFT_PARITY_SHARD=i/n
# runs every n-th query starting at i, so 4 concurrent pytest
# processes cover all queries in ~1/3 the wall. Unset = everything.
_NAMES = sorted(QUERIES)
_SHARD = __import__("os").environ.get("SPARK_GRAFT_PARITY_SHARD")
if _SHARD:
    _i, _n = (int(x) for x in _SHARD.split("/"))
    _NAMES = _NAMES[_i::_n]


@pytest.mark.parametrize("name", _NAMES)
def test_query_parity(name, spark, duck):
    fn = QUERIES[name]
    df = fn(spark, SF_DIR)
    spark_pdf = df.toPandas()
    if name in ORACLES:
        duck_pdf = duck.sql(ORACLES[name]).df()
        assert_frames_match(name, spark_pdf, duck_pdf)
    else:
        # rows-only contract: runs, stable schema, >= 0 rows
        assert spark_pdf is not None
        assert len(df.columns) > 0
