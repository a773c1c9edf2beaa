"""Every catalog query that declares a DuckDB oracle must match it
exactly at sf0.001 — a fast local replica of the driver's sf0.01 gate.
"""

from __future__ import annotations

import pytest

from simplemapreduce_spark import catalog
from tests.oracle_utils import compare_query

catalog.load_all()

ORACLED = sorted(catalog.ORACLES)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, catalog.QUERIES[name], catalog.ORACLES[name], sf_dir)


def test_all_queries_run(spark, sf_dir):
    """Queries without oracles still must execute and have stable schema."""
    for name, fn in catalog.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
