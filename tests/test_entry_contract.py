"""The driver contract: __spark_entry__.py loaded BY PATH (exactly as
the grading driver does), its three functions present and consistent
with each other and with the catalog."""

from __future__ import annotations

import importlib.util
import os

from simplemapreduce_spark.catalog import DRIVER_PRIORITY

_ENTRY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"
)


def _load_by_path():
    spec = importlib.util.spec_from_file_location("__spark_entry__", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_contract_shape(spark, sf_dir):
    m = _load_by_path()
    qs = m.queries()
    oracles = m.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for unregistered query"
    # every DRIVER_PRIORITY name is served, in front
    names = list(qs)
    assert names[: len(DRIVER_PRIORITY)] == list(DRIVER_PRIORITY)
    # smoke: the flagship query returns rows with a stable schema
    df = m.entry(spark)
    assert df.columns
    assert df.count() > 0


def test_rows_only_set_is_intentional():
    """Every query without an oracle must be one of the documented
    legitimately-non-SQL-expressible ops — a new query accidentally
    registered without its oracle fails here instead of silently
    downgrading to the driver's weakest check."""
    m = _load_by_path()
    rows_only = set(m.queries()) - set(m.oracle_sql())
    # Round 4 shrank this set from 4 to 2: the iterative k-means
    # queries (q_sim_ivf_kmeans_topk, q_sim_pq_topk) gained exact
    # unrolled-SQL oracles; only the seeded JVM-internal hash families
    # remain genuinely un-oracle-able.
    assert rows_only == {
        "q_ml_minhash_lsh",
        "q_ml_brp_lsh",
    }, rows_only
