"""Smoke: every oracle query runs at sf0.001 and returns a stable schema.
(Full oracle comparison: tools/oracle_check.py at sf0.01 — also run by
the driver per-round.)"""

from __future__ import annotations

import pytest

from waterdata_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name].fn(spark, SF_SMOKE)
    assert df.columns, name
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
