"""Driver-gate simulation: every queries() entry vs its oracle_sql() twin
at sf0.01 — the same check CORRECTNESS_r{N}.json records."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.compare import assert_same
from tests.conftest import SF_CORRECT

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_CORRECT)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    sdf = QUERIES[name](spark, SF_CORRECT)
    rel = duck.sql(ORACLES[name])
    assert_same(sdf, rel, context=name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"window_id", "route", "conv_id", "role", "tool", "n"}
