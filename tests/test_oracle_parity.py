"""Differential gate: every registry query vs its DuckDB oracle at
sf0.001 — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from dtle_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle

WITH_ORACLE = [name for name, p in REGISTRY.items() if p.oracle is not None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    pair = REGISTRY[name]
    sdf = pair.spark_fn(spark, SF_DIR)
    assert_matches_oracle(sdf, duck, pair.oracle)


def test_all_queries_return_rows(spark):
    for name, pair in REGISTRY.items():
        assert pair.spark_fn(spark, SF_DIR).count() > 0, name
