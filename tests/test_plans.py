"""Plan-quality regression tests: the physical plans the docstrings
promise. These fail if a refactor silently loses pushdown, pruning, or
a broadcast — the properties that matter at 100 TB."""

from __future__ import annotations

import pytest

from dtle_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def plan_of(name: str, spark) -> str:
    return (
        REGISTRY[name]
        .spark_fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of("q1_pricing_summary", spark)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # 7 needed columns only — the widest unused column must not be read
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q6_filters_reach_scan(spark):
    plan = plan_of("q6_revenue_delta", spark)
    assert "PushedFilters: [" in plan
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in plan.split("PushedFilters")[1][:400]


def test_q3_broadcasts_customer(spark):
    plan = plan_of("q3_shipping_priority", spark)
    assert "BroadcastHashJoin" in plan


def test_q5_broadcast_chain(spark):
    """All three dims broadcast; the only SortMerge/shuffled join may be
    lineitem⋈orders."""
    plan = plan_of("q5_region_revenue", spark)
    assert plan.count("BroadcastHashJoin") >= 3


def test_where_filter_expression_pushdown(spark):
    plan = plan_of("where_filter", spark)
    # the simple conjuncts push to parquet; pow() stays in the Filter
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:300]


def test_ann_bruteforce_no_corpus_shuffle(spark):
    """Corpus side must not shuffle: query side broadcast, one scan."""
    plan = plan_of("ann_topk_bruteforce", spark)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_text_ops_stay_jvm_side(spark):
    """Text analytics stay JVM-side: no Python eval nodes anywhere.
    (Higher-order lambdas are CodegenFallback, so WholeStageCodegen
    itself isn't required — Python absence is the property that
    matters; the only sanctioned Python is multimodal's mapInPandas.)"""
    for name in ("token_stats", "quality_score", "lang_id", "dedup_exact",
                 "dedup_minhash_lsh", "dedup_simhash", "ann_topk_bruteforce"):
        plan = plan_of(name, spark)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan, name
