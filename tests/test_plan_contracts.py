"""Physical-plan contract tests: the scale story depends on specific
plan shapes (filters reaching the parquet scan, global top-k compiling
to TakeOrderedAndProject instead of a full sort, small sides
broadcasting, no SortMergeJoin on candidate joins). These assertions
freeze those properties so a refactor that silently degrades the plan
— not the results — still fails CI."""

import os

import pytest

from alma_memory_spark.plans.registry import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_fetch_template_pushes_filters_and_uses_topk(spark):
    plan = _plan(spark, "memory_fetch_template")
    # equality + range predicates must reach the parquet scan
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:", 1)[1][:300]
    # orderBy+limit must compile to TakeOrderedAndProject (per-partition
    # partial top-k + k-row reduce), never a global Sort
    assert "TakeOrderedAndProject" in plan


def test_vector_topk_is_narrow_map_plus_topk(spark):
    plan = _plan(spark, "vector_topk")
    assert "TakeOrderedAndProject" in plan
    # brute-force cosine must not shuffle the corpus (only the final
    # k-row reduce); no join, no aggregate exchange
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" not in plan


def test_ann_candidate_join_broadcasts_candidates(spark):
    plan = _plan(spark, "ann_candidate_join")
    # the tiny candidate set must broadcast into the documents scan —
    # a sort-merge join here would shuffle the big side at 100 TB
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rrf_fusion_cuts_before_ranking(spark):
    plan = _plan(spark, "rrf_fusion")
    # both retrieval lists are cut via TakeOrderedAndProject BEFORE the
    # rank windows, so no global-window single-partition sort of the
    # full corpus survives in the plan (the fusion join itself is a
    # full-outer over the two <=100-row lists — Spark cannot broadcast
    # full-outer, and a sort-merge over bounded sides is scale-free)
    assert plan.count("TakeOrderedAndProject") >= 2
    fusion = plan.split("Window", 1)[0]  # above the first rank window
    assert "parquet" not in fusion  # no raw-corpus scan feeds the join directly


def test_pricing_agg_is_partial_aggregated(spark):
    plan = _plan(spark, "pricing_revenue_agg")
    # map-side combine: partial_ aggregate functions before the shuffle
    assert "partial_" in plan
    # the nation/region dims must broadcast, not shuffle
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", ["text_profile", "exact_dedup"])
def test_scan_bound_gates_have_no_join(spark, name):
    plan = _plan(spark, name)
    assert "Join" not in plan
