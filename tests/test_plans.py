"""Physical-plan regression tests: the properties PLANS.md documents must
survive refactors — pushdown reaches the scan, small dims broadcast,
pure-Column operators stay out of Python, LSH pruning precedes arithmetic."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only 3 columns reach the scan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate" in plan


def test_broadcast_join_for_dimension(spark):
    dim = spark.createDataFrame([(1, "x")], "o_custkey long, seg string")
    j = spark.read.parquet(f"{SF}/orders.parquet").join(F.broadcast(dim), "o_custkey")
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_blocklist_is_pure_column_plan(spark):
    """The blocklist must compile to JVM expressions — no Python eval."""
    import __spark_entry__ as E

    plan = _plan(E.q_blocklist_filter(spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "codegen id" in plan  # whole-stage codegen spans the filter stack


def test_simhash_exact_check_is_jvm_side(spark):
    """Signatures via Arrow UDF once; the hamming check is bit_count(xor)
    in codegen, and candidate joins are equi-joins (no cartesian)."""
    from marginaliasearch_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(simhash_pairs(docs))
    assert "ArrowEvalPython" in plan  # signature computation
    assert "bit_count" in plan
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject, not a full sort."""
    import __spark_entry__ as E

    plan = _plan(E.q_priority_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark):
    import __spark_entry__ as E

    plan = _plan(E.q_q1_pricing_summary(spark, SF))
    # map-side partial + final agg = two HashAggregate operators
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_cuckoo_anti_join_plan(spark):
    """Cuckoo admission (round 5): the exact-check joins on the small
    maybe-positive key set must be broadcast, the per-bucket filter
    build/probe must be cogrouped pandas stages, and the seen-set must
    never appear on the build side of a shuffled join."""
    import numpy as np

    from marginaliasearch_spark.operators.cuckoo import (
        cuckoo_anti_join,
        unpersist_transients,
    )

    rng = np.random.default_rng(1)
    seen = spark.createDataFrame(
        [(int(k), int(k % 4)) for k in rng.integers(0, 2**40, 2000)],
        "url_hash long, bucket int",
    )
    cand = spark.createDataFrame(
        [(int(k), int(k % 4), "u") for k in rng.integers(0, 2**40, 500)],
        "url_hash long, bucket int, url string",
    )
    plan = _plan(cuckoo_anti_join(cand, seen))
    unpersist_transients()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "FlatMapCoGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan  # seen is never shuffle-joined
