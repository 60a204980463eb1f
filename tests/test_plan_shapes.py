"""Plan-shape regression tests.

Correctness is the oracle gate's job; THESE tests pin the physical plans —
a refactor that silently de-optimizes (loses a pushed filter, widens a
scan, turns a broadcast join into a shuffle, adds an Exchange) fails here
even though results stay identical. Each assertion documents the plan
property that matters at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from weather_bigquery_lakehouse_spark.io.readers import load_testdata
from weather_bigquery_lakehouse_spark.operators import dedup as dd
from weather_bigquery_lakehouse_spark.plans import QUERIES


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_project_pushes_predicates_and_prunes_columns(spark, sf_dir):
    """Both predicates must reach the parquet scan (row-group/page skipping
    at scale) and the scan must read exactly the referenced columns — a
    full-width scan of a 16-column fact table for a 4-column projection
    reads 4x the bytes."""
    plan = _plan(QUERIES["filter_project_pushdown"].fn(spark, sf_dir))
    assert "GreaterThan(l_discount,0.05)" in plan, "discount filter not pushed"
    assert "LessThan(l_shipdate" in plan, "shipdate filter not pushed"
    scan_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in scan_schema
    assert "l_comment" not in scan_schema and "l_quantity" not in scan_schema


def test_flagship_star_is_broadcast_only_with_two_exchanges(spark, sf_dir):
    """The star query's only shuffles are the two-phase countDistinct
    aggregate (partial by (r_name, custkey), final by r_name). Every dim
    join must be a BroadcastHashJoin — a SortMergeJoin here would shuffle
    the full fact table per dim — and the orders scan must be pruned to
    the 3 referenced columns."""
    plan = _plan(QUERIES["flagship_star_revenue"].fn(spark, sf_dir), "simple")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    orders_scan = next(
        l for l in plan.splitlines() if "FileScan" in l and "orders.parquet" in l
    )
    assert "ReadSchema: struct<o_custkey:bigint,o_totalprice:double,o_orderdate" in orders_scan


def test_lsh_bucket_cap_is_broadcast_anti_join(spark, sf_dir):
    """The hot-bucket cap must stay a broadcast LeftAnti join against the
    (tiny) oversized-key list — if it regresses to a shuffled anti-join or
    a windowed count, every banded row reshuffles just to apply the cap."""
    docs = load_testdata(spark, sf_dir, ["documents"])["documents"]
    plan = _plan(dd.lsh_candidate_pairs(docs), "simple")
    anti_lines = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti_lines, "bucket-size cap anti-join disappeared from the plan"
    assert all("BroadcastHashJoin" in l for l in anti_lines), (
        "cap anti-join is no longer broadcast:\n" + "\n".join(anti_lines)
    )
