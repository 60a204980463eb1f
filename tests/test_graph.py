"""PageRank (operators/graph.py): exact-integer determinism against a
pure-Python reference, hand-graph semantics, and partition independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_bigquery_lakehouse_spark.operators import graph as gr


def _ref_pagerank(nodes, edges, n_iter=3, dnum=85, dden=100):
    """Trivially-correct reference in the SAME non-negative integer floor
    arithmetic the operator commits to (module docstring contract)."""
    n = len(nodes)
    outdeg: dict[object, int] = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: gr.SCALE // n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += r[s] // outdeg[s]
        dmass = sum(r[v] for v in nodes if v not in outdeg)
        share = dmass // n
        base = gr.SCALE // n
        r = {
            v: ((dden - dnum) * base + dnum * (contrib[v] + share)) // dden
            for v in nodes
        }
    return r


def _run(spark, nodes, edges, n_iter=3):
    ndf = spark.createDataFrame([(v,) for v in nodes], "v long")
    if edges:
        edf = spark.createDataFrame(edges, "src long, dst long")
    else:
        edf = spark.createDataFrame([], "src long, dst long")
    got = gr.pagerank(ndf, edf, n_iter=n_iter)
    return {row["v"]: row["rank_pico"] for row in got.collect()}


def test_pagerank_star_hub_outranks_spokes_and_matches_reference(spark):
    # undirected star 0–{1,2,3} (symmetrized) plus isolated node 4
    und = [(0, 1), (0, 2), (0, 3)]
    edges = und + [(b, a) for a, b in und]
    nodes = [0, 1, 2, 3, 4]
    got = _run(spark, nodes, edges)
    assert got == _ref_pagerank(nodes, edges)
    # the hub accumulates its three spokes' full rank each iteration
    assert got[0] > got[1] == got[2] == got[3]
    # the isolated node receives only the base + dangling share, less
    # than a spoke (which also gets a third of the hub's rank)
    assert got[4] < got[1]
    # mass is conserved up to per-node floor losses (< n per division,
    # 3 divisions per iteration, 3 iterations)
    assert gr.SCALE >= sum(got.values()) > gr.SCALE - 9 * len(nodes) * 3


def test_pagerank_no_edges_is_uniform(spark):
    nodes = [10, 20, 30]
    got = _run(spark, nodes, [])
    assert got == _ref_pagerank(nodes, [])
    assert len(set(got.values())) == 1


def test_pagerank_chain_is_partition_independent(spark):
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6)]
    edges = und + [(b, a) for a, b in und]
    nodes = list(range(1, 8))
    ndf = spark.createDataFrame([(v,) for v in nodes], "v long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    a = gr.pagerank(ndf.repartition(7), edf.repartition(1), n_iter=4)
    b = gr.pagerank(ndf.coalesce(1), edf.repartition(5, "dst"), n_iter=4)
    ra = {r["v"]: r["rank_pico"] for r in a.collect()}
    rb = {r["v"]: r["rank_pico"] for r in b.collect()}
    assert ra == rb == _ref_pagerank(nodes, edges, n_iter=4)


def test_pagerank_plan_has_no_window_and_only_broadcast_cartesians(spark):
    und = [(0, 1), (1, 2)]
    edges = und + [(b, a) for a, b in und]
    ndf = spark.createDataFrame([(v,) for v in [0, 1, 2]], "v long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    plan = (
        gr.pagerank(ndf, edf, n_iter=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowExec" not in plan
    assert "CartesianProduct" not in plan  # 1-row frames go broadcast
