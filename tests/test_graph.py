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


# --- triangle counting ------------------------------------------------------

def _ref_triangles(edges):
    """Trivially-correct: enumerate id-ordered triples over the unique
    undirected edge set."""
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    nodes = sorted({x for p in e for x in p})
    counts = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) not in e:
                continue
            for c in nodes:
                if c <= b:
                    continue
                if (a, c) in e and (b, c) in e:
                    for v in (a, b, c):
                        counts[v] = counts.get(v, 0) + 1
    return counts


def _tri_run(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["n_triangles"] for r in gr.triangle_counts(df).collect()
    }


def test_triangles_clique_and_chain(spark):
    # K4 on {1..4} (every node in C(3,2)=3 triangles) + a chain 5-6-7
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(5, 6), (6, 7)]
    got = _tri_run(spark, k4 + chain)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert got == _ref_triangles(k4 + chain)


def test_triangles_hub_roots_no_wedges_but_counts_its_triangles(spark):
    # star hub 0 with 6 spokes + one closed spoke pair (1,2): exactly one
    # triangle (0,1,2); duplicate/reversed edges must not double-count
    edges = [(0, s) for s in range(1, 7)] + [(1, 2), (2, 1), (1, 2)]
    got = _tri_run(spark, edges)
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangles_property_matches_reference(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 8), st.integers(0, 8)),
            min_size=1,
            max_size=24,
        )
    )
    def check(edges):
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            return
        assert _tri_run(spark, edges) == _ref_triangles(edges)

    check()


def test_triangles_plan_has_no_window_and_no_cartesian(spark):
    """Plan pin for the round-12 driver-window entry: the wedge build and
    closure check are equi-joins (no CartesianProduct anywhere — the
    degree-ordered orientation makes the wedge join key-equi), and no
    WindowExec sneaks in via the dedup/orientation stages."""
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    plan = (
        gr.triangle_counts(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowExec" not in plan
    assert "CartesianProduct" not in plan
