"""Iterative link analysis — deterministic integer PageRank.

The engine's graph surface so far is :func:`..operators.dedup.
connected_components` (equivalence classes — "which docs are the same").
PageRank answers the complementary curation question: "which docs are
HUBS" — a document whose near-duplicate edges chain through large
template families accumulates rank even when its direct degree is
modest, so centrality over the near-dup graph flags boilerplate/template
hubs that per-pair signals miss (and, on a hyperlink graph, is the
classic quality prior — Page et al., "The PageRank Citation Ranking",
Stanford InfoLab 1999). Reference parity: the reference repo has no graph
operators — this is engine-extension surface (SURVEY.md §2.5), same
class as connected components.

Determinism contract (the ``kmeans``/``bpe`` pattern — the trained
output is a pure function of the input, bit-identical across engines,
partitionings and runs, so a DuckDB oracle can UNROLL the same
iterations):

- **Exact integer arithmetic end-to-end.** Rank is carried in
  "pico-units" — bigint fractions of ``SCALE = 10¹²`` total mass. Every
  step is a bigint sum (order-independent) or a floor division of
  non-negative bigints (``div`` in Spark, ``//`` in DuckDB — identical
  on non-negatives): a node with out-degree ``d`` sends
  ``r div d`` along EACH out-edge; dangling mass is redistributed as
  ``dmass div n`` to every node; the damped update is
  ``((den−num)·(SCALE div n) + num·(contrib + share)) div den`` with the
  damping factor as the exact rational ``num/den`` (default 85/100).
  No float enters the computation, so there is nothing to tie-break.
  Overflow bound: every mass term is ≤ SCALE = 10¹², and the largest
  intermediate is ``num·(contrib + share) ≤ 100·10¹² ≪ 2⁶³``.
- **Fixed iteration count, truncated lineage.** The loop runs a FIXED
  ``n_iter`` driver-side iterations (no data-dependent early stop — a
  convergence test would add a per-iteration job and break the unrolled
  SQL twin); each iteration ``localCheckpoint``s the rank frame so
  lineage never compounds (the connected-components pattern; in
  production, checkpoint to durable storage every few iterations so a
  lost executor replays one iteration, not the whole chain).

Scale shape (100 TB): per iteration the corpus-scale work is ONE
equi-join of the rank frame against the degree-annotated edge list on
``src`` followed by ONE map-side-combinable sum keyed on ``dst`` — at
scale both frames land bucketed by node id, so the join is co-located
and the only shuffle is the contribution aggregate. The edge list is
degree-annotated ONCE before the loop (checkpointed — it is static
across iterations). Everything else per iteration is two 1-row
aggregates (dangling mass, node count) broadcast back — the engine's
bounded-metadata crossJoin pattern, never a data-scale collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total rank mass in pico-units (1.0 == 10^12) — large enough that the
#: per-iteration floor losses stay far below any rank gap of interest,
#: small enough that 100·SCALE fits comfortably in a bigint.
SCALE = 10**12


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    node_col: str = "v",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Damped PageRank over a directed edge list, in exact pico-unit
    integer arithmetic (module docstring). ``nodes`` must hold every
    vertex exactly once (the rank universe — vertices without edges are
    dangling and receive redistributed mass); ``edges`` is directed
    (symmetrize an undirected graph before calling). Returns one row per
    node: ``(v, rank_pico)``."""
    verts = nodes.select(F.col(node_col).alias("v"))
    ed = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))

    # static across iterations: node count (1 row), out-degrees, and the
    # degree-annotated edge list (checkpointed once, reused n_iter times)
    nfrm = verts.agg(F.count("*").alias("__n"))
    deg = ed.groupBy("src").agg(F.count("*").alias("__outdeg"))
    ed = ed.join(deg, "src").localCheckpoint(eager=True)

    base = F.expr(f"CAST({SCALE} AS BIGINT) div __n")
    ranks = (
        verts.crossJoin(F.broadcast(nfrm))
        .select("v", base.alias("r"))
        .localCheckpoint(eager=True)
    )
    for it in range(n_iter):
        contrib = (
            ed.join(ranks.withColumnRenamed("v", "src"), "src")
            .select(F.col("dst").alias("v"), F.expr("r div __outdeg").alias("__c"))
            .groupBy("v")
            .agg(F.sum("__c").alias("__contrib"))
        )
        dang = (
            ranks.join(deg.withColumnRenamed("src", "v"), "v", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("__dmass"))
        )
        consts = nfrm.crossJoin(dang)  # 1 row × 1 row
        ranks = (
            verts.join(contrib, "v", "left")
            .crossJoin(F.broadcast(consts))
            .select(
                "v",
                F.expr(
                    f"({damping_den - damping_num} * (CAST({SCALE} AS BIGINT) div __n)"
                    f" + {damping_num} * (coalesce(__contrib, CAST(0 AS BIGINT))"
                    f" + (__dmass div __n))) div {damping_den}"
                ).alias("r"),
            )
        )
        # truncate lineage between iterations; the FINAL iteration stays
        # un-checkpointed so callers receive a real (inspectable) plan
        if it < n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("v", F.col("r").alias("rank_pico"))


def triangle_counts(
    pairs: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Per-node triangle counts over an undirected pair graph — the local
    clustering signal the pairwise metrics can't see: a doc whose
    near-dup partners are ALSO near-dups of each other sits inside a
    dense template family (triangles), not a chain of incidental
    matches. Third member of the graph family beside connected
    components (equivalence) and PageRank (centrality).

    Degree-ordered ("forward") algorithm, Schank & Wagner 2005 / the
    standard distributed formulation: orient every edge from its
    lower-(degree, id) endpoint to the higher one; every triangle then
    has exactly ONE wedge rooted at its minimum-order corner, so the
    wedge join emits each triangle once and — the scale property — wedge
    work is Σ_v d⁺(v)² with d⁺ bounded by ~√(2m) for ANY degree
    distribution: a viral hub's edges all point AWAY from it, so the hub
    roots no wedges and the quadratic blow-up of a naive neighbor join
    never happens. Two edge-keyed equi-joins (wedge build + closure
    check), one explode of each found triangle to its 3 corners, one
    combinable count. Output: (node, n_triangles) for nodes in ≥ 1
    triangle.
    """
    e = (
        pairs.select(
            F.least(left_col, right_col).alias("u"),
            F.greatest(left_col, right_col).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        # materialize ONCE: the edge list is referenced ~5 times below
        # (union, degrees, both orientation joins, closure) and the
        # upstream pair lineage (LSH ∘ Jaccard for the near-dup entry) is
        # the expensive part — without this, Catalyst re-executes it per
        # reference (measured 11.3 → 5.1 s at sf0.1, the remainder being the pair build itself)
        .localCheckpoint(eager=True)
    )
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    # orient: src = lower (degree, id); dst = higher
    keyed = (
        und.join(deg.withColumnRenamed("u", "__n1").withColumnRenamed("d", "__d1"),
                 F.col("u") == F.col("__n1"))
        .join(deg.withColumnRenamed("u", "__n2").withColumnRenamed("d", "__d2"),
              F.col("v") == F.col("__n2"))
        .where(
            (F.col("__d1") < F.col("__d2"))
            | ((F.col("__d1") == F.col("__d2")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .localCheckpoint(eager=True)
    )
    w1 = keyed.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = keyed.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = w1.join(w2, "a").where(F.col("b") < F.col("c"))
    # closure: (b, c) must be an oriented edge in EITHER direction —
    # orientation is by (deg, id), so normalize the probe to the edge key
    closed = wedges.join(
        keyed.select(
            F.col("src").alias("b"), F.col("dst").alias("c")
        ).unionByName(
            keyed.select(F.col("dst").alias("b"), F.col("src").alias("c"))
        ).where(F.col("b") < F.col("c")).distinct(),
        ["b", "c"],
        "left_semi",
    )
    corners = closed.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
