"""Deterministic k-means quantizer training (operators/kmeans.py).

The trainer's whole value is that it is a pure function of the data —
bit-identical across runs, partition layouts, and engines (the DuckDB
oracle for ``ann_kmeans_codebook`` / ``ann_kmeans_centroids`` unrolls the
same iterations). These tests pin that, plus the algebraic invariants and
the plan shapes the 100 TB argument rests on.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from weather_bigquery_lakehouse_spark.operators import kmeans as km
from weather_bigquery_lakehouse_spark.operators import similarity as sim


def _vec_rows(vectors):
    return [(i, [float(x) for x in v]) for i, v in enumerate(vectors)]


def _frame(spark, vectors):
    return spark.createDataFrame(
        _vec_rows(vectors), "vec_id long, embedding array<double>"
    )


# 12 vectors in 4 dims with two obvious blobs and some strays — small
# enough that every test is a couple of tiny jobs
_BLOBS = [
    [0.0, 0.0, 0.1, 0.0],
    [0.1, 0.0, 0.0, 0.0],
    [0.0, 0.1, 0.0, 0.1],
    [0.1, 0.1, 0.1, 0.0],
    [5.0, 5.0, 5.1, 5.0],
    [5.1, 5.0, 5.0, 5.0],
    [5.0, 5.1, 5.0, 5.1],
    [5.1, 5.1, 5.1, 5.0],
    [-3.0, 2.0, 0.5, 1.0],
    [2.5, -1.5, 3.0, 0.0],
    [0.7, 4.2, -2.0, 1.1],
    [-1.0, -1.0, -1.0, -1.0],
]


def _md5_order(ids):
    return sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))


def _micro(x: float) -> int:
    # half away from zero, like F.round(x * 1e6)
    ax = abs(x) * 1_000_000
    r = int(ax + 0.5)
    return r if x >= 0 else -r


def _numpy_free_reference(vectors, n_codes, n_iter, sample_n=None):
    """Pure-python reimplementation of the exact integer Lloyd loop —
    the unit-level twin of both the Spark trainer and the SQL oracle."""
    ids = list(range(len(vectors)))
    order = _md5_order(ids)
    quant = {i: [_micro(x) for x in vectors[i]] for i in ids}
    cb = {code: list(quant[order[code]]) for code in range(n_codes)}
    train_ids = order[:sample_n] if sample_n is not None else ids
    width = len(vectors[0])
    for _ in range(n_iter):
        members: dict[int, list[int]] = {}
        for i in train_ids:
            best = min(
                (sum((quant[i][j] - c[j]) ** 2 for j in range(width)), code)
                for code, c in cb.items()
            )[1]
            members.setdefault(best, []).append(i)
        new_cb = {}
        for code in range(n_codes):
            if code not in members:
                new_cb[code] = cb[code]  # empty codeword keeps its position
                continue
            comps = []
            for j in range(width):
                s = sum(quant[i][j] for i in members[code])
                n = len(members[code])
                m = (2 * s + n) // (2 * n) if s >= 0 else -((2 * -s + n) // (2 * n))
                comps.append(m)
            new_cb[code] = comps
        cb = new_cb
    return {code: [c / 1_000_000 for c in comps] for code, comps in cb.items()}


def test_kmeans_centroids_match_exact_reference(spark):
    got = {
        r["cell_id"]: r["centroid"]
        for r in km.kmeans_centroids(_frame(spark, _BLOBS), n_cells=3, n_iter=3)
        .collect()
    }
    want = _numpy_free_reference(_BLOBS, n_codes=3, n_iter=3)
    assert got == want


def test_kmeans_sampled_training_matches_exact_reference(spark):
    got = {
        r["cell_id"]: r["centroid"]
        for r in km.kmeans_centroids(
            _frame(spark, _BLOBS), n_cells=3, n_iter=2, sample_n=8
        ).collect()
    }
    want = _numpy_free_reference(_BLOBS, n_codes=3, n_iter=2, sample_n=8)
    assert got == want


def test_kmeans_deterministic_across_partition_layouts(spark):
    f1 = _frame(spark, _BLOBS)
    f2 = _frame(spark, _BLOBS).repartition(7)
    a = sorted(map(tuple, km.kmeans_centroids(f1, n_cells=4, n_iter=2).collect()))
    b = sorted(map(tuple, km.kmeans_centroids(f2, n_cells=4, n_iter=2).collect()))
    assert a == b


def test_kmeans_every_vector_its_own_cluster_is_a_fixpoint(spark):
    # n_codes == n distinct vectors: each vector is its own nearest
    # codeword (d = 0), every cluster is a singleton, the mean is the
    # member — iterating must return the micro-quantized corpus itself
    n = len(_BLOBS)
    got = {
        r["cell_id"]: r["centroid"]
        for r in km.kmeans_centroids(_frame(spark, _BLOBS), n_cells=n, n_iter=3)
        .collect()
    }
    order = _md5_order(range(n))
    for code in range(n):
        want = [_micro(x) / 1_000_000 for x in _BLOBS[order[code]]]
        assert got[code] == want


def test_kmeans_empty_codeword_keeps_its_position(spark):
    # two identical vectors as md5-adjacent ids: wherever they rank, the
    # later duplicate codeword can never win an assignment (ties break to
    # the smaller code id), so it must keep its initial position verbatim
    order = _md5_order(range(6))
    vecs = [None] * 6
    dup = [1.0, 1.0, 1.0, 1.0]
    vecs[order[0]] = dup
    vecs[order[1]] = dup
    rest = [[9.0, 0.0, 0.0, 0.0], [0.0, 9.0, 0.0, 0.0],
            [0.0, 0.0, 9.0, 0.0], [0.0, 0.0, 0.0, 9.0]]
    for i, slot in enumerate(order[2:]):
        vecs[slot] = rest[i]
    got = {
        r["cell_id"]: r["centroid"]
        for r in km.kmeans_centroids(_frame(spark, vecs), n_cells=2, n_iter=2)
        .collect()
    }
    assert got[1] == dup  # never updated — kept, not nulled or re-seeded
    assert got == _numpy_free_reference(vecs, n_codes=2, n_iter=2)


def test_kmeans_pq_codebook_trains_all_subspaces_and_matches_reference(spark):
    cb = km.kmeans_pq_codebook(
        _frame(spark, _BLOBS), dim=4, m=2, n_codes=3, n_iter=2
    )
    rows = cb.collect()
    assert {(r["sub_id"], r["code_id"]) for r in rows} == {
        (s, c) for s in range(2) for c in range(3)
    }
    # each subspace independently equals the reference run on its slice
    for s in range(2):
        slice_vecs = [v[s * 2 : (s + 1) * 2] for v in _BLOBS]
        want = _numpy_free_reference(slice_vecs, n_codes=3, n_iter=2)
        got = {r["code_id"]: r["__cv"] for r in rows if r["sub_id"] == s}
        assert got == want


def test_kmeans_incomplete_group_raises(spark):
    with pytest.raises(ValueError, match="codebook incomplete"):
        km.kmeans_centroids(_frame(spark, _BLOBS[:2]), n_cells=5, n_iter=1)
    with pytest.raises(ValueError, match="n_codes"):
        km.kmeans_centroids(_frame(spark, _BLOBS), n_cells=0)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_kmeans_training_plan_shapes(spark):
    """The 100 TB argument, pinned on the real helpers: per-iteration
    corpus work is a BROADCAST join against the codebook (never a
    shuffled join); the grouped md5-order selection is a WindowGroupLimit
    (map-side partial limit, not a global per-group sort); the
    single-group selection contains NO window at all (orderBy+limit and a
    broadcast triangular rank)."""
    emb = _frame(spark, _BLOBS)
    quant = emb.select(
        F.lit(0).alias("__g"),
        F.col("vec_id").alias("__id"),
        km._to_micro(F.col("embedding")).alias("__v"),
    )
    cb, train = km._select_single_group(quant, n_codes=3, sample_n=None)
    cplan = _explain(cb)
    assert "Window" not in cplan  # no WindowExec, no WindowGroupLimit
    assert "BroadcastHashJoin" in cplan or "BroadcastNestedLoopJoin" in cplan
    assert "SortMergeJoin" not in cplan

    # the trainer checkpoints the ≤ n_codes codebook before assigning;
    # with the single group's literal key, Catalyst folds the equi-join
    # into a broadcast product against the tiny codebook — still
    # broadcast-built, never a shuffled join
    assigned = km._assign_codes(train, cb.localCheckpoint(eager=True))
    aplan = _explain(assigned)
    assert "BroadcastNestedLoopJoin" in aplan or "BroadcastHashJoin" in aplan
    assert "SortMergeJoin" not in aplan

    gquant = quant.withColumn("__g", F.col("__id") % 2)
    gcb, gtrain = km._select_grouped(gquant, n_codes=2, sample_n=None)
    assert "WindowGroupLimit" in _explain(gcb)
    # with a real group column the assignment is a broadcast HASH join
    gassigned = km._assign_codes(gtrain, gcb.localCheckpoint(eager=True))
    gplan = _explain(gassigned)
    assert "BroadcastHashJoin" in gplan
    assert "SortMergeJoin" not in gplan


def test_kmeans_single_group_training_emits_no_windowexec_warning(spark, capfd):
    """A constant group key folded out of the window partition spec would
    print WindowExec's 'No Partition Defined' warning on every run — the
    single-group path must stay silent (same stderr bar as
    skew_key_report's triangular rank)."""
    capfd.readouterr()  # drain
    km.kmeans_centroids(
        _frame(spark, _BLOBS), n_cells=3, n_iter=2, sample_n=8
    ).collect()
    err = capfd.readouterr().err
    assert "WindowExec" not in err
    assert "No Partition Defined" not in err


def test_trained_codebook_beats_standin_distortion_at_equal_m(spark):
    """The round-7 demand, as a regression gate on the metric training
    provably descends: at equal (m, n_codes), the trained codebook's mean
    ADC quantization distortion over the corpus is strictly below the
    first-n stand-in's. (Recall@5 over 10 probes is NOT gated here — on
    near-random unit vectors at 500-vector scale it is sampling noise
    that flips sign between the sf dirs; ann_recall_report publishes
    both metrics so the trade is measured, not guessed.)"""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def distortion(codebook):
        return sim.pq_distortion(
            emb, dim=64, m=8, n_codes=16, codebook=codebook
        ).collect()[0]["mean_distortion_micro"]

    cb_t = km.kmeans_pq_codebook(emb, dim=64, m=8, n_codes=16, n_iter=4)
    assert distortion(cb_t) < distortion(None)


def test_trained_codebook_lifts_recall_on_clustered_corpus(spark):
    """On the corpus the driver grades (sf0.01) the trained codebook also
    wins on recall@5 — pinned so a training regression that preserved
    distortion but broke encode/ADC plumbing would still surface."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 10)
    truth = (
        sim.l2_topk(emb, probes, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )

    def recall(codebook):
        approx = sim.pq_topk(
            emb, probes, dim=64, m=8, n_codes=16, k=5, codebook=codebook
        )
        return (
            approx.join(truth, ["query_id", "neighbor_id"], "left_semi").count()
        )

    cb_t = km.kmeans_pq_codebook(emb, dim=64, m=8, n_codes=16, n_iter=4)
    assert recall(cb_t) > recall(None)


def test_update_unroll_cap_falls_back_identically_above_max_width(spark):
    """Round-14 (ADVICE r13): a width above _UNROLL_MAX_WIDTH must take
    the explode update path (the width-64 unrolled aggregate measured
    slower) and still produce the identical trained codebook."""
    import random

    rng = random.Random(3)
    wide = km._UNROLL_MAX_WIDTH + 4
    rows = [
        (0, i, [rng.uniform(-1, 1) for _ in range(wide)]) for i in range(24)
    ]
    subs = spark.createDataFrame(
        rows, f"sub_id int, vec_id long, __sv array<double>"
    )
    got_dyn = km.train_grouped_codebook(
        subs, n_codes=4, n_iter=2, group_col="sub_id", id_col="vec_id",
        vec_col="__sv", width=None,
    )
    got_wide = km.train_grouped_codebook(
        subs, n_codes=4, n_iter=2, group_col="sub_id", id_col="vec_id",
        vec_col="__sv", width=wide,
    )
    a = sorted((r["sub_id"], r["code_id"], tuple(r["__cv"])) for r in got_dyn.collect())
    b = sorted((r["sub_id"], r["code_id"], tuple(r["__cv"])) for r in got_wide.collect())
    assert a == b
