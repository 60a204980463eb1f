"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline: probes × corpus dot
products, all JVM-side array math (`zip_with` + `aggregate` fold), probes
broadcast. At 100 TB the scale path is `lsh_bucketed_topk`: random-
hyperplane LSH assigns each vector to a bucket key; probe and corpus
co-partition on bucket, so the join shuffles each corpus vector once to
one bucket instead of cross-joining everything — approximate (recall
depends on bucket bits / multi-probe), which is the standard trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SIM_DECIMALS = 6  # round similarities before ranking → engine-portable order


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (deterministic,
    matches a left-to-right list_sum in any engine)."""
    prods = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    probes: (id_col, vec_col) — small; broadcast into a cross join against
    the corpus. Similarities are rounded to ``SIM_DECIMALS`` before the
    window rank, with the neighbor id as tie-break, so result order is a
    pure function of the data. Self-matches excluded."""
    q = probes.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__c")
    )
    sim = F.round(
        _dot(F.col("__q"), F.col("__c")) / (_norm(F.col("__q")) * _norm(F.col("__c"))),
        SIM_DECIMALS,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign(vec · plane_b).
    ``planes`` are fixed (seeded) constants, so the expression is pure and
    the bucket assignment reproducible across runs/engines."""
    bucket = F.lit(0)
    for b, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec.cast("array<double>"),
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(2**b)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the probe's
    hyperplane bucket, then exact scoring within the bucket. The join is a
    plain equi-join on the bucket id — shuffle partitions by bucket, so
    work scales with bucket occupancy, not corpus size × probes.

    ``n_probes`` is the multi-probe recall lever: each query additionally
    probes its Hamming-1 neighbor buckets (flipping bits 0, 1, … in order),
    ``n_probes`` buckets in total. A near neighbor that landed on the other
    side of ONE hyperplane is then still found; join width grows linearly
    with n_probes while recall climbs toward exact. The probed bucket ids
    are distinct, and every corpus vector lives in exactly one bucket, so
    no candidate is scored twice."""
    base = hyperplane_bucket(F.col(vec_col), planes)
    probe_buckets = [base] + [
        base.bitwiseXOR(F.lit(2**bit))
        for bit in range(min(max(0, n_probes - 1), len(planes)))
    ]
    q = probes.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__q"),
        F.explode(F.array(*probe_buckets)).alias("__bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__c"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    sim = F.round(
        _dot(F.col("__q"), F.col("__c")) / (_norm(F.col("__q")) * _norm(F.col("__c"))),
        SIM_DECIMALS,
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
