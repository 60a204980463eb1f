"""Skew-mitigation utilities for joins on hot keys.

AQE's skew-join splitting (on in session.py) handles skew it can SEE at
runtime. ``salted_join`` is the explicit lever for when the skew is known
up front (a viral user id, a null-ish default key, a power-law entity):
the left side is spread across ``n_salts`` sub-keys and the right side is
replicated once per salt, so one hot key's rows land on ``n_salts``
partitions instead of one straggler task.

Use when right is too big to broadcast but small enough that n_salts×
replication is cheap relative to the straggler it removes — the standard
trade. The salt is derived from a hash of the whole left row, so the plan
is deterministic across retries (no ``rand()`` — a retried task must
re-derive the same salt or the join duplicates/drops rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` ⋈ ``right`` on ``on`` with an ``n_salts``-way
    salt: left rows get ``hash(row) mod n_salts``, right rows are exploded
    to every salt value, and the join keys on (on, salt). Result equals the
    plain join exactly; only the shuffle layout changes."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, [on, "__salt"], how).drop("__salt")


def skew_key_report(
    df,
    key_col: str,
    top_n: int = 10,
    scale: int = 1_000_000,
):
    """The measured input to the salting decision: the ``top_n`` heaviest
    values of a join key with their integer-ppm share of the table and
    their multiple of the mean key frequency ("hot factor"). A key whose
    hot factor is ~1 needs no salt; a key holding 10% of a power-law
    table is the straggler `salted_join`'s ``n_salts`` should be sized
    against — measured, not guessed.

    Scale shape: one combinable count keyed on the key (map-side combine);
    the top-n selection is an ``orderBy().limit()`` that compiles to
    TakeOrderedAndProject — each task forwards its local top-n, never a
    global sort (or single-partition window) over the key space; rank is
    then a triangular broadcast self-join over the ≤ ``top_n``-row frame
    (count of strictly-better rows + 1) — the same pattern the quantile
    core uses to avoid WindowExec's "No Partition Defined" warning, which
    is aimed at data-scale frames and would alarm users in every run's
    stderr. Totals come from a 2-value aggregate over the COUNT TABLE
    (the input is never rescanned), broadcast back. Integer-exact shares
    (BIGINT ppm division) with count/key tie-breaks, so the report is
    engine-portable row for row.
    """
    from pyspark.sql import functions as F

    counts = df.where(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").cast("bigint").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("__n_keys"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col(key_col).asc()).limit(top_n)
    t = top.select(F.col(key_col).alias("key"), "n_rows")
    # rank = 1 + #rows ordered strictly before (count desc, key asc) —
    # keys are unique post-groupBy, so the rank is total and gap-free.
    ranked = (
        t.alias("a")
        .join(
            F.broadcast(t.alias("b")),
            (F.col("b.n_rows") > F.col("a.n_rows"))
            | (
                (F.col("b.n_rows") == F.col("a.n_rows"))
                & (F.col("b.key") < F.col("a.key"))
            ),
            "left",
        )
        .groupBy(F.col("a.key").alias("key"), F.col("a.n_rows").alias("n_rows"))
        .agg((F.count("b.key") + F.lit(1)).cast("int").alias("rank"))
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "key",
            "n_rows",
            F.expr(f"CAST((n_rows * {scale}L) DIV __total AS BIGINT)").alias(
                "share_ppm"
            ),
            # hot factor ×1000: how many times the mean key frequency,
            # exact integer math (n_rows * n_keys * 1000 div total)
            F.expr(
                "CAST((n_rows * __n_keys * 1000L) DIV __total AS BIGINT)"
            ).alias("hot_factor_milli"),
        )
    )
