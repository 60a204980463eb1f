"""Incremental-maintenance operators: MERGE-style upsert and SCD Type-2
dimension versioning.

The reference lakehouse maintains its gold tables with full-table or
partition-level rewrites (WRITE_TRUNCATE / WRITE_APPEND,
``/root/reference/src/etl/utils/bigquery.py:105-141``); these operators add
the incremental middle ground a warehouse needs once facts stop fitting a
daily rewrite: key-level upsert and attribute-history dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    broadcast_updates: bool = False,
    dedupe_order: list[str] | None = None,
) -> DataFrame:
    """MERGE semantics as a batch plan: rows from ``updates`` win on key
    collision, unmatched ``base`` rows survive, new ``updates`` keys are
    inserted. Expressed as anti-join + union — two narrow stages, no
    window, no driver state.

    PRECONDITION: ``updates`` must be unique on ``keys`` — every update
    row survives the union, so duplicate update keys would emit duplicate
    rows where a real MERGE errors or applies exactly one row per key.
    Callers with a raw (possibly multi-row-per-key) batch either
    pre-aggregate it, or pass ``dedupe_order`` — ordering columns under
    which the LAST row per key (descending order) deterministically wins,
    reducing ``updates`` with one row_number window before the merge (the
    window runs on the update batch only, never on ``base``).

    At scale the update batch is usually a small fraction of the base
    table: pass ``broadcast_updates=True`` and the anti-join becomes a
    broadcast hash join, leaving the base table un-shuffled (the plan a
    MERGE on a 100 TB fact table needs). Both inputs must share a schema.
    """
    if dedupe_order:
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in dedupe_order]
        )
        updates = (
            updates.withColumn("__mu_rn", F.row_number().over(w))
            .where(F.col("__mu_rn") == 1)
            .drop("__mu_rn")
        )
    upd = F.broadcast(updates) if broadcast_updates else updates
    return base.join(upd, keys, "left_anti").unionByName(updates)


AGG_STATE_SUFFIXES = ("__cnt", "__sum", "__min", "__max")


def rollup_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """The MERGEABLE aggregate state of a rollup: per key group,
    ``(__cnt, __sum, __min, __max)`` over ``value_col`` — the algebraic
    decomposition behind every incremental materialized view / continuous
    aggregate: count and sum add, min and max take extrema, and every
    presentation measure (avg = sum/cnt included) derives from the state.
    Sums are held EXACT as DECIMAL(38,2) (not IEEE double — a float sum
    depends on merge order, so two different increment histories would
    disagree with the recompute; decimal addition is associative, making
    merge ≡ recompute an identity, not an approximation)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).cast("bigint").alias("__cnt"),
        F.sum(v.cast("decimal(38,2)")).alias("__sum"),
        F.min(v).alias("__min"),
        F.max(v).alias("__max"),
    )


def merge_rollup_state(
    stored: DataFrame,
    increment_state: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Merge two rollup states key-wise WITHOUT touching base data — the
    incremental-refresh step: the stored state absorbs an increment's
    state via one unionByName + one map-side-combinable aggregate (cnt/
    sum add, min/max take extrema). Associative and commutative, so any
    increment batching converges to the recompute-from-scratch state
    (pytest property). Cost ∝ |stored keys| + |increment keys|; the base
    table is never rescanned."""
    unioned = stored.unionByName(increment_state)
    return unioned.groupBy(*keys).agg(
        F.sum("__cnt").cast("bigint").alias("__cnt"),
        F.sum("__sum").alias("__sum"),
        F.min("__min").alias("__min"),
        F.max("__max").alias("__max"),
    )


def rollup_present(state: DataFrame, keys: list[str]) -> DataFrame:
    """Presentation view of a rollup state: n / total / min / max / avg,
    doubles at the output boundary (the registry's exact-inside,
    double-at-the-edge rule). avg derives from the exact state, so an
    incrementally-maintained avg equals the recomputed one bit-for-bit."""
    return state.select(
        *keys,
        F.col("__cnt").alias("n"),
        F.col("__sum").cast("double").alias("total"),
        F.col("__min").alias("min_value"),
        F.col("__max").alias("max_value"),
        # ONE IEEE division of the two exact state components — not a
        # decimal division, whose result scale differs between engines
        (F.col("__sum").cast("double") / F.col("__cnt").cast("double")).alias(
            "avg_value"
        ),
    )


def replace_groups(
    base: DataFrame,
    replacement: DataFrame,
    keys: list[str],
    broadcast_keys: bool = True,
) -> DataFrame:
    """Group-wise REPLACE: every base row whose key appears in
    ``replacement`` is dropped, then ALL replacement rows are appended —
    the multi-row-per-key sibling of :func:`merge_upsert` (whose
    precondition is one update row per key). The unit of replacement is
    the whole key group, so a group that SHRANK loses its stale rows —
    exactly what incremental index maintenance needs (a re-chunked doc
    with fewer chunks must not keep orphans).

    The anti-join keys on the replacement's DISTINCT key set (small by
    contract: the changed groups), broadcast by default so the 100 TB
    base never shuffles. Both inputs must share a schema.
    """
    ks = replacement.select(*keys).distinct()
    if broadcast_keys:
        ks = F.broadcast(ks)
    return base.join(ks, keys, "left_anti").unionByName(replacement)


def scd2_versions(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 from an event log: collapse each
    key's attribute stream into change-point versions with
    ``[valid_from, valid_to)`` validity and an ``is_current`` flag.

    Change detection (lag), interval stitching (lead) and version
    numbering (row_number) all share one ``partitionBy(key)`` ordering, so
    the whole operator costs a single shuffle regardless of how many
    windows it reads. Ordering ties on ``ts_col`` break deterministically
    on ``tiebreak_col``. ``attr_col`` must be non-null (a null attribute
    would make lag-based change detection ambiguous).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    marked = df.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        F.lag(attr_col).over(w).alias("__prev"),
    )
    change_points = marked.where(
        F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col))
    )
    valid_to = F.lead(ts_col).over(w)
    return change_points.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.when(valid_to.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )
