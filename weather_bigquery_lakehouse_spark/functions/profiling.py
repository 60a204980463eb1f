"""Single-pass data profiling and distributed exact quantiles.

The reference profiles per column with separate Spark jobs —
``distinct().count()`` + ``show()`` per column for uniqueness
(src/etl/utils/data_profiling.py:1-8) and a 4-aggregate ``select`` per
column for ranges (:10-22). Here the row-level measures collapse to one
aggregate and each exact distinct count runs as its own two-phase
dedup branch — see ``profile`` for why that beats a combined
multi-distinct aggregate at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """count / countDistinct / min / max for every column, one row out.
    Column naming: ``{measure}_{col}``. Equivalent output to
    ``basic_data_profiling`` (reference data_profiling.py:10-22).

    Plan shape: the streaming measures (count/min/max) share ONE
    map-side-combined aggregate; each exact distinct count is its own
    two-phase branch (partial dedup per partition → shuffle distinct
    values → count) cross-joined onto the result row. A single aggregate
    with k countDistinct columns would instead go through Expand, which
    multiplies every input row k× before any partial aggregation —
    measured 3× slower at sf0.1 and k× more shuffle at any scale. The
    branches share the scan and run as parallel stages."""
    cols = cols or df.columns
    out = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.count(F.col(c)).alias(f"count_{c}"),
                F.min(F.col(c)).alias(f"min_{c}"),
                F.max(F.col(c)).alias(f"max_{c}"),
            )
        ]
    )
    for c in cols:
        # count(c) after distinct(): skips the null row, = COUNT(DISTINCT c)
        out = out.crossJoin(
            df.select(c).distinct().agg(F.count(F.col(c)).alias(f"distinct_{c}"))
        )
    order = [
        f"{m}_{c}" for c in cols for m in ("count", "distinct", "min", "max")
    ]
    return out.select(*order)


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    out_prefix: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Exact interpolated quantiles (SQL ``quantile_cont`` semantics) as a
    fully distributed plan — the scale-safe replacement for
    ``F.percentile``, whose aggregation buffer holds every value of the
    column on one task (fine at test SF, an OOM at 100 TB).

    Shape: value histogram (groupBy value — exact, map-side combined) →
    range-partition by value → per-partition cumulative counts stitched
    into global rank intervals with a partition-size offset prefix-sum (a
    metadata-scale window, same trick as curation.shuffle_order) → the
    ~2·|ps| needed ranks broadcast-probe the histogram → interpolate.
    Peak per-task state is one histogram partition, never the column.

    Interpolation mirrors Spark's own ``percentile``:
    ``v_lo + (v_hi - v_lo) * (pos - floor(pos))`` with ``pos = p·(n-1)``,
    rounded to 6dp — the same arithmetic the DuckDB oracle's
    ``quantile_cont`` agrees with. Output: one row, columns
    ``{out_prefix}_p{int(p*100)}`` (all NULL on empty input — SQL global
    aggregate semantics).
    """
    vals = df.select(
        F.lit(1).alias("__g"), F.col(col).cast("double").alias("v")
    ).where(F.col("v").isNotNull())
    q = _quantile_values(vals, "__g", ps, n_parts)
    return q.agg(
        *[
            F.round(F.max(F.when(F.col("p") == float(p), F.col("q"))), 6).alias(
                f"{out_prefix}_p{int(p * 100)}"
            )
            for p in ps
        ]
    )


def _quantile_values(vals: DataFrame, g: str, ps: list[float], n_parts: int | None) -> DataFrame:
    """Shared quantile core: ``vals`` = (g, v double non-null) →
    one row per (g, p) with the interpolated quantile ``q``. All joins on
    the group key are NULL-SAFE so a NULL group behaves like any other
    (SQL GROUP BY semantics). See :func:`exact_quantiles` for the plan
    narrative; grouping only changes the keys — the histogram keys on
    (g, v), range partitioning keys on the same pair (a dominant group
    SPANS partitions instead of landing in one task), and offsets/ranks
    are stitched per (partition, group)."""
    spark = vals.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    hist = vals.groupBy(g, "v").agg(F.count(F.lit(1)).alias("cnt"))
    hp = hist.repartitionByRange(n_parts, F.col(g), F.col("v")).withColumn(
        "pid", F.spark_partition_id()
    )
    in_w = (
        Window.partitionBy("pid", g)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hp.withColumn("cum_in", F.sum("cnt").over(in_w))
    sizes = hp.groupBy("pid", g).agg(F.sum("cnt").alias("__sz"))
    # Offset prefix-sum WITHOUT a global window: a triangular self-join
    # (strictly-earlier partitions summed per (partition, group)). O(P²)
    # pairs on a metadata-scale frame is trivia, and it avoids WindowExec's
    # "No Partition Defined" warning, which is aimed at data-scale frames
    # and would alarm users in every run's stderr.
    offsets = (
        sizes.alias("a")
        .join(
            sizes.alias("b"),
            F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}"))
            & (F.col("b.pid") < F.col("a.pid")),
            "left",
        )
        .groupBy(F.col("a.pid").alias("__opid"), F.col(f"a.{g}").alias("__og"))
        .agg(F.coalesce(F.sum("b.__sz"), F.lit(0)).alias("__off"))
    )
    ranked = cum.join(
        F.broadcast(offsets),
        (cum["pid"] == offsets["__opid"]) & cum[g].eqNullSafe(offsets["__og"]),
    ).select(
        F.col(g),
        "v",
        (F.col("__off") + F.col("cum_in") - F.col("cnt")).alias("cum_start"),
        (F.col("__off") + F.col("cum_in")).alias("cum_end"),
    )
    n_df = vals.groupBy(g).agg(F.count(F.lit(1)).alias("__n"))
    pos = F.col("p") * (F.col("__n") - 1)
    ranks = n_df.select(
        F.col(g).alias("__rg"),
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"),
        "__n",
    ).select(
        "__rg",
        "p",
        pos.alias("pos"),
        F.floor(pos).cast("bigint").alias("lo"),
        F.ceil(pos).cast("bigint").alias("hi"),
    )
    lo_hit = ranked.join(
        F.broadcast(ranks),
        F.col(g).eqNullSafe(F.col("__rg"))
        & (F.col("lo") >= F.col("cum_start"))
        & (F.col("lo") < F.col("cum_end")),
    ).select(F.col(g), "p", "pos", "hi", F.col("v").alias("v_lo"))
    both = ranked.join(
        F.broadcast(lo_hit.withColumnRenamed(g, "__hg")),
        F.col(g).eqNullSafe(F.col("__hg"))
        & (F.col("hi") >= F.col("cum_start"))
        & (F.col("hi") < F.col("cum_end")),
    ).select(F.col(g), "p", "pos", "v_lo", F.col("v").alias("v_hi"))
    return both.select(
        F.col(g),
        "p",
        (
            F.col("v_lo")
            + (F.col("v_hi") - F.col("v_lo")) * (F.col("pos") - F.floor("pos"))
        ).alias("q"),
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    ps: list[float],
    out_prefix: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Per-group exact interpolated quantiles — :func:`exact_quantiles`
    generalized so no task ever buffers a group. Spark's own exact
    ``percentile`` aggregate holds every value of a group in one
    aggregation buffer: fine for small groups, an OOM when one group owns
    a large share of a 100 TB table. Here the histogram keys on
    (group, value), range-partitions on the same pair (a giant group
    SPANS partitions instead of landing in one), per-partition cumulative
    counts stitch into global rank intervals with per-(partition, group)
    offsets, and the ~2·|ps| needed ranks per group broadcast-probe the
    histogram. Peak task state = one histogram slice.

    Output: one row per group — INCLUDING a NULL group (null-safe joins
    throughout) and groups whose values are all NULL (their quantile
    columns are NULL), exactly SQL GROUP BY semantics — with columns
    ``{out_prefix}_p{int(p*100)}``, interpolation identical to SQL
    ``quantile_cont`` (rounded to 6dp).
    """
    g = group_col
    vals = df.select(
        F.col(g), F.col(col).cast("double").alias("v")
    ).where(F.col("v").isNotNull())
    q = _quantile_values(vals, g, ps, n_parts)
    pivoted = q.groupBy(g).agg(
        *[
            F.round(F.max(F.when(F.col("p") == float(p), F.col("q"))), 6).alias(
                f"{out_prefix}_p{int(p * 100)}"
            )
            for p in ps
        ]
    )
    # completeness join: a group whose values are ALL null never reaches
    # the histogram but still owns an output row (with NULL quantiles)
    groups = df.select(F.col(g)).distinct()
    return groups.join(
        pivoted.withColumnRenamed(g, "__pg"),
        F.col(g).eqNullSafe(F.col("__pg")),
        "left",
    ).select(
        F.col(g),
        *[f"{out_prefix}_p{int(p * 100)}" for p in ps],
    )


def distinct_counts(df: DataFrame, cols: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Distinct count per column in one pass — ``check_unique_values``
    (reference data_profiling.py:1-8) without the per-column job loop.
    ``approx=True`` swaps in HyperLogLog (``approx_count_distinct``) —
    the right call at 100 TB where exact per-column distincts would each
    shuffle the full column."""
    cols = cols or df.columns
    fn = F.approx_count_distinct if approx else F.countDistinct
    return df.agg(*[fn(F.col(c)).alias(f"distinct_{c}") for c in cols])


def consistency_violations(df: DataFrame, name_col: str, id_col: str) -> DataFrame:
    """Names mapped to more than one id — the reference's data-quality gate
    (``groupBy(name).agg(countDistinct(id)).where(!= 1)``,
    reference src/etl/bronze_to_silver.py:118-131). Hash aggregate with
    map-side partial aggregation; the ``!= 1`` filter runs post-agg."""
    return (
        df.groupBy(name_col)
        .agg(F.countDistinct(id_col).alias("unique_ids"))
        .where(F.col("unique_ids") != 1)
    )


def expectation_report(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Declarative data-quality expectations over ONE corpus scan — the
    dbt-test / Great-Expectations contract surface, engine-side: each
    rule is a named boolean Column evaluated per row, and the report is
    one combinable aggregate emitting a row per rule with exact pass/
    fail accounting. A NULL predicate result counts as a FAILURE (the
    conservative read — an expectation that cannot be evaluated did not
    pass; document per-rule null semantics in the predicate itself via
    coalesce when nulls are acceptable).

    ``unique_cols`` adds one uniqueness expectation per listed column —
    the only expectation class that needs a shuffle (two counts over a
    groupBy). Uniqueness counts against ALL rows: a NULL key is a
    failure (n_pass = countDistinct over non-null keys, n_rows =
    count(*)), so a mostly-NULL column cannot report passed=1 — the
    same conservative read as NULL rule predicates. Row-predicate rules
    cost a single map-side pass regardless of rule count; at 100 TB this
    is the cheap always-on gate a zone write runs before publishing.

    Output per rule: (rule, n_rows, n_pass, n_fail, pass_ppm, passed) —
    exact integers (ppm via BIGINT div), so the report hash-gates.
    Raises ``ValueError`` on an empty expectation set (no rules and no
    unique_cols) — an empty gate that vacuously passes is a config bug.
    """
    if not rules and not unique_cols:
        raise ValueError(
            "expectation_report needs at least one rule or unique_cols "
            "entry — an empty expectation set would vacuously pass"
        )
    passes = [
        F.sum(F.coalesce(pred.cast("int"), F.lit(0)).cast("bigint")).alias(f"__p{i}")
        for i, (_name, pred) in enumerate(rules)
    ]

    def _rows_from_agg(agg: DataFrame, names: list[str]) -> DataFrame:
        # Explode the ONE-row aggregate into per-rule rows. Selecting the
        # aggregate once per rule and unioning re-plans the source scan
        # per Union branch (k rules = k corpus scans — 4x read
        # amplification at 100 TB for a 4-rule set); exploding a 1-row
        # array keeps every rule on the single scan the docstring
        # promises.
        structs = [
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_rows"),
                F.col(f"__p{i}").alias("n_pass"),
                (F.col("__n") - F.col(f"__p{i}")).alias("n_fail"),
            )
            for i, name in enumerate(names)
        ]
        return agg.select(F.explode(F.array(*structs)).alias("e")).select("e.*")

    frames = []
    if rules:
        agg = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n"), *passes)
        frames.append(_rows_from_agg(agg, [name for name, _pred in rules]))
    if unique_cols:
        # distinct-vs-ALL-rows: unique iff every row carries its own
        # non-null key — NULL keys count as failures (count(*) includes
        # them, countDistinct does not); exact and combinable. ALL
        # uniqueness probes ride ONE aggregate: a single key plans as
        # the plain two-phase distinct rewrite (no Expand); several keys
        # plan via Expand — (k+1)x row multiplication in exchange for
        # ONE parquet decode instead of k (the opposite trade from
        # profile(), whose per-column stat branches want the scans
        # independent; a pre-publish gate reads freshly written data
        # once, so the saved decodes win here).
        u_agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            *[
                F.countDistinct(F.col(col)).cast("bigint").alias(f"__p{i}")
                for i, col in enumerate(unique_cols)
            ],
        )
        frames.append(
            _rows_from_agg(u_agg, [f"unique({col})" for col in unique_cols])
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select(
        "rule",
        "n_rows",
        "n_pass",
        "n_fail",
        F.expr(
            "CASE WHEN n_rows = 0 THEN CAST(1000000 AS BIGINT)"
            " ELSE CAST(n_pass * CAST(1000000 AS BIGINT) div n_rows AS BIGINT) END"
        ).alias("pass_ppm"),
        (F.col("n_fail") == 0).cast("int").alias("passed"),
    )
