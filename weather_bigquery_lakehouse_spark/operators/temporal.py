"""Temporal operators Spark lacks as built-ins: as-of join, sessionization.

Both are expressed so ONE hash shuffle on the entity key does all the work
— the shapes that survive a 100× scale-up:

  as-of join      — the classic distributed formulation: tag both inputs,
                    union them, and run a single `last(ignorenulls)` window
                    over (key, time). Each right row is seen exactly once;
                    there is no range-join candidate explosion and no
                    per-row probe. Cost = one shuffle by key + one sort
                    within partitions (what a sort-merge join would pay
                    anyway). A range join (t BETWEEN x AND y) would be the
                    alternative; for "latest value at or before t" the
                    union+window plan strictly dominates it.
  sessionization  — gaps-and-islands: lag → new-session marker → running
                    sum, all inside one window over (key, time), then one
                    aggregate keyed by (key, session). Same single shuffle,
                    reused by the window AND the aggregate.

Time comparisons are done in integer microseconds (`unix_micros`) so the
semantics are exact and portable to the DuckDB oracle (epoch_us), with no
sub-second truncation surprises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (strict: <) within the same ``on`` group —
    LEFT semantics (unmatched left rows keep NULLs). Right's non-key
    columns (including ``right_ts``) are appended; they must not collide
    with left's column names (rename on the way in).

    Plan: union of tagged inputs → one window over (on, time, tag) taking
    ``last(col, ignorenulls=True)`` → keep left rows. At equal timestamps
    the tag ordering decides visibility: strict sorts the left row FIRST
    (same-instant right rows invisible), non-strict sorts it last.

    All right value columns are carried in ONE struct filled by a single
    ``last(ignorenulls)``, so the attached values always come from the
    same right row — per-column fills would stitch fields from DIFFERENT
    right rows whenever a value column holds a genuine NULL (and would
    resurrect an older non-null over that NULL)."""
    value_cols = [c for c in right.columns if c not in (on, right_ts)] + [right_ts]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")
    left_tag, right_tag = (0, 1) if strict else (1, 0)

    rv_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in value_cols])
    l_shaped = left.select(
        *left.columns,
        F.col(left_ts).alias("__t"),
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r_shaped = right.select(
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        F.col(right_ts).alias("__t"),
        F.lit(right_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    unioned = l_shaped.unionByName(r_shaped)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in left.columns],
        "__tag",
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__rv"),
    )
    return (
        filled.where(F.col("__tag") == left_tag)
        .select(*left.columns, *[F.col(f"__rv.{c}").alias(c) for c in value_cols])
    )


def gap_fill_locf(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Time-series gap fill with last-observation-carried-forward — the
    hypertable `time_bucket_gapfill` + `locf` shape (TimescaleDB /
    continuous-aggregate practice): regularize each entity's irregular
    event stream onto a fixed bucket grid, carrying the last observed
    value across empty buckets.

    Per entity: the grid spans its own [first, last] observed bucket
    (entities do not inherit the corpus' global span — a user active for
    one day yields 24 hourly rows, not the corpus' full range), built
    with `sequence` + `explode`; observed buckets aggregate to the LAST
    value in the bucket (max event time, event_id tie-break — exact, not
    `last()`'s partition-order roulette); the fill is one
    `last(ignorenulls)` window over (key, bucket).

    Scale shape: every stage keys on the entity or (entity, bucket) —
    the bounds aggregate and fill window on the key, the in-bucket
    last-value pick (compiled to WindowGroupLimit — per-partition top-1,
    no full sort) and the grid⋈observed join on (key, bucket). Four
    narrow exchanges locally, all map-side-combinable or top-1-pruned;
    nothing global, no broadcast of anything data-scale, no range-join
    explosion, and grid rows ∝ each entity's own span. Output: (key,
    bucket_ts, value, is_filled) — `is_filled` marks carried rows (the
    audit column every gap-fill consumer wants).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = F.lit(bucket_seconds).cast("bigint") * 1_000_000
    # pmod, not %: Spark % takes the dividend's sign, so negative-epoch
    # (pre-1970) timestamps would land one bucket too high; pmod gives
    # true floor-aligned time_bucket semantics (the range_join_count
    # discipline), exact in 64-bit integers.
    base = df.select(
        F.col(key_col),
        (us - F.pmod(us, bucket_us)).alias("__b"),
        us.alias("__us"),
        F.col(value_col).alias("__v"),
        F.col("event_id").alias("__tie") if "event_id" in df.columns else F.lit(0).alias("__tie"),
    )
    # last value per observed bucket: exact tie-break on (event time, id)
    w_in = Window.partitionBy(key_col, "__b").orderBy(
        F.col("__us").desc(), F.col("__tie").desc()
    )
    observed = (
        base.withColumn("__rn", F.row_number().over(w_in))
        .where(F.col("__rn") == 1)
        .select(key_col, "__b", F.col("__v").alias("__bucket_v"))
    )
    bounds = base.groupBy(key_col).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), bucket_us)
        ).alias("__b"),
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, [key_col, "__b"], "left")
        .withColumn("__filled", F.last("__bucket_v", ignorenulls=True).over(w_fill))
        .select(
            F.col(key_col),
            F.timestamp_micros(F.col("__b")).cast("timestamp_ntz").alias("bucket_ts"),
            F.col("__filled").alias(value_col),
            F.col("__bucket_v").isNull().cast("int").alias("is_filled"),
        )
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: how many entities complete step 1, then
    step 2 STRICTLY AFTER their step-1 time, and so on — the conversion
    /drop-off readout sequential-pattern dashboards are built on. The
    earliest-qualifying-time semantics are the standard ones: an entity's
    step-i time is the MINIMUM event time of type ``steps[i]`` that is
    strictly after its step-(i−1) time (earliest completion dominates —
    if any ordering of the entity's events completes the funnel, the
    earliest-times chain does).

    Physically: one entity-keyed MIN aggregate for step 1, then per
    additional step ONE entity-keyed join (events of that type against
    the survivors' frame) + one MIN aggregate — k−1 joins for k steps,
    all keyed on the entity (co-located when the zone lands bucketed by
    it); the survivors' frame only ever shrinks. Times compare in exact
    integer microseconds. Output, one row per step:
    (step_idx, step, n_entities, conversion_ppm, step_ppm) — conversion
    relative to step 1, step_ppm relative to the previous step.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(F.col(key_col), F.col(type_col).alias("__t"), us.alias("__us"))
    cur = (
        ev.where(F.col("__t") == steps[0])
        .groupBy(key_col)
        .agg(F.min("__us").alias("__at"))
    )
    counts = [cur.count()]
    frames = [cur]
    for step in steps[1:]:
        nxt = (
            ev.where(F.col("__t") == step)
            .join(cur.select(key_col, F.col("__at").alias("__prev")), key_col)
            .where(F.col("__us") > F.col("__prev"))
            .groupBy(key_col)
            .agg(F.min("__us").alias("__at"))
        )
        # bounded metadata: one scalar per funnel step (steps are few)
        cur = nxt.localCheckpoint(eager=True)
        counts.append(cur.count())
        frames.append(cur)
    spark = df.sparkSession
    base = counts[0]
    rows = []
    for i, (step, n) in enumerate(zip(steps, counts)):
        prev = counts[i - 1] if i else n
        rows.append(
            (
                i + 1,
                step,
                n,
                (n * 1_000_000) // base if base else None,
                (n * 1_000_000) // prev if prev else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "step_idx int, step string, n_entities bigint, "
        "conversion_ppm bigint, step_ppm bigint",
    )


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 7 * 86_400,
) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: group
    entities by their FIRST-ACTIVITY bucket (the cohort), then count how
    many of each cohort are still active 0, 1, 2, … buckets later.
    Buckets are epoch-aligned integer indices — FLOOR division via the
    pmod identity ``(us - pmod(us, bucket)) div bucket`` so the
    arithmetic is exact and engine-portable for any timestamp, including
    pre-1970 negative epochs where SQL ``div``'s truncate-toward-zero
    disagrees with DuckDB ``//``'s floor (calendar `date_trunc('week')`
    start-of-week conventions differ between engines too).

    Shuffle shape: ONE aggregate keyed on the entity (first-activity
    bucket), ONE key-keyed join of the event stream against that
    per-entity frame (at scale both sides land bucketed by the entity
    key), one distinct-count per (cohort, offset). Cohort sizes come
    from the offset-0 row of the SAME aggregate — every entity is active
    in its own first bucket by definition, so no second pass.

    Output: (cohort_bucket, week_offset, n_active, cohort_size,
    retention_ppm) — exact integers, retention in ppm of the cohort.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = bucket_seconds * 1_000_000
    ev = df.select(F.col(key_col), us.alias("__us")).withColumn(
        "__b",
        F.expr(
            f"CAST((__us - pmod(__us, {bucket_us})) div {bucket_us} AS BIGINT)"
        ),
    )
    first = ev.groupBy(key_col).agg(F.min("__b").alias("__cohort"))
    active = (
        ev.select(key_col, "__b")
        .distinct()
        .join(first, key_col)
        .groupBy(
            F.col("__cohort").alias("cohort_bucket"),
            (F.col("__b") - F.col("__cohort")).alias("week_offset"),
        )
        .agg(F.countDistinct(key_col).cast("bigint").alias("n_active"))
    )
    sizes = active.where(F.col("week_offset") == 0).select(
        F.col("cohort_bucket"), F.col("n_active").alias("cohort_size")
    )
    return (
        active.join(sizes, "cohort_bucket")
        .select(
            "cohort_bucket",
            F.col("week_offset").cast("bigint").alias("week_offset"),
            "n_active",
            "cohort_size",
            F.expr(
                "CAST(n_active * CAST(1000000 AS BIGINT) div cohort_size AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Time-bucketed OHLC bars (open/high/low/close + volume) per key —
    the candlestick rollup every metering/market/telemetry downsampler
    runs. ONE map-side-combinable aggregate per (key, bucket): open and
    close are `min_by`/`max_by` with a COMPOSITE (event time, id) order
    key, so ties at the bucket edge resolve deterministically under any
    partitioning (a bare `first()` would be partition-order roulette);
    high/low/volume are plain min/max/count. No window, no self-join —
    the entire operator is a single hash aggregate, so it scales exactly
    like a groupBy count. Output: (key, bucket_ts, open, high, low,
    close, volume).

    The composite order key is the SCALAR ``us·2⁶³ + id`` in
    DECIMAL(38,0) (≡ DuckDB HUGEINT — its ``arg_min`` takes only scalar
    keys, so a struct key would not be oracle-portable): 2⁶³ exceeds any
    non-negative BIGINT id, so the scalar orders exactly like the
    (us, id) tuple, and the product tops out ~1.6e34 « 1e38.

    ``id_col`` is REQUIRED to exist in ``df`` (raises if absent): the
    tie-break is the determinism contract — silently falling back to a
    partition-order-dependent id would make the output a function of the
    cluster layout instead of the data."""
    if id_col not in df.columns:
        raise ValueError(
            f"ohlc_bars needs an explicit tie-break column; {id_col!r} is "
            f"not in {df.columns} — pass id_col= naming a unique BIGINT "
            "column (open/close ties at the bucket edge must resolve as a "
            "pure function of the data, never of partition order)"
        )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = F.lit(bucket_seconds).cast("bigint") * 1_000_000
    ord_key = (
        us.cast("decimal(38,0)")
        * F.expr(f"CAST('{1 << 63}' AS DECIMAL(38,0))")  # 2^63 > any bigint id
        + F.col(id_col).cast("bigint").cast("decimal(38,0)")
    )
    # pmod: floor-aligned buckets for negative epochs too (see gap_fill_locf)
    base = df.select(
        F.col(key_col),
        (us - F.pmod(us, bucket_us)).alias("__b"),
        F.col(value_col).alias("__v"),
        ord_key.alias("__ord"),
    )
    return (
        base.groupBy(key_col, "__b")
        .agg(
            F.min_by("__v", "__ord").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", "__ord").alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
        )
        .select(
            key_col,
            F.timestamp_micros(F.col("__b")).cast("timestamp_ntz").alias("bucket_ts"),
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_name: str = "n_in_range",
) -> DataFrame:
    """For each left row, count right rows of the same ``on`` key whose
    timestamp falls in ``[left_ts - window, left_ts)``. Left rows with no
    matches are kept with count 0. Left rows must be distinct.

    A naive theta-join (t BETWEEN a AND b) degenerates to a per-key
    cartesian product. This is the bucketized range join: both sides are
    binned to window-width buckets (integer FLOOR division — exact, no
    double-rounding at boundaries, and floor-consistent for pre-1970
    negative epoch micros where SQL ``div``'s truncate-toward-zero would
    put a row one bucket too high), the left row probes its own and the
    previous bucket (any interval of width W overlaps ≤ 2 such buckets),
    and the join is a plain equi-join on (key, bucket) with the exact range
    predicate attached. Work scales with bucket occupancy, not |left|×|right|
    per key."""
    w_us = window_seconds * 1_000_000
    lm = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rm = F.unix_micros(F.col(right_ts).cast("timestamp"))

    # Floor division in pure 64-bit integer math: pmod(x, W) ∈ [0, W), so
    # (x - pmod(x, W)) is exactly divisible and the quotient is floor(x/W)
    # for negative x too (no double rounding, unlike floor(x / W)).
    fdiv = "(({x} - pmod({x}, {w})) div {w})"
    l_b = fdiv.format(x="__lm", w=w_us)
    r_b = fdiv.format(x="__rm", w=w_us)

    l_shaped = left.select(*left.columns, lm.alias("__lm")).select(
        "*", F.expr(f"explode(array({l_b} - 1, {l_b}))").alias("__b")
    )
    r_shaped = right.select(
        F.col(on).alias("__rk"), rm.alias("__rm")
    ).select("*", F.expr(r_b).alias("__b"))

    a, b = l_shaped.alias("a"), r_shaped.alias("b")
    joined = a.join(
        b,
        (F.col(f"a.{on}") == F.col("b.__rk"))
        & (F.col("a.__b") == F.col("b.__b"))
        & (F.col("b.__rm") >= F.col("a.__lm") - w_us)
        & (F.col("b.__rm") < F.col("a.__lm")),
        "left_outer",
    )
    return joined.groupBy(*[F.col(f"a.{c}") for c in left.columns]).agg(
        F.count(F.col("b.__rm")).alias(count_name)
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    value_col: str | None = None,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event of the same key exceeds ``gap_seconds``. Returns
    one row per (key, session): ``session_idx`` (1-based per key),
    ``n_events``, ``session_start``, ``session_end`` and, when
    ``value_col`` is given, ``total_value`` (exact decimal sum → double).

    This is the batch twin of a streaming session window
    (``applyInPandasWithState`` / session_window) — identical output on a
    closed input set, single shuffle, no Python."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(micros).over(w)
    is_new = F.when(
        prev.isNull() | ((micros - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = df.withColumn("__new", is_new).withColumn(
        "session_idx", F.sum("__new").over(run).cast("bigint")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value")
        )
    return marked.groupBy(key_col, "session_idx").agg(*aggs)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    n_salts: int | None = None,
) -> DataFrame:
    """Keyed interval-overlap join: rows pair when they share the equi-key
    AND their intervals intersect. Left intervals are closed
    ``[l_start, l_end]``; right intervals are half-open
    ``[r_start, r_end)`` with NULL ``r_end`` meaning open-ended (the SCD2
    validity convention).

    The join shuffles on the equi-key only; the overlap predicate filters
    post-join. That is the right plan when the key is selective (per-user
    interval sets are small). For hot keys (a power-law user owning a
    large share of intervals), pass ``n_salts``: the left side is spread
    across ``n_salts`` sub-keys (deterministic row-hash salt, as in
    ``skew.salted_join``) and the right side replicated once per salt, so
    a hot key's ``|L_k| × |R_k|`` cross product is evaluated by
    ``n_salts`` tasks instead of one straggler. Result is identical; only
    the shuffle layout changes.

    The salt hashes (keys, l_start, l_end) ONLY — not payload columns, so
    an F.hash-unsupported payload type (e.g. map) can't fail the join and
    adding columns doesn't reshuffle placements. Corollary: left rows
    identical on key + interval share one salt bucket; if the skew IS
    exact-duplicate intervals, dedupe or pre-aggregate them upstream —
    replication can't spread identical work items apart deterministically.
    """
    join_keys = list(keys)
    if n_salts:
        salt_cols = [F.col(c) for c in (*keys, l_start, l_end)]
        salt = F.pmod(F.hash(*salt_cols), F.lit(n_salts))
        left = left.withColumn("__salt", salt)
        right = right.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
        join_keys.append("__salt")
    l, r = left.alias("l"), right.alias("r")
    cond = None
    for k in join_keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    overlap = (
        F.col(f"r.{r_end}").isNull() | (F.col(f"l.{l_start}") < F.col(f"r.{r_end}"))
    ) & (F.col(f"l.{l_end}") >= F.col(f"r.{r_start}"))
    out = l.join(r, cond & overlap)
    return out.drop("__salt") if n_salts else out
