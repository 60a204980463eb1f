"""Writers for tier tables.

Replaces ``write_to_minio`` (reference src/etl/utils/bucket.py:34-84).
Differences by design:
  * real ``partitionBy`` columns instead of dates embedded in object paths
    (reference bronze_to_silver.py:82) — enables Catalyst partition pruning
    and dynamic partition pruning on the read side;
  * no pandas branch — ``DataFrameWriter`` covers csv/parquet/json
    distributed, so nothing funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    buckets: int,
    key: str,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Bucketed (and bucket-sorted) catalog table at an explicit path.

    Bucketing is the shuffle-elimination lever for repeated joins and
    aggregations on the same key: two tables bucketed by the join key into
    the same bucket count join with ZERO exchanges (and with ``sort=True``,
    zero sorts — the sort-merge join streams the pre-sorted buckets). At
    100 TB this turns every fact⋈dim or fact⋈fact on the bucket key from a
    full-data shuffle into a per-bucket local merge. Bucket metadata lives
    in the session catalog (``spark.table(name)``); data is plain parquet
    at ``path``."""
    writer = df.write.format(fmt).option("path", path).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.mode("overwrite").saveAsTable(name)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int | None = None,
    fmt: str = "parquet",
    keep_key: bool = False,
) -> None:
    """Rewrite a zone clustered on the Morton z-order of two integer
    columns — the ``OPTIMIZE ZORDER BY (a, b)`` maintenance op: each
    output file covers a contiguous z-key range, i.e. a small rectangle
    in (a, b) space, so its parquet min/max footer stats are narrow on
    BOTH columns and reads filtered on EITHER predicate skip most
    files/row-groups (plain sorting gives this on one dimension only).

    Cost is one range-repartition on the z-key — the shuffle any global
    sort pays — plus an in-partition sort the writer streams; the z-key
    itself is per-row integer arithmetic after a broadcast min/max probe
    (see ``operators/layout.py``). Range boundaries come from Spark's
    reservoir sampling, so file SIZES are balanced; file CONTENT order is
    the deterministic z-key."""
    from pyspark.sql import functions as F

    from ..operators.layout import ZORDER_BITS, zorder_key_frame

    if "__zkey" in df.columns:
        raise ValueError("input already has column '__zkey' — rename it first")
    bits = ZORDER_BITS if bits is None else bits
    if not 0 < bits <= 31:
        # 2*bits interleaved must stay within BIGINT (and bits=0 would
        # silently collapse every row onto one z-key)
        raise ValueError(f"bits must be in 1..31, got {bits}")
    keyed = zorder_key_frame(df, col_a, col_b, bits=bits, key_name="__zkey")
    out = keyed.repartitionByRange(n_files, F.col("__zkey")).sortWithinPartitions(
        "__zkey"
    )
    if not keep_key:
        out = out.drop("__zkey")
    writer = out.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shard42",
    fmt: str = "parquet",
) -> None:
    """The training-corpus landing step: write ``n_shards`` deterministic,
    size-balanced shards (``shard=K`` partition directories) whose
    assignment and within-shard order are content-addressed — the same doc
    lands in the same shard at the same position in every engine, run,
    retry, and cluster layout, so a training job can resume mid-epoch and
    two sites preparing the same corpus produce byte-comparable shards.

    Shard = md5(seed|id) mod n_shards (the engine's shared ``md5_bucket``
    primitive — one definition, so the sink can't drift from the oracles);
    rows are repartitioned BY the shard column so each output directory is
    written by the tasks that own it (no small-file spray), and sorted
    within partitions by (shard, md5 key) — the 'shard' prefix satisfies
    the partitioned writer's required ordering, so Spark inserts NO extra
    sort and the within-shard md5 order physically survives to the files.
    The write is pinned to STATIC overwrite: under the session's dynamic
    partition-overwrite default, a re-land after shards emptied (or with
    fewer shards) would keep stale directories — a corpus landing must
    replace the whole zone.
    """
    from pyspark.sql import functions as F

    from ..operators.curation import md5_bucket, md5_key

    clash = {"shard", "__key"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — rename them "
            "before landing (the shard layout owns these names)"
        )
    out = (
        df.withColumn("__key", md5_key(id_col, salt=seed + "|"))
        .withColumn(
            "shard", md5_bucket(id_col, salt=seed + "|", mod=n_shards).cast("int")
        )
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__key")
        .drop("__key")
    )
    writer = (
        out.write.format(fmt)
        .mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("shard")
    )
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)
