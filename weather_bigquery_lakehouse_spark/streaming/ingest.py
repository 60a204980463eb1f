"""Structured Streaming over the lakehouse zones.

The reference's 'stream' is a daily re-ingested batch (SURVEY.md §2.7):
date-partitioned bronze objects + append-mode gold loads. The idiomatic
Spark upgrade is a file-source stream with ``Trigger.AvailableNow`` — each
run incrementally processes exactly the files not yet seen (checkpointed),
which reproduces the reference's daily-batch semantics with exactly-once
bookkeeping for free, and the SAME code scales to a continuous trigger.

Window choice: tumbling 1h processing windows aligned to the epoch
(``F.window``), so the streaming result is bit-identical to the batch
``date_trunc('hour', ts)`` rollup — that equivalence is the oracle check.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import DOCUMENTS, EVENTS


def _as_stream_dir(path: str) -> str:
    """The file-stream source lists a DIRECTORY; wrap a bare file in a temp
    dir via symlink (zero copy). Local-filesystem convenience for the test
    harness — real zones are directories already."""
    if os.path.isfile(path):
        zone = tempfile.mkdtemp(prefix="wbl_stream_src_")
        os.symlink(path, os.path.join(zone, os.path.basename(path)))
        return zone
    return path


def run_hourly_rollup_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run the tumbling-window rollup as an AvailableNow stream to
    completion and return the final result as a batch DataFrame.

    Complete output mode + memory sink: the stream is finite (AvailableNow)
    and the aggregate state is small (one row per hour bucket), so complete
    mode is the right trade — append mode would withhold the last window
    (watermark never passes it on a finite stream)."""
    name = f"hourly_rollup_{uuid.uuid4().hex[:8]}"
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="wbl_stream_ckpt_")
    events_path = _as_stream_dir(events_path)
    stream = spark.readStream.schema(EVENTS).parquet(events_path).withColumn(
        # raw INT64 nanos → microsecond-truncated naive timestamp
        # (same conversion as the batch loader, io/readers.py)
        "ts",
        F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value_dec"),
        )
    )
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.sql(
        f"""
        SELECT w.start AS hour_start,
               n_events,
               CAST(total_value_dec AS DOUBLE) AS total_value
        FROM {name}
        """
    )


def run_dedup_stream(
    spark: SparkSession,
    documents_path: str,
    checkpoint_dir: str | None = None,
    output_dir: str | None = None,
) -> DataFrame:
    """Stateful streaming exact dedup: ``dropDuplicates`` on the content
    digest over an AvailableNow document stream — each digest is emitted
    the first time it is seen and suppressed afterwards, with the seen-set
    held in the state store across micro-batches (and across RUNS via the
    checkpoint: re-running against a grown zone emits only new content).

    Append output mode is correct here (unlike the windowed rollup):
    dedup emits rows immediately, nothing is withheld by a watermark. The
    sink is a real parquet zone (a memory sink cannot recover from a
    checkpoint in append mode), so the returned frame is the CUMULATIVE
    distinct-digest set across all runs — deterministic regardless of
    arrival order, which is what the batch oracle checks."""
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="wbl_stream_ckpt_")
    output = output_dir or tempfile.mkdtemp(prefix="wbl_stream_dedup_")
    stream = (
        spark.readStream.schema(DOCUMENTS)
        .parquet(_as_stream_dir(documents_path))
        .where(F.col("text").isNotNull())
        .select(F.sha2(F.trim(F.col("text")), 256).alias("text_sha"))
        .dropDuplicates(["text_sha"])
    )
    query = (
        stream.writeStream.format("parquet")
        .option("path", output)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.schema("text_sha string").parquet(output)


def incremental_zone_ingest(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    schema=None,
    transform=None,
) -> None:
    """Incremental bronze→silver promotion: stream the source zone with
    AvailableNow, apply ``transform``, append to the target zone. Re-runs
    only process files added since the last checkpoint — the engine's
    idempotent replacement for the reference's re-read-everything daily job
    (reference bronze_to_silver.py reads the full day's objects each run)."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.format(fmt).option("header", True).load(source_dir)
    if transform is not None:
        stream = transform(stream)
    (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
