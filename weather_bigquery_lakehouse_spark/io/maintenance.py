"""Zone maintenance: small-file compaction and partition retention.

The reference lakehouse accumulates one object per city per day in its
bronze/silver zones (reference src/etl/bronze_to_silver.py:82 writes
date-embedded object names) and never compacts or expires them. At 100 TB
the small-files problem is operational debt with a direct query cost —
every file is a scan task, a footer read, and a driver listing entry —
and unbounded retention is a compliance problem. These two passes are the
standard nightly fixes.
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionReport:
    files_before: int
    files_after: int
    bytes_total: int


def _list_files(path: str, suffix: str = ".parquet") -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(suffix)]
    return out


def compact_zone(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> CompactionReport:
    """Rewrite a parquet zone into ~``target_file_bytes`` files.

    The file count comes from the zone's actual byte size (ceil(bytes /
    target)), the rewrite is a ``repartition`` (round-robin — even output
    sizes, no skew from the input layout), and the swap is
    write-to-``.next`` + rename, the same crash-safe pattern as the
    streaming gold MERGE. Local-filesystem rename here; on an object
    store the swap step is the table format's (Delta/Iceberg) commit.

    Skips zones already at or below ``min_files`` — compaction that
    rewrites one file into one file is pure write amplification.

    Hive-partitioned zones (``col=value`` subdirectories) compact one
    partition directory at a time: partition values live in the directory
    names, not the files, so a whole-zone rewrite would flatten the
    layout. Per-partition compaction also keeps each rewrite's blast
    radius to one partition — at scale that's what makes compaction
    schedulable alongside live readers.
    """
    part_dirs = sorted(
        os.path.join(path, e)
        for e in (os.listdir(path) if os.path.isdir(path) else [])
        if "=" in e and os.path.isdir(os.path.join(path, e))
    )
    if part_dirs:
        before = after = total = 0
        for d in part_dirs:
            r = compact_zone(spark, d, target_file_bytes, min_files)
            before += r.files_before
            after += r.files_after
            total += r.bytes_total
        return CompactionReport(before, after, total)
    files = _list_files(path)
    total = sum(os.path.getsize(f) for f in files)
    if len(files) <= min_files:
        return CompactionReport(len(files), len(files), total)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if n_out >= len(files):
        return CompactionReport(len(files), len(files), total)
    df = spark.read.parquet(path)
    nxt = path.rstrip("/") + ".next"
    df.repartition(n_out).write.mode("overwrite").parquet(nxt)
    old = path.rstrip("/") + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(nxt, path)
    shutil.rmtree(old)
    return CompactionReport(len(files), len(_list_files(path)), total)


def expire_partitions(
    path: str, partition_col: str, keep_values: list[str]
) -> list[str]:
    """Drop hive-style partition directories (``col=value``) whose value
    is not in ``keep_values``; returns the dropped values.

    Retention works on the DIRECTORY listing, never by reading data —
    expiring a year of a 100 TB zone is a metadata operation. The caller
    computes ``keep_values`` (e.g. the last N ingestion dates) so the
    policy stays in one place and this function stays mechanical.
    """
    dropped = []
    prefix = f"{partition_col}="
    if not os.path.isdir(path):
        return dropped
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(prefix):
            continue
        value = entry[len(prefix):]
        if value not in keep_values:
            shutil.rmtree(os.path.join(path, entry))
            dropped.append(value)
    return dropped
