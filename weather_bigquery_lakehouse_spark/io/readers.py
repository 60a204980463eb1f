"""Readers for the engine's tier tables and the benchmark fixtures.

Replaces the reference's ``read_from_minio`` helper (reference
src/etl/utils/bucket.py:8-31): same surface — (format, path) → DataFrame —
but with pinned schemas instead of ``inferSchema`` (single-pass scan,
stable types) and no per-call Hadoop-conf mutation (s3a settings belong to
the session builder; see session.py). Works identically for ``file://``,
``s3a://``, ``hdfs://`` paths — the scheme decides the filesystem.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Read a tier table. CSV/JSON require a schema (no inference by default:
    inference is a full extra pass over the data — reference
    src/etl/utils/bucket.py:27 pays it on every bronze read)."""
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", True)
    quarantine = options.pop("quarantine_corrupt", False)
    if quarantine:
        # PERMISSIVE ingest for external feeds: malformed records land in
        # __corrupt (raw line preserved) instead of failing the job — at
        # scale one bad upstream line must not kill a multi-hour load. The
        # caller splits on __corrupt IS NULL and routes the rest to a
        # quarantine zone. Requires a pinned schema (the __corrupt column
        # must be declared, and inference over bad data is circular).
        if schema is None or fmt not in ("csv", "json"):
            raise ValueError("quarantine_corrupt needs csv/json and a schema")
        # copy, don't .add() in place — callers pass shared module-level schemas
        schema = T.StructType(
            list(schema.fields) + [T.StructField("__corrupt", T.StringType())]
        )
        reader = (
            reader.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "__corrupt")
        )
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        # Explicit opt-in when the caller genuinely can't pin a schema.
        if not options.pop("allow_infer", False):
            raise ValueError(
                f"{fmt} read of {path} requires a schema (or allow_infer=True); "
                "schema-on-read inference is an anti-pattern at scale"
            )
        reader = reader.option("inferSchema", True)
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.format(fmt).load(path)


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's benchmark parquet tables (TESTDATA.md) with pinned
    schemas, and register each as a temp view for the SQL front door."""
    out: dict[str, DataFrame] = {}
    for name in tables or TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = read_table(spark, path, "parquet", schema=TESTDATA_TABLES[name])
        if name == "events":
            # ts arrives as raw INT64 nanoseconds (see schemas.EVENTS);
            # truncate to microseconds — exactly DuckDB's conversion —
            # and expose a naive (NTZ) timestamp.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
