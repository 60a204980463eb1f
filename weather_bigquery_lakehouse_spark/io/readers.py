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

from ..schemas import EVENTS, EVENTS_RAW_NS, TESTDATA_TABLES


def events_schema(spark: SparkSession, path: str) -> T.StructType:
    """Pick the pinned events schema matching this zone's physical ts
    encoding (fixtures have shipped both TIMESTAMP(µs) and raw INT64
    nanoseconds). The peek is a parquet FOOTER read at analysis time —
    no data scan — and streaming readers need the schema up front, so
    this is the one sanctioned schema-on-read probe in the engine.

    A zone must be encoding-HOMOGENEOUS: one pin is applied to every file,
    so a zone mixing fixture generations would silently misread one
    encoding's timestamps. ``mergeSchema`` makes the probe read EVERY
    footer (parallel, still metadata-only) — mixed INT64/TIMESTAMP files
    fail the merge, which we surface as an explicit error instead of a
    wrong-answer read."""
    try:
        merged = spark.read.option("mergeSchema", "true").parquet(path).schema
    except Exception as e:  # Spark raises on unmergeable column types
        if "merge" in str(e).lower() or "incompatible" in str(e).lower():
            raise ValueError(
                f"events zone {path!r} mixes ts encodings across files "
                "(INT64-nanos vs TIMESTAMP) — a single schema pin would "
                "silently misread one of them; re-land the zone with one "
                "encoding"
            ) from e
        raise
    ts_type = merged["ts"].dataType
    return EVENTS_RAW_NS if isinstance(ts_type, T.LongType) else EVENTS


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ts column to a microsecond TIMESTAMP_NTZ:
    int64 nanoseconds are floor-divided to µs (exactly DuckDB's
    conversion), timestamp columns are cast (µs already). Works on batch
    and streaming frames — the schema is known either way."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


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
        if name == "events":
            df = normalize_event_ts(
                read_table(spark, path, "parquet", schema=events_schema(spark, path))
            )
        else:
            df = read_table(spark, path, "parquet", schema=TESTDATA_TABLES[name])
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
