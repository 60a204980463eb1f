"""Explicit schema contracts per tier table.

The reference relies on two-pass CSV ``inferSchema`` (reference
src/etl/utils/bucket.py:26-27) — a full extra scan of the data and a
correctness hazard at 100 TB. Every table this engine reads or writes has
a pinned ``StructType`` here; readers pass it explicitly so the scan is
single-pass and the plan's ``ReadSchema`` is exactly what downstream needs.

Two families:
  * reference-shaped tier tables (bronze/silver weather lakehouse —
    schema listings at reference README.md:72-167), and
  * the driver-provisioned benchmark tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference-shaped tier tables (README.md:74-167) -----------------------

BRONZE_CPTEC_WEATHER = T.StructType(
    [
        T.StructField("cidade", T.StringType()),
        T.StructField("estado", T.StringType()),
        T.StructField("atualizado_em", T.StringType()),  # mixed date formats
        T.StructField("data", T.StringType()),
        T.StructField("condicao", T.StringType()),
        T.StructField("condicao_desc", T.StringType()),
        T.StructField("min", T.IntegerType()),
        T.StructField("max", T.IntegerType()),
        T.StructField("indice_uv", T.IntegerType()),  # dropped at silver
        T.StructField("_source", T.StringType()),
        T.StructField("_ingestion_date", T.StringType()),
    ]
)

BRONZE_CPTEC_CITIES = T.StructType(
    [
        T.StructField("nome", T.StringType()),
        T.StructField("id", T.IntegerType()),
        T.StructField("estado", T.StringType()),
        T.StructField("_source", T.StringType()),
        T.StructField("_ingestion_date", T.StringType()),
    ]
)

BRONZE_IBGE_CITIES = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("nome", T.StringType()),
        T.StructField("microrregiao_id", T.IntegerType()),
        T.StructField("microrregiao_nome", T.StringType()),
        T.StructField("mesorregiao_id", T.IntegerType()),
        T.StructField("mesorregiao_nome", T.StringType()),
        T.StructField("uf_id", T.IntegerType()),
        T.StructField("uf_sigla", T.StringType()),
        T.StructField("uf_nome", T.StringType()),
        T.StructField("regiao_id", T.IntegerType()),
        T.StructField("regiao_sigla", T.StringType()),
        T.StructField("regiao_nome", T.StringType()),
        T.StructField("regiao_imediata_id", T.IntegerType()),
        T.StructField("regiao_imediata_nome", T.StringType()),
        T.StructField("_source", T.StringType()),
        T.StructField("_ingestion_date", T.StringType()),
    ]
)

# --- Driver benchmark tables (TESTDATA.md) ---------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        # Parquet logical type is TIMESTAMP(isAdjustedToUTC=false, ms) —
        # a naive timestamp, so NTZ is the faithful Spark type (and what
        # the DuckDB oracle sees).
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

# events.ts has shipped in TWO physical encodings across fixture
# generations: parquet TIMESTAMP(MICROS) (current) and TIMESTAMP(NANOS)
# (older fixtures — Spark has no nanosecond timestamp, so that scan takes
# the raw INT64 via spark.sql.legacy.parquet.nanosAsLong=true, set in
# session.py, and the loader truncates to microseconds exactly like
# DuckDB does). Readers peek the parquet footer and pick the matching
# pin (io/readers.py::events_schema / normalize_event_ts); both paths
# normalize to a microsecond TIMESTAMP_NTZ column.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: Legacy fixture encoding: ts = raw INT64 nanoseconds.
EVENTS_RAW_NS = T.StructType(
    [f if f.name != "ts" else T.StructField("ts", T.LongType()) for f in EVENTS.fields]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
