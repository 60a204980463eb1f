"""weather_bigquery_lakehouse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference lakehouse (VictorClvtt/weather-bigquery-lakehouse,
a bronze→silver→gold medallion pipeline; see SURVEY.md). Everything is
declared through the DataFrame/SQL API so Catalyst owns optimization;
Python UDFs are reserved for genuinely non-relational extension operators.

Layout:
  session     — one SparkSession builder (s3a-ready, AQE on, UTC)
  schemas     — explicit StructType contracts per tier table
  io          — readers/writers, freshness-guarded sinks, local gold catalog
  functions   — scalar-function library (keys, dates, cleaning, profiling)
  operators   — relational + extension operators (star schema, dedup,
                similarity search, text analysis, multimodal plumbing)
  plans       — the oracle-checked query registry driving __spark_entry__
  streaming   — Structured Streaming ingest of the bronze zone
  pipeline    — bronze→silver→gold runner mirroring the reference DAG
"""

__version__ = "0.1.0"
