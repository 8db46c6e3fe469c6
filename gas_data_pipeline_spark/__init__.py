"""gas_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference gas-market data platform
(litshivang/gas-data-pipeline, surveyed in /root/repo/SURVEY.md) as an
idiomatic Spark lakehouse engine:

- bronze (zero-loss raw JSON events) -> silver (long-format typed
  observations) -> gold (query views), all Parquet;
- every reference query re-expressed as DataFrame/SQL plans optimized
  by Catalyst (predicate pushdown, broadcast joins, AQE);
- the reference's pandas reshaping (wide->long melt, JSON-key melt,
  group-to-nested) as linear, shuffle-minimal DataFrame operators;
- the hourly-scheduler ingest loop as Structured Streaming;
- plus large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB inputs.
"""

from gas_data_pipeline_spark.session import get_spark
from gas_data_pipeline_spark.catalog import load_tables, TABLES

__all__ = ["get_spark", "load_tables", "TABLES"]
