"""angelone_clickhouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference system
``crypt0inf0/angelone_clickhouse`` (a Go market-data ingestion pipeline
feeding ClickHouse), re-expressed Spark-first:

- the streaming ingestion dataflow (binary tick decode -> project ->
  micro-batch append) as Structured Streaming over Parquet
  (``streaming/``, ``sources/``),
- the declared analytical query surface (SURVEY.md section 2.2, Q1-Q8)
  as Spark SQL / DataFrame plans over a Parquet-backed tick table
  (``operators/queries.py``),
- plus the large-scale training-data-pipeline operators the north star
  requires: deduplication, similarity search, text analysis, multimodal
  binary columns (``operators/``).

Everything is declarative DataFrame/SQL so Catalyst supplies predicate
pushdown, column pruning, partial aggregation, broadcast-join selection
and whole-stage codegen; Python UDFs appear only where Spark genuinely
lacks the semantics (fixed-layout binary decode, simhash, language-ID),
and then always as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
