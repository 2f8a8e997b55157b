"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``angelone_clickhouse_spark`` package;
this module only aggregates the registries each operator module
exports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q5 daily OHLCV, SURVEY.md §7 M1) on sf0.001."""
    from angelone_clickhouse_spark.operators.queries import q5_daily_ohlcv

    return q5_daily_ohlcv(spark, SMOKE_SF_DIR)


def _registries():
    """(queries, oracles) aggregated from every operator module."""
    from angelone_clickhouse_spark.operators import queries as qmod

    mods = [qmod]
    for modname in (
        "angelone_clickhouse_spark.operators.joins",
        "angelone_clickhouse_spark.operators.relational",
        "angelone_clickhouse_spark.operators.tpch_extra",
        "angelone_clickhouse_spark.operators.dedup",
        "angelone_clickhouse_spark.operators.similarity",
        "angelone_clickhouse_spark.operators.text",
        "angelone_clickhouse_spark.operators.sessionize",
        "angelone_clickhouse_spark.operators.multimodal",
        "angelone_clickhouse_spark.operators.skew",
        "angelone_clickhouse_spark.operators.pipeline",
        "angelone_clickhouse_spark.operators.curation",
        "angelone_clickhouse_spark.operators.timeseries",
        "angelone_clickhouse_spark.operators.asof",
        "angelone_clickhouse_spark.operators.embedding_fast",
        "angelone_clickhouse_spark.functions.scalar",
        "angelone_clickhouse_spark.sources.token_config",
        "angelone_clickhouse_spark.streaming.batch_equiv",
        "angelone_clickhouse_spark.streaming.stream_join",
    ):
        try:
            import importlib

            mods.append(importlib.import_module(modname))
        except ImportError:
            continue
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    o: dict[str, str] = {}
    for m in mods:
        q.update(getattr(m, "QUERIES", {}))
        o.update(getattr(m, "ORACLES", {}))
    return q, o


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    return _registries()[1]
