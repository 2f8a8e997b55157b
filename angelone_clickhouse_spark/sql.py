"""SQL-facing surface: every engine relation as a Spark SQL view.

The reference's consumers speak SQL strings to a server
(db/clickhouse.go:135-201, README.md:129-256); this module gives the
engine the same front door: ``register_all`` publishes the raw tables,
the canonical tick table, and the token-config dimensions as temp
views, after which ``spark.sql("SELECT ... FROM ticks ...")`` is the
whole API. The view is a logical plan, not a materialization —
Catalyst still pushes filters through it into the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from angelone_clickhouse_spark.sources.tables import register_tables, ticks


def register_all(spark: SparkSession, sf_dir: str | None = None) -> None:
    register_tables(spark, sf_dir)
    ticks(spark, sf_dir).createOrReplaceTempView("ticks")
    from angelone_clickhouse_spark.sources.token_config import (
        enriched_token_config,
        exchange_type_df,
        load_token_config,
    )

    load_token_config(spark).createOrReplaceTempView("token_config")
    exchange_type_df(spark).createOrReplaceTempView("exchange_map")
    enriched_token_config(spark).createOrReplaceTempView("token_config_enriched")
