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


def sql_grouping_sets(spark: SparkSession, sf_dir: str):
    """Driver-visible face of the SQL front door: a pure
    ``spark.sql`` query over the registered views (no DataFrame API),
    using explicit GROUPING SETS — the general grouping-sets form next
    to ROLLUP (revenue_rollup) and CUBE (order_priority_cube). The
    cent sum is the exact.py integer spelling, inlined in SQL."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
SELECT token, day,
       count(*) AS n_ticks,
       CAST(sum(CAST(round(last_traded_price * 100) AS BIGINT)) AS DOUBLE)
         / 100 AS sum_ltp,
       CAST(grouping_id(token, day) AS INT) AS level
FROM (SELECT token, CAST(ts AS DATE) AS day, last_traded_price FROM ticks)
GROUP BY GROUPING SETS ((token), (day), ())
"""
    )


QUERIES = {"sql_grouping_sets": sql_grouping_sets}

ORACLES = {
    "sql_grouping_sets": """
WITH t AS (
  SELECT token, CAST(ts AS DATE) AS day,
         CAST(round(last_traded_price * 100) AS BIGINT) AS c
  FROM (
    SELECT CAST(user_id AS VARCHAR) AS token,
           CAST(ts AS TIMESTAMP)    AS ts,
           "value"                  AS last_traded_price
    FROM events
  )
)
SELECT token, day,
       count(*) AS n_ticks,
       CAST(sum(c) AS DOUBLE) / 100 AS sum_ltp,
       CAST(GROUPING(token) * 2 + GROUPING(day) AS INTEGER) AS level
FROM t
GROUP BY GROUPING SETS ((token), (day), ())
""",
}
