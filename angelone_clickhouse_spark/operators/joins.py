"""Dimension-enrichment joins — the reference's only join, generalized.

The reference performs exactly one join: an in-memory lookup of
``exchange name -> exchange-type int`` while grouping config tokens per
exchange (reference main.go:180-188 over models/token.go:30-38's
ExchangeMap), silently dropping rows whose exchange is unknown
(main.go:183-186). Re-expressed Spark-first:

- the token dimension and exchange map become small DataFrames that
  Catalyst broadcasts (explicit ``F.broadcast`` — at 100 TB the fact
  side never shuffles for these joins);
- the "unknown exchange -> warn + drop" path becomes inner-join
  semantics, with the dropped rows recoverable as a LEFT ANTI join
  (``unknown_exchange_tokens``);
- the ``map[int][]string`` group-into-lists becomes
  ``groupBy().agg(sort_array(collect_list()))`` (``tokens_by_exchange``).

The token dimension is derived deterministically from the tick
universe (token = stringified user_id, FIXTURES.md B3) so the DuckDB
oracle can rebuild it: symbol = 'SYM'||token, exchange cycles through
the reference's exchange names by token number, with every 4th token
landing on an exchange missing from the map to exercise the drop path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.tables import TICKS_ORACLE_CTE, ticks

# Subset of the reference ExchangeMap (models/token.go:30-38):
# nse_cm=1, bse_cm=3, mcx_fo=5. 'ncx_fo' (7) is deliberately absent
# from the dimension; 'UNKNOWN_EX' is deliberately absent from the map.
EXCHANGE_MAP = [("nse_cm", 1), ("bse_cm", 3), ("mcx_fo", 5)]
_EXCHANGE_CASE = (
    "CASE CAST(token AS BIGINT) % 4 WHEN 0 THEN 'nse_cm' "
    "WHEN 1 THEN 'bse_cm' WHEN 2 THEN 'mcx_fo' ELSE 'UNKNOWN_EX' END"
)


def token_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token config dimension (reference config/tokens.json analogue)."""
    t = ticks(spark, sf_dir).select("token").distinct()
    return t.select(
        "token",
        F.concat(F.lit("SYM"), F.col("token")).alias("symbol"),
        F.expr(_EXCHANGE_CASE).alias("exchange"),
    )


def exchange_map_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(EXCHANGE_MAP, "exchange string, exchange_type int")


_DIM_CTE = (
    TICKS_ORACLE_CTE
    + f""",
token_dim AS (
  SELECT token,
         'SYM' || token AS symbol,
         {_EXCHANGE_CASE} AS exchange
  FROM (SELECT DISTINCT token FROM ticks)
),
exchange_map AS (
  SELECT * FROM (VALUES ('nse_cm', 1), ('bse_cm', 3), ('mcx_fo', 5))
       AS m(exchange, exchange_type)
)
"""
)


def enrich_tokens_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship enrichment: ticks ⋈ token_dim ⋈ exchange_map, rolled up
    per exchange. Both dimensions broadcast; the fact side aggregates
    with a single shuffle on (exchange, exchange_type)."""
    t = ticks(spark, sf_dir)
    dim = token_dim(spark, sf_dir)
    emap = exchange_map_df(spark)
    return (
        t.join(F.broadcast(dim), "token")
        .join(F.broadcast(emap), "exchange")
        .groupBy("exchange", "exchange_type")
        .agg(
            F.countDistinct("token").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
        )
    )


def unknown_exchange_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rows the reference warns about and drops (main.go:183-186),
    surfaced as a LEFT ANTI join instead of a log line."""
    dim = token_dim(spark, sf_dir)
    emap = exchange_map_df(spark)
    return (
        dim.join(F.broadcast(emap), "exchange", "left_anti")
        .select("token", "symbol", "exchange")
    )


def tokens_by_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference's map[int][]string grouping (main.go:180-191) as a
    list aggregate; sort_array pins deterministic ordering."""
    dim = token_dim(spark, sf_dir)
    emap = exchange_map_df(spark)
    return (
        dim.join(F.broadcast(emap), "exchange")
        .groupBy("exchange_type")
        .agg(
            # joined to one string: the driver's canonicalization sorts
            # columns with pandas, which cannot hash list cells
            F.array_join(
                F.sort_array(F.collect_list("token")), ","
            ).alias("tokens"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


QUERIES = {
    "enrich_tokens_join": enrich_tokens_join,
    "unknown_exchange_tokens": unknown_exchange_tokens,
    "tokens_by_exchange": tokens_by_exchange,
}

ORACLES = {
    "enrich_tokens_join": _DIM_CTE
    + """
SELECT d.exchange,
       m.exchange_type,
       count(DISTINCT t.token)      AS n_tokens,
       count(*)                     AS n_ticks,
       round(sum(t.volume), 2)      AS total_volume
FROM ticks t
JOIN token_dim d USING (token)
JOIN exchange_map m ON d.exchange = m.exchange
GROUP BY d.exchange, m.exchange_type
""",
    "unknown_exchange_tokens": _DIM_CTE
    + """
SELECT token, symbol, exchange
FROM token_dim d
WHERE NOT EXISTS (
  SELECT 1 FROM exchange_map m WHERE m.exchange = d.exchange
)
""",
    "tokens_by_exchange": _DIM_CTE
    + """
SELECT m.exchange_type,
       array_to_string(list_sort(list(d.token)), ',')  AS tokens,
       count(*)                                        AS n_tokens
FROM token_dim d
JOIN exchange_map m ON d.exchange = m.exchange
GROUP BY m.exchange_type
""",
}
