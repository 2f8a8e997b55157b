"""Token-config JSON source (reference O10: config/tokens.json scan).

The reference loads a JSON array of {symbol, token, exchange} at
startup (main.go:168-177 over config/tokens.json:1-33) and joins it
against the static ExchangeMap (models/token.go:30-38). The engine
ships the same universe as a committed asset and reads it with an
EXPLICIT schema (never inferSchema on a hot path — SURVEY §1.3),
broadcasting it wherever ticks need symbol/exchange enrichment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

TOKEN_CONFIG_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("token", StringType(), False),
        StructField("exchange", StringType(), False),
    ]
)

DEFAULT_CONFIG_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "config",
    "tokens.json",
)

# models/token.go:30-38 (full map; the reference's exchange-type codes)
EXCHANGE_TYPE_MAP = {
    "nse_cm": 1,
    "nse_fo": 2,
    "bse_cm": 3,
    "bse_fo": 4,
    "mcx_fo": 5,
    "ncx_fo": 7,
    "cde_fo": 13,
}


def load_token_config(
    spark: SparkSession, path: str | None = None
) -> DataFrame:
    # the reference config is one JSON array (config/tokens.json:1-33),
    # not JSON-lines -> multiLine
    return (
        spark.read.schema(TOKEN_CONFIG_SCHEMA)
        .option("multiLine", "true")
        .json(path or DEFAULT_CONFIG_PATH)
    )


def exchange_type_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(EXCHANGE_TYPE_MAP.items()), "exchange string, exchange_type int"
    )


def enriched_token_config(spark: SparkSession, path: str | None = None) -> DataFrame:
    """config ⋈ exchange map, inner (unknown exchanges dropped — the
    reference's warn-and-drop path, main.go:183-186)."""
    cfg = load_token_config(spark, path)
    return cfg.join(F.broadcast(exchange_type_df(spark)), "exchange")


def decode_ticks_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated wire frames decoded then enriched with the token
    config — the reference's full startup dataflow (O2/O6 + O10/O11)
    as one plan. rows-only driver check."""
    from angelone_clickhouse_spark.sources.decoder import decode_frames, wire_to_ticks
    from angelone_clickhouse_spark.sources.frames import frames_df, generate_frames

    frames = generate_frames(2000, seed=42)
    ticks = wire_to_ticks(decode_frames(frames_df(spark, frames)))
    cfg = enriched_token_config(spark)
    return (
        ticks.join(F.broadcast(cfg), "token")
        .groupBy("symbol", "exchange", "exchange_type")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.round(F.avg("last_traded_price"), 4).alias("avg_price"),
        )
    )


QUERIES = {"decode_ticks_enriched": decode_ticks_enriched}
ORACLES: dict[str, str] = {}
