"""Subscription-control JSON contract (reference O3 wire format).

The reference subscribes by sending one JSON control message over the
WebSocket — ``{correlationID, action, params: {mode, tokenList:
[{exchangeType, tokens}]}}`` (angel/types.go:13-27), built from the
token config grouped by exchange type (main.go:287-304) with the
action/mode constants of models/token.go:9-18. This module round-trips
that exact contract with Spark JSON functions: ``to_json`` BUILDS the
subscribe message from the token-config table, ``from_json`` PARSES an
incoming message back into a (token, exchange_type, mode) spec that
feeds :func:`~angelone_clickhouse_spark.streaming.ingest
.subscription_filter`.

Scale notes: the control message is a few KB by construction (the
token universe the reference subscribes to), so collecting ONE json
string to the driver is the WebSocket control channel, not a data
path. The data-path filter stays distributed: token membership from a
parsed message is applied as an IN-list predicate (pushable) via
subscription_filter, or as a broadcast semi-join for a large universe.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from angelone_clickhouse_spark.sources.token_config import (
    exchange_type_df,
    load_token_config,
)

# models/token.go:9-18
SUBSCRIBE_ACTION = 1
UNSUBSCRIBE_ACTION = 0
LTP_MODE = 1
QUOTE_MODE = 2
SNAP_QUOTE = 3
DEPTH_MODE = 4

# angel/types.go:13-27 (SubscribeRequest / SubscriptionParams /
# TokenSubscription field names, verbatim)
SUBSCRIBE_REQUEST_SCHEMA = StructType(
    [
        StructField("correlationID", StringType()),
        StructField("action", IntegerType()),
        StructField(
            "params",
            StructType(
                [
                    StructField("mode", IntegerType()),
                    StructField(
                        "tokenList",
                        ArrayType(
                            StructType(
                                [
                                    StructField("exchangeType", IntegerType()),
                                    StructField(
                                        "tokens", ArrayType(StringType())
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def build_subscribe_request(
    spark: SparkSession,
    correlation_id: str = "ws_test",
    mode: int = QUOTE_MODE,
    action: int = SUBSCRIBE_ACTION,
    config_path: str | None = None,
) -> str:
    """The exact subscribe message the reference sends at startup
    (main.go:287-304): token config -> known-exchange join (unknown
    exchanges dropped, the reference's log-and-skip) -> per-exchange
    token lists -> one JSON string via ``to_json``. Lists are sorted
    (exchangeType, then token) for determinism — the reference
    iterates a Go map, whose order is deliberately random."""
    cfg = load_token_config(spark, config_path)
    et = exchange_type_df(spark)
    token_list = (
        cfg.join(F.broadcast(et), "exchange")
        .groupBy("exchange_type")
        .agg(F.array_sort(F.collect_list("token")).alias("tokens"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("exchange_type").alias("exchangeType"),
                        F.col("tokens"),
                    )
                )
            ).alias("tokenList")
        )
    )
    req = token_list.select(
        F.to_json(
            F.struct(
                F.lit(correlation_id).alias("correlationID"),
                F.lit(action).alias("action"),
                F.struct(
                    F.lit(mode).alias("mode"), F.col("tokenList")
                ).alias("params"),
            )
        ).alias("msg")
    )
    return req.collect()[0].msg


def parse_subscribe_request(spark: SparkSession, message: str) -> DataFrame:
    """Incoming control message -> one row per subscribed token:
    (correlation_id, action, mode, exchange_type, token). Malformed
    JSON yields zero rows (from_json null-propagates), matching the
    reference's parse-error skip."""
    df = spark.createDataFrame([(message,)], "msg string")
    return (
        df.select(F.from_json("msg", SUBSCRIBE_REQUEST_SCHEMA).alias("r"))
        .filter(F.col("r").isNotNull() & F.col("r.params").isNotNull())
        .select(
            F.col("r.correlationID").alias("correlation_id"),
            F.col("r.action").alias("action"),
            F.col("r.params.mode").alias("mode"),
            F.explode("r.params.tokenList").alias("ts"),
        )
        .select(
            "correlation_id",
            "action",
            "mode",
            F.col("ts.exchangeType").alias("exchange_type"),
            F.explode("ts.tokens").alias("token"),
        )
    )


def apply_subscribe_message(
    decoded: DataFrame, spark: SparkSession, message: str
) -> DataFrame:
    """Wire the parsed control message into the data path: keep only
    ticks for subscribed tokens at >= the subscribed mode. The spec is
    control-channel sized, so it lands as an IN-list predicate through
    :func:`subscription_filter` (pushable into keyed scans)."""
    from angelone_clickhouse_spark.streaming.ingest import subscription_filter

    spec = parse_subscribe_request(spark, message).filter(
        F.col("action") == SUBSCRIBE_ACTION
    )
    rows = spec.select("token", "mode").collect()
    if not rows:
        return decoded.limit(0)
    tokens = sorted({r.token for r in rows})
    min_mode = min(r.mode for r in rows)
    return subscription_filter(decoded, tokens, min_mode=min_mode)


def reference_request_dict(
    tokens_by_exchange: dict[int, list[str]],
    correlation_id: str = "ws_test",
    mode: int = QUOTE_MODE,
) -> dict:
    """The reference's SubscribeRequest as a Python dict (for tests to
    compare against the built JSON): angel/types.go:13-27 field names,
    sorted the way build_subscribe_request sorts."""
    return {
        "correlationID": correlation_id,
        "action": SUBSCRIBE_ACTION,
        "params": {
            "mode": mode,
            "tokenList": [
                {"exchangeType": et, "tokens": sorted(ts)}
                for et, ts in sorted(tokens_by_exchange.items())
            ],
        },
    }


def roundtrip_equal(spark: SparkSession, message: str) -> bool:
    """build -> parse -> rebuild fixed-point check used by tests."""
    parsed = parse_subscribe_request(spark, message)
    rebuilt = (
        parsed.groupBy("correlation_id", "action", "mode", "exchange_type")
        .agg(F.array_sort(F.collect_list("token")).alias("tokens"))
        .groupBy("correlation_id", "action", "mode")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("exchange_type").alias("exchangeType"),
                        F.col("tokens"),
                    )
                )
            ).alias("tokenList")
        )
        .select(
            F.to_json(
                F.struct(
                    F.col("correlation_id").alias("correlationID"),
                    F.col("action"),
                    F.struct("mode", "tokenList").alias("params"),
                )
            ).alias("msg")
        )
    )
    return json.loads(rebuilt.collect()[0].msg) == json.loads(message)
