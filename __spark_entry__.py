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


# The driver's end-of-round correctness gate checks the FIRST 50 registry
# entries only.  Order the registry so every query that has never earned a
# green driver row — or whose implementation changed since its last green
# row — sits inside that window; everything else rotates behind position 50
# (kept registered: they still run in bench.py, pytest, and check_parity).
#
# Round-4 window layout (VERDICT r3 items 1, 2, 4):
# (a) the one red r3 row (sessionize_events, fixed this round) plus the
#     queries whose implementation changes this round and must re-earn a
#     row (fuzzy_prefix_pairs reblocked; distinct_tokens_approx and
#     kmeans_refine converted from rows-only to full-oracle),
# (b) all 46 remaining queries whose latest green row is CORRECTNESS_r02 —
#     two rounds of refactors old — so every registry entry ends round 4
#     with a green row no older than one round.
_PRIORITY = [
    # (a) red r3 / changed this round
    "sessionize_events",
    "fuzzy_prefix_pairs",
    "distinct_tokens_approx",
    "kmeans_refine",
    # (b) r2-green rotation: declared query surface + joins
    "q2_daily_stats",
    "q3_recency_check",
    "q4_latest_prices",
    "q6_volume_profile",
    "q7_sample",
    "enrich_tokens_join",
    "tokens_by_exchange",
    "unknown_exchange_tokens",
    # (b) r2-green rotation: relational / TPC-H battery
    "pricing_summary",
    "revenue_rollup",
    "event_type_pivot",
    "customer_order_ranks",
    "shipping_priority",
    "nation_profit",
    "order_priority_cube",
    "trailing_activity_range",
    "event_type_unpivot",
    "revenue_by_nation",
    "top_customers",
    "union_nationkeys",
    "customers_without_orders",
    "customers_with_urgent_orders",
    "customer_balance_quartiles",
    "orders_above_nation_avg",
    "late_shipment_priorities",
    "volume_shipping",
    "returned_item_revenue",
    "promo_revenue_share",
    "parts_supplier_counts",
    "large_orders",
    "disjunctive_revenue",
    "supplier_late_blame",
    # (b) r2-green rotation: dedup / similarity / text
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_clusters_minhash",
    "ann_topk_cosine",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "text_token_stats",
    "text_tokenize_regex",
    "text_quality",
    "text_lang_stats",
]


def _reorder(d: dict) -> dict:
    """Priority names first (in _PRIORITY order), then the rest in
    registration order."""
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


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
        "angelone_clickhouse_spark.operators.finance",
        "angelone_clickhouse_spark.operators.embedding_fast",
        "angelone_clickhouse_spark.functions.scalar",
        "angelone_clickhouse_spark.sql",
        "angelone_clickhouse_spark.sources.token_config",
        "angelone_clickhouse_spark.streaming.batch_equiv",
        "angelone_clickhouse_spark.streaming.stream_join",
        "angelone_clickhouse_spark.streaming.sessions",
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
    return _reorder(q), _reorder(o)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    return _registries()[1]
