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
# green driver row sits inside that window; queries with a green
# CORRECTNESS_r02 row on record rotate behind position 50 (kept registered —
# they still run in bench.py and pytest).
#
# Window layout: (a) the 9 queries that FAILED in CORRECTNESS_r01 and whose
# fixes were never driver-confirmed, (b) never-driver-checked round-2 ops,
# (c) new round-3 ops, (d) representative proven queries to fill to 50.
_PRIORITY = [
    # (a) r01 FAIL, fix unconfirmed by driver
    "text_langid",
    "text_fingerprint",
    "sessionize_events",
    "multimodal_features",
    "dedup_embedding_fast",
    "ann_topk_fast",
    "distinct_tokens_approx",
    "decode_ticks_enriched",
    "decode_ticks",
    # (b) registered round 2, never driver-checked
    "value_dispersion",
    "salted_user_stats",
    "decontaminate_ngrams",
    "decontaminate_hashed",
    "sample_stratified",
    "quality_quantile_gate",
    "sequence_pack",
    "doc_repetition",
    "dataset_split",
    "corpus_top_tokens",
    "pii_redact",
    "resample_ffill",
    "asof_price_lookup",
    "map_functions",
    "tick_interval_join",
    # (b') r01 pass but outside the r02 window — re-earn a green row
    "json_extract_events",
    "event_type_funnel",
    "event_sliding_windows",
    "multimodal_meta",
    "scalar_functions",
    "distinct_tokens",
    "price_percentiles",
    "minute_bars",
    # (c) new round-3 ops (names registered later this round; absent names
    # are skipped harmlessly)
    "gap_sessions",
    "kmeans_assign",
    "ingest_load_shed",
    "ann_topk_quantized",
    "idle_rich_customers",
    "min_cost_suppliers",
    "cap_per_source",
    "vwap_daily",
    "twap_hourly",
    "weekly_retention",
    "sql_grouping_sets",
    "price_histogram",
    "price_outliers",
    "fuzzy_prefix_pairs",
    "orders_monthly_growth",
    # (d) representative proven queries (green r02 rows) filling to 50
    "q1_latest_tick",
    "q5_daily_ohlcv",
    "q8_token_stats",
    "enrich_tokens_join",
    "tokens_by_exchange",
    "pricing_summary",
    "revenue_rollup",
    "event_type_pivot",
    "customer_order_ranks",
    "shipping_priority",
    "nation_profit",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "ann_topk_cosine",
    "ann_ivf_topk",
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
