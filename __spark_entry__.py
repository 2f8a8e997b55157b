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
# Round-5 window layout (VERDICT r4 items 1, 2):
# (a) the 9 queries added late in round 4 that have never earned a driver
#     CORRECTNESS row, plus every query NEW this round (sections a–a3:
#     sketches, rollups, the TPC-H battery completion, the LLM-pipeline
#     additions) — in the window NOW so new surface earns driver rows
#     the round it ships (the r4 gap this verdict flagged),
# (b) dedup_clusters_minhash — r4-green but its materialization helper
#     moved/changed this round (materialize.py), so it re-earns its row,
# (c) 19 of the 47 queries whose latest green row is CORRECTNESS_r03
#     (includes every one whose code the checkpoint_dir threading
#     touched: decontaminate_ngrams/_hashed). The 28 deferred to round 6
#     (scalar_functions, map_functions, distinct_tokens,
#     price_percentiles, value_dispersion, json_extract_events,
#     corpus_top_tokens, multimodal_meta, sql_grouping_sets,
#     salted_user_stats, vwap_daily, twap_hourly, price_histogram,
#     price_outliers, sequence_pack, doc_repetition, dataset_split,
#     pii_redact, cap_per_source, quality_quantile_gate,
#     weekly_retention, event_type_funnel, event_sliding_windows,
#     gap_sessions, sample_stratified,
#     ann_topk_fast, text_langid, multimodal_features) are untouched
#     stable entries, still guarded every pytest run by
#     tests/test_full_parity.
_PRIORITY = [
    # (a) never-driver-verified (added late r4) + new this round
    "dedup_survivors",
    "chunk_documents",
    "decontaminate_fingerprint",
    "event_transitions",
    "frame_sample",
    "top_tokens_sketch",
    "price_quantiles_kll",
    "distinct_users_theta",
    "hourly_bars_rollup",
    "daily_bars_rollup",
    "distinct_users_hll",
    "doc_unigram_logprob",
    # (a2) new TPC-H shape analogues (added this round) — in the
    #      window so they earn driver rows the round they ship.
    #      With these nine, all 22 classic TPC-H shapes have a
    #      fixture-expressible analogue in the registry.
    "forecast_revenue",
    "ship_latency_classes",
    "customer_order_distribution",
    "small_qty_revenue",
    "local_supplier_volume",
    "market_share",
    "important_brands",
    "top_supplier_revenue",
    "dominant_part_suppliers",
    # (a3) new LLM-pipeline ops (added this round): SemDeDup,
    #      CCNet-style corpus span dedup, cross-source contamination
    "semdedup",
    "span_dedup_corpus",
    "source_overlap_matrix",
    "doc_bigram_logprob",
    "max_drawdown",
    "rolling_volatility",
    "pipeline_e2e",
    "span_dedup_rewrite",
    "ann_recall_audit",
    # (b) re-earn after materialize refactor
    "dedup_clusters_minhash",
    # (c) r3-green rotation: declared query surface
    "q1_latest_tick",
    "q5_daily_ohlcv",
    "q8_token_stats",
    # (c) r3-green rotation: relational / window / skew
    "orders_monthly_growth",
    "idle_rich_customers",
    "min_cost_suppliers",
    # (c) r3-green rotation: similarity / text / multimodal
    "kmeans_assign",
    "ann_topk_quantized",
    "dedup_embedding_fast",
    "text_fingerprint",
    # (c) r3-green rotation: LLM pipeline / curation
    "decontaminate_ngrams",
    "decontaminate_hashed",
    # (c) r3-green rotation: timeseries / finance — resample/asof
    #     changed this round (trunc_ntz), so they re-earn rows
    "resample_ffill",
    "asof_price_lookup",
    # (c) r3-green rotation: decode / streaming twins
    "decode_ticks",
    "decode_ticks_enriched",
    "minute_bars",
    "ingest_load_shed",
    "tick_interval_join",
    # gap_sessions (r3-green, unchanged) deferred to the round-6
    # rotation with the other stable entries to keep the window at 50
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
