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
# The driver's correctness gate checks only the FIRST 50 queries()
# entries, so this list is the rotation schedule: each round it holds
# (a) every op whose code changed that round (must re-earn a driver
# row), (b) overdue rotation debt, and (c) the registry names whose
# last green driver row is oldest. Entries outside the window keep
# their value-parity guarantee via tests/test_full_parity.py at
# sf0.001 and tools/check_parity.py runs at larger SFs.
_PRIORITY = [
    # r11 window = (a) new this round, (b) ops whose code or oracle
    # text changed this round (must re-earn a row), (c) the ENTIRE
    # owed r5-stale refresh (after this round no driver row predates
    # r7), (d) the 21 oldest r7-stale names alphabetically. 26 r7
    # names remain for r12 (listed at the bottom).
    # (a) new in r11
    "knn_graph_ann_bucketed",   # NEW: write-once bucketed cell index
    "knn_graph_ann_incremental",  # NEW: base-build + delta-append index
    "ann_topk_bucketed",        # NEW: query top-k over the same index
    "stream_semdedup_lsh",      # NEW: LSH-fronted streaming gate
    "bpe_encode",               # NEW: apply learned merges + OOV
    # (b) code/oracle changed in r11
    "vocab_coverage_curve",     # frozen bucket assignment (ADVICE)
    "bpe_train",                # empty-word guard in _word_freq
    "bpe_merge_pairs",          # empty-word guard in _word_freq
    "vocab_oov_rate",           # empty-word guard in _word_freq
    "knn_graph_ann",            # parametrized oracle builder
    "knn_graph_ann_amplified",  # parametrized oracle builder
    "knn_ann_recall",           # parametrized oracle builder
    "stream_semdedup",          # committer signature change
    # (c) the complete owed r5-stale refresh
    "local_supplier_volume",
    "market_share",
    "max_drawdown",
    "min_cost_suppliers",
    "orders_monthly_growth",
    "pipeline_e2e",
    "price_quantiles_kll",
    "rolling_volatility",
    "ship_latency_classes",
    "small_qty_revenue",
    "source_overlap_matrix",
    "span_dedup_corpus",
    "span_dedup_rewrite",
    "text_fingerprint",
    "top_supplier_revenue",
    "top_tokens_sketch",
    # (d) the 22 oldest r7-stale names (alphabetical)
    "ann_lsh_topk",
    "ann_recall_audit",
    "ann_topk_cosine",
    "ann_topk_fast",
    "asof_price_lookup",
    "cap_per_source",
    "corpus_top_tokens",
    "daily_bars_rollup",
    "dataset_split",
    "dedup_embedding",
    "dedup_exact",
    "dedup_simhash",
    "distinct_tokens",
    "doc_containment",
    "doc_repetition",
    "epoch_cap_events",
    "event_sliding_windows",
    "event_type_funnel",
    "frame_sample",
    "fuzzy_prefix_pairs",
    "gap_sessions",
    # exactly 50 entries above — the driver gate stops there. r12
    # owes the remaining 26 r7-stale names (hourly_bars_rollup was
    # displaced by knn_graph_ann_incremental late in r11):
    # hourly_bars_rollup, ingest_load_shed,
    # json_extract_events, map_functions, minute_bars,
    # multimodal_features, multimodal_meta, pii_redact,
    # price_histogram, price_outliers, price_percentiles,
    # quality_quantile_gate, resample_ffill, salted_user_stats,
    # sample_stratified, scalar_functions, semdedup, sequence_pack,
    # skewed_hot_user_stats, sql_grouping_sets, text_langid,
    # tick_interval_join, twap_hourly, value_dispersion, vwap_daily,
    # weekly_retention.
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
        "angelone_clickhouse_spark.operators.mixing",
        "angelone_clickhouse_spark.operators.vocab",
        "angelone_clickhouse_spark.operators.timeseries",
        "angelone_clickhouse_spark.operators.asof",
        "angelone_clickhouse_spark.operators.finance",
        "angelone_clickhouse_spark.operators.embedding_fast",
        "angelone_clickhouse_spark.functions.scalar",
        "angelone_clickhouse_spark.sql",
        "angelone_clickhouse_spark.sources.token_config",
        "angelone_clickhouse_spark.streaming.batch_equiv",
        "angelone_clickhouse_spark.streaming.docdedup",
        "angelone_clickhouse_spark.streaming.embdedup",
        "angelone_clickhouse_spark.streaming.novelty",
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
