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
# Round-6 window layout (VERDICT r5 items 1, plus this round's edits):
# (a) all 28 entries whose latest green row is CORRECTNESS_r03 — the
#     rotation debt VERDICT r5 named; after this round nothing in the
#     registry is more than two rounds stale,
# (b) the 2 entries NEW this round (skew-stress aggregate, epoch cap),
# (c) every entry whose implementation changed this round and so
#     re-earns its row: the trunc_ntz rewrite (minute/hourly/daily
#     bars, ingest_load_shed, resample_ffill, asof_price_lookup,
#     tick_interval_join), the semdedup broadcast removal, the
#     ANN parameterization (ann_recall_audit/ann_lsh_topk/
#     ann_topk_cosine), and the real-WAV multimodal change
#     (frame_sample; multimodal_meta/features are in (a)),
# (d) 8 filler slots rotating the oldest untouched r4-green entries
#     (dedup family, sessionize, tokens_by_exchange).
# Everything outside the window is still guarded every pytest run by
# tests/test_full_parity at sf0.001.
_PRIORITY = [
    # (a) r3-green rotation — scalar/relational/event surface
    "scalar_functions",
    "map_functions",
    "distinct_tokens",
    "price_percentiles",
    "value_dispersion",
    "json_extract_events",
    "sql_grouping_sets",
    "salted_user_stats",
    "weekly_retention",
    "event_type_funnel",
    "event_sliding_windows",
    "gap_sessions",
    # (a) r3-green rotation — timeseries / finance
    "vwap_daily",
    "twap_hourly",
    "price_histogram",
    "price_outliers",
    # (a) r3-green rotation — LLM pipeline / curation / text
    "corpus_top_tokens",
    "sequence_pack",
    "doc_repetition",
    "dataset_split",
    "pii_redact",
    "cap_per_source",
    "quality_quantile_gate",
    "sample_stratified",
    "text_langid",
    # (a) r3-green rotation — similarity / multimodal
    "ann_topk_fast",
    "multimodal_meta",
    "multimodal_features",
    # (b) new this round
    "skewed_hot_user_stats",
    "epoch_cap_events",
    "doc_containment",
    # (c) re-earn: trunc_ntz rewrite touched these plans
    "minute_bars",
    "hourly_bars_rollup",
    "daily_bars_rollup",
    "ingest_load_shed",
    "resample_ffill",
    "asof_price_lookup",
    "tick_interval_join",
    # (c) re-earn: semdedup join change, ANN parameterization,
    #     real-WAV decode path, fuzzy collapse rewrite
    "fuzzy_prefix_pairs",
    "semdedup",
    "ann_recall_audit",
    "ann_lsh_topk",
    "ann_topk_cosine",
    "frame_sample",
    # (d) oldest untouched r4-green rotation filler
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_embedding",
    # sessionize_events and tokens_by_exchange rotate next round:
    # displaced by doc_containment and the fuzzy_prefix_pairs re-earn
    # so new/changed surface gets driver rows this round
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
