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
    # r14 window = (a) ops whose executed code changed this round
    # (must re-earn a driver row): the count-first CMS cell build
    # (cms_cells), the shingle-stage parallelism spread
    # (dedup.spread_low_parallelism — every minhash/jaccard consumer),
    # the keyed gates (commit_epoch_fused bulk-branch restructure +
    # sweep-ordering hoist), and the graph ops (edge-parameterized
    # core split + oracle-builder parameterization); (b) the ENTIRE
    # owed r10-stale refresh — all 40 names, clearing the rotation
    # debt: after a green r14 no entry's newest driver row predates
    # r11. (a)+(b) is exactly 50. stream_semdedup is NOT in (a): its
    # executed path (commit_epoch_flat brute arm) did not change —
    # only its module sibling's timeout label did.
    # (a) code changed in r14
    "token_freq_cms",           # count-first cms_cells
    "stream_token_cms",         # count-first cms_cells (merge twin)
    "stream_dedup_docs",        # fused-commit restructure + shingle spread
    "stream_novelty_docs",      # fused-commit restructure
    "stream_semdedup_lsh",      # fused-commit restructure + label fix
    "knn_pagerank",             # pagerank_from_edges core split
    "knn_triangles",            # triangles_from_edges core split
    "dedup_ngram_jaccard",      # shingle-stage spread (PPJoin site)
    "dedup_minhash_lsh",        # shingle-stage spread
    "dedup_incremental",        # shingle-stage spread (minhash path)
    # (b) the complete owed r10-stale refresh (rotation_audit order)
    "q1_latest_tick",
    "q5_daily_ohlcv",
    "q8_token_stats",
    "trailing_activity_range",
    "event_type_unpivot",
    "event_type_pivot",
    "union_nationkeys",
    "forecast_revenue",
    "customer_order_distribution",
    "large_orders",
    "disjunctive_revenue",
    "supplier_late_blame",
    "idle_rich_customers",
    "important_brands",
    "dominant_part_suppliers",
    "dedup_clusters",
    "dedup_clusters_minhash",
    "dedup_survivors",
    "kmeans_refine",
    "kmeans_assign",
    "ann_lsh_topk_amplified",
    "ann_topk_quantized",
    "text_tokenize_regex",
    "text_quality",
    "text_lang_stats",
    "event_transitions",
    "decontaminate_ngrams",
    "decontaminate_hashed",
    "decontaminate_fingerprint",
    "chunk_documents",
    "doc_unigram_logprob",
    "doc_bigram_logprob",
    "dedup_embedding_fast",
    "knn_graph",
    "knn_graph_ivf",
    "distinct_tokens_approx",
    "distinct_users_theta",
    "distinct_users_hll",
    "decode_ticks_enriched",
    "decode_ticks",
    # exactly 50 entries above — the driver gate stops there. With
    # the r10 cohort fully re-earned this round, the r15 rotation
    # debt is the r11 cohort (40 names — run tools/rotation_audit.py
    # for the exact latest-green-per-name table), PLUS two r14
    # changed-code entries the full window could not absorb:
    # text_fingerprint and doc_containment (the barrier-spread perf
    # fix; both re-verified green at sf0.01 AND sf0.1 this round —
    # see the r14 commit log), plus whatever r15 changes.
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
        "angelone_clickhouse_spark.operators.layout",
        "angelone_clickhouse_spark.functions.scalar",
        "angelone_clickhouse_spark.sql",
        "angelone_clickhouse_spark.sources.token_config",
        "angelone_clickhouse_spark.streaming.batch_equiv",
        "angelone_clickhouse_spark.streaming.docdedup",
        "angelone_clickhouse_spark.streaming.embdedup",
        "angelone_clickhouse_spark.streaming.novelty",
        "angelone_clickhouse_spark.streaming.sketch",
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
