"""Physical-plan assertions for the scale-design claims the docstrings
make: broadcasts where broadcasts are promised, no shuffle where
shuffle-freedom is promised. A regression here is a 100 TB incident
even when sf0.001 results stay correct.
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sample_stratified_is_shuffle_free(spark, sf_dir):
    from angelone_clickhouse_spark.operators.pipeline import sample_stratified

    plan = _plan(sample_stratified(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    from angelone_clickhouse_spark.operators.pipeline import (
        decontaminate_ngrams,
    )

    plan = _plan(decontaminate_ngrams(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_ivf_assignment_and_probe_joins_are_broadcast(spark, sf_dir):
    from angelone_clickhouse_spark.operators.similarity import ann_ivf_topk

    plan = _plan(ann_ivf_topk(spark, sf_dir))
    # centroid assignment + probe join: no SortMergeJoin anywhere
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_exact_topk_scores_map_side(spark, sf_dir):
    from angelone_clickhouse_spark.operators.similarity import ann_topk_cosine

    plan = _plan(ann_topk_cosine(spark, sf_dir))
    # the corpus is never shuffled for scoring: the only exchange is
    # the final per-query top-k partitioning
    assert "SortMergeJoin" not in plan, plan


def test_quantized_ann_scores_map_side(spark, sf_dir):
    from angelone_clickhouse_spark.operators.similarity import ann_topk_quantized

    plan = _plan(ann_topk_quantized(spark, sf_dir))
    # queries broadcast; the corpus is never shuffled for candidate
    # generation (same contract as the exact op)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_vwap_single_exchange(spark, sf_dir):
    from angelone_clickhouse_spark.operators.finance import vwap_daily

    plan = _plan(vwap_daily(spark, sf_dir))
    # one partial+final hash aggregate -> exactly one shuffle
    assert plan.count("Exchange") == 1, plan


def test_min_cost_suppliers_dim_joins_broadcast(spark, sf_dir):
    from angelone_clickhouse_spark.operators.tpch_extra import min_cost_suppliers

    plan = _plan(min_cost_suppliers(spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan


def test_q5_q8_only_fact_join_shuffles(spark, sf_dir):
    """Q5/Q8 analogues promise all dims broadcast: the only join
    allowed to shuffle is lineitem⋈orders (fact⋈fact)."""
    from angelone_clickhouse_spark.operators.tpch_extra import (
        local_supplier_volume,
        market_share,
    )

    for fn in (local_supplier_volume, market_share):
        plan = _plan(fn(spark, sf_dir))
        assert plan.count("SortMergeJoin") <= 1, plan
        assert "BroadcastHashJoin" in plan, plan


def test_scalar_subquery_analogues_broadcast_the_scalar(spark, sf_dir):
    """Q11/Q15 shapes: the global-aggregate side (1 row) must come
    back as a broadcast, never a shuffled join."""
    from angelone_clickhouse_spark.operators.tpch_extra import (
        important_brands,
        top_supplier_revenue,
    )

    for fn in (important_brands, top_supplier_revenue):
        plan = _plan(fn(spark, sf_dir))
        assert "SortMergeJoin" not in plan, plan
        assert (
            "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        ), plan


def test_dominant_suppliers_semi_join_no_fact_smj(spark, sf_dir):
    """Q20 shape: per-part totals and the dominant-supplier semi-join
    are UNHINTED under the r16 hint policy (both sides are
    SF-proportional), so the STATIC plan may sort-merge them — the
    promise is that AQE's runtime size stats convert those joins to
    broadcast at any scale where the side fits. Assert on the FINAL
    adaptive plan after execution."""
    from angelone_clickhouse_spark.operators.tpch_extra import (
        dominant_part_suppliers,
    )

    df = dominant_part_suppliers(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # the final (isFinalPlan=true) section precedes the initial-plan
    # echo in toString(); cut at the "+- == Initial Plan ==" marker
    final = final.split("Initial Plan")[0]
    assert "SortMergeJoin" not in final, final


def test_drawdown_and_volatility_share_one_shuffle(spark, sf_dir):
    """Both ops promise the cumulative window and the final aggregate
    share ONE token-keyed exchange — the TWAP device."""
    from angelone_clickhouse_spark.operators.finance import (
        max_drawdown,
        rolling_volatility,
    )

    for fn in (max_drawdown, rolling_volatility):
        plan = _plan(fn(spark, sf_dir))
        assert plan.count("Exchange") == 1, (fn.__name__, plan)


def test_recall_audit_no_cartesian(spark, sf_dir):
    """The audit join must stay keyed on (query_id, neighbor_id) —
    a nested-loop over the two k·|queries| sides would silently become
    quadratic in k."""
    from angelone_clickhouse_spark.operators.similarity import (
        ann_recall_audit,
    )

    plan = _plan(ann_recall_audit(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_fuzzy_pairs_join_key_is_content_derived(spark, sf_dir):
    """VERDICT r3 #3: the fuzzy-match candidate join must key on the
    PassJoin segment CONTENT (sub), not only on the (lang, lb) block —
    block-only keys make candidate pairs quadratic in corpus size."""
    from angelone_clickhouse_spark.operators.text import fuzzy_prefix_pairs

    df = fuzzy_prefix_pairs(spark, sf_dir)
    plan = _plan(df)
    import re

    join_lines = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "doc_id_a" in ln
    ]
    assert join_lines, plan
    # the equi-join key list of the candidate join must include the
    # segment substring column alongside the block columns — and as
    # distinct attributes per side: same-lineage self-joins can
    # silently degrade to trivially-true predicates otherwise
    assert any(
        re.search(r"\bsub_a#", ln) and re.search(r"\bsub_b#", ln)
        and re.search(r"\blb_a#", ln) and re.search(r"\blb_b#", ln)
        for ln in join_lines
    ), join_lines
