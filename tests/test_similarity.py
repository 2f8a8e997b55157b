from __future__ import annotations

from angelone_clickhouse_spark.operators.similarity import (
    TOP_K,
    ann_lsh_topk,
    ann_topk_cosine,
)


def test_exact_topk_shape(spark, sf_dir):
    rows = ann_topk_cosine(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, TOP_K + 1))
        sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rs)


def test_lsh_results_are_subset_quality(spark, sf_dir):
    """LSH neighbors must carry correct cosine values (same scoring
    path) and respect the rank contract; recall vs exact is reported,
    not asserted hard (it is an approximation)."""
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in ann_topk_cosine(spark, sf_dir).collect()
    }
    lsh = ann_lsh_topk(spark, sf_dir).collect()
    assert lsh, "LSH should return candidates at this corpus size"
    for r in lsh:
        if (r.query_id, r.neighbor_id) in exact:
            assert abs(exact[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9
    hits = sum(1 for r in lsh if (r.query_id, r.neighbor_id) in exact)
    recall = hits / len(exact)
    # same-bucket neighbors are biased toward high cosine; any overlap
    # at 500 vectors/16 buckets shows the bucketing works
    assert recall > 0.1


def test_ivf_results_quality(spark, sf_dir):
    """IVF neighbors carry exact cosine values, respect the rank
    contract, and come only from the probed lists; recall vs exact is
    reported with a floor (approximation, but probing 2/8 lists of a
    clustered fixture should find a decent share)."""
    from angelone_clickhouse_spark.operators.similarity import ann_ivf_topk

    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in ann_topk_cosine(spark, sf_dir).collect()
    }
    ivf = ann_ivf_topk(spark, sf_dir).collect()
    assert ivf, "IVF should return candidates"
    by_q = {}
    for r in ivf:
        by_q.setdefault(r.query_id, []).append(r)
        if (r.query_id, r.neighbor_id) in exact:
            assert abs(exact[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9
    for q, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
    hits = sum(1 for r in ivf if (r.query_id, r.neighbor_id) in exact)
    assert hits / len(exact) > 0.1


def test_kmeans_refine_invariants(spark):
    """Lloyd iterations must (a) keep the assignment a partition of
    the corpus, (b) never increase total inertia, (c) keep at most
    N_CENTROIDS clusters."""
    from angelone_clickhouse_spark.operators.similarity import (
        N_CENTROIDS,
        kmeans_refine_float,
    )
    from tests.conftest import SF_CORRECT

    def stats(iters):
        rows = kmeans_refine_float(spark, SF_CORRECT, iters=iters).collect()
        return sum(r.n_members for r in rows), sum(r.inertia for r in rows), len(rows)

    n0, inertia0, k0 = stats(0)
    n2, inertia2, k2 = stats(2)
    assert n0 == n2  # every vector assigned exactly once
    assert k0 <= N_CENTROIDS and k2 <= N_CENTROIDS
    # Lloyd monotonicity (allow float-rounding jitter)
    assert inertia2 <= inertia0 + 1e-6
    assert inertia2 < inertia0 * 0.999  # and it actually improved


def test_quantized_topk_recall(spark, sf_dir):
    """int8 quantization perturbs scores by <~1% of |q||n|, so the
    exact re-score over a 3k shortlist should recover nearly all of the
    brute-force top-k; cosine values themselves are exact (float
    re-score path, same expression as the exact op)."""
    from angelone_clickhouse_spark.operators.similarity import ann_topk_quantized

    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in ann_topk_cosine(spark, sf_dir).collect()
    }
    quant = ann_topk_quantized(spark, sf_dir).collect()
    assert quant
    for r in quant:
        if (r.query_id, r.neighbor_id) in exact:
            assert abs(exact[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9
    hits = sum(1 for r in quant if (r.query_id, r.neighbor_id) in exact)
    recall = hits / len(exact)
    assert recall >= 0.8, f"int8 shortlist recall too low: {recall}"


def test_recall_audit_amplified_setting_dominates(spark, sf_dir):
    """The production-grade multi-table row (VERDICT r6 item 4) must
    exist in the audit grid and dominate every single-table setting:
    union-then-exact-rescore means extra tables only ever add recall.
    The >= 0.9 claim itself is measured at sf0.1 (2000 vectors:
    mean recall 0.96 vs 0.48 for the default — see AUDIT_SETTINGS);
    at this fixture's 200 vectors the 5-query mean is 0.84, so the
    gate here is dominance plus a 0.8 floor."""
    import pyspark.sql.functions as F

    from angelone_clickhouse_spark.operators.similarity import (
        ann_recall_audit,
    )

    rows = (
        ann_recall_audit(spark, sf_dir)
        .groupBy("n_planes", "n_flips", "n_tables")
        .agg(F.avg("recall").alias("mean_recall"))
        .collect()
    )
    by_setting = {
        (r.n_planes, r.n_flips, r.n_tables): r.mean_recall for r in rows
    }
    amplified = {k: v for k, v in by_setting.items() if k[2] > 1}
    single = {k: v for k, v in by_setting.items() if k[2] == 1}
    assert amplified, "audit grid lost its multi-table setting"
    best_amp = max(amplified.values())
    assert best_amp >= 0.8
    assert best_amp > max(single.values())


def test_lsh_topk_rejects_out_of_range_flips(spark, sf_dir):
    """A flip on a plane >= n_planes XORs a bit no corpus bucket has —
    the probe can never match. Out-of-range settings must fail loudly
    instead of silently plateauing a recall-tuning sweep."""
    import pytest

    from angelone_clickhouse_spark.operators.similarity import lsh_topk

    with pytest.raises(ValueError, match="n_flips"):
        lsh_topk(spark, sf_dir, n_planes=4, n_flips=6)
    with pytest.raises(ValueError, match="n_flips"):
        lsh_topk(spark, sf_dir, n_planes=4, n_flips=-1)


def test_pq_topk_recall(spark, sf_dir):
    """PQ codes approximate subspace geometry coarsely (16 codewords
    per 8-dim subspace), but ADC ranks well enough that the exact
    re-score over the 3k shortlist recovers most of the brute-force
    top-k; cosine values themselves are exact (float re-score path,
    same expression as the exact op)."""
    from angelone_clickhouse_spark.operators.similarity import ann_topk_pq

    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in ann_topk_cosine(spark, sf_dir).collect()
    }
    pq = ann_topk_pq(spark, sf_dir).collect()
    assert pq
    for r in pq:
        if (r.query_id, r.neighbor_id) in exact:
            assert abs(exact[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9
    hits = sum(1 for r in pq if (r.query_id, r.neighbor_id) in exact)
    recall = hits / len(exact)
    # near-uniform fixture vectors are PQ's worst case (no cluster
    # structure for codewords to exploit); codebook rows drawn from
    # the corpus itself still separate the shortlist from random
    assert recall >= 0.3, f"PQ shortlist recall too low: {recall}"


def test_pq_plan_is_shuffle_free_until_shortlist(spark, sf_dir):
    """Encode + ADC must stay map-side: the only exchanges in the plan
    are the shortlist/rank windows' per-query partitioning and the
    codebook broadcast — no corpus-keyed shuffle, no UDF."""
    from angelone_clickhouse_spark.operators.similarity import ann_topk_pq

    plan = (
        ann_topk_pq(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bucket_cols_bit_identical_to_expr_fold(spark, sf_dir):
    """_bucket_cols (the r16 vectorized pandas-UDF bucketing) must
    reproduce the expr fold's bucket bits EXACTLY for every corpus
    vector and every table — the candidate sets, and hence the
    DuckDB-oracle contract of the whole LSH family, ride on this."""
    from angelone_clickhouse_spark.operators.similarity import (
        _bucket,
        _bucket_cols,
        _vectors,
    )

    n_planes, n_tables = 6, 3
    vecs = _vectors(spark, sf_dir).select("vec_id", "v")
    old = vecs
    for t in range(n_tables):
        old = _bucket(old, n_planes, plane_offset=t * n_planes, out=f"b{t}")
    new = _bucket_cols(vecs, n_planes, n_tables)
    cols = [f"b{t}" for t in range(n_tables)]
    old_rows = {r["vec_id"]: tuple(r[c] for c in cols) for r in old.collect()}
    new_rows = {r["vec_id"]: tuple(r[c] for c in cols) for r in new.collect()}
    assert old_rows == new_rows
