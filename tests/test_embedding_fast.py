from __future__ import annotations

from angelone_clickhouse_spark.operators.dedup import dedup_embedding
from angelone_clickhouse_spark.operators.embedding_fast import (
    ann_topk_fast,
    dedup_embedding_fast,
)
from angelone_clickhouse_spark.operators.similarity import ann_topk_cosine


def test_fast_pairs_equal_exact(spark, sf_dir):
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim for r in dedup_embedding(spark, sf_dir).collect()
    }
    fast = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in dedup_embedding_fast(spark, sf_dir).collect()
    }
    assert set(exact) == set(fast)
    for k in exact:
        assert abs(exact[k] - fast[k]) <= 1e-6  # identical after round(6)


def test_fast_topk_equal_exact(spark, sf_dir):
    exact = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in ann_topk_cosine(spark, sf_dir).collect()
    )
    fast = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in ann_topk_fast(spark, sf_dir).collect()
    )
    assert [t[:3] for t in exact] == [t[:3] for t in fast]
    for a, b in zip(exact, fast):
        assert abs(a[3] - b[3]) <= 1e-6


def test_approx_distinct_within_rsd(spark, sf_dir):
    from angelone_clickhouse_spark.functions.scalar import (
        distinct_tokens,
        distinct_tokens_approx,
    )

    exact = distinct_tokens(spark, sf_dir).collect()[0].n_tokens_exact
    approx = distinct_tokens_approx(spark, sf_dir).collect()[0].n_tokens_approx
    assert abs(approx - exact) / exact <= 0.1
