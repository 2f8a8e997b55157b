"""Accuracy gates for the sketch-based scalar aggregates.

The exact variants (distinct_tokens, price_percentiles) are
oracle-checked by the driver; the approx variants are rows-only there
because sketch internals are engine-specific — THESE tests are their
value-level contract: bounded relative error against the exact result
on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from angelone_clickhouse_spark.functions.scalar import (
    distinct_tokens,
    distinct_tokens_approx,
)
from angelone_clickhouse_spark.sources.tables import ticks

HLL_RSD = 0.02  # rsd passed to approx_count_distinct in scalar.py


def test_hll_distinct_within_3_rsd(spark, sf_dir):
    """HyperLogLog++ standard error is rsd; 3·rsd is a ~99.7% bound.
    The query now emits the bound verdict itself (driver-hashable);
    assert both the verdict column and the underlying exact count."""
    exact = distinct_tokens(spark, sf_dir).collect()[0].n_tokens_exact
    row = distinct_tokens_approx(spark, sf_dir).collect()[0]
    assert row.n_tokens_exact == exact
    assert row.approx_within_3rsd is True


def test_percentile_approx_within_rank_error(spark, sf_dir):
    """percentile_approx(acc=10000) guarantees RANK error <= n/acc (it
    returns an existing value near the target rank). Value distance to
    the exact percentile is meaningless when adjacent order statistics
    are far apart, so the gate is rank-based: the approx result must
    lie between the exact percentiles at q ± slack, where slack covers
    the sketch's rank error plus the one-order-stat gap between
    nearest-rank (approx) and interpolation (exact) semantics."""
    t = ticks(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n")]
    for q in (0.5, 0.95):
        tag = str(q).replace(".", "")
        aggs += [
            F.expr(
                f"percentile_approx(last_traded_price, {q}, 10000)"
            ).alias(f"approx_{tag}"),
        ]
    per_token = {r["token"]: r for r in t.groupBy("token").agg(*aggs).collect()}
    for q in (0.5, 0.95):
        tag = str(q).replace(".", "")
        bounds = {
            r["token"]: r
            for r in t.groupBy("token")
            .agg(
                *[
                    F.expr(
                        f"percentile(last_traded_price, "
                        f"{max(0.0, min(1.0, q + s))})"
                    ).alias(name)
                    for name, s in (("lo", -0.002), ("hi", +0.002))
                ]
            )
            .collect()
        }
        for token, r in per_token.items():
            slack = 1.0 / 10000 + 2.0 / r["n"]  # sketch + order-stat gap
            lo = t.filter(F.col("token") == token)
            b = bounds[token]
            approx = r[f"approx_{tag}"]
            # widen the exact bounds by the per-group slack in rank
            # space: recompute only when the static ±0.002 is too tight
            if not (b["lo"] - 1e-9 <= approx <= b["hi"] + 1e-9):
                wide = lo.agg(
                    F.expr(
                        f"percentile(last_traded_price, {max(0.0, q - slack)})"
                    ).alias("lo"),
                    F.expr(
                        f"percentile(last_traded_price, {min(1.0, q + slack)})"
                    ).alias("hi"),
                ).collect()[0]
                assert wide["lo"] - 1e-9 <= approx <= wide["hi"] + 1e-9, (
                    token, q, approx, wide["lo"], wide["hi"], r["n"]
                )


def test_cms_one_sided_and_python_reference(spark, sf_dir):
    """Rebuild the D x W counter table in plain Python and compare
    every probed token's estimate exactly; the CMS guarantee is
    one-sided (estimate >= exact, always)."""
    import hashlib
    from collections import Counter

    from angelone_clickhouse_spark.functions.scalar import (
        CMS_D,
        CMS_TOP,
        CMS_W,
        token_freq_cms,
    )

    toks = []
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        toks.extend(r.text.split(" "))

    def bucket(d, tok):
        return (
            int(hashlib.md5(f"{d}:{tok}".encode()).hexdigest()[:15], 16)
            % CMS_W
        )

    cells = Counter()
    for t in toks:
        for d in range(CMS_D):
            cells[(d, bucket(d, t))] += 1
    exact = Counter(toks)
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOP]
    got = {r.token: r for r in token_freq_cms(spark, sf_dir).collect()}
    assert set(got) == {t for t, _ in top}
    for t, c in top:
        est = min(cells[(d, bucket(d, t))] for d in range(CMS_D))
        r = got[t]
        assert (r.exact_c, r.cms_est, r.overestimate) == (c, est, est - c)
        assert r.cms_est >= r.exact_c


def test_stream_cms_equals_batch(spark, sf_dir):
    """Counter addition commutes, so the epoch-merged streaming sketch
    must equal the one-pass batch sketch row-for-row — the merge law
    that makes CMS shippable across shards and triggers."""
    from angelone_clickhouse_spark.functions.scalar import token_freq_cms
    from angelone_clickhouse_spark.streaming.sketch import stream_token_cms

    batch = {
        r.token: (r.exact_c, r.cms_est, r.overestimate)
        for r in token_freq_cms(spark, sf_dir).collect()
    }
    stream = {
        r.token: (r.exact_c, r.cms_est, r.overestimate)
        for r in stream_token_cms(spark, sf_dir).collect()
    }
    assert stream == batch
