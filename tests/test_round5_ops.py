"""Invariant tests for the round-5 operators, beyond the value-hash
parity that tests/test_full_parity.py already provides: each pins a
semantic property that would survive an (unlikely) twin bug in the
DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_span_dedup_counts_are_consistent(spark, sf_dir):
    from angelone_clickhouse_spark.operators.curation import (
        span_dedup_corpus,
    )

    rows = span_dedup_corpus(spark, sf_dir).collect()
    assert rows, "every doc has at least one span"
    assert all(0 <= r.n_dup_spans <= r.n_spans for r in rows)
    # spans are non-overlapping 3-word windows: ceil(words / 3) each
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows:
        n_words = len(docs[r.doc_id].split(" "))
        assert r.n_spans == -(-n_words // 3), (r.doc_id, n_words, r.n_spans)


def test_span_rewrite_keeps_unique_docs_intact(spark, sf_dir):
    """A doc with zero corpus-common spans must round-trip unchanged,
    and kept-span counts must agree between the accounting op and the
    rewrite op."""
    from angelone_clickhouse_spark.operators.curation import (
        span_dedup_corpus,
        span_dedup_rewrite,
    )

    acct = {r.doc_id: r for r in span_dedup_corpus(spark, sf_dir).collect()}
    rewritten = {
        r.doc_id: r for r in span_dedup_rewrite(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for doc_id, a in acct.items():
        kept = a.n_spans - a.n_dup_spans
        if kept == 0:
            assert doc_id not in rewritten
            continue
        r = rewritten[doc_id]
        assert r.n_kept_spans == kept, doc_id
        if a.n_dup_spans == 0:
            assert r.clean_text == docs[doc_id], doc_id


def test_semdedup_keeps_every_cluster_min(spark, sf_dir):
    """The lowest vec_id of each cluster can have no lower-id
    cluster-mate, so it can never be marked duplicate; and verdicts
    must cover the whole corpus exactly once."""
    from angelone_clickhouse_spark.operators.similarity import semdedup

    rows = semdedup(spark, sf_dir).collect()
    n_corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_corpus
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cent_id, []).append(r)
    for members in by_cluster.values():
        lead = min(members, key=lambda r: r.vec_id)
        assert not lead.is_dup, lead


def test_pipeline_e2e_funnel_is_monotonic(spark, sf_dir):
    from angelone_clickhouse_spark.operators.pipeline import pipeline_e2e

    rows = sorted(pipeline_e2e(spark, sf_dir).collect(), key=lambda r: r.stage_idx)
    assert [r.stage for r in rows] == [
        "input",
        "exact_dedup",
        "decontaminated",
        "quality_gate",
    ]
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    assert counts[0] > 0


def test_max_drawdown_bounds(spark, sf_dir):
    from angelone_clickhouse_spark.operators.finance import max_drawdown

    rows = max_drawdown(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_drawdown >= 0.0
        # a drawdown deeper than the peak would mean a negative price
        assert r.max_drawdown <= r.peak_price + 1e-9, r


def test_rolling_volatility_bounds(spark, sf_dir):
    from angelone_clickhouse_spark.operators.finance import (
        VOLA_N,
        rolling_volatility,
    )

    rows = rolling_volatility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_window <= VOLA_N
        assert r.var_cents2 >= 0.0, r


def test_bar_family_is_session_timezone_independent(spark, sf_dir):
    """date_trunc on a TIMESTAMP_NTZ input interprets it in the
    session zone and returns an instant, so bar labels used to shift
    with spark.sql.session.timeZone (the sessionize NTZ lesson).
    trunc_ntz must make every bar level identical under any zone."""
    from angelone_clickhouse_spark.operators.asof import asof_price_lookup
    from angelone_clickhouse_spark.operators.finance import (
        twap_hourly,
        vwap_daily,
    )
    from angelone_clickhouse_spark.operators.timeseries import resample_ffill
    from angelone_clickhouse_spark.streaming.batch_equiv import (
        daily_bars_rollup,
        hourly_bars_rollup,
        ingest_load_shed,
        minute_bars_batch,
    )

    def snapshot():
        out = {}
        for fn in (
            minute_bars_batch,
            hourly_bars_rollup,
            daily_bars_rollup,
            ingest_load_shed,
            resample_ffill,
            asof_price_lookup,
            twap_hourly,
            vwap_daily,
        ):
            rows = fn(spark, sf_dir).collect()
            out[fn.__name__] = sorted(map(tuple, rows))
        return out

    tz = spark.conf.get("spark.sql.session.timeZone")
    utc = snapshot()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = snapshot()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    for name in utc:
        assert utc[name] == ny[name], name


def test_trunc_ntz_matches_python_floor(spark):
    """trunc_ntz must equal naive Python datetime flooring for every
    unit, on a deterministic pseudo-random grid that includes exact
    boundaries, one-microsecond-before-boundary values, and leap-day
    neighborhoods — under BOTH a UTC and a non-UTC session zone."""
    import datetime as dt
    import random

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    vals = [base + dt.timedelta(seconds=rng.randrange(0, 120 * 86400),
                                microseconds=rng.randrange(0, 1_000_000))
            for _ in range(300)]
    vals += [
        dt.datetime(2024, 2, 29, 0, 0, 0),
        dt.datetime(2024, 2, 29, 23, 59, 59, 999999),
        dt.datetime(2024, 3, 1, 0, 0, 0),
        dt.datetime(2024, 6, 15, 13, 0, 0),
        dt.datetime(2024, 6, 15, 13, 59, 59, 999999),
    ]

    def pyfloor(t: dt.datetime, unit: str) -> dt.datetime:
        if unit == "MINUTE":
            return t.replace(second=0, microsecond=0)
        if unit == "HOUR":
            return t.replace(minute=0, second=0, microsecond=0)
        return t.replace(hour=0, minute=0, second=0, microsecond=0)

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType, TimestampNTZType

    from angelone_clickhouse_spark.sources.tables import trunc_ntz

    df = spark.createDataFrame(
        [(v,) for v in vals],
        StructType([StructField("ts", TimestampNTZType())]),
    )
    out_cols = [trunc_ntz(u, "ts").alias(u) for u in ("MINUTE", "HOUR", "DAY")]
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for zone in (tz, "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", zone)
            rows = df.select("ts", *out_cols).collect()
            for r in rows:
                for u in ("MINUTE", "HOUR", "DAY"):
                    assert r[u] == pyfloor(r["ts"], u), (zone, u, r)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_source_overlap_matrix_is_upper_triangle(spark, sf_dir):
    from angelone_clickhouse_spark.operators.curation import (
        source_overlap_matrix,
    )

    rows = source_overlap_matrix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_common >= 1


def test_ewma_price_matches_python_reference(spark, sf_dir):
    """Replay the truncated-EWMA arithmetic in plain Python over the
    same (ts, sequence_number)-ordered cent prices per token and
    compare every row exactly; the smoothing invariant (EWMA lies
    within the frame's [min, max]) rides along."""
    from angelone_clickhouse_spark.operators.finance import (
        EWMA_W,
        ewma_price,
    )
    from angelone_clickhouse_spark.sources.tables import ticks

    px = (
        ticks(spark, sf_dir)
        .selectExpr(
            "token",
            "ts",
            "sequence_number",
            "cast(round(last_traded_price * 100) as bigint) as c",
        )
        .collect()
    )
    by_token = {}
    for r in sorted(px, key=lambda r: (r.token, r.ts, r.sequence_number)):
        by_token.setdefault(r.token, []).append((r.sequence_number, r.c))
    expected = {}
    for tok, seq in by_token.items():
        for i, (sn, _) in enumerate(seq):
            frame = [c for _, c in seq[max(0, i - EWMA_W + 1) : i + 1]]
            num = sum(c * (1 << j) for j, c in enumerate(frame))
            den = (1 << len(frame)) - 1
            expected[(tok, sn)] = (len(frame), (num // den) / 100.0)
    got = {
        (r.token, r.sequence_number): (r.n_window, r.ewma)
        for r in ewma_price(spark, sf_dir).collect()
    }
    assert got == expected
    for (tok, sn), (m, e) in got.items():
        frame = [
            c
            for _, c in by_token[tok][
                max(0, [s for s, _ in by_token[tok]].index(sn) - EWMA_W + 1) : [
                    s for s, _ in by_token[tok]
                ].index(sn)
                + 1
            ]
        ]
        assert min(frame) / 100.0 - 0.01 <= e <= max(frame) / 100.0
