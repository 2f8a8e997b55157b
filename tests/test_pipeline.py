"""Value-level tests for the training-data pipeline operators
(operators/pipeline.py) beyond the DuckDB oracle differential:
invariants the oracle can't see (packing feasibility, stratum rates,
decontamination ground truth from planted duplicates).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from angelone_clickhouse_spark.operators.pipeline import (
    BENCH_MOD,
    PACK_BUDGET,
    SAMPLE_PCT,
    SAMPLE_PCT_DEFAULT,
    decontaminate_hashed,
    decontaminate_ngrams,
    quality_quantile_gate,
    sample_stratified,
    sequence_pack,
)


def test_decontaminate_flags_planted_duplicates(spark, sf_dir):
    """The documents fixture plants exact duplicates; any training doc
    whose duplicate landed in the benchmark subset MUST be flagged,
    and every flagged doc must not itself be a benchmark doc."""
    hits = decontaminate_ngrams(spark, sf_dir).collect()
    flagged = {r.doc_id for r in hits}
    assert all(d % BENCH_MOD != 0 for d in flagged)
    assert all(r.n_hit_ngrams >= 1 for r in hits)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup_texts = (
        docs.groupBy("text")
        .agg(
            F.collect_set("doc_id").alias("ids"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .collect()
    )
    for row in dup_texts:
        bench_ids = [d for d in row.ids if d % BENCH_MOD == 0]
        train_ids = [d for d in row.ids if d % BENCH_MOD != 0]
        if bench_ids and train_ids:
            # a full duplicate of a benchmark doc shares every gram
            for d in train_ids:
                assert d in flagged, f"doc {d} duplicates benchmark {bench_ids}"


def test_decontaminate_hashed_equals_exact(spark, sf_dir):
    """The 60-bit-hash scale path must reproduce the exact op's output
    at fixture scale (no collisions at these gram counts)."""
    exact = {
        (r.doc_id, r.n_hit_ngrams)
        for r in decontaminate_ngrams(spark, sf_dir).collect()
    }
    hashed = {
        (r.doc_id, r.n_hit_ngrams)
        for r in decontaminate_hashed(spark, sf_dir).collect()
    }
    assert exact == hashed


def test_sample_stratified_rates(spark, sf_dir):
    """Each stratum's sampled share must track its configured rate
    (binomial tolerance), and the selection must be a deterministic
    function of doc_id (same rows on rerun)."""
    s1 = sample_stratified(spark, sf_dir)
    rows = s1.collect()
    assert rows, "sample must be non-empty"
    assert {r.doc_id for r in rows} == {
        r.doc_id for r in sample_stratified(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    kept = {}
    for r in rows:
        kept[r.lang] = kept.get(r.lang, 0) + 1
        pct = SAMPLE_PCT.get(r.lang, SAMPLE_PCT_DEFAULT)
        assert r.bucket < pct
    for lang, total in totals.items():
        pct = SAMPLE_PCT.get(lang, SAMPLE_PCT_DEFAULT)
        expect = total * pct / 100.0
        # 4-sigma binomial window, min slack for tiny strata
        sigma = max((expect * (1 - pct / 100.0)) ** 0.5, 1.0)
        assert abs(kept.get(lang, 0) - expect) <= 4 * sigma + 2, (
            lang, total, kept.get(lang, 0), expect,
        )


def test_quality_gate_keeps_top_half_per_lang(spark, sf_dir):
    out = quality_quantile_gate(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang_total = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    per_lang_kept = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, total in per_lang_total.items():
        kept = per_lang_kept.get(lang, 0)
        # "top half" with rank ties broken by doc_id: ceil(n/2) or
        # (n+1)//2 exactly
        assert kept == (total + 1) // 2, (lang, total, kept)
    # kept docs must dominate dropped docs scorewise within a lang
    joined = out.alias("k")
    mins = out.groupBy("lang").agg(F.min("score_milli").alias("kept_min"))
    all_scored = docs.select(
        "doc_id",
        "lang",
        F.expr(
            "(1000 * size(array_distinct(split(text, ' '))))"
            " div size(split(text, ' '))"
        ).alias("score_milli"),
    )
    kept_ids = {r.doc_id for r in out.collect()}
    dropped_max = {
        r.lang: r.m
        for r in all_scored.filter(~F.col("doc_id").isin(kept_ids))
        .groupBy("lang")
        .agg(F.max("score_milli").alias("m"))
        .collect()
    }
    kept_min = {r.lang: r.kept_min for r in mins.collect()}
    for lang in dropped_max:
        # equality allowed: ties at the median are broken by doc_id
        assert dropped_max[lang] <= kept_min[lang], (
            "a dropped doc outscored a kept doc",
            lang,
        )


def test_sequence_pack_invariants(spark, sf_dir):
    out = sequence_pack(spark, sf_dir).collect()
    assert out
    by_source = {}
    for r in out:
        assert 0 <= r.offset_in_seq < PACK_BUDGET
        assert r.seq_id >= 0
        by_source.setdefault(r.source, []).append(r)
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.seq_id == cum // PACK_BUDGET, (source, r)
            assert r.offset_in_seq == cum % PACK_BUDGET, (source, r)
            cum += r.n_tokens


def test_chunk_documents_covers_every_token(spark, sf_dir):
    """Chunking invariants: chunk 0 starts at token 1; consecutive
    chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE; every token of the
    doc appears in at least one chunk; no chunk exceeds the budget."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )
    from angelone_clickhouse_spark.sources.tables import load_table

    chunks = chunk_documents(spark, sf_dir)
    assert chunks.filter(F.col("n_chunk_tokens") > CHUNK_TOKENS).count() == 0
    # per-doc: sum of (stride-clipped) coverage == token count
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(
                F.col("chunk_id") * CHUNK_STRIDE + F.col("n_chunk_tokens")
            ).alias("covered"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .join(docs, "doc_id")
    )
    assert agg.filter(F.col("covered") != F.col("n_tokens")).count() == 0
    # overlap arithmetic: expected chunk count = 1 + (n-1) div stride
    bad = agg.filter(
        F.col("n_chunks")
        != 1 + F.floor((F.col("n_tokens") - 1) / CHUNK_STRIDE)
    )
    assert bad.count() == 0


def test_survivors_one_per_cluster(spark, sf_dir):
    """Exactly one survivor per cluster; survivors are the longest doc
    (doc_id tiebreak); every document gets a verdict."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.dedup import dedup_survivors
    from angelone_clickhouse_spark.sources.tables import load_table

    out = dedup_survivors(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    per = out.groupBy("cluster_id").agg(
        F.sum(F.col("is_survivor").cast("long")).alias("n_surv"),
        F.count(F.lit(1)).alias("n"),
        F.max("cluster_size").alias("sz"),
    )
    assert per.filter(F.col("n_surv") != 1).count() == 0
    assert per.filter(F.col("n") != F.col("sz")).count() == 0


def test_fingerprint_decon_flags_planted_contamination(spark, sf_dir):
    """A doc sharing a long run with a benchmark doc must be flagged:
    benchmark docs themselves are excluded; every flagged doc really
    shares at least one winnowing fingerprint (n_hit_fps >= 1)."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.pipeline import (
        BENCH_MOD,
        decontaminate_fingerprint,
    )

    out = decontaminate_fingerprint(spark, sf_dir)
    assert out.filter(F.col("doc_id") % BENCH_MOD == 0).count() == 0
    assert out.filter(F.col("n_hit_fps") < 1).count() == 0
    assert out.count() > 0  # word-soup fixture guarantees some overlap


def test_pack_efficiency_matches_python_reference(spark, sf_dir):
    """Brute-force the per-source packing report from the raw corpus:
    same (source, doc_id) order, same cum-sum, same split rule."""
    from angelone_clickhouse_spark.operators.pipeline import pack_efficiency

    docs = sorted(
        (
            (r.source, r.doc_id, len(r.text.split(" ")))
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        )
    )
    per = {}
    cum = {}
    for source, _doc_id, n in docs:
        c = cum.get(source, 0)
        s = per.setdefault(source, [0, 0, 0])  # n_docs, n_tokens, n_split
        s[0] += 1
        s[1] += n
        if c % PACK_BUDGET + n > PACK_BUDGET:
            s[2] += 1
        cum[source] = c + n
    rows = pack_efficiency(spark, sf_dir).collect()
    assert len(rows) == len(per)
    any_split = False
    for r in rows:
        n_docs, n_tokens, n_split = per[r.source]
        n_seqs = (n_tokens + PACK_BUDGET - 1) // PACK_BUDGET
        assert (r.n_docs, r.n_tokens, r.n_split_docs, r.n_seqs) == (
            n_docs,
            n_tokens,
            n_split,
            n_seqs,
        )
        assert r.fill_milli == 1000 * n_tokens // (n_seqs * PACK_BUDGET)
        assert r.split_milli == 1000 * n_split // n_docs
        any_split |= n_split > 0
    # docs average ~54 tokens against a 512 budget: splits must occur
    assert any_split


def test_decontaminate_bloom_superset_and_fp_accounting(spark, sf_dir):
    """At the deployed geometry (M=2^20) the fixture's bit set is so
    sparse the bloom pass must agree exactly with the exact-overlap
    pass; at a deliberately tiny M (64 bits, saturated filter) false
    positives MUST appear, every exact hit must still be flagged
    (blooms have no false negatives), and the fp accounting column
    must reconcile."""
    from angelone_clickhouse_spark.operators.pipeline import (
        decontaminate_bloom,
        decontaminate_ngrams,
    )

    exact = {
        r.doc_id: r.n_hit_ngrams
        for r in decontaminate_ngrams(spark, sf_dir).collect()
    }
    deployed = {
        r.doc_id: r
        for r in decontaminate_bloom(spark, sf_dir).collect()
    }
    assert {d: r.n_exact_ngrams for d, r in deployed.items() if r.n_exact_ngrams} == exact
    assert all(r.n_false_pos == r.n_flagged_ngrams - r.n_exact_ngrams for r in deployed.values())
    assert sum(r.n_false_pos for r in deployed.values()) == 0

    tiny = {
        r.doc_id: r for r in decontaminate_bloom(spark, sf_dir, m=64).collect()
    }
    for d, n in exact.items():
        assert d in tiny and tiny[d].n_exact_ngrams == n  # no false negatives
    assert sum(r.n_false_pos for r in tiny.values()) > 0  # saturated -> FPs
