from __future__ import annotations

from angelone_clickhouse_spark.operators.text import (
    text_fingerprint,
    text_langid,
    text_quality,
    text_token_stats,
)


def test_token_stats_consistency(spark, sf_dir):
    rows = text_token_stats(spark, sf_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_distinct_tokens <= r.n_tokens
        assert 0 < r.avg_token_len < 30


def test_quality_flags(spark, sf_dir):
    rows = text_quality(spark, sf_dir).collect()
    assert all(0.0 <= r.stopword_ratio <= 1.0 for r in rows)
    assert all(0.0 < r.type_token_ratio <= 1.0 for r in rows)
    assert any(r.passes_quality for r in rows)


def test_langid_deterministic_and_covering(spark, sf_dir):
    a = sorted(map(tuple, text_langid(spark, sf_dir).collect()))
    b = sorted(map(tuple, text_langid(spark, sf_dir).collect()))
    assert a == b
    langs = {r[1] for r in a}
    assert langs <= {"en", "es", "fr", "de", "zh", "und"}
    assert sum(r[2] for r in a) == 500


def test_fingerprints_stable_and_bounded(spark, sf_dir):
    rows = text_fingerprint(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.n_fingerprints <= r.n_shingles


def test_fuzzy_pairs_collapse_equals_core_on_duplicated_corpus(spark, sf_dir):
    """fuzzy_prefix_pairs' duplicate-group collapse must be output-
    identical to running the PassJoin core on every doc, on a corpus
    WITH duplicated (lang, length-bucket, prefix) keys."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.text import (
        FUZZY_BLOCK_CHARS,
        FUZZY_PREFIX_LEN,
        _fuzzy_pairs_core,
    )
    from angelone_clickhouse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "lang", "n_chars", "text")
    copy1 = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    copy2 = (
        base.filter(F.col("doc_id") % 4 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
    )
    corpus = base.unionByName(copy1).unionByName(copy2)
    t = corpus.select(
        "doc_id",
        "lang",
        F.expr(f"n_chars div {FUZZY_BLOCK_CHARS}").alias("lb"),
        F.substring("text", 1, FUZZY_PREFIX_LEN).alias("pfx"),
    )
    naive = {tuple(r) for r in _fuzzy_pairs_core(t).collect()}

    # collapsed spelling, inlined over the synthetic corpus
    groups = t.groupBy("lang", "lb", "pfx").agg(
        F.min("doc_id").alias("doc_id"),
        F.sort_array(F.collect_list("doc_id")).alias("members"),
    )
    rep_pairs = _fuzzy_pairs_core(groups.select("doc_id", "lang", "lb", "pfx"))
    mem_a = groups.select(
        F.col("doc_id").alias("doc_id_a"), F.col("members").alias("mem_a")
    )
    mem_b = groups.select(
        F.col("doc_id").alias("doc_id_b"), F.col("members").alias("mem_b")
    )
    cross = (
        rep_pairs.join(mem_a, "doc_id_a")
        .join(mem_b, "doc_id_b")
        .select(F.explode("mem_a").alias("a"), "mem_b", "lang", "dist")
        .select("a", F.explode("mem_b").alias("b"), "lang", "dist")
        .select(
            F.least("a", "b").alias("doc_id_a"),
            F.greatest("a", "b").alias("doc_id_b"),
            "lang",
            "dist",
        )
    )
    within = (
        groups.filter(F.size("members") >= 2)
        .select(
            "lang",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(members) - 2),"
                    " i -> transform(slice(members, i + 2, size(members) - i - 1),"
                    "      x -> struct(members[i] AS doc_a, x AS doc_b))))"
                )
            ).alias("p"),
        )
        .select(
            F.col("p.doc_a").alias("doc_id_a"),
            F.col("p.doc_b").alias("doc_id_b"),
            "lang",
            F.lit(0).cast("int").alias("dist"),
        )
    )
    collapsed = {tuple(r) for r in cross.unionByName(within).collect()}
    assert collapsed == naive
    assert any(d == 0 for *_, d in collapsed)  # within-group pairs exercised


def test_containment_collapse_equals_core_on_duplicated_corpus(spark, sf_dir):
    """doc_containment's directed duplicate-group collapse must be
    output-identical to the inverted-index core on every doc, on a
    corpus with duplicate texts — including the ORDERED within-group
    pairs at containment 1.0 and the fingerprint-less short docs."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.text import (
        _containment_core,
        _fp_sets,
        _containment_from_fps,
    )
    from angelone_clickhouse_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copy1 = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    shorty = spark.createDataFrame(
        [(9_000_001, "just two"), (9_000_002, "just two")],
        "doc_id long, text string",
    )
    corpus = base.unionByName(copy1).unionByName(shorty)
    naive = {tuple(r) for r in _containment_core(corpus).collect()}

    groups = corpus.groupBy(F.md5("text").alias("tkey")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("text", "doc_id").alias("text"),
        F.sort_array(F.collect_list("doc_id")).alias("members"),
    )
    rep_fps = _fp_sets(groups.select("doc_id", "text"))
    rep_pairs = _containment_from_fps(rep_fps)
    mem_s = groups.select(
        F.col("doc_id").alias("doc_src"), F.col("members").alias("mem_s")
    )
    mem_d = groups.select(
        F.col("doc_id").alias("doc_dst"), F.col("members").alias("mem_d")
    )
    cross = (
        rep_pairs.join(mem_s, "doc_src")
        .join(mem_d, "doc_dst")
        .select(F.explode("mem_s").alias("s"), "mem_d", "n_common", "containment")
        .select(
            F.col("s").alias("doc_src"),
            F.explode("mem_d").alias("doc_dst"),
            "n_common",
            "containment",
        )
    )
    within = (
        groups.join(rep_fps.select("doc_id", "n_fp"), "doc_id")
        .filter(F.size("members") >= 2)
        .select(F.explode("members").alias("doc_src"), "members", "n_fp")
        .select(
            "doc_src",
            F.explode("members").alias("doc_dst"),
            F.col("n_fp").cast("long").alias("n_common"),
            F.lit(1.0).alias("containment"),
        )
        .filter(F.col("doc_src") != F.col("doc_dst"))
    )
    collapsed = {
        tuple(r) for r in cross.unionByName(within).collect()
    }
    assert collapsed == naive
    assert any(c == 1.0 for *_, c in collapsed)  # within-group exercised
    # fingerprint-less duplicated docs never pair
    assert not any(
        s in (9_000_001, 9_000_002) or d in (9_000_001, 9_000_002)
        for s, d, *_ in collapsed
    )
