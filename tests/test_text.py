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
    """fuzzy_prefix_pairs' duplicate-group collapse (production
    helper _fuzzy_grouped, not an inlined re-spelling) must be
    output-identical to running the PassJoin core on every doc, on a
    corpus WITH duplicated (lang, length-bucket, prefix) keys — all
    groups shallow here, so the bounded form is exactly the naive
    pair set."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.text import (
        FUZZY_BLOCK_CHARS,
        FUZZY_PREFIX_LEN,
        _fuzzy_grouped,
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
    collapsed = {tuple(r) for r in _fuzzy_grouped(corpus).collect()}
    assert collapsed == naive
    assert any(d == 0 for *_, d in collapsed)  # within-group pairs exercised


def _closure_components(pairs):
    """Union-find over (a, b, ...) edge tuples -> set of frozenset
    components; shared by the deep-fixture tests below."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, *_ in pairs:
        parent[find(a)] = find(b)
    out = {}
    for x in list(parent):
        out.setdefault(find(x), set()).add(x)
    return {frozenset(s) for s in out.values()}


def test_fuzzy_grouped_deep_group_bounded(spark):
    """Pins the DEEP branches of _fuzzy_grouped (n > bound: star
    edges, rep-only cross expansion) that no shallow corpus reaches
    (VERDICT r7 item 3). bound=2, one 4-deep key group, one 2-deep
    near key group, one unrelated doc."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.text import (
        FUZZY_BLOCK_CHARS,
        FUZZY_PREFIX_LEN,
        _fuzzy_grouped,
        _fuzzy_pairs_core,
    )

    pfx_d = "abcdefghijklmnopqrstuvwxyz0123"  # 30 chars
    pfx_s = "abcdefghijklmnopqrstuvwxyz0456"  # levenshtein 3 from pfx_d
    assert len(pfx_d) == len(pfx_s) == FUZZY_PREFIX_LEN
    rows = [(10 + i, "en", 40, pfx_d + " tail text") for i in range(4)]
    rows += [(20, "en", 40, pfx_s + " tail text"), (21, "en", 40, pfx_s + " x")]
    rows += [(30, "fr", 40, pfx_d + " tail text")]  # other lang: no pairs
    corpus = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    )

    bounded = {tuple(r) for r in _fuzzy_grouped(corpus, bound=2).collect()}
    expected = (
        {(10, m, "en", 0) for m in (11, 12, 13)}  # deep star, rep=10
        | {(20, 21, "en", 0)}  # shallow within pair
        | {(10, 20, "en", 3), (10, 21, "en", 3)}  # rep-only deep side
    )
    assert bounded == expected

    # closure equivalence with the naive core output
    t = corpus.select(
        "doc_id",
        "lang",
        F.expr(f"n_chars div {FUZZY_BLOCK_CHARS}").alias("lb"),
        F.substring("text", 1, FUZZY_PREFIX_LEN).alias("pfx"),
    )
    naive = {tuple(r) for r in _fuzzy_pairs_core(t).collect()}
    assert len(naive) == 6 + 1 + 8  # C(4,2) + 1 + 4*2: truly deeper
    assert _closure_components(bounded) == _closure_components(naive)


def test_containment_collapse_equals_core_on_duplicated_corpus(spark, sf_dir):
    """doc_containment's directed duplicate-group collapse
    (production helper _containment_grouped) must be output-identical
    to the inverted-index core on every doc, on a corpus with
    duplicate texts — including the ORDERED within-group pairs at
    containment 1.0 and the fingerprint-less short docs."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.text import (
        _containment_core,
        _containment_grouped,
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
    collapsed = {tuple(r) for r in _containment_grouped(corpus).collect()}
    assert collapsed == naive
    assert any(c == 1.0 for *_, c in collapsed)  # within-group exercised
    # fingerprint-less duplicated docs never pair
    assert not any(
        s in (9_000_001, 9_000_002) or d in (9_000_001, 9_000_002)
        for s, d, *_ in collapsed
    )


def test_containment_grouped_deep_group_bounded(spark):
    """Pins the DEEP branches of the DIRECTED collapse: a 5-deep
    identical-text group must emit a bidirectional star
    (rep<->member, 2(n-1) ordered edges, n_common = the group's
    fingerprint count) instead of all n(n-1) ordered pairs, and a
    deep side of a cross pair contributes only its representative."""
    from angelone_clickhouse_spark.operators.text import (
        _containment_core,
        _containment_grouped,
        _fp_sets,
    )

    t_deep = "alpha bravo charlie delta echo foxtrot golf"
    t_sup = t_deep + " hotel india juliet"  # superset: contains t_deep
    rows = [(10 + i, t_deep) for i in range(5)]  # n=5 > bound=2
    rows += [(20, t_sup)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")

    bounded = {
        tuple(r) for r in _containment_grouped(corpus, bound=2).collect()
    }
    # expected cross pairs: exactly the core on one rep per text
    reps = spark.createDataFrame(
        [(10, t_deep), (20, t_sup)], "doc_id long, text string"
    )
    rep_core = {tuple(r) for r in _containment_core(reps).collect()}
    assert rep_core, "fixture must produce at least one cross pair"
    n_fp = {
        r.doc_id: r.n_fp
        for r in _fp_sets(reps).select("doc_id", "n_fp").collect()
    }
    star = {(10, m, n_fp[10], 1.0) for m in range(11, 15)} | {
        (m, 10, n_fp[10], 1.0) for m in range(11, 15)
    }
    assert bounded == rep_core | star

    # sanity: naive is truly bigger (5*4=20 within pairs vs 8 star
    # edges) and the undirected closure is unchanged
    naive = {tuple(r) for r in _containment_core(corpus).collect()}
    assert len(naive) > len(bounded)
    assert _closure_components(bounded) == _closure_components(naive)


def test_containment_df_cap_conservative(spark):
    """The document-frequency cap (the 100 TB hot-posting knob on
    _containment_from_fps) must (a) leave output identical when no
    fingerprint exceeds the cap, and (b) with a binding cap produce a
    SUBSET of the exact pairs with containment scores that only ever
    drop — never a new pair, never a higher score."""
    from angelone_clickhouse_spark.operators.text import (
        _containment_from_fps,
        _fp_sets,
    )

    # 30 docs sharing one stopword-ish phrase (a hot fingerprint in
    # every doc) plus per-doc unique tails; one true superset pair
    common = "the quick brown fox jumps over"
    rows = [
        (i, f"{common} unique{i} tail{i} words{i} here{i}")
        for i in range(30)
    ]
    rows.append((100, rows[5][1] + " extra trailing content appended"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    fps = _fp_sets(corpus.select("doc_id", "text"))

    exact = {
        (r.doc_src, r.doc_dst): (r.n_common, r.containment)
        for r in _containment_from_fps(fps).collect()
    }
    loose = {
        (r.doc_src, r.doc_dst): (r.n_common, r.containment)
        for r in _containment_from_fps(fps, df_cap=1000).collect()
    }
    assert loose == exact  # (a) cap above every df: no-op

    capped = {
        (r.doc_src, r.doc_dst): (r.n_common, r.containment)
        for r in _containment_from_fps(fps, df_cap=5).collect()
    }
    assert set(capped) <= set(exact)  # (b) subset of pairs
    for pair, (n, c) in capped.items():
        assert n <= exact[pair][0] and c <= exact[pair][1]
    assert len(capped) < len(exact)  # the cap actually bound


def test_fuzzy_grouped_null_keys_match_core(spark):
    """Docs with a NULL key field (lang/n_chars/text) can never pair
    in the PassJoin core — its equi-joins drop NULL keys — so the
    collapse must exclude them BEFORE grouping (also keeping
    concat_ws, which silently skips NULLs, from collapsing distinct
    triples into one group key). Pinned on a corpus where two docs
    have complementary NULL patterns that a naive concat_ws key would
    merge."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.text import (
        FUZZY_BLOCK_CHARS,
        FUZZY_PREFIX_LEN,
        _fuzzy_grouped,
        _fuzzy_pairs_core,
    )

    pfx = "abcdefghijklmnopqrstuvwxyz0123"
    rows = [
        (1, "en", 40, pfx + " tail"),
        (2, "en", 40, pfx + " tail"),
        (3, None, 40, pfx + " tail"),  # NULL lang
        (4, "en", None, pfx + " tail"),  # NULL n_chars -> NULL lb
        (5, "en", 40, None),  # NULL text -> NULL pfx
        # complementary NULLs: concat_ws('\x1f','en',NULL,'x') ==
        # concat_ws('\x1f','en','x',NULL) would merge these two
        (6, "en", None, "x"),
        (7, "en", 40 * FUZZY_BLOCK_CHARS, None),
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    )
    t = corpus.select(
        "doc_id",
        "lang",
        F.expr(f"n_chars div {FUZZY_BLOCK_CHARS}").alias("lb"),
        F.substring("text", 1, FUZZY_PREFIX_LEN).alias("pfx"),
    )
    naive = {tuple(r) for r in _fuzzy_pairs_core(t).collect()}
    collapsed = {tuple(r) for r in _fuzzy_grouped(corpus).collect()}
    assert collapsed == naive
    assert naive == {(1, 2, "en", 0)}  # only the NULL-free pair
