"""Dataset-assembly operators over the ``documents`` table: per-doc
TF-IDF keyword extraction, deterministic shuffle/shard planning, and
capped source-mixture reweighting.

These are the last-mile steps a training-data pipeline runs AFTER
dedup/curation (operators/dedup.py, curation.py, pipeline.py): pick
the per-domain mixture, lay the kept documents out into shards in a
reproducible pseudo-random order, and attach lightweight relevance
metadata. The reference engine has none of these (its pipeline ends
at ClickHouse inserts — main.go's insert path, SURVEY §2.3 capability
gaps); like the rest of the LLM-pipeline ladder they are north-star
extensions, shaped after public practice (C4/Gopher-style mixtures,
DoReMi-style domain reweighting in its static capped form, tf-idf as
in any IR textbook).

All four ops (the three above plus the arrival-order n-gram novelty
score) are pure built-in-function DataFrame plans with full DuckDB
value oracles. Determinism policy follows the repo convention:
integer arithmetic and md5 bucketing wherever a value feeds a
comparison or a rank; the single IEEE step in tf-idf (an integer
times one log10 of an exact integer ratio) is bit-identical
cross-engine and rounded to 6 decimals before the rank, with a token
tie-break, so ordering can never diverge on ulp noise (same device as
curation.doc_unigram_logprob).

Scale notes (100 TB):
- tfidf_top_terms: tf is a (doc_id, token) groupBy and df a token
  groupBy — both partial-aggregate before shuffling; the doc-count
  scalar broadcasts; the token->df join shuffles |vocab|-bounded
  partials, and the final top-k per doc is a bounded window over
  (doc_id, token) aggregates, never raw tokens.
- shard_plan: the only shuffle is the repartition-by-shard that a
  real writer needs anyway; within-shard order is a window over the
  md5 key, i.e. each shard sorts locally after the exchange. No RNG
  coordination, bit-reproducible on rerun — resuming a crashed
  shard-writing job reproduces byte-identical shards.
- source_mixture_weights: per-source token counts are computed from
  each row's own token-array size (no explode); everything after the
  groupBy is arithmetic over |sources| rows with two broadcast
  scalars. This is the op whose OUTPUT drives the sampler, so it
  being exact integer milli/micro units means two engines (or two
  runs) can never disagree on a sampling plan.
- novelty_ngram_rate: see its docstring (span_dedup_corpus's shuffle
  profile with an in-row dedupe before the explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from angelone_clickhouse_spark.materialize import materialize
from angelone_clickhouse_spark.sources.tables import load_table

TFIDF_TOP_K = 5  # terms kept per document

N_SHARDS = 8  # shard_plan fan-out

# source_mixture_weights: cap any one source at this share (milli
# units of the corpus token total) before renormalizing — the static
# capped-proportion mixture (C4-style "no domain dominates" rule; the
# sf fixtures' 20 sources spread 42-57 milli, so 50 splits them
# non-degenerately: heavy sources bind at the cap, light ones keep
# their natural share).
MIX_CAP_MILLI = 50
SAMPLE_BUDGET_DOCS = 10_000  # turn weights into a per-source doc budget

NOVELTY_N = 3  # word n-gram width for novelty_ngram_rate

# mixture_sample: corpus fraction distributed across sources by
# weight_micro (milli units), and the stage-1 salt fan-out
MIXTURE_SAMPLE_FRAC_MILLI = 250
SAMPLE_SALT = 4


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP_K`` terms per document by tf-idf.

    score = tf * log10(N / df), with tf the in-doc term count, df the
    number of documents containing the term, N the corpus size.
    Rounded to 6 decimals BEFORE ranking (token ascending breaks
    ties), so the rank is deterministic cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log10(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "token", "tf", "df", "score", "rnk")
    )


def shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard layout: every document
    gets a content-free md5 order key, a shard (key mod N_SHARDS) and
    its position within the shard — the exact layout a shard writer
    materializes before training. Reproducible with no RNG state
    (same md5-bucket device as curation.dataset_split)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(
            F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))
        ).alias("hkey"),
    ).select(
        "doc_id",
        "hkey",
        (
            F.expr(
                "cast(conv(substring(hkey, 1, 15), 16, 10) as bigint)"
            )
            % N_SHARDS
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hkey")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).alias("pos"),
        "hkey",
    )


def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped-proportion source mixture: per-source token share in
    milli units, capped at MIX_CAP_MILLI, renormalized to micro-unit
    sampling weights, and turned into a per-source document budget.
    Integer division end-to-end — the plan two runs produce can never
    differ by a ulp."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    tot = per_src.agg(F.sum("n_tokens").alias("tot_tokens"))
    shared = (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("(1000 * n_tokens) div tot_tokens").alias(
                "share_milli"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "share_milli",
            F.least(
                F.col("share_milli"), F.lit(MIX_CAP_MILLI).cast("bigint")
            ).alias("capped_milli"),
        )
    )
    capped_tot = shared.agg(
        F.sum("capped_milli").alias("tot_capped")
    )
    return (
        shared.crossJoin(F.broadcast(capped_tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "share_milli",
            (F.col("share_milli") > MIX_CAP_MILLI).alias("capped"),
            F.expr("(1000000 * capped_milli) div tot_capped").alias(
                "weight_micro"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "share_milli",
            "capped",
            "weight_micro",
            F.expr(
                f"(weight_micro * {SAMPLE_BUDGET_DOCS}) div 1000000"
            ).alias("budget_docs"),
        )
    )


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the mixture: the deterministic per-source document
    sample that :func:`source_mixture_weights` budgets. Each source
    contributes its weight_micro share of a corpus-fraction target
    (``MIXTURE_SAMPLE_FRAC_MILLI`` milli of total docs), selected by
    md5 order — exact per-source top-k, no RNG state, so two runs (or
    two engines) materialize the identical sample.

    Scale notes (100 TB): a plain ``row_number() OVER (PARTITION BY
    source)`` puts an entire source in ONE task — the classic skew
    trap for group top-k (a web-crawl source is most of the corpus).
    This is the two-phase exact form instead: stage 1 ranks within
    (source, salt) — ``SAMPLE_SALT`` bounded partitions per source —
    and keeps each salt's top-``budget``; the per-source top-budget is
    provably contained in that union, so stage 2's authoritative
    per-source rank runs over at most salt x budget survivors, never
    the raw source. Budgets ride a broadcast (one row per source).
    All-JVM: two window passes + one broadcast join, no Python.
    """
    weights = source_mixture_weights(spark, sf_dir)
    tot = weights.agg(F.sum("n_docs").alias("tot_docs"))
    budgets = (
        weights.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.expr(
                f"(weight_micro * tot_docs * {MIXTURE_SAMPLE_FRAC_MILLI})"
                " div 1000000000"
            ).alias("budget_docs"),
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        F.md5(
            F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
        ).alias("hkey"),
        (F.col("doc_id") % SAMPLE_SALT).alias("salt"),
    ).join(F.broadcast(budgets), "source")
    w1 = Window.partitionBy("source", "salt").orderBy("hkey", "doc_id")
    pruned = keyed.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= F.col("budget_docs")
    )
    w2 = Window.partitionBy("source").orderBy("hkey", "doc_id")
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= F.col("budget_docs"))
        .select("source", "doc_id", "sample_rank", "budget_docs")
    )


def novelty_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content novelty under arrival order (doc_id, the
    repo-wide "smaller id came first" convention shared with
    dedup_incremental): the fraction of a doc's DISTINCT word
    ``NOVELTY_N``-grams that no smaller-id document contains. The
    data-pruning / curriculum signal — a doc that only restates
    already-seen n-grams scores 0, a doc of entirely new content
    scores 1000 (exact milli units).

    Scale notes (100 TB): gram construction is row-local
    (transform over the doc's own word array, map-side, deduped
    in-row before the explode); the first-seen table is a min()
    aggregate keyed on gram content — map-side partials shuffle once,
    boilerplate-gram skew is AQE's skew-join case exactly as in
    span_dedup_corpus; the gram->first join reuses the same key; the
    final rollup shuffles on doc_id. No window over the corpus."""
    from angelone_clickhouse_spark.operators.pipeline import _word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    # _word_ngrams carries the two devices this op needs: the short-doc
    # guard and the materialize-before-explode cut (Generate
    # re-evaluates its child per OUTPUT row — quadratic per doc on the
    # raw transform(); measured 15 s -> ~3 s at sf0.1). It also stops
    # the self-join below re-deriving the explode on both sides.
    dg = _word_ngrams(docs, NOVELTY_N)
    first = dg.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per = (
        dg.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.expr(
                "CASE WHEN n_grams > 0 THEN (1000 * n_novel) div n_grams"
                " END"
            ).alias("novelty_milli"),
        )
    )


def _novelty_oracle_sql() -> str:
    from angelone_clickhouse_spark.operators.curation import _gram_sql

    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
dg AS (
  SELECT DISTINCT doc_id, gram
  FROM d, UNNEST({_gram_sql(NOVELTY_N)}) AS t(gram)
),
first AS (SELECT gram, min(doc_id) AS first_doc FROM dg GROUP BY gram),
per AS (
  SELECT doc_id, count(*) AS n_grams,
         sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM dg JOIN first USING (gram)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CASE WHEN n_grams > 0 THEN (1000 * n_novel) // n_grams END
            AS BIGINT) AS novelty_milli
FROM d LEFT JOIN per USING (doc_id)
"""


# shared by the source_mixture_weights oracle and (as a CTE body) the
# mixture_sample oracle — one spelling of the budget arithmetic
_MIX_WEIGHTS_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         sum(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS tot_tokens FROM per_src),
shared AS (
  SELECT source, n_docs, n_tokens,
         (1000 * n_tokens) // tot_tokens AS share_milli
  FROM per_src CROSS JOIN tot
),
capped AS (
  SELECT *, least(share_milli, {MIX_CAP_MILLI}) AS capped_milli
  FROM shared
),
ctot AS (SELECT sum(capped_milli) AS tot_capped FROM capped)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(share_milli AS BIGINT) AS share_milli,
       share_milli > {MIX_CAP_MILLI} AS capped,
       CAST((1000000 * capped_milli) // tot_capped AS BIGINT)
         AS weight_micro,
       CAST(((1000000 * capped_milli) // tot_capped)
            * {SAMPLE_BUDGET_DOCS} // 1000000 AS BIGINT) AS budget_docs
FROM capped CROSS JOIN ctot
"""

# dsir_weights: hashed-feature buckets, target-domain sources, and
# the Laplace-smoothing constant is the bucket count (add-one per
# bucket). B is a quality/collision knob, not semantics: more buckets
# = less feature aliasing; both engines hash identically at any B.
DSIR_B = 1024
DSIR_TARGET_SOURCES = ("src0", "src1")


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): score every document by how much more
    likely its content is under a TARGET domain's hashed-n-gram
    unigram model than under the raw corpus's. Features are word
    bigrams hashed into DSIR_B buckets (the md5-60-bit device shared
    with dedup's MinHash); the target sample is the docs of
    DSIR_TARGET_SOURCES (a curated-domain stand-in — real runs point
    this at a Wikipedia/books sample); both bucket models are
    Laplace-smoothed. The per-doc weight is the average per-feature
    log10 importance ratio

        log10( ((ct[b]+1) / (Nt+B)) / ((cr[b]+1) / (Nr+B)) )

    computed as ONE log10 of a ratio of two exact long products (each
    < 2^53, so the doubles are exact and the division correctly
    rounded — bit-identical cross-engine, the
    curation.doc_unigram_logprob determinism device), averaged and
    rounded to 6. ``selected`` is the sign test (weight >= 0: the doc
    looks more target than raw) — the paper resamples with these
    weights; the sign cut is its deterministic-oracle-checkable face
    (a real pipeline feeds ``dsir_logratio`` into mixture_sample's
    budgeted sampler instead).

    Scale notes (100 TB): bigram construction is row-local (guarded
    transform over the doc's own words, materialized before the
    explode — the Generate re-evaluation device of
    doc_bigram_logprob); the bucket-count table is at most DSIR_B
    rows (ONE groupBy with map-side partials — target and raw counts
    come from the same pass via a conditional sum, not two scans);
    the two totals broadcast as one scalar row; scoring joins each
    feature occurrence to the DSIR_B-row table (broadcast — it is
    KB-sized at any corpus size) and rolls up per doc. One shuffle of
    bucket partials + the per-doc rollup; no corpus self-join, no
    driver state: this is why DSIR is the data-selection method that
    runs at pretraining scale."""
    docs = load_table(spark, sf_dir, "documents")
    in_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
    pairs = docs.select(
        "doc_id",
        in_target.alias("is_t"),
        F.split("text", " ").alias("w"),
    ).select(
        "doc_id",
        "is_t",
        F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "  transform(sequence(0, size(w) - 2), "
            "            i -> concat(w[i], ' ', w[i+1])) "
            "ELSE CAST(array() AS ARRAY<STRING>) END"
        ).alias("bs"),
    )
    pairs = materialize(pairs, None)
    feats = pairs.select(
        "doc_id",
        "is_t",
        F.expr(
            "explode(transform(bs, b -> "
            "cast(conv(substring(md5(b), 1, 15), 16, 10) as bigint)"
            f" % {DSIR_B}))"
        ).alias("bucket"),
    )
    stats = feats.groupBy("bucket").agg(
        F.sum(F.col("is_t").cast("long")).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    tots = stats.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    ratio = (
        ((F.col("ct") + 1) * (F.col("nr") + DSIR_B)).cast("double")
        / ((F.col("cr") + 1) * (F.col("nt") + DSIR_B)).cast("double")
    )
    per = (
        feats.join(F.broadcast(stats), "bucket")
        .crossJoin(F.broadcast(tots))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.avg(F.log10(ratio)), 6).alias("dsir_logratio"),
        )
    )
    return per.select(
        "doc_id",
        "n_feats",
        "dsir_logratio",
        (F.col("dsir_logratio") >= 0).alias("selected"),
    )


QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "shard_plan": shard_plan,
    "source_mixture_weights": source_mixture_weights,
    "mixture_sample": mixture_sample,
    "novelty_ngram_rate": novelty_ngram_rate,
    "dsir_weights": dsir_weights,
}

ORACLES = {
    "mixture_sample": f"""
WITH wts AS ({_MIX_WEIGHTS_SQL}),
wtot AS (SELECT sum(n_docs) AS tot_docs FROM wts),
budgets AS (
  SELECT source,
         (weight_micro * tot_docs * {MIXTURE_SAMPLE_FRAC_MILLI})
           // 1000000000 AS budget_docs
  FROM wts CROSS JOIN wtot
),
ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rnk
  FROM documents
)
SELECT r.source, r.doc_id,
       CAST(rnk AS INTEGER) AS sample_rank,
       CAST(budget_docs AS BIGINT) AS budget_docs
FROM ranked r JOIN budgets b USING (source)
WHERE rnk <= budget_docs
""",
    "novelty_ngram_rate": _novelty_oracle_sql(),
    "tfidf_top_terms": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
),
df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.df AS BIGINT) AS df,
         round(tf.tf * log10(CAST(n.n_docs AS DOUBLE) / df.df), 6)
           AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, score, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token ASC
  ) AS rnk
  FROM scored
)
WHERE rnk <= {TFIDF_TOP_K}
""",
    "shard_plan": f"""
WITH keyed AS (
  SELECT doc_id,
         md5('shard:' || CAST(doc_id AS VARCHAR)) AS hkey
  FROM documents
),
sharded AS (
  SELECT doc_id, hkey,
         ('0x' || substring(hkey, 1, 15))::BIGINT % {N_SHARDS} AS shard
  FROM keyed
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY shard ORDER BY hkey
       ) AS INTEGER) AS pos,
       hkey
FROM sharded
""",
    "source_mixture_weights": _MIX_WEIGHTS_SQL,
}

_DSIR_TARGET_IN = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)

ORACLES["dsir_weights"] = f"""
WITH d AS (
  SELECT doc_id, source IN ({_DSIR_TARGET_IN}) AS is_t,
         string_split(text, ' ') AS w
  FROM documents
),
feats AS (
  SELECT doc_id, is_t,
         ('0x' || substring(md5(w[i] || ' ' || w[i+1]), 1, 15))::BIGINT
           % {DSIR_B} AS bucket
  FROM d, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 2
),
stats AS (
  SELECT bucket,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM feats GROUP BY bucket
),
tots AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM stats),
per AS (
  SELECT doc_id,
         count(*) AS n_feats,
         round(avg(log10(
           CAST((ct + 1) * (nr + {DSIR_B}) AS DOUBLE)
           / CAST((cr + 1) * (nt + {DSIR_B}) AS DOUBLE))), 6)
           AS dsir_logratio
  FROM feats JOIN stats USING (bucket) CROSS JOIN tots
  GROUP BY doc_id
)
SELECT doc_id, n_feats, dsir_logratio,
       dsir_logratio >= 0 AS selected
FROM per
"""
