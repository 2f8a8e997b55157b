"""Document-curation operators over the ``documents`` table:
repetition-based quality scoring, deterministic dataset splits,
corpus vocabulary statistics, and PII redaction.

These round out the training-data pipeline surface
(``operators/pipeline.py`` has decontamination / sampling / gating /
packing; this module adds the per-document *content* filters a
curation pass runs before those). The reference engine has none of
these (SURVEY §2.3 capability gaps) — they are the Gopher/C4-style
rules every large-scale text pipeline applies.

All four ops are pure built-in-function DataFrame plans and fully
DuckDB-oracle-checked: every derived value is integer arithmetic,
md5 bucketing, or deterministic string rewriting — no float anywhere.

Scale notes (100 TB):
- doc_repetition: zero shuffles — every score is computed from the
  document's own token array with higher-order functions (map-side
  only, embarrassingly parallel). This is the op you run on every
  document of a 100 TB crawl, so it being shuffle-free matters most.
- dataset_split: zero shuffles — split assignment is a stable hash of
  doc_id (reproducible across reruns/engines; no RNG coordination).
- corpus_top_tokens: explode + global count is the classic word-count
  shape — partial (map-side) aggregation does the heavy lifting and
  only per-token partials shuffle; the top-k is a TakeOrdered over
  |vocab| rows, not |corpus|.
- pii_redact: zero shuffles — regexp_replace chain, map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from angelone_clickhouse_spark.materialize import materialize
from angelone_clickhouse_spark.sources.tables import load_table

# Gopher-style gates (Rae et al. 2021 use 0.2 duplicate-2gram /
# 0.18 dup-3gram / 0.1 top-token fractions; the word-soup fixture has
# a ~40-word vocabulary so every doc is repetitive — thresholds here
# are calibrated to split the fixture non-degenerately while keeping
# the rule shape identical).
DUP2_MAX_MILLI = 60
TOP_TOK_MAX_MILLI = 95

# dataset_split: hash-bucket boundaries out of 100.
TRAIN_PCT = 80
VAL_PCT = 10  # val is [TRAIN_PCT, TRAIN_PCT + VAL_PCT)

TOP_K_TOKENS = 20

# pii_redact: RE2/Java-compatible patterns (no lookaround, no \b
# ambiguity across engines).
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"
IP_RE = r"ip:[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition scores in exact milli-units (integer
    division — bit-identical cross-engine) plus the keep/drop gate:

    - dup2_milli / dup3_milli: fraction of word {2,3}-grams that are
      duplicates of an earlier gram (Gopher "duplicate n-gram" rule);
    - top_tok_milli: most-frequent-token share of all tokens.

    Computed entirely from each doc's own token array with
    higher-order functions — no explode, no shuffle, no Python.
    """
    docs = load_table(spark, sf_dir, "documents")

    def gram_expr(n: int) -> str:
        idx = ", ".join(f"w[i+{k}]" for k in range(n))
        # short-doc guard: sequence(0, size-n) counts DOWN when
        # size < n (see pipeline._word_ngrams)
        return (
            f"CASE WHEN size(w) >= {n} THEN"
            f" transform(sequence(0, size(w) - {n}),"
            f"           i -> concat_ws(' ', {idx}))"
            f" ELSE CAST(array() AS ARRAY<STRING>) END"
        )

    def dup_milli(g: str) -> F.Column:
        return F.expr(
            f"CASE WHEN size({g}) > 0 THEN"
            f" (1000 * (size({g}) - size(array_distinct({g}))))"
            f" div size({g})"
            f" ELSE CAST(0 AS BIGINT) END"
        )

    # top-token count via a single sorted-run scan (O(n log n)) instead
    # of the O(|vocab| * n) filter-per-distinct-token form
    top_tok = F.expr(
        "(1000 * aggregate(array_sort(w),"
        "   struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS best),"
        "   (acc, x) -> struct(x AS prev,"
        "     CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1L END AS run,"
        "     greatest(acc.best,"
        "       CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1L END)"
        "       AS best),"
        "   acc -> acc.best))"
        " div size(w)"
    )
    # layered selects so each gram array is built once per row — the
    # sizes/distinct below reference the materialized column, and
    # Catalyst's CollapseProject keeps multiply-referenced non-trivial
    # aliases out-of-line rather than re-inlining them
    grams = docs.select(
        "doc_id",
        F.split("text", " ").alias("w"),
    ).select(
        "doc_id",
        "w",
        F.expr(gram_expr(2)).alias("g2"),
        F.expr(gram_expr(3)).alias("g3"),
    )
    scored = grams.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        dup_milli("g2").alias("dup2_milli"),
        dup_milli("g3").alias("dup3_milli"),
        top_tok.alias("top_tok_milli"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "dup2_milli",
        "dup3_milli",
        "top_tok_milli",
        (
            (F.col("dup2_milli") <= DUP2_MAX_MILLI)
            & (F.col("top_tok_milli") <= TOP_TOK_MAX_MILLI)
        ).alias("keep"),
    )


def split_bucket(salt: str, col_expr: str):
    """THE split-bucket device, defined once (ADVICE r15): a 0-99
    bucket from the first 15 hex chars of ``md5('<salt>' || value)``
    parsed as a 60-bit integer, mod 100 — engine-portable (DuckDB
    spells the identical arithmetic), reproducible across executors
    and reruns, no RNG seed coordination. Every split scheme and the
    leakage audit MUST build its bucket through this helper so the
    audit can never silently measure a hash no longer shipped:
    ``dataset_split`` uses ('ds:', doc_id),
    ``dedup.split_by_cluster`` uses ('dsc:', cluster_id),
    ``dedup.split_leakage_audit`` replays both."""
    return F.expr(
        f"cast(conv(substring(md5(concat('{salt}', cast({col_expr} as"
        " string))), 1, 15), 16, 10) as bigint) % 100"
    )


def split_when(bucket):
    """Bucket -> split label, the single spelling of the 80/10/10
    boundaries (companion of :func:`split_bucket`)."""
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by a stable content-free
    hash of doc_id (same md5-bucket device as
    ``pipeline.sample_stratified`` — reproducible across engines,
    executors, and reruns; no RNG seed coordination).
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = split_bucket("ds:", "doc_id")
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
    ).select(
        "doc_id",
        "lang",
        "bucket",
        split_when(F.col("bucket")).alias("split"),
    )


# shared with pipeline.sequence_pack (the per-source variant) so the
# two packing spellings can never drift to different budgets
from angelone_clickhouse_spark.operators.pipeline import PACK_BUDGET

PACK_BUCKET = 100  # doc_ids per prefix-sum bucket (see scale note)


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing over the GLOBAL token stream:
    concatenate the corpus's tokens in doc_id order and chop the
    stream into PACK_BUDGET-token training sequences. Each document
    gets its global token offset, the sequence it starts in, its
    position inside that sequence, and whether it straddles a
    sequence boundary (real pipelines let docs straddle — the chop
    truncates across windows; this op computes the exact layout a
    writer would materialize).

    Complement to ``pipeline.sequence_pack``, which packs WITHIN each
    source (window partitioned by source — fine while every source is
    modest, but one giant source pins its whole window to one task).
    This op packs the global stream and stays parallel regardless of
    the key distribution, via the two-level prefix sum below.

    Scale shape — the whole point of this op: the naive spelling is
    ``sum(n_tokens) OVER (ORDER BY doc_id)``, a GLOBAL window that
    funnels the corpus through ONE task — the 100 TB scale killer.
    The global prefix sum here is two-level instead:

    1. per-bucket token totals (bucket = doc_id div bucket_width):
       one map-side-combined shuffle whose key cardinality is
       |docs|/bucket_width;
    2. each bucket's cumulative BASE via a window over the small
       bucket-totals table (|docs|/bucket_width rows — the one
       single-partition step), broadcast back;
    3. the within-bucket running sum via a window PARTITIONED BY
       bucket (≤ bucket_width docs per partition), so no corpus-wide
       stage is ever single-task.

    offset = bucket_base + within_bucket_cumsum - n_tokens.

    Sizing ``bucket_width`` at 100 TB: the two pressure points are
    the step-2 single-partition window (|docs|/width rows) and the
    step-3 per-bucket window partitions (width rows each); width =
    sqrt(|docs|)-ish balances them — 10^10 docs at width 10^5 means a
    10^5-row bucket table (trivial on one task) and 10^5-doc window
    partitions (a few MB each). The registry path applies that rule
    LIVE (``bucket_width=None`` below sizes from a parquet-pushdown
    count), so the invariant "no corpus-wide single-task stage"
    holds at every scale, not just in the docstring; a test pins
    that any width yields bit-identical packing."""
    return pack_from_docs(
        load_table(spark, sf_dir, "documents"), bucket_width=None
    )


def pack_from_docs(
    docs: DataFrame, bucket_width: int | None = None
) -> DataFrame:
    """Frame-in core of :func:`pack_sequences` (docs needs ``doc_id``
    and ``text``): split out so tests can drive it with adversarial
    synthetic corpora — sparse doc_ids, empty buckets, boundary-exact
    token counts — where the fixture is too tame. ``bucket_width``
    is the prefix-sum bucket size; None applies the sqrt(|docs|)
    balance rule (floored at PACK_BUCKET so tiny fixtures still
    exercise the multi-bucket path)."""
    if bucket_width is None:
        # metadata-cheap: a column-free parquet count is answered
        # from footers, and width only needs the right order of
        # magnitude for the balance to hold
        bucket_width = max(PACK_BUCKET, int(docs.count() ** 0.5))
    t = docs.select(
        "doc_id",
        F.expr("cast(size(split(text, ' ')) as bigint)").alias(
            "n_tokens"
        ),
        F.expr(f"doc_id div {bucket_width}").alias("bucket"),
    )
    btot = t.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    wbase = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = btot.select(
        "bucket",
        F.coalesce(F.sum("btok").over(wbase), F.lit(0)).alias("base"),
    )
    wrun = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = t.withColumn("cum", F.sum("n_tokens").over(wrun))
    return (
        within.join(F.broadcast(base), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("base") + F.col("cum") - F.col("n_tokens")).alias(
                "offset"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "offset",
            F.expr(f"offset div {PACK_BUDGET}").alias("seq_id"),
            F.expr(f"offset % {PACK_BUDGET}").alias("pos_in_seq"),
            F.expr(
                f"(offset + n_tokens - 1) div {PACK_BUDGET} >"
                f" offset div {PACK_BUDGET}"
            ).alias("crosses_boundary"),
        )
    )


def pack_sequences_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized sequences table for the trainer — the writer rung
    above :func:`pack_sequences` (VERDICT r15 #6): one row per packed
    training sequence with the actual token stream and the document
    boundary mask, i.e. what a pipeline writes to parquet and feeds
    the dataloader. ``pack_sequences`` computes the LAYOUT (per-doc
    offsets); this op materializes the CONTENT:

    - ``seq_id``        — which PACK_BUDGET-token window
    - ``n_seq_tokens``  — tokens in this sequence (= PACK_BUDGET for
      every sequence but the last)
    - ``n_docs``        — documents STARTING in this sequence
    - ``doc_starts``    — comma-joined in-sequence positions where a
      new document begins (the attention-reset / loss-mask input;
      carry-over tails from a previous sequence are NOT starts)
    - ``packed_text``   — the space-joined token stream

    Docs straddle boundaries (the chop truncates across windows), so
    a document contributes one FRAGMENT to every sequence it touches:
    doc at offset o with n tokens spans seq o div B .. (o+n-1) div B,
    and its slice for sequence s is tokens
    [max(o, sB) - o, min(o+n, (s+1)B) - o) placed at position
    max(o, sB) - sB.

    Scale shape: the explode emits 1 + floor(n/B)-ish fragments per
    doc (bounded fan-out, ~|corpus_tokens|/B extra rows); the ONE
    shuffle is the groupBy(seq_id) that assembles sequences — data
    movement inherent to packing — and per-group state is bounded by
    PACK_BUDGET tokens, so no group can overrun an executor no matter
    the corpus size. Everything stays in JVM expressions (slice /
    sort_array / aggregate over collected structs); no Python UDF.

    Oracle: DuckDB replays the naive global-window cumsum +
    generate_series fragmentation + ordered string_agg — two
    independent algorithms (two-level prefix sum vs global window)
    must produce byte-identical sequences."""
    return pack_write_from_docs(
        load_table(spark, sf_dir, "documents"), bucket_width=None
    )


def pack_write_from_docs(
    docs: DataFrame, bucket_width: int | None = None
) -> DataFrame:
    """Frame-in core of :func:`pack_sequences_write` (docs needs
    ``doc_id`` and ``text``) — parameterized so tests drive it with
    adversarial corpora and assert bit-equality across bucket widths
    (the layout invariance must survive materialization)."""
    B = PACK_BUDGET
    layout = pack_from_docs(docs, bucket_width=bucket_width)
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    frags = (
        layout.join(toks, "doc_id")
        .select(
            "doc_id",
            "offset",
            "n_tokens",
            "toks",
            F.explode(
                F.sequence(
                    F.expr(f"offset div {B}"),
                    F.expr(f"(offset + n_tokens - 1) div {B}"),
                )
            ).alias("seq_id"),
        )
        .select(
            "seq_id",
            # in-sequence position of this fragment
            F.expr(f"greatest(offset, seq_id * {B}) - seq_id * {B}").alias(
                "pos"
            ),
            # the doc STARTS here only in its first sequence
            F.expr(f"seq_id = offset div {B}").alias("is_start"),
            # token slice: 1-based start, bounded length
            F.expr(
                f"slice(toks, cast(greatest(offset, seq_id * {B}) - offset"
                f" + 1 as int),"
                f" cast(least(offset + n_tokens, (seq_id + 1) * {B})"
                f" - greatest(offset, seq_id * {B}) as int))"
            ).alias("frag"),
        )
    )
    # ONE shuffle: every per-sequence column assembles in the same
    # groupBy(seq_id) aggregate. collect_list drops the nulls the
    # when() leaves for non-start fragments, so the starts list needs
    # no second pass.
    return frags.groupBy("seq_id").agg(
        F.sum(F.size("frag").cast("bigint")).alias("n_seq_tokens"),
        F.sum(F.col("is_start").cast("bigint")).alias("n_docs"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("is_start"), F.col("pos")))
                ),
                lambda p: p.cast("string"),
            ),
            ",",
        ).alias("doc_starts"),
        F.array_join(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("frag")))
                    ),
                    lambda x: x["frag"],
                )
            ),
            " ",
        ).alias("packed_text"),
    )


PACK_INCR_BASE = 400  # fixture split: doc_id < this = already-packed corpus


def pack_sequences_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-batch packing — the incremental rung of the packing
    ladder (mirrors ``dedup_incremental``'s batch-vs-corpus shape):
    lay out a NEW batch of documents at the end of an already-packed
    corpus without re-scanning the corpus stream. In production the
    packed corpus's total token count lives in its manifest; here it
    is recomputed from the fixture with ONE narrow scalar aggregate
    (never a window over the corpus), and the two-level prefix sum
    runs over the BATCH only — per-ingest-day cost is O(|batch|),
    independent of corpus size, which is the entire point at 100 TB.

    Fixture convention: docs with ``doc_id < PACK_INCR_BASE`` are the
    existing corpus, the rest are the appended batch (append packing
    presumes batch ids sort after the corpus — true for ingest-ordered
    ids).

    Oracle: DuckDB computes the naive global-window cumsum over ALL
    documents and filters to the batch — the incremental
    aggregate+shift spelling must agree with the from-scratch global
    layout row for row."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_append_from_docs(
        docs.filter(F.col("doc_id") >= PACK_INCR_BASE),
        docs.filter(F.col("doc_id") < PACK_INCR_BASE),
    )


def pack_append_from_docs(
    batch: DataFrame, corpus: DataFrame, bucket_width: int | None = None
) -> DataFrame:
    """Frame-in core of :func:`pack_sequences_incremental`: the
    corpus contributes exactly one number (its token total — the
    broadcast of a 1-row scalar aggregate is constant-size at any SF,
    per the forced-hint policy); the batch is laid out by the same
    two-level prefix sum as :func:`pack_from_docs` and shifted."""
    base = corpus.select(
        F.coalesce(
            F.sum(F.expr("cast(size(split(text, ' ')) as bigint)")),
            F.lit(0).cast("bigint"),
        ).alias("t0")
    )
    layout = pack_from_docs(batch, bucket_width=bucket_width)
    return (
        layout.crossJoin(F.broadcast(base))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("offset") + F.col("t0")).alias("offset"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "offset",
            F.expr(f"offset div {PACK_BUDGET}").alias("seq_id"),
            F.expr(f"offset % {PACK_BUDGET}").alias("pos_in_seq"),
            F.expr(
                f"(offset + n_tokens - 1) div {PACK_BUDGET} >"
                f" offset div {PACK_BUDGET}"
            ).alias("crosses_boundary"),
        )
    )


def corpus_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K vocabulary: token frequency and document frequency
    over the whole corpus (word-count with map-side combine; the top-k
    runs over |vocab| aggregated rows, never raw tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(TOP_K_TOKENS)
    )


LEN_BUCKET_W = 16  # doc_length_histogram bucket width (tokens)


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: documents bucketed by whitespace token
    count in ``LEN_BUCKET_W``-token bins, with each bin's document
    and token share in exact milli units — the distribution a length
    filter or packing-budget choice is read off.

    One map-side-combined shuffle on the bucket id (cardinality =
    max_len / width), one broadcast total. Fixture lengths span
    10-99 tokens, so ~6 bins are populated at every SF."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        F.expr(f"size(split(text, ' ')) div {LEN_BUCKET_W}").alias(
            "bucket"
        ),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    tot = b.agg(
        F.count(F.lit(1)).alias("tot_docs"),
        F.sum("n_tokens").alias("tot_tokens"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.col("bucket") * LEN_BUCKET_W).alias("lo_tokens"),
            "n_docs",
            "n_tokens",
            F.expr("(1000 * n_docs) div tot_docs").alias(
                "docs_share_milli"
            ),
            F.expr("(1000 * n_tokens) div tot_tokens").alias(
                "tokens_share_milli"
            ),
        )
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regexp_replace chain over email / phone / IP
    patterns, map-side only.

    The fixture corpus is word soup with no PII, so the query plants
    deterministic doc_id-derived PII spans first (emails on
    doc_id%3==0, phones on doc_id%2==0, an IP on every doc) and then
    redacts — the planted/redacted counts differ per doc, so the
    oracle actually exercises the match logic rather than a no-op.
    """
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.expr(
            "concat(substring(text, 1, 40),"
            " CASE WHEN doc_id % 3 = 0 THEN"
            "   concat(' user', cast(doc_id as string), '@example.com')"
            " ELSE '' END,"
            " CASE WHEN doc_id % 2 = 0 THEN"
            "   concat(' +1-555-', lpad(cast(doc_id % 10000 as string),"
            "                           4, '0'))"
            " ELSE '' END,"
            " ' ip:10.0.', cast(doc_id % 256 as string), '.1')"
        ).alias("t"),
    )
    red = (
        planted.withColumn(
            "n_emails", F.regexp_count("t", F.lit(EMAIL_RE))
        )
        .withColumn("n_phones", F.regexp_count("t", F.lit(PHONE_RE)))
        .withColumn("n_ips", F.regexp_count("t", F.lit(IP_RE)))
        .withColumn(
            "redacted",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("t", EMAIL_RE, "<EMAIL>"),
                    PHONE_RE,
                    "<PHONE>",
                ),
                IP_RE,
                "<IP>",
            ),
        )
    )
    return red.select(
        "doc_id",
        F.col("n_emails").cast("int").alias("n_emails"),
        F.col("n_phones").cast("int").alias("n_phones"),
        F.col("n_ips").cast("int").alias("n_ips"),
        "redacted",
    )


CAP_PER_SOURCE = 50  # max docs kept per source


def cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the domain-balancing rule of web-crawl
    pipelines (no single domain may dominate the corpus): keep at most
    CAP_PER_SOURCE docs per source, best-first by the integer
    type-token-ratio quality score (milli-units, pure integer division
    — bit-identical cross-engine), doc_id tiebreak.

    Scale: one shuffle on source (the window partition key). Skewed
    mega-domains are exactly the motivating case: the window still
    sees one domain per partition, and a two-phase pre-cap (cap at
    10*K per partition-salt, then the true cap) bounds the skew if one
    domain outweighs an executor."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.expr(
            "(1000 * size(array_distinct(split(text, ' '))))"
            " div size(split(text, ' '))"
        ).alias("score_milli"),
    )
    win = Window.partitionBy("source").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= CAP_PER_SOURCE)
        .select("doc_id", "source", "score_milli", F.col("rnk").cast("int").alias("rnk"))
    )


def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score — the CCNet-style proxy
    (Wenzek et al., LREC'20 use LM perplexity; the unigram variant
    needs no external model): score each document by the average
    log10-probability of its tokens under the corpus's own unigram
    distribution. Rare-garbage documents (typos, boilerplate IDs,
    non-language noise) score low; fluent repetitive text scores high.
    Rounded to 6 decimals — each token's log10 is bit-identical
    cross-engine, and the ~1-ulp summation-order slack is 7 orders of
    magnitude below the rounding grid.

    Scale notes: the frequency table is |vocab|-sized (groupBy token
    with map-side combine), the scalar total broadcasts, and the
    token->freq join shuffles on token — the same word-count shape as
    corpus_top_tokens. No driver-side state; at 100 TB the vocab
    table is millions of rows, still executor-sized."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    return (
        toks.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log10(F.col("c") / F.col("n_total"))), 6
            ).alias("avg_logprob"),
        )
    )


# span_dedup_corpus: CCNet-style corpus-level duplicate-span removal
# (Wenzek et al., LREC'20 dedup paragraphs by hash; the single-line
# fixture docs make the unit a non-overlapping SPAN_W-word span).
SPAN_W = 3
SPAN_DUP_MIN_DOCS = 2  # span is "common" when >= this many docs share it


def _doc_spans(docs: DataFrame, checkpoint_dir: str | None):
    """doc_id -> (pos, span): each doc chopped into non-overlapping
    SPAN_W-word spans — the single source of the span unit both the
    accounting op and the rewrite op must agree on (their lockstep is
    what test_span_rewrite_keeps_unique_docs_intact asserts)."""
    spans = docs.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, cast(ceil(size(w) / {SPAN_W}.0) as int) - 1), "
            f"          i -> concat_ws(' ', slice(w, i * {SPAN_W} + 1, {SPAN_W})))"
        ).alias("spans"),
    )
    # materialize before explode — Generate re-evaluates its child
    # expression per OUTPUT row (see pipeline._word_ngrams)
    spans = materialize(spans, checkpoint_dir)
    return spans.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    )


def span_dedup_corpus(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Corpus-level duplicate-span accounting — the CCNet/C4
    paragraph-dedup analogue: chop each document into non-overlapping
    SPAN_W-word spans, count how many DISTINCT documents contain each
    exact span corpus-wide, and report per document how many of its
    spans are corpus-common (shared by >= SPAN_DUP_MIN_DOCS docs) —
    the spans a line-dedup pass would strip before training.

    Scale notes (100 TB): span construction is shuffle-free
    (transform+slice over the doc's own word array, map-side). The
    span-frequency table aggregates map-side before its one shuffle on
    span content, and the span->count join shuffles on the same key —
    boilerplate spans are the classic skew key, which is exactly what
    AQE skew-join splitting handles (the count side is one row per
    distinct span, never large per key). The final per-doc rollup
    shuffles on doc_id. No window over the corpus, no driver state."""
    docs = load_table(spark, sf_dir, "documents")
    sp = _doc_spans(docs, checkpoint_dir).select("doc_id", "span")
    counts = sp.groupBy("span").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        sp.join(counts, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                (F.col("n_docs") >= SPAN_DUP_MIN_DOCS).cast("long")
            ).alias("n_dup_spans"),
        )
    )


def source_overlap_matrix(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Cross-source contamination audit: pairwise SPAN_W-gram Jaccard
    overlap between every pair of sources — the matrix a pipeline
    inspects to find sources that republish each other's content (and
    would double-count under per-source sampling caps).

    Scale notes (100 TB): per-source distinct gram sets are built with
    one map-side-combined aggregate keyed on (source, gram); the
    pairwise intersection self-joins on gram CONTENT, where each gram
    contributes at most |sources|² pair-rows — bounded by the source
    count (tens), never by corpus size. Per-source totals are a
    |sources|-row broadcast. Jaccard is ONE IEEE division of exact
    longs, rounded to 6 — bit-identical cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    idx = ", ".join(f"w[i+{k}]" for k in range(SPAN_W))
    grams = docs.select("source", F.split("text", " ").alias("w")).select(
        "source",
        F.expr(
            f"CASE WHEN size(w) >= {SPAN_W} THEN array_distinct("
            f"  transform(sequence(0, size(w) - {SPAN_W}), "
            f"            i -> concat_ws(' ', {idx})))"
            f" ELSE CAST(array() AS ARRAY<STRING>) END"
        ).alias("grams"),
    )
    grams = materialize(grams, checkpoint_dir)
    sg = grams.select(
        "source", F.explode("grams").alias("gram")
    ).distinct()
    totals = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = sg.select(F.col("source").alias("source_a"), "gram")
    b = sg.select(F.col("source").alias("source_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ta = F.broadcast(
        totals.select(
            F.col("source").alias("source_a"), F.col("n_grams").alias("na")
        )
    )
    tb = F.broadcast(
        totals.select(
            F.col("source").alias("source_b"), F.col("n_grams").alias("nb")
        )
    )
    return (
        inter.join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def span_dedup_rewrite(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """The rewrite half of :func:`span_dedup_corpus`: actually emit
    each document's cleaned text with corpus-common spans (shared by
    >= SPAN_DUP_MIN_DOCS docs) stripped, preserving original span
    order — what the CCNet/C4 line-dedup pass writes back to the
    corpus. Documents whose every span is corpus-common drop out
    entirely (nothing left to train on).

    Determinism: span order is carried as the span index and
    reassembled via array_sort(collect_list(struct(pos, span))) — no
    reliance on shuffle order. Scale notes: same shapes as the
    accounting op (map-side chop, one content-keyed count shuffle, one
    doc_id rollup); the rewrite adds no extra shuffle — the final
    groupBy doubles as the reassembly."""
    docs = load_table(spark, sf_dir, "documents")
    sp = _doc_spans(docs, checkpoint_dir)
    counts = sp.groupBy("span").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    kept = sp.join(counts, "span").filter(
        F.col("n_docs") < SPAN_DUP_MIN_DOCS
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept_spans"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "span"))),
                    lambda s: s["span"],
                ),
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            "n_kept_spans",
            F.length("clean_text").alias("clean_chars"),
            "clean_text",
        )
    )


SEED_W = 10  # repeated-substring seed width (tokens)
REP_MIN_OCC = 2  # a seed occurring this often anywhere is "repeated"


def _repeated_seeds(
    docs: DataFrame, checkpoint_dir: str | None
) -> DataFrame:
    """(doc_id, pos) for every position whose SEED_W-token window
    occurs >= REP_MIN_OCC times corpus-wide (counting ALL
    occurrences — within-document self-repetition included, as
    ExactSubstr dedups both). Shared seed stage of
    :func:`repeated_spans_from_docs`. The frame stays NARROW — only
    the two keys ride the corpus-wide gram shuffle; per-doc metadata
    is re-derived by the callers from the doc row they already hold.

    The join keys on gram CONTENT, not a hash: a 60-bit hash key would
    shave shuffle bytes but admits birthday collisions at 10^10+ grams
    (false "repeated" marks); exactness wins, and the gram payload is
    SEED_W words — bounded."""
    idx = ", ".join(f"w[i+{k}]" for k in range(SEED_W))
    g = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(w) >= {SEED_W} THEN"
            f"  transform(sequence(0, size(w) - {SEED_W}),"
            f"            i -> struct(cast(i as bigint) AS pos,"
            f"                        concat_ws(' ', {idx}) AS gram))"
            f" ELSE CAST(array() AS"
            f"   ARRAY<STRUCT<pos: BIGINT, gram: STRING>>) END"
        ).alias("gs"),
    )
    # materialize before explode — Generate re-evaluates its child
    # expression per OUTPUT row (see pipeline._word_ngrams)
    g = materialize(g, checkpoint_dir)
    grams = g.select("doc_id", F.explode("gs").alias("s")).select(
        "doc_id", F.col("s.pos").alias("pos"), F.col("s.gram").alias("gram")
    )
    rep = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= REP_MIN_OCC)
        .select("gram")
    )
    return grams.join(rep, "gram", "left_semi").select("doc_id", "pos")


def _seed_islands(seeds: DataFrame) -> DataFrame:
    """Merge overlapping/adjacent seed intervals [pos, pos+SEED_W)
    into maximal repeated spans per document (gaps-and-islands over
    the per-doc running max of interval ends; the window partitions
    by doc_id, so state is bounded by doc length, never corpus
    size). Returns (doc_id, span_start, span_end)."""
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = seeds.withColumn(
        "new_island",
        F.when(
            F.col("pos")
            > F.coalesce(
                F.max(F.col("pos") + F.lit(SEED_W)).over(w_prev),
                F.lit(-1).cast("bigint"),
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("new_island").over(w_run))
    return flagged.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(SEED_W)).alias("span_end"),
    )


def repeated_spans_from_docs(
    docs: DataFrame, checkpoint_dir: str | None = None
) -> DataFrame:
    """Frame-in span table (doc_id, span_start, span_end) — the
    expensive seed+merge stage shared by
    :func:`repeated_substring_spans` and
    :func:`repeated_substring_rewrite`; a pipeline that runs the
    accounting and then the rewrite feeds this table into
    :func:`rewrite_from_spans` once instead of paying the corpus-wide
    gram shuffle twice."""
    return _seed_islands(_repeated_seeds(docs, checkpoint_dir))


def repeated_substring_spans(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """ExactSubstr-style repeated-substring accounting (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"
    — the seed-and-merge spelling of their suffix-array pass): a
    token position is inside a repeated region iff some SEED_W-token
    window covering... precisely, iff it lies in the interval union
    of repeated SEED_W-gram seeds; overlapping/adjacent seeds merge
    into MAXIMAL spans. Differs from :func:`span_dedup_corpus` (C4
    line-dedup: fixed non-overlapping spans, distinct-doc counts) in
    exactly the way ExactSubstr differs from C4: overlapping windows
    catch repetitions at any alignment, and within-doc self-repetition
    counts.

    One row per document: how many maximal repeated spans it
    contains, how many of its tokens they cover, and the covered
    fraction in exact milli units — the accounting a pipeline reports
    before committing to the rewrite.

    Scale notes (100 TB): seed construction is map-side (transform
    over the doc's own words); the ONE corpus-wide shuffle keys on
    gram content with map-side combine (word-count shape — boilerplate
    grams are the skew keys and AQE skew splitting applies; the count
    side is one row per distinct gram). The semi-join back shuffles on
    the same key. Island merge windows partition by doc_id (bounded by
    doc length). No corpus-wide window, no driver state. This is the
    honest distributed alternative to a suffix array: identical span
    output for regions >= SEED_W, at the cost of SEED_W-bounded
    resolution below it."""
    docs = load_table(spark, sf_dir, "documents")
    return spans_accounting_from_docs(docs, checkpoint_dir)


def spans_accounting_from_docs(
    docs: DataFrame, checkpoint_dir: str | None = None
) -> DataFrame:
    """Frame-in core of :func:`repeated_substring_spans`."""
    spans = repeated_spans_from_docs(docs, checkpoint_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_rep_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("rep_tokens"),
    )
    base = docs.select(
        "doc_id",
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("n_tokens"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_rep_spans", F.lit(0).cast("bigint")).alias(
            "n_rep_spans"
        ),
        F.coalesce("rep_tokens", F.lit(0).cast("bigint")).alias(
            "rep_tokens"
        ),
        F.expr(
            "(1000 * coalesce(rep_tokens, 0)) div greatest(n_tokens, 1)"
        ).alias("rep_milli"),
    )


def repeated_substring_rewrite(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """The rewrite half of :func:`repeated_substring_spans`: emit each
    document's text with every maximal repeated span stripped — the
    aggressive every-occurrence variant (keeping one canonical copy
    per duplicate cluster needs a global occurrence order; pipelines
    that want it run this op's span table through a keep-first pass
    first). Documents fully covered by repeated spans drop to empty
    text but keep their row (n_kept_tokens = 0), so the op composes
    with downstream length gates.

    The strip stays in whole-stage codegen: spans collect per doc
    (bounded by n_tokens/SEED_W entries), join back to the doc row,
    and a higher-order filter drops covered positions — no extra
    shuffle beyond the span table's own, no Python UDF. The DuckDB
    oracle strips RELATIONALLY (explode span ranges, anti-join token
    positions, ordered string_agg), so parity is again a
    cross-algorithm proof."""
    docs = load_table(spark, sf_dir, "documents")
    return rewrite_from_spans(
        docs, repeated_spans_from_docs(docs, checkpoint_dir)
    )


def rewrite_from_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Frame-in core of :func:`repeated_substring_rewrite`, split so a
    pipeline (or test) can feed one precomputed span table into both
    halves instead of paying the corpus-wide gram shuffle twice."""
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("sp")
    )
    base = docs.select("doc_id", F.split("text", " ").alias("w"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_tokens"),
            F.expr(
                "filter(transform(sequence(0, size(w) - 1),"
                "                 i -> cast(i as bigint)),"
                "       p -> sp IS NULL OR NOT exists(sp,"
                "            s -> p >= s.span_start AND p < s.span_end))"
            ).alias("kept_pos"),
            "w",
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("kept_pos").cast("bigint").alias("n_kept_tokens"),
            F.concat_ws(
                " ",
                F.expr("transform(kept_pos, p -> w[cast(p as int)])"),
            ).alias("clean_text"),
        )
    )


def doc_bigram_logprob(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Bigram language-model quality score — the conditional-probability
    refinement of :func:`doc_unigram_logprob`: each document scores the
    average log10 of p(w2|w1) = c(w1 w2) / c(w1 ·) under the corpus's
    own bigram counts (maximum-likelihood, no smoothing — every
    observed bigram has a positive count by construction). Word-salad
    docs whose adjacent-word pairs are rare score low even when their
    unigrams are common — the signal the unigram model cannot see.
    Rounded to 6 decimals (same 1-ulp summation-slack argument as the
    unigram op).

    Scale notes: bigram construction is shuffle-free transform over
    the doc's own words; both count tables aggregate map-side before
    one content-keyed shuffle each, and the score join shuffles on the
    same bigram key — the word-count shape, twice. At 100 TB the
    bigram table is large but still groupBy-able (it is exactly what
    an n-gram-LM training job computes); no driver state anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id",
        F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "  transform(sequence(0, size(w) - 2), "
            "            i -> struct(w[i] AS w1, w[i+1] AS w2)) "
            "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) END"
        ).alias("bs"),
    )
    # materialize before explode — Generate re-evaluates its child
    # expression per OUTPUT row (see pipeline._word_ngrams)
    pairs = materialize(pairs, checkpoint_dir)
    bg = pairs.select("doc_id", F.explode("bs").alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log10(F.col("c12") / F.col("c1"))), 6
            ).alias("avg_logprob"),
        )
    )


QUERIES = {
    "doc_repetition": doc_repetition,
    "dataset_split": dataset_split,
    "pack_sequences": pack_sequences,
    "pack_sequences_write": pack_sequences_write,
    "pack_sequences_incremental": pack_sequences_incremental,
    "repeated_substring_spans": repeated_substring_spans,
    "repeated_substring_rewrite": repeated_substring_rewrite,
    "corpus_top_tokens": corpus_top_tokens,
    "doc_length_histogram": doc_length_histogram,
    "doc_unigram_logprob": doc_unigram_logprob,
    "pii_redact": pii_redact,
    "cap_per_source": cap_per_source,
    "span_dedup_corpus": span_dedup_corpus,
    "source_overlap_matrix": source_overlap_matrix,
    "doc_bigram_logprob": doc_bigram_logprob,
    "span_dedup_rewrite": span_dedup_rewrite,
}


def _gram_sql(n: int) -> str:
    """DuckDB n-gram list over ws (1-indexed)."""
    idx = " || ' ' || ".join(f"ws[i+{k}]" for k in range(n))
    return (
        f"CASE WHEN len(ws) >= {n} THEN"
        f" list_transform(generate_series(1, len(ws) - {n - 1}),"
        f"                i -> {idx})"
        f" ELSE [] END"
    )


def _dup_sql(n: int) -> str:
    g = _gram_sql(n)
    return (
        f"CASE WHEN len({g}) > 0 THEN"
        f" (1000 * (len({g}) - len(list_distinct({g})))) // len({g})"
        f" ELSE 0 END"
    )


ORACLES = {
    "doc_length_histogram": f"""
WITH b AS (
  SELECT len(string_split(text, ' ')) // {LEN_BUCKET_W} AS bucket,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
tot AS (SELECT count(*) AS tot_docs, sum(n_tokens) AS tot_tokens FROM b)
SELECT bucket,
       CAST(bucket * {LEN_BUCKET_W} AS BIGINT) AS lo_tokens,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST((1000 * count(*)) // any_value(tot_docs) AS BIGINT)
         AS docs_share_milli,
       CAST((1000 * sum(n_tokens)) // any_value(tot_tokens) AS BIGINT)
         AS tokens_share_milli
FROM b CROSS JOIN tot
GROUP BY bucket
""",
    "doc_unigram_logprob": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
tot AS (SELECT count(*) AS n_total FROM toks)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(log10(CAST(c AS DOUBLE) / n_total)), 6) AS avg_logprob
FROM toks JOIN freq USING (token) CROSS JOIN tot
GROUP BY doc_id
""",
    "cap_per_source": f"""
WITH scored AS (
  SELECT doc_id, source,
         (1000 * len(list_distinct(string_split(text, ' '))))
           // len(string_split(text, ' ')) AS score_milli
  FROM documents
)
SELECT doc_id, source, CAST(score_milli AS BIGINT) AS score_milli,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY score_milli DESC, doc_id ASC
  ) AS rnk
  FROM scored
)
WHERE rnk <= {CAP_PER_SOURCE}
""",
    "doc_repetition": f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
scored AS (
  SELECT doc_id,
         len(ws) AS n_tokens,
         {_dup_sql(2)} AS dup2_milli,
         {_dup_sql(3)} AS dup3_milli,
         (1000 * list_max(list_transform(list_distinct(ws),
             x -> len(list_filter(ws, y -> y = x))))) // len(ws)
           AS top_tok_milli
  FROM w
)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST(dup2_milli AS BIGINT) AS dup2_milli,
       CAST(dup3_milli AS BIGINT) AS dup3_milli,
       CAST(top_tok_milli AS BIGINT) AS top_tok_milli,
       (dup2_milli <= {DUP2_MAX_MILLI}
        AND top_tok_milli <= {TOP_TOK_MAX_MILLI}) AS keep
FROM scored
""",
    "dataset_split": f"""
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5('ds:' || CAST(doc_id AS VARCHAR)),
                            1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM b
""",
    "pack_sequences": f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS "offset"
  FROM t
)
SELECT doc_id, n_tokens, "offset",
       "offset" // {PACK_BUDGET} AS seq_id,
       "offset" % {PACK_BUDGET} AS pos_in_seq,
       ("offset" + n_tokens - 1) // {PACK_BUDGET}
         > "offset" // {PACK_BUDGET} AS crosses_boundary
FROM o
""",
    # the incremental oracle replays the FROM-SCRATCH global layout
    # (naive window cumsum over ALL docs) and filters to the batch —
    # the aggregate+shift spelling must agree row for row
    "pack_sequences_incremental": f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS "offset"
  FROM t
)
SELECT doc_id, n_tokens, "offset",
       "offset" // {PACK_BUDGET} AS seq_id,
       "offset" % {PACK_BUDGET} AS pos_in_seq,
       ("offset" + n_tokens - 1) // {PACK_BUDGET}
         > "offset" // {PACK_BUDGET} AS crosses_boundary
FROM o
WHERE doc_id >= {PACK_INCR_BASE}
""",
    # the writer oracle replays the NAIVE algorithm end-to-end: global
    # window cumsum, generate_series fragmentation, ordered string_agg
    # assembly — byte-identical packed_text is the cross-algorithm
    # proof (Spark runs the two-level prefix sum + slice/collect path)
    "pack_sequences_write": f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, toks, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS o
  FROM t
),
frag AS (
  SELECT s.seq AS seq_id,
         greatest(o.o, s.seq * {PACK_BUDGET})
           - s.seq * {PACK_BUDGET} AS pos,
         (s.seq = o.o // {PACK_BUDGET}) AS is_start,
         o.toks[
           CAST(greatest(o.o, s.seq * {PACK_BUDGET}) - o.o + 1 AS BIGINT)
           : CAST(least(o.o + o.n_tokens, (s.seq + 1) * {PACK_BUDGET})
                  - o.o AS BIGINT)
         ] AS frag
  FROM o
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(
      o.o // {PACK_BUDGET},
      (o.o + o.n_tokens - 1) // {PACK_BUDGET}
    )) AS seq
  ) s
)
SELECT seq_id,
       CAST(sum(len(frag)) AS BIGINT) AS n_seq_tokens,
       CAST(sum(CASE WHEN is_start THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       coalesce(string_agg(
         CASE WHEN is_start THEN CAST(pos AS VARCHAR) END,
         ',' ORDER BY pos), '') AS doc_starts,
       string_agg(array_to_string(frag, ' '), ' ' ORDER BY pos)
         AS packed_text
FROM frag
GROUP BY seq_id
""",
    "corpus_top_tokens": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
)
SELECT token,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM toks
GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {TOP_K_TOKENS}
""",
    "pii_redact": f"""
WITH planted AS (
  SELECT doc_id,
         substring(text, 1, 40)
         || CASE WHEN doc_id % 3 = 0
                 THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                         4, '0')
                 ELSE '' END
         || ' ip:10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{IP_RE}')) AS INT) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(
         t, '{EMAIL_RE}', '<EMAIL>', 'g'),
            '{PHONE_RE}', '<PHONE>', 'g'),
            '{IP_RE}', '<IP>', 'g') AS redacted
FROM planted
""",
    "span_dedup_corpus": f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
spans AS (
  SELECT doc_id,
         array_to_string(w[(i * {SPAN_W} + 1):(i * {SPAN_W} + {SPAN_W})],
                         ' ') AS span
  FROM d,
       UNNEST(range(CAST(ceil(len(w) / {SPAN_W}.0) AS BIGINT))) AS t(i)
),
counts AS (SELECT span, count(DISTINCT doc_id) AS n_docs FROM spans GROUP BY 1)
SELECT doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN n_docs >= {SPAN_DUP_MIN_DOCS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_spans
FROM spans JOIN counts USING (span)
GROUP BY doc_id
""",
    "source_overlap_matrix": f"""
WITH d AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
sg AS (
  SELECT DISTINCT source, gram
  FROM d, UNNEST({_gram_sql(SPAN_W)}) AS t(gram)
),
totals AS (SELECT source, count(*) AS n_grams FROM sg GROUP BY 1)
SELECT a.source AS source_a,
       b.source AS source_b,
       count(*) AS n_common,
       round(count(*) * 1.0
             / (ta.n_grams + tb.n_grams - count(*)), 6) AS jaccard
FROM sg a
JOIN sg b ON a.gram = b.gram AND a.source < b.source
JOIN totals ta ON ta.source = a.source
JOIN totals tb ON tb.source = b.source
GROUP BY a.source, b.source, ta.n_grams, tb.n_grams
""",
    "doc_bigram_logprob": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
  FROM d, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(avg(log10(c12 * 1.0 / c1)), 6) AS avg_logprob
FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY doc_id
""",
    "span_dedup_rewrite": f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
spans AS (
  SELECT doc_id, i AS pos,
         array_to_string(w[(i * {SPAN_W} + 1):(i * {SPAN_W} + {SPAN_W})],
                         ' ') AS span
  FROM d,
       UNNEST(range(CAST(ceil(len(w) / {SPAN_W}.0) AS BIGINT))) AS t(i)
),
counts AS (SELECT span, count(DISTINCT doc_id) AS n_docs FROM spans GROUP BY 1),
kept AS (
  SELECT doc_id, pos, span
  FROM spans JOIN counts USING (span)
  WHERE n_docs < {SPAN_DUP_MIN_DOCS}
)
SELECT doc_id,
       count(*) AS n_kept_spans,
       CAST(len(string_agg(span, ' ' ORDER BY pos)) AS INT) AS clean_chars,
       string_agg(span, ' ' ORDER BY pos) AS clean_text
FROM kept
GROUP BY doc_id
""",
}

# Repeated-substring oracles: same seed->merge algorithm spelled
# relationally in DuckDB (lateral generate_series + window islands);
# the rewrite oracle strips covered positions by anti-semantics
# (LEFT JOIN ... IS NULL) instead of Spark's higher-order filter —
# cross-algorithm parity on the strip itself.
_REP_SEED_SQL = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(s.i - 1 AS BIGINT) AS pos,
         array_to_string(w[s.i : s.i + {SEED_W} - 1], ' ') AS gram
  FROM w
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {SEED_W} + 1)) AS i
  ) s
),
rep AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) >= {REP_MIN_OCC}
),
seeds AS (
  SELECT g.doc_id, g.n_tokens, g.pos FROM g JOIN rep USING (gram)
),
isl AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN pos > coalesce(max(pos + {SEED_W}) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM seeds
),
isl2 AS (
  SELECT doc_id, n_tokens, pos,
         sum(new_island) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, min(pos) AS span_start,
         max(pos) + {SEED_W} AS span_end
  FROM isl2 GROUP BY doc_id, island
)
"""

ORACLES["repeated_substring_spans"] = f"""
WITH {_REP_SEED_SQL},
perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rep_spans,
         CAST(sum(span_end - span_start) AS BIGINT) AS rep_tokens
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_rep_spans, 0) AS BIGINT) AS n_rep_spans,
       CAST(coalesce(p.rep_tokens, 0) AS BIGINT) AS rep_tokens,
       CAST((1000 * coalesce(p.rep_tokens, 0)) // greatest(
         CAST(len(string_split(d.text, ' ')) AS BIGINT), 1
       ) AS BIGINT) AS rep_milli
FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""

ORACLES["repeated_substring_rewrite"] = f"""
WITH {_REP_SEED_SQL},
cov AS (
  SELECT spans.doc_id, CAST(c.p AS BIGINT) AS p
  FROM spans
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(span_start, span_end - 1)) AS p
  ) c
),
pos AS (
  SELECT doc_id, CAST(i.i - 1 AS BIGINT) AS p, w[i.i] AS tok
  FROM w
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS i
  ) i
),
kept AS (
  SELECT pos.doc_id, pos.p, pos.tok
  FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
  WHERE cov.p IS NULL
),
kagg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept_tokens,
       coalesce(k.clean_text, '') AS clean_text
FROM documents d LEFT JOIN kagg k USING (doc_id)
"""
