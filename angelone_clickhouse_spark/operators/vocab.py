"""Tokenizer-training support: BPE merge-pair statistics and
vocabulary OOV coverage.

The reference engine has no tokenizer surface (its documents never
leave ClickHouse: db/clickhouse.go:135-201 only INSERTs and SELECTs
tick rows); both ops here are north-star LLM-pipeline extensions,
shaped after public practice (Sennrich-style BPE training counts
adjacent symbol pairs weighted by word frequency; OOV rate against a
frequency-truncated vocabulary is the standard coverage diagnostic
when sizing one).

Scale notes (100 TB):

- ``bpe_merge_pairs`` uses the classic BPE-training factorization:
  aggregate the corpus to a word -> frequency table FIRST (one
  map-side-combined shuffle whose output is |vocab|, not |corpus| —
  word types grow sub-linearly in corpus size), then generate
  character pairs over the tiny word-type table only. A naive
  corpus-side pair explode would shuffle O(total characters); this
  shuffles O(corpus tokens) once for the word count and O(word-type
  characters) — essentially nothing — for the pair count. The final
  top-k is a TakeOrderedAndProject over |distinct pairs| rows.
- ``vocab_oov_rate`` builds the top-``VOCAB_K`` vocabulary the same
  way (word-count shuffle, driver-bounded top-k) and probes it with
  an explicit broadcast hash join — the vocabulary is k rows by
  construction, so the corpus-side token explode never shuffles for
  the membership test; the only full shuffle is the per-doc rollup
  on doc_id. Integer milli units keep the rate exactly comparable
  across engines.

Determinism: all counts are exact integers; every rank/truncation
tie-breaks by (count DESC, key ASC), so the vocabulary boundary and
the merge-pair top-k are total orders and the DuckDB oracles
reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.tables import load_table

MERGE_TOP_K = 50  # bpe_merge_pairs output size
VOCAB_K = 16  # vocab_oov_rate vocabulary size (fixture vocab is 31
# word types at every SF, so half the token mass is OOV — both ends
# of the rate are exercised non-degenerately)


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word -> corpus frequency: the one corpus-wide shuffle both ops
    share (map-side combine; output is |word types|)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration's pair statistics: the top
    ``MERGE_TOP_K`` adjacent character pairs by corpus occurrence
    count (word frequency x in-word adjacency count — occurrences,
    NOT distinct positions, exactly what BPE's merge-choice ranks).

    Columns: pair ("a b"), n_occurrences, n_word_types.
    """
    wf = _word_freq(spark, sf_dir)
    pairs = wf.select(
        "word",
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN length(word) >= 2 THEN"
                " transform(sequence(1, length(word) - 1),"
                "           i -> concat(substring(word, i, 1), ' ',"
                "                       substring(word, i + 1, 1)))"
                " ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("n_occurrences"),
            F.countDistinct("word").alias("n_word_types"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(MERGE_TOP_K)
    )


def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the top-
    ``VOCAB_K``-by-frequency vocabulary (ties broken by word ASC):
    n_tokens, n_oov, and the exact integer milli rate.
    """
    wf = _word_freq(spark, sf_dir)
    vocab = (
        wf.orderBy(F.desc("freq"), F.asc("word"))
        .limit(VOCAB_K)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long")).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("(1000 * n_oov) div n_tokens").alias("oov_milli"),
        )
    )


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token coverage at power-of-two vocabulary sizes (plus the full
    vocabulary as the final point): for each candidate size, what
    exact milli fraction of all corpus tokens the top-that-many words
    cover — the curve a tokenizer-size decision is read off.

    Scale notes: the global rank/cumsum window runs over the WORD-TYPE
    table (the same sub-linear-in-corpus table bpe_merge_pairs
    iterates), never the corpus — a single-task sort of |vocab| rows,
    which is the textbook shape for this table (at 100 TB word types
    are millions, not billions; the corpus-side work is the one
    map-side-combined word-count shuffle)."""
    from pyspark.sql.window import Window

    wf = _word_freq(spark, sf_dir)
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    ranked = wf.select(
        "freq",
        F.row_number().over(w).alias("rn"),
        F.sum("freq").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum_tokens"),
    )
    tot = wf.agg(
        F.sum("freq").alias("tot_tokens"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            (F.expr("(rn & (rn - 1)) = 0")) | (F.col("rn") == F.col("n_types"))
        )
        .select(
            F.col("rn").cast("long").alias("vocab_size"),
            "cum_tokens",
            F.expr("(1000 * cum_tokens) div tot_tokens").alias(
                "coverage_milli"
            ),
        )
    )


_WF_SQL = """
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
"""

QUERIES = {
    "bpe_merge_pairs": bpe_merge_pairs,
    "vocab_oov_rate": vocab_oov_rate,
    "vocab_coverage_curve": vocab_coverage_curve,
}

ORACLES = {
    "vocab_coverage_curve": f"""
WITH wf AS ({_WF_SQL}),
ranked AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, word ASC) AS rn,
         sum(freq) OVER (ORDER BY freq DESC, word ASC
                         ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM wf
),
tot AS (SELECT sum(freq) AS tot_tokens, count(*) AS n_types FROM wf)
SELECT CAST(rn AS BIGINT) AS vocab_size,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST((1000 * cum_tokens) // tot_tokens AS BIGINT)
         AS coverage_milli
FROM ranked CROSS JOIN tot
WHERE (rn & (rn - 1)) = 0 OR rn = n_types
""",
    "bpe_merge_pairs": f"""
WITH wf AS ({_WF_SQL}),
p AS (
  SELECT word, freq, pair
  FROM wf, UNNEST(
    CASE WHEN length(word) >= 2 THEN
      list_transform(generate_series(1, length(word) - 1),
                     i -> substring(word, i, 1) || ' ' ||
                          substring(word, i + 1, 1))
    ELSE [] END
  ) AS t(pair)
)
SELECT pair,
       CAST(sum(freq) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT word) AS BIGINT) AS n_word_types
FROM p
GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT {MERGE_TOP_K}
""",
    "vocab_oov_rate": f"""
WITH wf AS ({_WF_SQL}),
vocab AS (
  SELECT word FROM wf ORDER BY freq DESC, word LIMIT {VOCAB_K}
),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST((1000 * sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS oov_milli
FROM toks LEFT JOIN vocab v USING (word)
GROUP BY doc_id
""",
}
