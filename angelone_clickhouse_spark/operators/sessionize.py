"""Event-stream relational ops: sessionization and JSON extraction.

The ``events`` table is the stream-shaped fixture (FIXTURES.md). These
are the classic clickstream ops a general analytics engine owes its
users; both are window-function / JSON-function compositions with full
DuckDB oracles.

Scale notes: sessionization is one shuffle on user_id (the window
partition key); the cumulative-sum session id needs no iteration —
lag + conditional sum is a single window pass. Skewed users would want
AQE skew handling or a salt on the *aggregation* that follows, never
on the window itself (session boundaries must see the full user
history in order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from angelone_clickhouse_spark.functions.exact import (
    avg_fixed,
    avg_fixed_sql,
    sum_fixed,
    sum_fixed_sql,
)
from angelone_clickhouse_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle > 30 minutes. Returns one row per session."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ in the driver's parquet; timestampdiff
    # works directly on NTZ, so the gap math never leaves naive
    # wall-clock time (no cast through a session-timezone-dependent
    # TIMESTAMP -> epoch hop). Floor both instants to the second first:
    # DuckDB's date_diff('second', ...) counts second-BOUNDARY
    # crossings, while Spark's timestampdiff truncates the exact
    # microsecond difference — on second-aligned inputs the two agree.
    sec = F.date_trunc("second", F.col("ts"))
    gap = F.timestamp_diff("SECOND", F.lag(sec).over(w), sec)
    with_break = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    with_sid = with_break.withColumn(
        "session_seq",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # explicit output casts mirroring gap_sessions (the green twin):
    # NTZ session bounds, BIGINT counters — the oracle's window sum is
    # a DuckDB HUGEINT, which survives pandas/arrow as float64/decimal
    # and hash-mismatches a raw Spark BIGINT even when values agree
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # exact integer-cents sum — round(sum(double)) diverges
            # cross-engine (functions/exact.py module docstring)
            sum_fixed("value", "total_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
            "total_value",
        )
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (props is a JSON string) rolled up per
    event type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            avg_fixed("k", "avg_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k").isNull().cast("long")).alias("n_missing"),
        )
    )


def event_type_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first-touch funnel: for each event type, how many users
    have it as their first event (min_by over the user's history)."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("first_event_type")
    )
    return first.groupBy("first_event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def value_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dispersion statistics per event type: population variance
    of the cent-grid ``value`` column carried as integers end-to-end —
    ``var = (n*Σx² − (Σx)²) / n²`` in cents², emitted in milli-cents²
    with integer division, so it is bit-identical cross-engine where
    float ``var_pop`` would wobble in the last ulp.

    The cross terms (n·Σx², (Σx)²) overflow a long already at sf0.1
    group sizes — ANSI mode catches it — so the arithmetic runs in
    DECIMAL(38,0) (Spark's integral ``div`` on decimals returns a
    long); DuckDB's HUGEINT does the same natively.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("sum_cents"),
            F.sum(F.col("c") * F.col("c")).alias("sumsq"),
        )
        .select(
            "event_type",
            "n",
            "sum_cents",
            F.expr(
                "(1000 * (cast(n as decimal(38,0)) * sumsq"
                "         - cast(sum_cents as decimal(38,0)) * sum_cents))"
                " div (cast(n as decimal(38,0)) * n)"
            ).alias("var_milli_cents2"),
        )
    )


WINDOW_MIN = 10  # sliding window length
SLIDE_MIN = 5  # slide step (windows overlap 2x)


def event_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping event-time windows (10 min length, 5 min slide) —
    the hopping-window rollup every stream dashboard runs; here as the
    deterministic batch twin of ``F.window``'s sliding mode (the
    streaming variant is the same expression under a watermark).

    Scale notes: Spark expands each row into length/slide = 2 window
    assignments *before* the hash aggregate, so partial aggregation
    still applies — one shuffle of per-window partials, never raw
    events twice.
    """
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", f"{WINDOW_MIN} minutes", f"{SLIDE_MIN} minutes")
    return (
        ev.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            sum_fixed("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
            "total_value",
        )
    )


def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the other classic clickstream rollup next to
    sessionization: users cohorted by first-activity week (Monday
    date_trunc, identical in both engines); each (cohort_week,
    weeks_since) cell counts the distinct cohort members active that
    week.

    Scale notes: distinct (user, week) pairs first — the dedup
    shrinks events to at most |users|*|weeks| rows before any join;
    the first-week aggregate and the join both key on user_id, so one
    shuffle is shared; the final cell aggregate is tiny."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts").cast("date")
    user_weeks = ev.select(
        "user_id", week.alias("week")
    ).distinct()
    firsts = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        user_weeks.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias(
                "weeks_since"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (the Markov/flow-diagram
    rollup next to the funnel): count (prev_type -> type) bigrams along
    each user's time-ordered history, plus '<start>' pseudo-transitions
    for first events.

    Scale notes: one shuffle on user_id for the lag window, then a
    partial-aggregated count on the (from, to) pair — the pair-key
    cardinality is |event_types|^2, so the second shuffle is tiny."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        ev.select(
            F.coalesce(prev, F.lit("<start>")).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


QUERIES = {
    "sessionize_events": sessionize_events,
    "event_transitions": event_transitions,
    "weekly_retention": weekly_retention,
    "json_extract_events": json_extract_events,
    "event_type_funnel": event_type_funnel,
    "event_sliding_windows": event_sliding_windows,
    "value_dispersion": value_dispersion,
}

_TOTAL_VALUE_SQL = sum_fixed_sql('"value"', "total_value")

ORACLES = {
    "event_transitions": """
WITH t AS (
  SELECT coalesce(lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ), '<start>') AS from_type,
         event_type AS to_type
  FROM events
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
FROM t
GROUP BY from_type, to_type
""",
    "weekly_retention": """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
  FROM events
),
firsts AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, uw.week) // 7 AS INTEGER)
         AS weeks_since,
       CAST(count(DISTINCT uw.user_id) AS BIGINT) AS n_users
FROM uw JOIN firsts f ON uw.user_id = f.user_id
GROUP BY 1, 2
""",
    "sessionize_events": f"""
WITH ordered AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, "value",
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second',
                                CAST(lag(ts) OVER w AS TIMESTAMP),
                                CAST(ts AS TIMESTAMP))
                      > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT *,
         sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_seq
  FROM ordered
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       min(ts)                     AS session_start,
       max(ts)                     AS session_end,
       CAST(count(*) AS BIGINT)    AS n_events,
       {_TOTAL_VALUE_SQL}
FROM sid
GROUP BY user_id, session_seq
""",
    "json_extract_events": f"""
WITH t AS (
  SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events
)
SELECT event_type,
       count(*)                                  AS n_events,
       {avg_fixed_sql("k", "avg_k")},
       max(k)                                    AS max_k,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM t
GROUP BY event_type
""",
    "event_type_funnel": """
SELECT first_event_type, count(*) AS n_users
FROM (
  SELECT user_id, event_type AS first_event_type
  FROM (
    SELECT user_id, event_type,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS rn
    FROM events
  ) ranked
  WHERE rn = 1
) f
GROUP BY first_event_type
""",
    # every event lands in exactly length/slide = 2 windows whose
    # starts are epoch-aligned slide multiples — UNION ALL of the two
    # shifted floors reproduces Spark's window expansion exactly
    "event_sliding_windows": f"""
WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, "value" FROM events
),
wins AS (
  SELECT make_timestamp((epoch_us(ts) // {SLIDE_MIN * 60_000_000})
                        * {SLIDE_MIN * 60_000_000}) AS ws,
         user_id, "value"
  FROM e
  UNION ALL
  SELECT make_timestamp((epoch_us(ts) // {SLIDE_MIN * 60_000_000})
                        * {SLIDE_MIN * 60_000_000}
                        - {SLIDE_MIN * 60_000_000}) AS ws,
         user_id, "value"
  FROM e
)
SELECT ws AS window_start,
       ws + INTERVAL {WINDOW_MIN} MINUTE AS window_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       {_TOTAL_VALUE_SQL}
FROM wins
GROUP BY ws
""",
    "value_dispersion": """
WITH c AS (
  SELECT event_type, CAST(round("value" * 100) AS BIGINT) AS c
  FROM events
)
SELECT event_type,
       count(*) AS n,
       CAST(sum(c) AS BIGINT) AS sum_cents,
       CAST((1000 * (count(*) * sum(c * c) - sum(c) * sum(c)))
            // (count(*) * count(*)) AS BIGINT) AS var_milli_cents2
FROM c
GROUP BY event_type
""",
}
