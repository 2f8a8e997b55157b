"""Financial aggregates over the canonical tick table: VWAP and TWAP.

The reference's users run a market-tick store (db/clickhouse.go:16-28
— ClickHouse MergeTree ordered by timestamp); volume- and
time-weighted average price are the queries that store exists to
serve, beyond the plain OHLCV the reference declares (README.md Q5).
Both are exact-integer formulations so the DuckDB differential is
bit-for-bit:

- VWAP: sum(price_cents * volume) and sum(volume) are exact long
  sums (order-independent); the weighted average is ONE truncating
  integer division (Spark ``div`` == DuckDB ``//``).
- TWAP: each tick is weighted by the seconds until the next tick in
  the same (token, hour), the last tick weighted to the hour end —
  lead() over an integer-seconds column, then the same integer-ratio
  device.

Scale notes: VWAP is one partial-aggregated shuffle on (token, date)
— the sink's own partitioning, so at 100 TB the exchange reuses the
layout. TWAP's window partitions on (token, hour) — the same key its
aggregate groups by, so window + groupBy share one shuffle; weights
never cross partition boundaries by construction (hour-end capping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from angelone_clickhouse_spark.sources.tables import (
    TICKS_ORACLE_CTE,
    ticks,
    trunc_ntz,
)


def _cents():
    """Exact price-in-cents: round(price*100) as long — the ONE
    spelling of the module's fixed-point contract. Every oracle CTE
    mirrors it as CAST(round(last_traded_price * 100) AS BIGINT); a
    rounding-mode change must happen here (and there), nowhere else."""
    return F.round(F.col("last_traded_price") * 100).cast("long")


# naive epoch anchor for tz-independent second arithmetic on NTZ
_EPOCH_NTZ = "1970-01-01 00:00:00"


def _secs_ntz(col):
    """Naive seconds-since-epoch of a TIMESTAMP_NTZ column — pure NTZ
    arithmetic (casting NTZ -> timestamp -> long would re-interpret
    the naive value in the session zone; across a DST transition the
    offsets differ and weights/buckets shift — the trunc_ntz
    lesson)."""
    epoch = F.lit(_EPOCH_NTZ).cast("timestamp_ntz")
    return F.timestamp_diff("SECOND", epoch, col)


def vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (token, day), exact integers
    end-to-end; zero-volume days fall back to the unweighted mean of
    prices (same rule in the oracle)."""
    t = ticks(spark, sf_dir)
    cents = _cents()
    vol = F.col("volume").cast("long")  # fixture volume is integer-valued
    return (
        t.select(
            "token",
            F.to_date("ts").alias("day"),
            cents.alias("c"),
            vol.alias("v"),
        )
        .groupBy("token", "day")
        .agg(
            F.sum(F.col("c") * F.col("v")).alias("pv"),
            F.sum("v").alias("total_volume"),
            F.sum("c").alias("sum_c"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "token",
            "day",
            "n_ticks",
            "total_volume",
            (
                F.when(
                    F.col("total_volume") > 0,
                    F.expr("pv div total_volume"),
                ).otherwise(F.expr("sum_c div n_ticks"))
                / F.lit(100.0)
            ).alias("vwap"),
        )
    )


def twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (token, hour): tick i holds its
    price for (t_{i+1} - t_i) seconds, the last tick until the hour
    end; weights and prices stay integers until one final division."""
    t = ticks(spark, sf_dir)
    secs = _secs_ntz(F.col("ts"))
    hour = trunc_ntz("HOUR", "ts")
    w = Window.partitionBy("token", "hour").orderBy("secs", "sequence_number")
    base = t.select(
        "token",
        hour.alias("hour"),
        secs.alias("secs"),
        "sequence_number",
        _cents().alias("c"),
    )
    hour_end = _secs_ntz(F.col("hour")) + 3600
    weighted = base.withColumn(
        "weight_s",
        F.coalesce(F.lead("secs").over(w), hour_end) - F.col("secs"),
    )
    return (
        weighted.groupBy("token", "hour")
        .agg(
            F.sum(F.col("c") * F.col("weight_s")).alias("cw"),
            F.sum("weight_s").alias("total_s"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "token",
            F.col("hour").alias("hour"),  # trunc_ntz is already NTZ
            "n_ticks",
            "total_s",
            (F.expr("cw div total_s") / F.lit(100.0)).alias("twap"),
        )
    )


HIST_BIN_CENTS = 2_000  # 20-unit price bins (fixture prices span ~0-500)


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram over the whole tick stream — the
    distribution profile every OLAP store serves. Bin assignment is a
    truncating integer division of exact cents, so edges are identical
    cross-engine. One partial-aggregated shuffle on ~|price range /
    bin| keys."""
    t = ticks(spark, sf_dir)
    cents = _cents()
    b = F.expr(f"c div {HIST_BIN_CENTS}")
    return (
        t.select("token", cents.alias("c"))
        .select("token", b.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.countDistinct("token").alias("n_tokens"),
        )
        .select(
            (F.col("bin") * HIST_BIN_CENTS / F.lit(100.0)).alias("bin_start"),
            "n_ticks",
            "n_tokens",
        )
    )


MAD_K = 5  # outlier if |dev| > K * MAD


def price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-(token, day) outlier accounting: lower-median price
    and lower-median absolute deviation (MAD), all in exact integer
    cents — discrete medians picked by rank (value at position
    (n+1) div 2 under a (value, sequence) order), never interpolated
    floats — then ticks with |dev| > K * max(MAD, 1 cent) are counted.
    The data-quality gate a tick store runs before publishing bars.

    Scale notes: two rank windows and two joins, every one keyed on
    (token, day) — a single exchange reused end-to-end; no global
    sort, no percentile sketch needed for the exact-integer contract."""
    t = ticks(spark, sf_dir)
    cents = _cents()
    base = t.select(
        "token",
        F.to_date("ts").alias("day"),
        "sequence_number",
        cents.alias("c"),
    )
    gw = Window.partitionBy("token", "day")
    mw = gw.orderBy("c", "sequence_number")
    med = (
        base.withColumn("rn", F.row_number().over(mw))
        .withColumn("n", F.count(F.lit(1)).over(gw))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("token", "day", F.col("c").alias("med"))
    )
    dev = base.join(med, ["token", "day"]).withColumn(
        "ad", F.abs(F.col("c") - F.col("med"))
    )
    aw = gw.orderBy("ad", "sequence_number")
    mad = (
        dev.withColumn("rn", F.row_number().over(aw))
        .withColumn("n", F.count(F.lit(1)).over(gw))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("token", "day", F.col("ad").alias("mad"))
    )
    flagged = dev.join(mad, ["token", "day"]).withColumn(
        "is_outlier",
        F.col("ad") > MAD_K * F.greatest(F.col("mad"), F.lit(1)),
    )
    return (
        flagged.groupBy("token", "day")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.max("med").alias("med_cents"),
            F.max("mad").alias("mad_cents"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        )
        .filter(F.col("n_outliers") > 0)
    )


def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per token: the deepest drop from a running
    peak over the (ts, sequence_number)-ordered price path — the
    risk metric a tick store serves after VWAP/TWAP. Exact integers
    end-to-end: prices on the cent grid, the running peak is a
    cumulative window max of longs, and the drawdown subtraction never
    leaves the grid.

    Scale notes: the cumulative max partitions on token — the same key
    the final aggregate groups by, so window + groupBy share ONE
    shuffle (the TWAP device). Per-token history must fit a partition
    for the window; at 100 TB with date-partitioned sink files, the
    per-(token, date) variant runs per partition and a tiny second
    pass merges peaks across days — same algebra as the bar rollup."""
    t = ticks(spark, sf_dir)
    cents = _cents()
    w = (
        Window.partitionBy("token")
        .orderBy("ts", "sequence_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    priced = t.select(
        "token", "ts", "sequence_number", cents.alias("c")
    ).withColumn("dd", F.max("c").over(w) - F.col("c"))
    return priced.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        (F.max("c") / F.lit(100.0)).alias("peak_price"),
        (F.max("dd") / F.lit(100.0)).alias("max_drawdown"),
    )


VOLA_N = 100  # rolling frame length in ticks
VOLA_TOKEN_MOD = 25  # token subset (the timeseries.resample_ffill device)


def rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling price variance per token over the last VOLA_N ticks —
    the realized-volatility input every quant pipeline derives from a
    tick store. Deterministic despite being a float statistic: the
    frame's count / sum / sum-of-squares are exact long sums of
    cent-grid prices (order-independent), and the variance is ONE IEEE
    division of exact longs, (n·Σc² − (Σc)²) / n² — no incremental
    float accumulation anywhere. Overflow headroom: cents ≤ ~5e4, so
    n·Σc² ≤ 2.5e13 at n=100 — long-safe by 5 orders of magnitude.

    Scale notes: all three frame aggregates share ONE window spec
    (token-partitioned, (ts, seq)-ordered ROWS frame), so Spark
    computes them in a single pass over one token-keyed shuffle; the
    token subset prunes the scan before the shuffle."""
    t = ticks(spark, sf_dir).filter(
        F.col("token").cast("long") % VOLA_TOKEN_MOD == 0
    )
    cents = _cents()
    w = (
        Window.partitionBy("token")
        .orderBy("ts", "sequence_number")
        .rowsBetween(-(VOLA_N - 1), 0)
    )
    base = t.select("token", "ts", "sequence_number", cents.alias("c"))
    n = F.count(F.lit(1)).over(w)
    s = F.sum("c").over(w)
    ss = F.sum(F.col("c") * F.col("c")).over(w)
    return base.select(
        "token",
        "sequence_number",
        n.alias("n_window"),
        ((n * ss - s * s) / (n * n)).alias("var_cents2"),
    )


EWMA_W = 8  # lookback ticks; alpha = 1/2 (weights 2^0 .. 2^(W-1))


def ewma_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average price per token — the
    smoothing signal every tick pipeline derives (RiskMetrics-style
    EWMA), in its truncated-window form so it stays exact: the last
    EWMA_W cent-grid prices weighted 2^0 (oldest) .. 2^(m-1) (newest)
    over a ROWS frame, one truncating long division by (2^m − 1) at
    the end. The infinite-memory recurrence is sequential by nature;
    truncating at W (weight tail < 2^-W of the mass) turns it into a
    frame-local expression with NO float accumulation and NO
    row-to-row state — each row's value is an independent exact
    function of its frame, which is what makes it both shuffle-
    parallel and bit-identical in DuckDB.

    Determinism: collect_list over a ROWS frame yields frame order
    (the (ts, sequence_number) total order), weights are exact powers
    of two, division truncates identically (div / //).

    Scale notes: one token-keyed shuffle for the window, whole-stage
    codegen end to end; the frame list is bounded at EWMA_W elements
    so memory per row is constant."""
    t = ticks(spark, sf_dir)
    cents = _cents()
    w = (
        Window.partitionBy("token")
        .orderBy("ts", "sequence_number")
        .rowsBetween(-(EWMA_W - 1), 0)
    )
    base = t.select("token", "ts", "sequence_number", cents.alias("c"))
    return base.select(
        "token",
        "sequence_number",
        F.collect_list("c").over(w).alias("frame"),
    ).select(
        "token",
        "sequence_number",
        F.expr("cast(size(frame) as int)").alias("n_window"),
        (
            F.expr(
                "aggregate(sequence(1, size(frame)), cast(0 as bigint),"
                " (acc, j) -> acc + frame[j - 1]"
                " * shiftleft(cast(1 as bigint), j - 1))"
                " div (shiftleft(cast(1 as bigint), size(frame)) - 1)"
            )
            / F.lit(100.0)
        ).alias("ewma"),
    )


QUERIES = {
    "vwap_daily": vwap_daily,
    "ewma_price": ewma_price,
    "twap_hourly": twap_hourly,
    "price_histogram": price_histogram,
    "price_outliers": price_outliers,
    "max_drawdown": max_drawdown,
    "rolling_volatility": rolling_volatility,
}

ORACLES = {
    "ewma_price": TICKS_ORACLE_CTE
    + f"""
, px AS (
  SELECT token, ts, sequence_number,
         CAST(round(last_traded_price * 100) AS BIGINT) AS c
  FROM ticks
),
frames AS (
  SELECT token, sequence_number,
         list(c) OVER w AS frame
  FROM px
  WINDOW w AS (PARTITION BY token ORDER BY ts, sequence_number
               ROWS BETWEEN {EWMA_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT token, sequence_number,
       CAST(len(frame) AS INTEGER) AS n_window,
       CAST(CAST(list_sum(list_transform(generate_series(1, len(frame)),
              j -> frame[j] * (CAST(1 AS BIGINT) << (j - 1)))) AS BIGINT)
            // ((CAST(1 AS BIGINT) << len(frame)) - 1) AS DOUBLE) / 100
         AS ewma
FROM frames
""",
    "rolling_volatility": TICKS_ORACLE_CTE
    + f"""
, px AS (
  SELECT token, ts, sequence_number,
         CAST(round(last_traded_price * 100) AS BIGINT) AS c
  FROM ticks
  WHERE CAST(token AS BIGINT) % {VOLA_TOKEN_MOD} = 0
),
frames AS (
  SELECT token, sequence_number,
         count(*) OVER w AS n,
         CAST(sum(c) OVER w AS BIGINT) AS s,
         CAST(sum(c * c) OVER w AS BIGINT) AS ss
  FROM px
  WINDOW w AS (PARTITION BY token ORDER BY ts, sequence_number
               ROWS BETWEEN {VOLA_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT token, sequence_number,
       n AS n_window,
       CAST(n * ss - s * s AS DOUBLE) / (n * n) AS var_cents2
FROM frames
""",
    "max_drawdown": TICKS_ORACLE_CTE
    + """
, px AS (
  SELECT token, ts, sequence_number,
         CAST(round(last_traded_price * 100) AS BIGINT) AS c
  FROM ticks
),
dd AS (
  SELECT token, c,
         max(c) OVER (PARTITION BY token ORDER BY ts, sequence_number
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - c AS d
  FROM px
)
SELECT token,
       count(*) AS n_ticks,
       CAST(max(c) AS DOUBLE) / 100 AS peak_price,
       CAST(max(d) AS DOUBLE) / 100 AS max_drawdown
FROM dd
GROUP BY token
""",
    "vwap_daily": TICKS_ORACLE_CTE
    + """
SELECT token,
       CAST(ts AS DATE) AS day,
       count(*) AS n_ticks,
       CAST(sum(v) AS BIGINT) AS total_volume,
       CAST(CASE WHEN sum(v) > 0
                 THEN sum(c * v) // sum(v)
                 ELSE sum(c) // count(*) END AS DOUBLE) / 100 AS vwap
FROM (
  SELECT token, ts,
         CAST(round(last_traded_price * 100) AS BIGINT) AS c,
         CAST(volume AS BIGINT) AS v
  FROM ticks
)
GROUP BY token, CAST(ts AS DATE)
""",
    "price_histogram": TICKS_ORACLE_CTE
    + f"""
SELECT CAST(bin * {HIST_BIN_CENTS} AS DOUBLE) / 100 AS bin_start,
       count(*) AS n_ticks,
       CAST(count(DISTINCT token) AS BIGINT) AS n_tokens
FROM (
  SELECT token,
         CAST(round(last_traded_price * 100) AS BIGINT)
           // {HIST_BIN_CENTS} AS bin
  FROM ticks
)
GROUP BY bin
""",
    "price_outliers": TICKS_ORACLE_CTE
    + f"""
, base AS (
  SELECT token, CAST(ts AS DATE) AS day, sequence_number,
         CAST(round(last_traded_price * 100) AS BIGINT) AS c
  FROM ticks
),
med AS (
  SELECT token, day, c AS med
  FROM (
    SELECT *, row_number() OVER w AS rn, count(*) OVER (
             PARTITION BY token, day) AS n
    FROM base
    WINDOW w AS (PARTITION BY token, day ORDER BY c, sequence_number)
  ) WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT base.*, med, abs(c - med) AS ad
  FROM base JOIN med USING (token, day)
),
mad AS (
  SELECT token, day, ad AS mad
  FROM (
    SELECT *, row_number() OVER w AS rn, count(*) OVER (
             PARTITION BY token, day) AS n
    FROM dev
    WINDOW w AS (PARTITION BY token, day ORDER BY ad, sequence_number)
  ) WHERE rn = (n + 1) // 2
)
SELECT token, day,
       count(*) AS n_ticks,
       max(med) AS med_cents,
       max(mad) AS mad_cents,
       CAST(sum(CASE WHEN ad > {MAD_K} * greatest(mad, 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (token, day)
GROUP BY token, day
HAVING sum(CASE WHEN ad > {MAD_K} * greatest(mad, 1) THEN 1 ELSE 0 END) > 0
""",
    "twap_hourly": TICKS_ORACLE_CTE
    + """
, base AS (
  SELECT token,
         date_trunc('hour', ts) AS hour,
         CAST(floor(epoch(ts)) AS BIGINT) AS secs,
         sequence_number,
         CAST(round(last_traded_price * 100) AS BIGINT) AS c
  FROM ticks
),
weighted AS (
  SELECT token, hour, c,
         coalesce(
           lead(secs) OVER (
             PARTITION BY token, hour ORDER BY secs, sequence_number
           ),
           CAST(floor(epoch(hour)) AS BIGINT) + 3600
         ) - secs AS weight_s
  FROM base
)
SELECT token, hour,
       count(*) AS n_ticks,
       CAST(sum(weight_s) AS BIGINT) AS total_s,
       CAST(sum(c * weight_s) // sum(weight_s) AS DOUBLE) / 100 AS twap
FROM weighted
GROUP BY token, hour
""",
}
