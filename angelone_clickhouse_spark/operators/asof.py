"""As-of (point-in-time) join — the canonical market-data lookup.

"What was the last traded price of token X at time T?" is the query
every consumer of the reference's tick table (db/clickhouse.go:17-25)
ultimately asks; Q1 (VerifyLastInserted, db/clickhouse.go:122-152) is
its T=now special case. Spark has no native AS OF join; this module
implements it Spark-first with the union-tag trick:

  union(ticks tagged 0, probes tagged 1)
  -> window last(value, ignorenulls) over
     (PARTITION BY key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)
  -> keep probe rows

One shuffle on the join key, no range explosion, no per-row search:
the sort inside the window interleaves probes among ticks so each
probe row's running "last non-null value" IS the as-of match.
Ordering by (ts, tag) with ticks first makes the match inclusive
(tick at exactly T matches a probe at T). At 100 TB this scales like
any windowed aggregate — the key partitioning bounds state, skewed
keys split via AQE, and probes are typically ~1000x fewer rows than
ticks so the union adds negligible shuffle volume.

The DuckDB oracle is the real ASOF JOIN (DuckDB implements it
natively), which makes this a strong differential: two entirely
different algorithms must agree row-for-row.

Ticks are first reduced to one row per (key, ts) keeping the highest
sequence_number (the last event of that instant) so the as-of match
is deterministic under timestamp ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from angelone_clickhouse_spark.sources.tables import TICKS_ORACLE_CTE, ticks, trunc_ntz


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_ts: str,
    event_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for each probe row, the most recent event
    row of the same key with event_ts <= probe_ts (inclusive).
    ``events`` must be unique per (key, event_ts). Probe rows with no
    preceding event are dropped (inner as-of semantics).

    The running carrier is a STRUCT of the value columns, not the
    columns themselves: an event row's struct is non-null even when
    every value inside it is NULL, so (a) a legitimately NULL-valued
    event still wins the as-of match (DuckDB's native ASOF JOIN
    semantics — last(col, ignorenulls) would silently skip back to an
    older non-null value), and (b) "no preceding event" is detected
    by struct nullness, never by a value column happening to be
    NULL."""
    ev = events.select(
        key,
        F.col(event_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_ev"),
    )
    pr = probes.select(
        key,
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(ev.schema["_ev"].dataType).alias("_ev"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.unionByName(pr).select(
        key,
        "_ts",
        "_tag",
        F.last("_ev", ignorenulls=True).over(w).alias("_ev"),
    )
    return (
        filled.filter(F.col("_tag") == 1)
        .filter(F.col("_ev").isNotNull())
        .select(
            key,
            F.col("_ts").alias(probe_ts),
            *[F.col(f"_ev.{c}").alias(c) for c in value_cols],
        )
    )


def asof_price_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered demo: for every (token, hour boundary) present in the
    tick data, the last traded price as of that boundary."""
    t = ticks(spark, sf_dir)
    reduced = t.groupBy("token", "ts").agg(
        F.max_by("last_traded_price", "sequence_number").alias("ltp")
    )
    probes = t.select(
        "token", trunc_ntz("HOUR", "ts").alias("probe_ts")
    ).distinct()
    return asof_join(
        probes,
        reduced,
        key="token",
        probe_ts="probe_ts",
        event_ts="ts",
        value_cols=["ltp"],
    )


QUERIES = {"asof_price_lookup": asof_price_lookup}

ORACLES = {
    # the oracle uses DuckDB's NATIVE ASOF JOIN — a completely
    # different algorithm than the union-tag window plan
    "asof_price_lookup": TICKS_ORACLE_CTE
    + """,
tr AS (
  SELECT token, ts, max_by(last_traded_price, sequence_number) AS ltp
  FROM ticks GROUP BY token, ts
),
probes AS (
  SELECT DISTINCT token, date_trunc('hour', ts) AS probe_ts FROM ticks
)
SELECT p.token, p.probe_ts, t.ltp
FROM probes p
ASOF JOIN tr t ON p.token = t.token AND p.probe_ts >= t.ts
""",
}
