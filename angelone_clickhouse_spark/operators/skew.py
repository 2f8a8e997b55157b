"""Skew-resistant aggregation: two-phase (salted) group-by.

At 100 TB a handful of hot keys (one viral token, one dominant
user_id) can pin an aggregation's reducers. AQE splits skewed JOIN
partitions, but a skewed partial AGGREGATE on a low-cardinality hot
key still funnels into one reducer for the final merge of that key.
The classic fix: salt the key into S sub-keys, aggregate, then merge
the S partials — legal for any algebraic aggregate (sum/count/min/
max; avg as sum+count).

``salted_group_sum`` is the reusable utility; the test proves
result-equality with the direct aggregation (the plan trades one
shuffle on ``key`` for a shuffle on ``(key, salt)`` + a tiny merge of
|keys|·S rows)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.tables import load_table


def salted_group_sum(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    **aggs: Column,
) -> DataFrame:
    """Two-phase aggregation on a (possibly skewed) key.

    ``aggs``: name -> aggregate over the ORIGINAL columns; must be
    algebraic (re-aggregable with sum/min/max over partials). Supported
    re-merge is inferred from the aggregate's name prefix:
    sum_*/count_* merge with sum, min_* with min, max_* with max.
    """
    salted = df.withColumn(
        "_salt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_salts)
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    merges = []
    for name in aggs:
        if name.startswith(("sum_", "count_", "total_", "n_")):
            merges.append(F.sum(name).alias(name))
        elif name.startswith("min_"):
            merges.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            merges.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"aggregate {name!r}: prefix must declare the merge "
                "(sum_/count_/total_/n_/min_/max_)"
            )
    return partial.groupBy(key).agg(*merges)


def salted_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible demo of the salted path: per-user event stats
    through the two-phase aggregate, oracle-checked against a plain
    GROUP BY (salting must be invisible in the result). The value sum
    runs in integer cents through BOTH phases so the partial merge is
    exact — merging cent-grid DOUBLES would reintroduce float noise."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    out = salted_group_sum(
        ev,
        "user_id",
        n_salts=16,
        n_events=F.count(F.lit(1)),
        sum_value_cents=F.sum(cents),
        max_value=F.max("value"),
    )
    return out.select(
        "user_id",
        "n_events",
        (F.col("sum_value_cents") / F.lit(100.0)).alias("total_value"),
        "max_value",
    )


def skewed_hot_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted path under an ACTUAL heavy hitter: per-user stats
    over the skew-stress variant of events (sources/skewed.py — one
    user owns ~50% of rows). The oracle replays the deterministic
    remap inline, so a green driver row certifies the two-phase
    aggregate end-to-end on skewed data, not just on the near-uniform
    base fixture (VERDICT r5 #3)."""
    from angelone_clickhouse_spark.sources.skewed import skew_events

    ev = skew_events(load_table(spark, sf_dir, "events"))
    cents = F.round(F.col("value") * 100).cast("long")
    out = salted_group_sum(
        ev,
        "user_id",
        n_salts=16,
        n_events=F.count(F.lit(1)),
        sum_value_cents=F.sum(cents),
        max_value=F.max("value"),
    )
    return out.select(
        "user_id",
        "n_events",
        (F.col("sum_value_cents") / F.lit(100.0)).alias("total_value"),
        "max_value",
    )


QUERIES = {
    "salted_user_stats": salted_user_stats,
    "skewed_hot_user_stats": skewed_hot_user_stats,
}

ORACLES = {
    "salted_user_stats": """
SELECT user_id,
       count(*)                                                   AS n_events,
       CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS DOUBLE) / 100
                                                                  AS total_value,
       max("value")                                               AS max_value
FROM events
GROUP BY user_id
""",
    # HOT_USER = 7 (sources/skewed.py): even event_ids remapped
    "skewed_hot_user_stats": """
SELECT CASE WHEN event_id % 2 = 0 THEN 7 ELSE user_id END          AS user_id,
       count(*)                                                   AS n_events,
       CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS DOUBLE) / 100
                                                                  AS total_value,
       max("value")                                               AS max_value
FROM events
GROUP BY CASE WHEN event_id % 2 = 0 THEN 7 ELSE user_id END
""",
}
