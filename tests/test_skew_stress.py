"""Skew-stress: the heavy-hitter fixture actually exercises the skew
machinery (VERDICT r5 #3).

The base fixtures are near-uniform, so the salted two-phase aggregate
and AQE skew handling were architecture claims. Here one user owns
~50% of events and one source ~50% of documents; the tests assert

1. the fixture IS skewed (hot key ≈ half the rows),
2. the salted path's RESULT is identical to the plain aggregate on
   the skewed data (salting must be invisible),
3. the hot key's rows actually spread across the salt sub-keys (the
   balance property that bounds any one reducer's share), and
4. a groupBy-heavy registry query (minute_bars) stays value-correct
   on the skewed data vs an independent DuckDB oracle.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.skewed import (
    HOT_SOURCE,
    HOT_USER,
    skew_documents,
    write_skewed_fixture,
)
from angelone_clickhouse_spark.sources.tables import load_table

N_SALTS = 16


@pytest.fixture(scope="session")
def skew_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("skewfix"))
    return write_skewed_fixture(spark, sf_dir, out)


def test_fixture_is_skewed(spark, skew_dir, sf_dir):
    ev = load_table(spark, skew_dir, "events")
    total = ev.count()
    hot = ev.filter(F.col("user_id") == HOT_USER).count()
    assert total == load_table(spark, sf_dir, "events").count()
    assert hot >= 0.45 * total, f"hot user owns {hot}/{total}"
    docs = skew_documents(load_table(spark, sf_dir, "documents"))
    dtotal = docs.count()
    dhot = docs.filter(F.col("source") == HOT_SOURCE).count()
    assert dhot >= 0.45 * dtotal


def test_salted_aggregate_parity_on_skew(spark, skew_dir):
    """Salting must be invisible in the result even when one key owns
    half the data — exact integer-cent arithmetic through both
    phases."""
    from angelone_clickhouse_spark.operators.skew import salted_user_stats

    got = {
        r.user_id: (r.n_events, r.total_value, r.max_value)
        for r in salted_user_stats(spark, skew_dir).collect()
    }
    ev = load_table(spark, skew_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    want = {
        r.user_id: (r.n_events, r.total_value, r.max_value)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / F.lit(100.0)).alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want
    assert want[HOT_USER][0] >= 0.45 * sum(v[0] for v in want.values())


def test_hot_key_spreads_across_salts(spark, skew_dir):
    """The balance property the salted plan buys: the hot key's rows
    land across all N_SALTS sub-keys with no sub-key holding more
    than 2x its fair share — so no single reducer inherits the hot
    key whole."""
    ev = load_table(spark, skew_dir, "events").filter(
        F.col("user_id") == HOT_USER
    )
    salted = ev.withColumn(
        "_salt",
        F.abs(F.xxhash64(F.monotonically_increasing_id())) % N_SALTS,
    )
    counts = [
        r.n for r in salted.groupBy("_salt").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(counts) == N_SALTS, "hot key must hit every salt bucket"
    fair = sum(counts) / N_SALTS
    assert max(counts) <= 2 * fair, (max(counts), fair)


def test_minute_bars_correct_on_skew(spark, skew_dir):
    """A groupBy-heavy registry query stays value-correct under the
    heavy-hitter distribution — checked against an independent DuckDB
    aggregation over the same skewed parquet."""
    import duckdb

    from angelone_clickhouse_spark.sources.tables import TICKS_ORACLE_CTE
    from angelone_clickhouse_spark.streaming.batch_equiv import QUERIES

    got = sorted(
        (str(r.bar_ts), r.token, r.open, r.close, r.total_volume, r.tick_count)
        for r in QUERIES["minute_bars"](spark, skew_dir)
        .select("bar_ts", "token", "open", "close", "total_volume", "tick_count")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{os.path.join(skew_dir, 'events.parquet')}/*.parquet')"
    )
    want = sorted(
        (str(ts), token, op, cl, vol, n)
        for ts, token, op, cl, vol, n in con.execute(
            TICKS_ORACLE_CTE
            + """
SELECT date_trunc('minute', ts) AS bar_ts, token,
       min_by(open_price, sequence_number) AS open,
       max_by(close_price, sequence_number) AS close,
       CAST(sum(CAST(round(volume * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_volume,
       count(*) AS tick_count
FROM ticks GROUP BY date_trunc('minute', ts), token
"""
        ).fetchall()
    )
    assert got == want


def test_session_has_aqe_skew_handling(spark):
    """The runtime half of the skew story: AQE + skew-join splitting
    are on for every session this engine creates."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_udaf_user_stats_plain_salted_builtin_agree(spark, skew_dir):
    """The bench crossover pair (skew.udaf_user_stats): the grouped-agg
    pandas UDAF sum — plain AND salted — must agree bit-for-bit with
    the built-in integer-cents sum on the skewed fixture (the UDAF is
    an exact int64 sum, so there is nothing to round)."""
    from angelone_clickhouse_spark.operators.skew import udaf_user_stats

    ev = spark.read.parquet(os.path.join(skew_dir, "events.parquet"))
    ref = dict(
        (r.user_id, r.ref)
        for r in ev.groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("ref"))
        .collect()
    )
    for salted in (False, True):
        got = dict(
            (r.user_id, r.sum_value_cents)
            for r in udaf_user_stats(ev, salted=salted).collect()
        )
        assert got == ref, f"salted={salted}"


def test_content_salt_identical_rows_collapse_and_identity_spreads(spark):
    """ADVICE r15: byte-identical duplicate rows collapse to ONE salt
    (the documented limitation — content hashing can't tell them
    apart), and mixing a stable per-row identity restores the spread
    without breaking determinism."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.skew import _content_salt

    df = spark.range(1000).select(
        F.lit(7).alias("key"), F.lit("same").alias("payload")
    )
    collapsed = df.select(
        _content_salt(df, 16).alias("s")
    ).select(F.countDistinct("s").alias("n")).collect()[0].n
    assert collapsed == 1  # the limitation, pinned
    spread_df = spark.range(1000).select(
        F.lit(7).alias("key"),
        F.lit("same").alias("payload"),
        F.col("id").alias("row_identity"),
    )
    spread = spread_df.select(
        _content_salt(
            spread_df.select("key", "payload"),
            16,
            identity=[F.col("row_identity")],
        ).alias("s")
    ).select(F.countDistinct("s").alias("n")).collect()[0].n
    assert spread == 16


def test_content_salt_skips_map_columns(spark):
    """xxhash64 rejects MapType (including nested); the salt must
    exclude such columns instead of failing analysis."""
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.operators.skew import _content_salt

    df = spark.range(100).select(
        F.col("id"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        F.array(F.create_map(F.lit("x"), F.lit(1))).alias("nested"),
    )
    out = df.select(_content_salt(df, 8).alias("s")).collect()
    assert all(0 <= r.s < 8 for r in out)
    # the hashable id column still spreads rows
    assert len({r.s for r in out}) > 1
