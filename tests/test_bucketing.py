"""Bucketed co-located join: correctness + the no-shuffle plan claim."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.bucketing import (
    bucket_fact_tables,
    bucketed_join,
)
from angelone_clickhouse_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li_t, o_t = bucket_fact_tables(
        spark, sf_dir, n_buckets=4, prefix="t_bkt", base_path=str(wh)
    )
    yield li_t, o_t
    spark.sql(f"DROP TABLE IF EXISTS {li_t}")
    spark.sql(f"DROP TABLE IF EXISTS {o_t}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li_t, o_t = bucketed
    joined = bucketed_join(spark, li_t, o_t)
    # disable auto-broadcast so the plan must choose SMJ, then prove the
    # bucket layout removed both shuffles
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = bucketed_join(spark, li_t, o_t)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    join_section = plan.split("HashAggregate")[-1]  # below the agg: the join + scans
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, f"join still shuffles:\n{join_section[:2000]}"


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed):
    li_t, o_t = bucketed
    got = {
        (r.o_orderkey, r.o_orderstatus): (r.revenue, r.n_items)
        for r in bucketed_join(spark, li_t, o_t).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    expected = {
        (r.o_orderkey, r.o_orderstatus): (r.revenue, r.n_items)
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderkey", "o_orderstatus")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
            .collect()
        )
    }
    assert got == expected
