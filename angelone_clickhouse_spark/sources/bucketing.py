"""Bucketed tables: the shuffle-free fact-fact join strategy.

At 100 TB the expensive join is fact ⋈ fact (lineitem ⋈ orders here;
ticks ⋈ ticks-history in the reference's domain). Broadcasting is out
(neither side fits) and a shuffle moves both tables across the wire
every query. The standing fix is to pay the shuffle once at write
time: bucket both tables by the join key into the same number of
buckets; every subsequent equi-join on that key is planned with zero
Exchange on either side (SortMergeJoin over pre-bucketed scans).

Bucketing requires a metastore table (``saveAsTable``) — bucket
metadata lives in the catalog, not in parquet — so this module manages
named catalog tables; plan assertions live in
tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from angelone_clickhouse_spark.sources.tables import load_table


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) catalog table.
    ``path`` makes it an external table (location independent of the
    static warehouse dir)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucket_fact_tables(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 8,
    prefix: str = "bkt",
    base_path: str | None = None,
) -> tuple[str, str]:
    """Bucket lineitem and orders by order key into co-located tables."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    li_t, o_t = f"{prefix}_lineitem", f"{prefix}_orders"
    pa = (lambda t: f"{base_path}/{t}") if base_path else (lambda t: None)
    write_bucketed(li, li_t, "l_orderkey", n_buckets, path=pa(li_t))
    write_bucketed(o, o_t, "o_orderkey", n_buckets, path=pa(o_t))
    return li_t, o_t


def bucketed_join(spark: SparkSession, li_table: str, o_table: str) -> DataFrame:
    """The co-located join: no Exchange on either side (asserted in
    tests). Returns order-level revenue."""
    li = spark.table(li_table)
    o = spark.table(o_table)
    from pyspark.sql import functions as F

    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
