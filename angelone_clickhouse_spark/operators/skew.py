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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
