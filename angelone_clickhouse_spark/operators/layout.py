"""Multi-dimensional data layout: Z-order (Morton) clustering stats.

At 100 TB the difference between scanning a table and scanning 1% of
it is the physical LAYOUT: min/max file statistics only prune when
each file's value range is narrow, and sorting by one column leaves
every OTHER column's per-file range unbounded. Z-ordering interleaves
the bits of several columns into one sort key so each file covers a
small hyper-rectangle — both dimensions prune (the device behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``; Morton 1966, and Orenstein &
Merrett's SIGMOD'84 treatment of Z-curves for range queries). The
reference engine has no layout control at all (SURVEY §2.3 —
ClickHouse ORDER BY is a single-dimension sort); this is a north-star
extension shaped after the public lakehouse practice.

``zorder_layout`` computes, entirely in-engine, the layout a Z-order
rewrite of ``events`` on (user_id, value) would produce — the zval of
every row, its target file, and the per-file min/max of BOTH
dimensions (the statistics a pruning reader consults). The payoff is
visible in the output itself: every file's user_id span AND value
span are narrow simultaneously, which no single-column sort achieves.

Determinism: both dimensions map to the 16-bit lattice in pure
integer arithmetic — floor(value*100) exact-double floor (the KM_GRID
device), then MIN-MAX RANGE NORMALIZATION onto [0, 2^16) in integer
division. Normalization is what makes interleaving meaningful when
dimensions occupy wildly different ranges (user_id tops out near 2^11
while value*100 fills ~2^16 here: un-normalized, the high Morton bits
all come from one column and the curve degenerates to a single-column
sort — exactly why production Z-order implementations normalize by
range or rank before interleaving). The bounds come from one tiny
aggregate broadcast to every row; bit interleave is shift/mask
arithmetic and the file id is ``zval div span`` — no global sort, no
RNG, every value bit-identical in DuckDB.

Scale notes (100 TB): zval and file_id are MAP-SIDE expressions; the
only shuffle is the per-file stats rollup (and, in a real rewrite,
the repartitionByRange(zval) the writer needs anyway — which is
exactly how you'd materialize this layout with Spark: compute zval,
``repartitionByRange`` on it, ``sortWithinPartitions``, write). The
16-bit-per-dimension lattice is a fixture-scale choice; a deployment
sizes bits to cardinality and keeps the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.tables import load_table

Z_BITS = 16  # lattice bits per dimension (zval is 2*Z_BITS wide)
Z_FILES = 64  # target file count for the layout plan
Z_SPAN = (1 << (2 * Z_BITS)) // Z_FILES  # zval range per file


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file statistics of a Z-order layout of ``events`` on
    (user_id, value): file id, row count, and min/max of both
    dimensions — narrow in BOTH because the Morton curve localizes
    both coordinates at once."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.col("user_id").alias("x"),
        F.expr("cast(floor(value * 100) as bigint)").alias("y"),
    )
    bounds = keyed.agg(
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
    )
    top = (1 << Z_BITS) - 1
    norm = (
        f"((%s - %s0) * {top}) div greatest(cast(1 as bigint), %s1 - %s0)"
    )
    zval = F.expr(
        f"aggregate(sequence(0, {Z_BITS - 1}), cast(0 as bigint), "
        f"(acc, b) -> acc"
        f" + (shiftright(xn, b) % 2) * shiftleft(cast(1 as bigint), 2 * b)"
        f" + (shiftright(yn, b) % 2) * shiftleft(cast(1 as bigint),"
        f" 2 * b + 1))"
    )
    return (
        keyed.crossJoin(F.broadcast(bounds))
        .select(
            "x",
            "y",
            F.expr(norm % ("x", "x", "x", "x")).alias("xn"),
            F.expr(norm % ("y", "y", "y", "y")).alias("yn"),
        )
        .select("x", "y", zval.alias("zval"))
        .select("x", "y", F.expr(f"zval div {Z_SPAN}").alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_user"),
            F.max("x").alias("max_user"),
            F.min("y").alias("min_value_c"),
            F.max("y").alias("max_value_c"),
        )
    )


QUERIES = {"zorder_layout": zorder_layout}

ORACLES = {
    "zorder_layout": f"""
WITH keyed AS (
  SELECT user_id AS x,
         CAST(floor("value" * 100) AS BIGINT) AS y
  FROM events
),
bounds AS (
  SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1
  FROM keyed
),
n AS (
  SELECT x, y,
         ((x - x0) * {(1 << Z_BITS) - 1})
           // greatest(CAST(1 AS BIGINT), x1 - x0) AS xn,
         ((y - y0) * {(1 << Z_BITS) - 1})
           // greatest(CAST(1 AS BIGINT), y1 - y0) AS yn
  FROM keyed CROSS JOIN bounds
),
z AS (
  SELECT x, y,
         -- DuckDB types a correlated sum() as HUGEINT (int128); CAST to
         -- BIGINT so file_id below matches Spark's LongType exactly
         -- (the driver's value hash is type-sensitive).
         CAST((SELECT sum(((xn >> b) & 1) * (CAST(1 AS BIGINT) << (2 * b))
                   + ((yn >> b) & 1) * (CAST(1 AS BIGINT) << (2 * b + 1)))
          FROM UNNEST(generate_series(0, {Z_BITS - 1})) AS t(b)) AS BIGINT) AS zval
  FROM n
)
SELECT zval // {Z_SPAN} AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(x) AS min_user, max(x) AS max_user,
       min(y) AS min_value_c, max(y) AS max_value_c
FROM z
GROUP BY 1
""",
}
