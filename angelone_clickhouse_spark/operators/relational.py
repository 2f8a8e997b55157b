"""General relational operator coverage over the star schema.

The reference outsources all relational execution to ClickHouse
(SURVEY.md §3.3) — its query surface never exceeds filter + group-by +
sort/limit. A drop-in engine still needs the full relational core, so
these queries exercise, with oracles, the operator classes SURVEY.md
§2.3 commits to: multi-way equi-joins (broadcast for dims, shuffle for
fact-fact), hash aggregation with partial/final phases, top-k
(TakeOrderedAndProject), window ranking, union/distinct, and
semi/anti joins.

Scale notes:
- ``revenue_by_nation`` joins the lineitem fact to orders (fact-fact:
  sort-merge/shuffled-hash under AQE) then to customer/nation/region
  dims — customer is borderline at real TPC-H scale; nation/region are
  always broadcast. At 100 TB the orders⋈lineitem join wants both
  sides bucketed by orderkey; the declarative plan is unchanged.
- ``top_customers`` aggregates BEFORE joining the customer dim, so the
  join input is |customers| rows, not |orders| rows.
- all ORDER BY ... LIMIT k carry a unique tiebreak on a key column so
  the result set is deterministic under floating-point revenue ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from angelone_clickhouse_spark.functions.exact import (
    avg_fixed,
    sum_fixed_round2,
    sum_fixed_round2_sql,
)
from angelone_clickhouse_spark.sources.tables import load_table

SHIP_CUTOFF = "1999-06-01"
REGION = "ASIA"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            sum_fixed_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                4, "sum_disc_price",
            ),
            sum_fixed_round2(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6, "sum_charge",
            ),
            avg_fixed("l_quantity", "avg_qty"),
            avg_fixed("l_extendedprice", "avg_price"),
            avg_fixed("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped revenue rollup: lineitem⋈orders⋈customer⋈nation⋈region."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == REGION)
        .groupBy("n_name")
        .agg(
            sum_fixed_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 customers by order revenue; aggregate-then-join keeps the
    dimension join input small."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        rev.join(F.broadcast(c), rev.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


def union_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT of customer and supplier nation keys (set-op parity;
    the reference's per-exchange union is main.go:287-294)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no urgent order (every customer has
    *some* order in the synthetic data, so the anti-join filters the
    probe side to keep the result non-trivial)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: the existence-check mirror of the anti-join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: each customer's top-3 orders by price (row_number
    with a unique orderkey tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def orders_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate decorrelation by hand: orders whose price
    beats their nation's average order price. The per-nation aggregate
    is tiny (25 rows) and broadcast back onto the fact — the classic
    rewrite of ``WHERE price > (SELECT avg(...) WHERE same nation)``
    that avoids a second fact shuffle.

    The comparison is exact integer arithmetic — ``cents * n_orders >
    sum_cents`` — so the boundary is bit-identical cross-engine (an
    avg-double compare would wobble on ties; functions/exact.py).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        "o_custkey",
        "c_nationkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias(
            "price_cents"
        ),
    )
    per_nation = oc.groupBy("c_nationkey").agg(
        F.sum("price_cents").alias("sum_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        oc.join(F.broadcast(per_nation), "c_nationkey")
        .filter(
            F.col("price_cents") * F.col("n_orders") > F.col("sum_cents")
        )
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("o_orderkey", "o_custkey", "n_name", "price_cents")
    )


CUTOFF = "1998-06-01"  # mid-range anchor; never wall-clock (oracle determinism)


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 not-yet-shipped orders of one market
    segment by outstanding revenue as of CUTOFF (ordered before,
    shipping after). The fixture has no o_shippriority column, so the
    output carries the order date instead.

    Plan shape: the segment filter prunes customers before the
    broadcast; lineitem and orders shuffle once on orderkey; revenue
    is the exact 1e-4-grid sum (functions/exact.py) so the top-10
    boundary is deterministic cross-engine (orderkey tiebreak).
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(CUTOFF).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(CUTOFF).cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            sum_fixed_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                4,
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


def late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders placed in a
    quarter have at least one line item shipped more than 30 days
    after ordering (the fixture lacks commit/receipt dates, so "late"
    is ship-minus-order > 30 days).

    The EXISTS is a LEFT SEMI join on orderkey with the date condition
    inside the join predicate — one shuffle, no dedup pass.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + lead window pair: balance quartile within each market
    segment plus the cent gap to the next-richer customer.

    Balances are carried as integer cents end-to-end, so quartile
    boundaries and gaps are bit-identical cross-engine. Scale notes:
    the window partitions by segment (bounded cardinality but each
    partition is |customers|/5 — at 100 TB you'd compute approx
    quartile cutoffs per segment and broadcast-join them instead of
    running a full sort window; same output contract).
    """
    c = load_table(spark, sf_dir, "customer")
    bal = c.select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("bal_cents", "c_custkey")
    return bal.select(
        "c_mktsegment",
        "c_custkey",
        "bal_cents",
        F.ntile(4).over(w).alias("quartile"),
        (F.lead("bal_cents").over(w) - F.col("bal_cents")).alias(
            "gap_cents"
        ),
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation): per-nation, per-region subtotal,
    and grand-total rows in one pass (partial aggregates reused across
    grouping sets — one shuffle, not three)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            sum_fixed_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
            F.grouping_id().cast("int").alias("level"),
        )
    )


EVENT_TYPES = ("click", "purchase", "error", "signup", "view")


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type, one row per user. Pivot values
    are DECLARED (not discovered) — at scale an unbounded pivot is a
    driver-side distinct scan; a declared list keeps it one pass."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


def event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide per-user event matrix back to long
    (user_id, event_type, n) rows — the inverse of event_type_pivot,
    a pure per-row expansion (no shuffle beyond the pivot's own)."""
    wide = event_type_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["user_id"],
        values=list(EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    )


def order_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping sets in one
    shuffle — completes the grouping-sets family next to ROLLUP
    (revenue_rollup). All-integer outputs; grouping_id disambiguates
    subtotal rows from genuine NULL groups."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.grouping_id().cast("int").alias("level"),
    )


def trailing_activity_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-token trailing-24h tick count at every
    tick — a value-based frame (RANGE BETWEEN 86400000 PRECEDING on
    epoch-millis), not a row-based one, so gaps in time shrink the
    frame. Completes the window-frame family next to the row_number /
    cumulative (sessionize) and unbounded (resample) frames."""
    from angelone_clickhouse_spark.sources.tables import ticks

    t = ticks(spark, sf_dir)
    w = (
        Window.partitionBy("token")
        # ts is TIMESTAMP_NTZ in the driver's parquet; unix_millis wants
        # LTZ and the NTZ->LTZ hop is wall-clock identity under the UTC
        # session (session.py)
        .orderBy(F.unix_millis(F.col("ts").cast("timestamp")))
        .rangeBetween(-86_400_000, 0)
    )
    return t.select(
        "token",
        "sequence_number",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_24h"),
    )


def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order growth — the trend query every dashboard
    opens with: monthly order counts and exact-cents totals, plus the
    MoM delta in basis points via truncating integer division over the
    previous month's cents (lag window on a ~|months| row aggregate —
    the window runs AFTER the reduction, so its input is tiny at any
    scale)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents"),
        )
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_c", F.lag("cents").over(w))
        .select(
            "month",
            "n_orders",
            (F.col("cents") / F.lit(100.0)).alias("revenue"),
            F.when(
                F.col("prev_c").isNotNull(),
                F.expr("((cents - prev_c) * 10000) div prev_c"),
            ).alias("growth_bp"),
        )
    )


QUERIES = {
    "pricing_summary": pricing_summary,
    "orders_monthly_growth": orders_monthly_growth,
    "revenue_rollup": revenue_rollup,
    "order_priority_cube": order_priority_cube,
    "trailing_activity_range": trailing_activity_range,
    "event_type_unpivot": event_type_unpivot,
    "event_type_pivot": event_type_pivot,
    "revenue_by_nation": revenue_by_nation,
    "top_customers": top_customers,
    "union_nationkeys": union_nationkeys,
    "customers_without_orders": customers_without_orders,
    "customers_with_urgent_orders": customers_with_urgent_orders,
    "customer_order_ranks": customer_order_ranks,
    "customer_balance_quartiles": customer_balance_quartiles,
    "orders_above_nation_avg": orders_above_nation_avg,
    "shipping_priority": shipping_priority,
    "late_shipment_priorities": late_shipment_priorities,
}

from angelone_clickhouse_spark.sources.tables import TICKS_ORACLE_CTE  # noqa: E402

ORACLES = {
    "orders_monthly_growth": """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  GROUP BY 1
)
SELECT month, n_orders,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       -- cents = sum(BIGINT) is HUGEINT in DuckDB, so the quotient is
       -- HUGEINT vs Spark's BIGINT; CAST so result types match the
       -- Spark schema exactly (oracle cast discipline, r13)
       CAST(CASE WHEN prev_c IS NOT NULL
            THEN ((cents - prev_c) * 10000) // prev_c END AS BIGINT)
         AS growth_bp
FROM (
  SELECT *, lag(cents) OVER (ORDER BY month) AS prev_c FROM monthly
)
""",
    "order_priority_cube": """
SELECT o_orderpriority,
       o_orderstatus,
       count(*)                          AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
            AS INTEGER) AS level
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
    "trailing_activity_range": TICKS_ORACLE_CTE
    + """
SELECT token,
       sequence_number,
       ts,
       CAST(count(*) OVER (
         PARTITION BY token ORDER BY epoch_ms(ts)
         RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_trailing_24h
FROM ticks
""",
    "event_type_unpivot": """
SELECT user_id, event_type, n FROM (
  SELECT user_id,
         CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
         CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
         CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
         CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view
  FROM events GROUP BY user_id
) UNPIVOT (n FOR event_type IN (click, purchase, error, signup, view))
""",
    "revenue_rollup": """
SELECT r_name,
       n_name,
       CAST(((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) + 50) // 100) AS DOUBLE) / 100 AS revenue,
       count(*)                                          AS n_lineitems,
       CAST(grouping(r_name) * 2 + grouping(n_name) AS INTEGER) AS level
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    "event_type_pivot": """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
       CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view
FROM events
GROUP BY user_id
""",
    "pricing_summary": f"""
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       CAST(((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) + 50) // 100) AS DOUBLE) / 100 AS sum_disc_price,
       CAST(((sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000) AS BIGINT)) + 5000) // 10000) AS DOUBLE) / 100 AS sum_charge,
       CAST((sum(CAST(round((l_quantity) * 100) AS BIGINT)) + count(*) // 2) // count(*) AS DOUBLE) / 100 AS avg_qty,
       CAST((sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) + count(*) // 2) // count(*) AS DOUBLE) / 100 AS avg_price,
       CAST((sum(CAST(round((l_discount) * 100) AS BIGINT)) + count(*) // 2) // count(*) AS DOUBLE) / 100 AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "revenue_by_nation": f"""
SELECT n_name,
       CAST(((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) + 50) // 100) AS DOUBLE) / 100 AS revenue,
       count(*)                                          AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{REGION}'
GROUP BY n_name
""",
    "top_customers": """
SELECT c_custkey, c_name, c_mktsegment, revenue, n_orders
FROM (
  SELECT o_custkey,
         round(sum(o_totalprice), 2) AS revenue,
         count(*)                    AS n_orders
  FROM orders
  GROUP BY o_custkey
) r
JOIN customer ON r.o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
""",
    "union_nationkeys": """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    "customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    "customers_with_urgent_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    "customer_order_ranks": """
SELECT o_custkey, o_orderkey, o_totalprice, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS INTEGER) AS rank
  FROM orders
) ranked
WHERE rank <= 3
""",
    "customer_balance_quartiles": """
SELECT c_mktsegment, c_custkey, bal_cents,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       lead(bal_cents) OVER w - bal_cents AS gap_cents
FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
) b
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY bal_cents, c_custkey)
""",
    "orders_above_nation_avg": """
WITH oc AS (
  SELECT o.o_orderkey, o.o_custkey, c.c_nationkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
pn AS (
  SELECT c_nationkey,
         CAST(sum(price_cents) AS BIGINT) AS sum_cents,
         count(*) AS n_orders
  FROM oc GROUP BY c_nationkey
)
SELECT oc.o_orderkey, oc.o_custkey, n.n_name, oc.price_cents
FROM oc
JOIN pn ON oc.c_nationkey = pn.c_nationkey
JOIN nation n ON oc.c_nationkey = n.n_nationkey
WHERE oc.price_cents * pn.n_orders > pn.sum_cents
""",
    "shipping_priority": f"""
SELECT l.l_orderkey, o.o_orderdate,
       {sum_fixed_round2_sql("l.l_extendedprice * (1 - l.l_discount)", 4, "revenue")}
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
""",
    "late_shipment_priorities": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
""",
}
