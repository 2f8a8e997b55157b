"""Wider TPC-H-shaped relational coverage (Q7/Q9/Q10/Q14/Q16/Q18/Q19/Q21).

The reference pushes every relational query to ClickHouse (SURVEY.md
§3.3); a drop-in engine must own the full shapes an analyst would run
against the same star schema. Each query here is the classic TPC-H
pattern re-parameterized to the driver fixtures (TESTDATA.md — no
partsupp/shipmode/commitdate columns, so the nearest expressible
variant is used and documented per-query).

Scale notes (100 TB):
- Broadcast-hint policy (VERDICT r15 #4 sweep): `F.broadcast` is
  FORCED only on sides whose size is a constant independent of SF —
  nation (25 rows), region (5 rows), and 1-row scalar aggregates.
  SF-proportional sides (customer, part, supplier, and any aggregate
  bounded by them) carry NO hint: a forced hint makes Spark attempt
  the broadcast at any size (at TPC-H SF ~10^5, customer alone is
  ~15 G rows — driver OOM), while unhinted the planner/AQE broadcasts
  them from size stats whenever they fit under
  autoBroadcastJoinThreshold and degrades to a shuffled join beyond
  that. Fixture-scale plans are identical either way
  (plan-snapshot-verified).
- Only fact⋈fact (lineitem⋈orders) must shuffle, once, on orderkey —
  the same key across queries, so a bucketed layout
  (sources/bucketing.py) removes even that.
- Q21's classic formulation is two correlated self-joins on lineitem;
  here it is decorrelated into ONE grouped pass over lineitem
  (counts of suppliers / late suppliers per order) joined back —
  linear work, no quadratic self-join, same result.
- Disjunctive predicates (Q19) stay in the scan filter: Catalyst
  pushes the OR-of-ANDs below the join after rewriting the common
  ``p_partkey = l_partkey`` conjunct, so the fact scan prunes rows
  before the broadcast probe.

All money aggregates use functions/exact.py fixed-point forms —
never ``round(sum(double))`` (cross-engine half-rounding; see
exact.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.functions.exact import (
    sum_fixed_round2,
    sum_fixed_round2_sql,
)
from angelone_clickhouse_spark.sources.tables import load_table

NATION_A = "NATION_3"
NATION_B = "NATION_7"
Q10_Q_START, Q10_Q_END = "1997-01-01", "1997-04-01"
Q14_M_START, Q14_M_END = "1997-03-01", "1997-04-01"
Q18_QTY = 250
LATE_DAYS = 60


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two nations, by
    (supplier nation, customer nation, ship year), both directions.

    nation copies broadcast (forced — constant 25 rows); supplier and
    customer join unhinted (SF-proportional — see module hint policy);
    lineitem⋈orders is the one mandatory shuffle. The nation-pair
    filter lands on the dim side, so fact rows for other nations never
    reach the aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == NATION_A)
                & (F.col("cust_nation") == NATION_B)
            )
            | (
                (F.col("supp_nation") == NATION_B)
                & (F.col("cust_nation") == NATION_A)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            sum_fixed_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per (supplier nation, order year) profit on
    PROMO parts. The fixture has no partsupp, so cost is
    ``p_retailprice * l_quantity`` (cent grid × integer qty — exact),
    and amount = revenue − cost lives on the 1e-4 grid, summed in
    integer units (negative-safe: both engines floor-divide)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(sum_fixed_round2(amount, 4, "sum_profit"))
    )


def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    (l_returnflag = 'R') for orders placed in one quarter.

    Aggregates on (custkey) BEFORE the customer/nation join, so the
    dim join input is ≤ |customers| rows (customer unhinted — AQE
    broadcasts it while it fits; nation forced, 25 rows)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_Q_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_Q_END).cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            sum_fixed_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
            )
        )
    )
    return (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "c_acctbal",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO-part share of one month's revenue.

    Both sums are exact integer 1e-4-grid units; the share is one IEEE
    division of two exact longs — bit-identical cross-engine. The part
    side joins unhinted (SF-proportional — module hint policy); the
    month filter prunes the fact scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_M_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_M_END).cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    promo_units = F.when(F.col("p_type") == "PROMO", units).otherwise(F.lit(0))
    # share = (100 * promo) / total with an exact-integer numerator and
    # ONE IEEE double division — DuckDB's `100.0 * x` would go through
    # DECIMAL arithmetic and diverge, so both engines scale in integers
    return j.agg(
        (
            (F.sum(promo_units) * F.lit(100)).cast("double")
            / F.sum(units)
        ).alias("promo_share_pct"),
        (F.sum(promo_units) / F.lit(10_000.0)).alias("promo_revenue"),
        (F.sum(units) / F.lit(10_000.0)).alias("total_revenue"),
    )


def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) for parts outside one brand/size set, excluding suppliers
    with negative balances (the fixture's stand-in for the complaints
    NOT IN subquery). The exclusion list is a LEFT ANTI (unhinted —
    SF-proportional supplier subset, AQE broadcasts while it fits);
    countDistinct shuffles once on the grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (~F.col("p_size").isin(9, 14, 23))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds Q18_QTY,
    with the customer attached. The HAVING runs on the grouped fact
    FIRST (result is tiny), then joins orders + customer (unhinted) —
    never the raw fact to the dim. Quantities are integral doubles, so
    the sum is exact; cast to long for a grid-free compare."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three
    (brand, size-range, quantity-range) conjunctions — the disjunctive
    predicate-pushdown test. Catalyst factors the common join conjunct
    out of the OR, so the part side joins pre-filtered (unhinted, AQE
    broadcasts while it fits) and each branch
    prunes at the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(branch1 | branch2 | branch3).agg(
        sum_fixed_round2(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


def supplier_late_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a late
    multi-supplier order (their line shipped > LATE_DAYS after the
    order date; no other supplier's did).

    Decorrelated: the classic EXISTS/NOT-EXISTS double self-join on
    lineitem becomes two cascaded grouped passes with NO distinct
    aggregates — per (orderkey, suppkey) first (any-late flag; this
    is where map-side partial aggregation eats the volume), then per
    orderkey counting pairs and late pairs. A qualifying order has
    EXACTLY one late supplier, so that supplier is recovered inside
    the same aggregate (max over late-only suppkeys) — no join-back,
    the lineitem-orders join runs once. The r8 spelling first removed
    the join-back (which re-evaluated the big join), then replaced
    the two countDistinct aggregates, whose Expand node tripled the
    shuffled row count, with the pair pre-aggregate: sf1.0 warm wall
    6.8 s -> 3.3 s. Linear in |lineitem| at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        ).alias("is_late"),
    )
    per_pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("supp_late").cast("int")).alias("n_late_supp"),
        # with n_late_supp == 1 this max IS the unique late supplier
        F.max(
            F.when(F.col("supp_late"), F.col("l_suppkey"))
        ).alias("late_supp"),
    )
    blamed = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey", F.col("late_supp").alias("l_suppkey"))
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(10)
    )


Q22_NATIONS = (3, 7, 11, 13, 17, 19, 23)
Q22_IDLE_SINCE = "2000-01-01"  # every fixture customer has SOME order; Q22's
# real predicate is recency-idleness
Q2_SIZE = 15


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (fixtures have no c_phone, so nationkey plays
    the country-code prefix): customers from a 7-nation set with
    balance above the set's positive-balance average and no order since
    Q22_IDLE_SINCE, rolled up per nation (the fixture gives every
    customer at least one historical order, so literal never-ordered is
    empty; recency-idleness is Q22's actual semantics).

    The correlated scalar AVG decorrelates to one 1-row aggregate
    broadcast back; the above-average comparison runs as an exact
    integer cross-multiply (bal_cents * n > sum_cents) — a float
    average threshold would let engine summation order flip boundary
    customers. The no-orders probe is a LEFT ANTI against orders
    (shuffle on custkey; at 100 TB, broadcast the aggregate side and
    bucket orders on custkey)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cc = c.filter(F.col("c_nationkey").isin(*Q22_NATIONS)).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    stats = cc.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("pos_sum"),
        F.count(F.lit(1)).alias("pos_n"),
    )
    rich = cc.crossJoin(F.broadcast(stats)).filter(
        F.col("bal_cents") * F.col("pos_n") > F.col("pos_sum")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit(Q22_IDLE_SINCE).cast("timestamp")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("bal_cents") / F.lit(100.0)).alias("total_acctbal"),
    )


def min_cost_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp table: per-(part, supplier) minimum
    lineitem price is the derived supply cost): for each part of the
    chosen size, the supplier offering the minimum cost, with
    supplier/nation attributes joined back; top 100 by (cost, partkey).

    The classic correlated `cost = (SELECT min(..) .. same part)`
    decorrelates into two aggregates: (partkey, suppkey) min — the one
    fact shuffle — then an argmin per partkey via min(struct(cost,
    suppkey)) (lexicographic struct min = min cost, ties to lowest
    suppkey) with NO window and NO join-back-to-fact. The nation dim
    broadcasts (forced, 25 rows); part/supplier join unhinted."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cost_cents"
            )
        )
    )
    best = cost.groupBy("l_partkey").agg(
        F.min(F.struct("cost_cents", "l_suppkey")).alias("b")
    )
    parts = p.filter(F.col("p_size") == Q2_SIZE)
    return (
        best.join(parts, best.l_partkey == parts.p_partkey)
        .join(s, F.col("b.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("b.l_suppkey").alias("s_suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            (F.col("b.cost_cents") / F.lit(100.0)).alias("min_cost"),
        )
        .orderBy(F.asc("min_cost"), F.asc("p_partkey"))
        .limit(100)
    )


Q6_YEAR = 1997
Q6_QTY = 24
Q12_LATE_DAYS = 45  # ship-latency band edge (days after order date)
Q17_BRAND = "Brand#13"


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from discounted small-quantity
    lineitems in one year — the pure filter-and-aggregate query whose
    entire cost is the scan. Every predicate (year range, discount
    band, quantity cap) pushes to the parquet scan; no join, no
    per-group shuffle, one exact integer sum. The discount band
    compares integer basis points (round(d*100)) — a double-equality
    band would be engine-dependent at the edges."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{Q6_YEAR}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{Q6_YEAR + 1}-01-01").cast("timestamp"))
            # the exact integer-basis-point band is not scan-pushable
            # (expression filter); the redundant coarse double range IS,
            # so the parquet scan still prunes before the exact band
            & (F.col("l_discount") >= 0.035)
            & (F.col("l_discount") <= 0.065)
            & F.round(F.col("l_discount") * 100).cast("int").isin(4, 5, 6)
            & (F.col("l_quantity") < Q6_QTY)
        )
        .agg(
            sum_fixed_round2(
                F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def ship_latency_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship-latency class (the fixture has no
    l_shipmode, so lineitems are classed by order->ship latency:
    <= Q12_LATE_DAYS days = 'ON_TIME' else 'LATE'), count lineitems
    from high-priority ('1-URGENT'/'2-HIGH') vs lower-priority orders
    — the classic CASE-pivot aggregate over one fact⋈fact join.

    Scale notes: the single shuffle is lineitem⋈orders on orderkey
    (bucketing removes it); the CASE counts partial-aggregate
    map-side to 2 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(lat <= Q12_LATE_DAYS, "ON_TIME").otherwise("LATE").alias(
                "latency_class"
            ),
            high.alias("is_high"),
        )
        .groupBy("latency_class")
        .agg(
            F.sum(F.col("is_high").cast("long")).alias("high_line_count"),
            F.sum((~F.col("is_high")).cast("long")).alias("low_line_count"),
        )
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers (the left outer join is the point
    of the query), excluding one order class ('5-LOW' stands in for
    the comment NOT LIKE filter the fixture lacks).

    Scale notes: aggregate orders per custkey FIRST (fact collapses
    to <= |customers| rows), then a broadcast-right LEFT join from the
    customer dim, then the tiny histogram groupBy. The raw fact never
    joins the dim."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("c_count")
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) for one brand
    were not taken. The correlated per-part AVG subquery is
    decorrelated into a grouped aggregate joined back — with the
    threshold compare in EXACT integer units: avg(qty)/5 =
    sum(qty)/(5*n), so qty < sum/(5n) <=> qty*5*n < sum with integral
    quantities — no engine-dependent double division on the decision
    boundary.

    Scale notes: the per-part aggregate is |parts|-sized and
    joins back unhinted (both sides are SF-proportional; AQE broadcasts
    the aggregate while it fits); the brand filter prunes the part dim
    before both
    the fact probe and the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND
    )
    li_b = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li_b.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        li_b.join(per_part, "l_partkey")
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("n_li")
            < F.col("sum_qty")
        )
        .agg(
            sum_fixed_round2(F.col("l_extendedprice") / 7.0, 4, "avg_yearly"),
            F.count(F.lit(1)).alias("n_small_qty_lines"),
        )
    )


Q5_REGION, Q5_YEAR = "ASIA", 1997
Q8_REGION, Q8_TYPE, Q8_NATION = "EUROPE", "STANDARD", "NATION_7"
Q11_NUM, Q11_DEN = 42, 1000  # brand counts as "important" above 4.2% share
Q15_Q_START, Q15_Q_END = "1997-01-01", "1997-04-01"
Q20_TYPE, Q20_REGION, Q20_YEAR = "PROMO", "AFRICA", 1997


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the
    customer and the supplier share that nation, within one region and
    one order year.

    Scale notes: nation/region broadcast (forced — constant-size);
    customer/supplier join unhinted (SF-proportional — module hint
    policy); the region + year predicates land on the dim/scan
    sides, so only matching fact rows reach the single
    lineitem⋈orders shuffle. The same-nation predicate is an equality
    between two already-joined dim columns — no extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{Q5_YEAR}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q5_YEAR + 1}-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            sum_fixed_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                4,
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's
    market for one part type, per order year. Share follows the Q14
    exact pattern — both sums in integer 1e-4 grid units, ONE IEEE
    double division of two exact longs, bit-identical cross-engine.

    Scale notes: both nation copies and region broadcast (forced —
    constant-size); part (type-filtered), customer, and supplier join
    unhinted (SF-proportional); the customer-region filter prunes fact
    rows
    before the aggregate; the single shuffle is lineitem⋈orders."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    nation_units = F.when(
        F.col("supp_nation") == Q8_NATION, units
    ).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                (F.sum(nation_units) * F.lit(100)).cast("double")
                / F.sum(units)
            ).alias("mkt_share_pct"),
            (F.sum(nation_units) / F.lit(10_000.0)).alias("nation_revenue"),
            (F.sum(units) / F.lit(10_000.0)).alias("total_revenue"),
        )
    )


def important_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp, so inventory value is
    p_retailprice × p_size per part): brands whose total value exceeds
    Q11_NUM/Q11_DEN of the grand total — the groupBy-then-HAVING-vs-
    global-scalar pattern.

    The global total is a 1-row aggregate broadcast back (the scalar
    subquery decorrelation); the threshold compare is an exact integer
    cross-multiply (value_units·DEN > total_units·NUM) — no float
    fraction on the decision boundary. Per-brand values are cent-grid
    × integer size, so sums are exact longs."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        (
            F.round(F.col("p_retailprice") * 100).cast("long")
            * F.col("p_size").cast("long")
        ).alias("value_units"),
    )
    per_brand = p.groupBy("p_brand").agg(
        F.sum("value_units").alias("brand_units")
    )
    total = per_brand.agg(F.sum("brand_units").alias("total_units"))
    return (
        per_brand.crossJoin(F.broadcast(total))
        .filter(
            F.col("brand_units") * F.lit(Q11_DEN)
            > F.col("total_units") * F.lit(Q11_NUM)
        )
        .select(
            "p_brand",
            (F.col("brand_units") / F.lit(100.0)).alias("brand_value"),
        )
    )


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter (ties kept, as the spec requires). The CREATE VIEW +
    max-scalar-subquery formulation decorrelates to: per-supplier
    aggregate (one fact shuffle, pre-pruned by the quarter filter) →
    1-row max broadcast back → exact integer equality (revenue is
    summed in 1e-4 grid units, so the tie compare is exact — a double
    max would make ties engine-dependent)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_Q_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_Q_END).cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
            ).cast("long")
        ).alias("rev_units")
    )
    top = rev.agg(F.max("rev_units").alias("max_units"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_units") == F.col("max_units"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            (F.col("rev_units") / F.lit(10_000.0)).alias("total_revenue"),
        )
    )


def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp/availqty, so "excess stock"
    becomes shipped-quantity dominance): suppliers from one region who
    shipped more than half of some Q20_TYPE part's total quantity in
    one year — the nested semi-join chain (supplier ⋉ qualifying
    (part, supplier) pairs ⋉ per-part totals).

    Scale notes: the fact collapses to (partkey, suppkey) rows FIRST
    (one shuffle); per-part totals re-aggregate those collapsed rows
    (tiny, ≤|parts|) and join back unhinted (SF-proportional; AQE
    broadcasts while they fit); dominance is an exact integer compare
    on integral quantities (2·q > total). The supplier side is a dim
    filtered through broadcast nation→region, and the final
    dedup is over qualifying suppkeys only — never the raw fact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q20_YEAR}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q20_YEAR + 1}-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q20_TYPE)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q20_REGION)
    ps = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    totals = ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("total_qty")
    )
    dominant = (
        ps.join(totals, "l_partkey")
        .filter(F.col("supp_qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        # dominant is bounded by |suppliers| — SF-proportional, so no
        # forced hint (AQE broadcasts the semi-join probe while it fits)
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


QUERIES = {
    "volume_shipping": volume_shipping,
    "forecast_revenue": forecast_revenue,
    "ship_latency_classes": ship_latency_classes,
    "customer_order_distribution": customer_order_distribution,
    "small_qty_revenue": small_qty_revenue,
    "nation_profit": nation_profit,
    "returned_item_revenue": returned_item_revenue,
    "promo_revenue_share": promo_revenue_share,
    "parts_supplier_counts": parts_supplier_counts,
    "large_orders": large_orders,
    "disjunctive_revenue": disjunctive_revenue,
    "supplier_late_blame": supplier_late_blame,
    "idle_rich_customers": idle_rich_customers,
    "min_cost_suppliers": min_cost_suppliers,
    "local_supplier_volume": local_supplier_volume,
    "market_share": market_share,
    "important_brands": important_brands,
    "top_supplier_revenue": top_supplier_revenue,
    "dominant_part_suppliers": dominant_part_suppliers,
}

_REV = "l_extendedprice * (1 - l_discount)"

ORACLES = {
    "forecast_revenue": f"""
SELECT {sum_fixed_round2_sql("l_extendedprice * l_discount", 4, "revenue")},
       count(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01'
  AND l_shipdate <  TIMESTAMP '{Q6_YEAR + 1}-01-01'
  AND CAST(round(l_discount * 100) AS INTEGER) IN (4, 5, 6)
  AND l_quantity < {Q6_QTY}
""",
    "ship_latency_classes": f"""
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= {Q12_LATE_DAYS}
            THEN 'ON_TIME' ELSE 'LATE' END AS latency_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
""",
    "customer_order_distribution": """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, coalesce(n, 0) AS c_count
  FROM customer
  LEFT JOIN (
    SELECT o_custkey, count(*) AS n
    FROM orders
    WHERE o_orderpriority <> '5-LOW'
    GROUP BY o_custkey
  ) oc ON c_custkey = oc.o_custkey
)
GROUP BY c_count
""",
    "small_qty_revenue": f"""
WITH li_b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         count(*) AS n_li
  FROM li_b GROUP BY l_partkey
)
SELECT {sum_fixed_round2_sql("l_extendedprice / 7.0", 4, "avg_yearly")},
       count(*) AS n_small_qty_lines
FROM li_b
JOIN per_part USING (l_partkey)
WHERE CAST(l_quantity AS BIGINT) * 5 * n_li < sum_qty
""",
    "volume_shipping": f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {sum_fixed_round2_sql(_REV, 4, "revenue")},
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{NATION_A}' AND n2.n_name = '{NATION_B}')
   OR (n1.n_name = '{NATION_B}' AND n2.n_name = '{NATION_A}')
GROUP BY 1, 2, 3
""",
    "nation_profit": f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {sum_fixed_round2_sql(
           "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity",
           4, "sum_profit")}
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
""",
    "returned_item_revenue": f"""
SELECT c_custkey, c_name, n_name AS nation, c_acctbal, revenue
FROM (
  SELECT o_custkey,
         {sum_fixed_round2_sql(_REV, 4, "revenue")}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{Q10_Q_START}'
    AND o_orderdate <  TIMESTAMP '{Q10_Q_END}'
  GROUP BY o_custkey
) r
JOIN customer ON r.o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    "promo_revenue_share": f"""
SELECT CAST(100 * sum(CASE WHEN p_type = 'PROMO' THEN units ELSE 0 END) AS DOUBLE)
             / CAST(sum(units) AS BIGINT)                          AS promo_share_pct,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN units ELSE 0 END) AS BIGINT)
             / 10000.0                                             AS promo_revenue,
       CAST(sum(units) AS BIGINT) / 10000.0                        AS total_revenue
FROM (
  SELECT p_type,
         CAST(round(({_REV}) * 10000) AS BIGINT) AS units
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_M_START}'
    AND l_shipdate <  TIMESTAMP '{Q14_M_END}'
)
""",
    "parts_supplier_counts": """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size NOT IN (9, 14, 23)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
""",
    "large_orders": f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum(l_quantity) AS BIGINT) > {Q18_QTY}
) b
JOIN orders   ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 100
""",
    "disjunctive_revenue": f"""
SELECT {sum_fixed_round2_sql(_REV, 4, "revenue")},
       count(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
    "supplier_late_blame": f"""
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY l_orderkey
),
blamed AS (
  SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
  FROM lo
  JOIN per_order po ON lo.l_orderkey = po.l_orderkey
  WHERE lo.is_late AND po.n_supp >= 2 AND po.n_late_supp = 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 10
""",
    "idle_rich_customers": f"""
WITH cc AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
  WHERE c_nationkey IN {Q22_NATIONS}
),
stats AS (
  SELECT sum(bal_cents) AS pos_sum, count(*) AS pos_n
  FROM cc WHERE bal_cents > 0
),
rich AS (
  SELECT cc.* FROM cc, stats
  WHERE bal_cents * pos_n > pos_sum
),
idle AS (
  SELECT * FROM rich
  WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = rich.c_custkey
      AND o_orderdate >= TIMESTAMP '{Q22_IDLE_SINCE}')
)
SELECT c_nationkey,
       count(*) AS n_customers,
       CAST(sum(bal_cents) AS DOUBLE) / 100 AS total_acctbal
FROM idle
GROUP BY c_nationkey
""",
    "min_cost_suppliers": f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, l_suppkey, cost_cents
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY l_partkey ORDER BY cost_cents, l_suppkey
    ) AS rn
    FROM cost
  ) WHERE rn = 1
)
SELECT p_partkey, p_name, l_suppkey AS s_suppkey, s_name,
       n_name AS nation,
       CAST(cost_cents AS DOUBLE) / 100 AS min_cost
FROM best
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_size = {Q2_SIZE}
ORDER BY min_cost ASC, p_partkey ASC
LIMIT 100
""",
    "local_supplier_volume": f"""
SELECT n_name AS nation,
       {sum_fixed_round2_sql(_REV, 4, "revenue")},
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_YEAR}-01-01'
  AND o_orderdate <  TIMESTAMP '{Q5_YEAR + 1}-01-01'
GROUP BY 1
""",
    "market_share": f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(100 * sum(CASE WHEN supp_nation = '{Q8_NATION}'
                           THEN units ELSE 0 END) AS DOUBLE)
             / CAST(sum(units) AS BIGINT)                  AS mkt_share_pct,
       CAST(sum(CASE WHEN supp_nation = '{Q8_NATION}'
                     THEN units ELSE 0 END) AS BIGINT)
             / 10000.0                                     AS nation_revenue,
       CAST(sum(units) AS BIGINT) / 10000.0                AS total_revenue
FROM (
  SELECT o_orderdate, n2.n_name AS supp_nation,
         CAST(round(({_REV}) * 10000) AS BIGINT) AS units
  FROM lineitem
  JOIN part      ON l_partkey = p_partkey
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
)
GROUP BY 1
""",
    "important_brands": f"""
WITH per_brand AS (
  SELECT p_brand,
         sum(CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(p_size AS BIGINT)) AS brand_units
  FROM part GROUP BY 1
),
total AS (SELECT sum(brand_units) AS total_units FROM per_brand)
SELECT p_brand,
       CAST(brand_units AS DOUBLE) / 100 AS brand_value
FROM per_brand, total
WHERE brand_units * {Q11_DEN} > total_units * {Q11_NUM}
""",
    "top_supplier_revenue": f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(({_REV}) * 10000) AS BIGINT)) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_Q_START}'
    AND l_shipdate <  TIMESTAMP '{Q15_Q_END}'
  GROUP BY 1
)
SELECT l_suppkey AS s_suppkey, s_name,
       CAST(rev_units AS DOUBLE) / 10000 AS total_revenue
FROM rev
JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_units = (SELECT max(rev_units) FROM rev)
""",
    "dominant_part_suppliers": f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS BIGINT)) AS supp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{Q20_TYPE}'
    AND l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01'
    AND l_shipdate <  TIMESTAMP '{Q20_YEAR + 1}-01-01'
  GROUP BY 1, 2
),
totals AS (SELECT l_partkey, sum(supp_qty) AS total_qty FROM ps GROUP BY 1),
dominant AS (
  SELECT DISTINCT l_suppkey
  FROM ps JOIN totals USING (l_partkey)
  WHERE supp_qty * 2 > total_qty
)
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
""",
}
