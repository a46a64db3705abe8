"""TPC-H-shaped breadth queries, round 2: the remaining public-spec join/
aggregation shapes expressible over the synthetic star schema (no partsupp
table exists, so Q2/Q11/Q16/Q20 are adapted to lineitem-derived supplier
relationships, matching the adaptations already made for Q13/Q17/Q22).

Shapes covered here: disjunctive pushdown (Q19), scan-only tight-filter
aggregate (Q6), two-sided nation join (Q7), market share via conditional
aggregation (Q8), profit rollup (Q9), CASE-bucket counts over a date lag
(Q12), promo ratio (Q14), argmax-by-scalar-subquery (Q15), distinct-count
group (Q16), HAVING-scalar-subquery share filter (Q11 analog),
semi+anti-join chain with inequality residuals (Q21), grouped semi-join
threshold (Q20).

Float discipline is the house rule (queries.py module docstring): sums are
decimal-exact, divided/cast to double once, then rounded — Spark and the
DuckDB oracle produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _dec, _t, query

def _disc_price() -> F.Column:
    # built lazily: Column construction needs an active SparkContext,
    # which doesn't exist at import time
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4))


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
)


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 3) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.02 AND l_discount <= 0.04
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped scan-only aggregate: three conjunctive predicates,
    no join, one global sum. The plan test of predicate pushdown — all
    three filters must reach the parquet scan (PushedFilters), the
    projection prunes to four columns, and the aggregate is partial+final
    with a single-row exchange. At 100 TB this query IS the scan: its cost
    is bytes read after row-group skipping, nothing else."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * _dec("l_discount", 4)).cast("double"), 3
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(SUM(volume) AS DOUBLE), 3) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INTEGER) AS l_year,
                 {_DISC_PRICE_SQL} AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey
            AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped two-sided nation join: revenue between a nation
    PAIR, attributed by (supplier nation, customer nation, ship year).
    Scale shape: nation is broadcast TWICE under different aliases (no
    shuffle for either side of the pair predicate); the disjunctive pair
    filter prunes both dimension broadcasts before the fact joins; the
    fact tables hash-join on their keys only."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("sk"))
        .join(n2, c.c_nationkey == F.col("ck"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(_disc_price()).cast("double"), 3).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 {_DISC_PRICE_SQL} AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
            AND p_type = 'PROMO')
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: one nation's fraction of regional
    PROMO-part revenue per order year — the conditional-aggregation ratio
    shape (SUM(CASE)/SUM). Both sums stay decimal-exact and divide once in
    double, so the ratio is bit-identical across engines. Scale shape:
    region/nation broadcast, part filter prunes the part join's build
    side, facts hash-join on keys; the final exchange carries one row per
    year."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(F.col("n_nationkey").alias("ck"))
    )
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation")))
    vol = _disc_price()
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == F.col("ck"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, s.s_nationkey == F.col("sk"))
    )
    return (
        joined.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0)))
                .cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, ROUND(CAST(SUM(amount) AS DOUBLE), 3) AS profit
    FROM (SELECT n_name AS nation,
                 CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 {_DISC_PRICE_SQL} AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit rollup by (supplier nation, order year) for
    a part-name pattern (no partsupp table → profit is discounted revenue,
    the same join/agg skeleton). Scale shape: the LIKE filter prunes the
    broadcast part dimension before the fact join; nation broadcasts; one
    exchange for the (25 × years) group."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(_disc_price()).cast("double"), 3).alias("profit"))
    )


@query(
    "q11_value_share",
    oracle=f"""
    WITH v AS (SELECT n_name, SUM({_DISC_PRICE_SQL}) AS val
               FROM lineitem, supplier, nation
               WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
               GROUP BY n_name)
    SELECT n_name, ROUND(CAST(val AS DOUBLE), 3) AS value
    FROM v
    WHERE CAST(val AS DOUBLE) > (SELECT 0.04 * CAST(SUM(val) AS DOUBLE) FROM v)
    """,
)
def q11_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped HAVING-against-global-scalar: per-nation revenue
    kept only when it exceeds a fraction of the grand total (no partsupp →
    nation value share over lineitem). Scale shape: one grouped aggregate,
    then the grand total re-aggregates the 25 GROUP ROWS (not the fact
    table) and broadcasts as a one-row cross join — the decorrelated
    scalar subquery never rescans lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).alias("val"))
    )
    total = v.agg((F.lit(0.04) * F.sum("val").cast("double")).alias("threshold"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select("n_name", F.round(F.col("val").cast("double"), 3).alias("value"))
    )


@query(
    "q12_ship_delay_priority",
    oracle="""
    SELECT delay_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (SELECT o_orderpriority,
                 CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                     CAST(l_shipdate AS DATE)) > 60
                      THEN 'late' ELSE 'timely' END AS delay_class
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
    GROUP BY delay_class
    """,
)
def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped priority × lateness pivot (no l_shipmode column →
    the bucket key is the order→ship calendar-day lag). Both engines
    compute the lag as whole-calendar-day date arithmetic (Spark datediff
    on to_date == DuckDB date_diff('day') on DATE casts), so bucket edges
    are integer-exact. Scale shape: one fact-fact hash join on the order
    key, then a two-row conditional-count aggregate."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.when(lag > 60, F.lit("late")).otherwise(F.lit("timely")).alias("delay_class"),
            high.alias("is_high"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(disc) AS DOUBLE), 6) AS promo_revenue
    FROM (SELECT p_type, {_DISC_PRICE_SQL} AS disc
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00')
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo ratio: PROMO parts' percentage of one
    month's discounted revenue — conditional sum over a broadcast dim
    join, both sums decimal-exact, one double division then round. Scale
    shape: the month filter prunes at the lineitem scan; part broadcasts;
    the aggregate is a single row."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _disc_price()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("p_type"), disc.alias("disc"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("disc")).otherwise(F.lit(0)))
                .cast("double")
                / F.sum("disc").cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (SELECT l_suppkey AS supplier_no, SUM({_DISC_PRICE_SQL}) AS tr
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
                 GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, ROUND(CAST(tr AS DOUBLE), 3) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE tr = (SELECT MAX(tr) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped argmax via scalar subquery: the quarter's top-
    revenue supplier(s), selected by EXACT decimal equality against the
    max (no float argmax ambiguity — ties return multiple rows in both
    engines identically). Scale shape: the revenue 'view' aggregates once;
    the max re-aggregates the per-supplier ROWS and broadcasts as a
    one-row join; supplier is a broadcast dim."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("tr")
    )
    mx = rev.agg(F.max("tr").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("tr") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round(F.col("tr").cast("double"), 3).alias("total_revenue"))
    )


@query(
    "q16_supplier_part_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped distinct-supplier count per part attribute class
    (no partsupp → the supplier relationship comes from lineitem). Scale
    shape: the three dim predicates prune the broadcast part side; COUNT
    DISTINCT expands to a two-level aggregate (distinct on the full key
    first, then count) — both exchanges carry the post-filter key space
    only."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT ROUND(CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE), 3) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate join: an OR of three
    (brand, size, quantity) conjunct groups spanning BOTH tables.
    Catalyst extracts the common single-table factors of the disjunction
    (quantity ≤ 30 / size ≤ 15 classes) below the join, so each scan
    prunes before the join even though the full predicate straddles it —
    the textbook CNF-extraction test. Scale shape: part broadcasts, one
    residual-filtered hash join, single-row aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(_disc_price()).cast("double"), 3).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q20_red_part_suppliers",
    oracle="""
    WITH g AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
    s_qty AS (SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
              FROM lineitem JOIN g ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY l_suppkey)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN
      (SELECT l_suppkey FROM s_qty
       WHERE CAST(qty AS DOUBLE) >
             (SELECT 0.5 * CAST(SUM(qty) AS DOUBLE) / COUNT(*) FROM s_qty))
    """,
)
def q20_red_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped nested-aggregate semi join: suppliers who shipped
    more than half the average per-supplier quantity of 'red' parts in
    1996 (no partsupp availqty → the threshold is over shipped
    quantities). Scale shape: the part-name filter prunes a broadcast
    build side; the per-supplier aggregate is one exchange; the global
    threshold re-aggregates the per-supplier ROWS and broadcasts; the
    final semi join broadcasts the qualifying-supplier keys."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    s_qty = (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    thr = s_qty.agg(
        (F.lit(0.5) * F.sum("qty").cast("double") / F.count(F.lit(1))).alias("threshold")
    )
    qualifying = (
        s_qty.join(F.broadcast(thr))
        .filter(F.col("qty").cast("double") > F.col("threshold"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return s.join(F.broadcast(qualifying), "s_suppkey", "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "q21_sole_returned_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped EXISTS + NOT EXISTS chain (no receipt/commit dates
    → the fault predicate is the return flag): count, per supplier, lines
    in finished multi-supplier orders where THIS supplier is the only one
    with a returned line. The correlated subqueries decorrelate into a
    left-semi and a left-anti hash join on the order key, each with the
    supplier-inequality as a join residual — no nested loop, no fact
    rescans beyond the two slim (orderkey, suppkey[, flag]) projections.
    Scale shape: three hash exchanges on the order key + one broadcast dim
    join, then a one-exchange count by supplier name."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
    )
    l2 = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey"))
    )
    base = l1.join(o, l1.l_orderkey == o.o_orderkey)
    with_other = base.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    )
    sole = with_other.join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
