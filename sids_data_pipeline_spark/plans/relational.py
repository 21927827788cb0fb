"""Relational query catalog over the driver's TPC-H-ish tables.

Covers the reference's relational surface (SURVEY.md §2a: projections
P1-P3, filters P5, string scalars F1-F4, joins J2 + semi/anti shapes of
P6/P8, the A1 aggregate and its natural superset, sort O1) plus the
categories the reference lacks but the engine commits to ship (set ops,
window functions, rollup, date math, case-when, LIMIT).

Each entry is a ``Query``: a DataFrame plan plus its DuckDB oracle SQL.
Aggregates follow the exact-integer determinism policy (plans/base.py):
element-wise ``round(x*100)`` to cents, BIGINT sums, averages/stddevs as
deterministic double math over exact integer sums — bit-identical across
engines and partitionings, which is also what makes results reproducible
under AQE at 100 TB.

Scale notes: dimension joins (nation/region) broadcast explicitly;
fact-fact joins stay shuffled equi-joins Catalyst can plan; every filter
and projection lands in the Parquet scan (verified via .explain in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sids_data_pipeline_spark.plans.base import (
    Query,
    avg_from_cents,
    cents,
    o_avg_from_cents,
    o_cents,
    o_sum_cents,
    sum_cents,
    tables,
)

SHIP_CUTOFF = "2000-09-02"


# --- A1 superset: pricing summary (the TPC-H Q1 shape) ----------------------


def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_cents("l_quantity", "sum_qty_cents"),
            sum_cents("l_extendedprice", "sum_base_cents"),
            F.sum(cents(disc_price)).alias("sum_disc_cents"),
            avg_from_cents("l_quantity", "avg_qty"),
            avg_from_cents("l_extendedprice", "avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_PRICING_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {o_sum_cents('l_quantity', 'sum_qty_cents')},
       {o_sum_cents('l_extendedprice', 'sum_base_cents')},
       CAST(SUM({o_cents('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS sum_disc_cents,
       {o_avg_from_cents('l_quantity', 'avg_qty')},
       {o_avg_from_cents('l_extendedprice', 'avg_price')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Projections (P1/P2/P3) --------------------------------------------------


def _proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        cents("l_extendedprice").alias("price_cents"),
    )


def _proj_star_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        cents("o_totalprice").alias("total_cents"),
        F.unix_micros("o_orderdate").alias("o_orderdate_us"),
        "o_orderpriority",
        "c_name",
    )


# --- Filters (P5 shape on relational data) -----------------------------------


def _filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_discount").between(0.02, 0.05)
    ).select("l_orderkey", "l_linenumber", cents("l_quantity").alias("qty_cents"))


# --- String scalars (F1-F4) ---------------------------------------------------


def _str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    # F3 path stem/suffix parse on a constructed blob-style path (the
    # reference parses blob names, pipeline/processing/data.py:12)
    path = F.concat(F.lit("inputs/rasters/"), F.lower("p_name"), F.lit(".tif"))
    fname = F.element_at(F.split(path, "/"), -1)
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.concat_ws("_", F.lower("p_brand"), F.lower("p_type")).alias("brand_type"),
        F.regexp_replace("p_brand", "[^0-9]", "").alias("brand_digits"),
        # try_element_at: under ANSI mode a '#'-less brand would ABORT
        # the query via INVALID_ARRAY_INDEX, while the oracle's
        # string_split(...)[2] returns NULL — NULL parity on both sides
        F.try_element_at(F.split("p_brand", "#"), F.lit(2)).alias("brand_suffix"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.regexp_extract(fname, r"^(.*)\.[^.]+$", 1).alias("path_stem"),
        F.regexp_extract(fname, r"(\.[^.]+)$", 1).alias("path_suffix"),
    )


_STR_SQL = r"""
WITH p AS (
  SELECT *,
         string_split('inputs/rasters/' || lower(p_name) || '.tif', '/')[-1] AS fname
  FROM part
)
SELECT p_partkey,
       lower(p_name) AS name_lower,
       concat_ws('_', lower(p_brand), lower(p_type)) AS brand_type,
       regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_digits,
       string_split(p_brand, '#')[2] AS brand_suffix,
       length(p_name) AS name_len,
       substr(p_type, 1, 3) AS type_prefix,
       regexp_extract(fname, '^(.*)\.[^.]+$', 1) AS path_stem,
       regexp_extract(fname, '(\.[^.]+)$', 1) AS path_suffix
FROM p
"""


# --- Joins (J2, semi/anti, broadcast) -----------------------------------------


def _join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "c_custkey", "c_name", "c_mktsegment")
    )


def _join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with unmatched rows on BOTH sides (urgent-order
    aggregates × high-balance customers), so a semantics break in either
    null-extension direction flips the hash."""
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_urgent"))
    )
    rich = cust.filter(F.col("c_acctbal") > 5000.0).select(
        "c_custkey", "c_name"
    )
    return urgent.join(
        rich, urgent.o_custkey == rich.c_custkey, "full_outer"
    ).select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "n_urgent",
    )


_JOIN_FULL_OUTER_SQL = """
WITH urgent AS (
  SELECT o_custkey, COUNT(*) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
), rich AS (
  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000.0
)
SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name, n_urgent
FROM urgent FULL OUTER JOIN rich ON o_custkey = c_custkey
"""


def _join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = tables(spark, sf_dir, "customer", "nation", "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            sum_cents("c_acctbal", "acctbal_cents"),
        )
        .orderBy("r_name")
    )


def _join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    f_orders = orders.filter(F.col("o_orderstatus") == "F")
    return cust.join(
        f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def _join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join against the URGENT slice: every fixture customer has
    SOME order, so anti-joining all orders returned 0 rows — a vacuous
    gate row that would still pass if the anti-join semantics broke.
    Customers with no urgent order give positive signal."""
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- Aggregates (A1 superset + distinct + exact stddev) ----------------------


def _agg_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    qc = cents("l_quantity")
    grouped = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.min(qc).alias("min_qty_cents"),
        F.max(qc).alias("max_qty_cents"),
        F.sum(qc).alias("sum_qty_cents"),
        F.sum(qc * qc).alias("_sum_sq"),
    )
    n = F.col("n_rows").cast("double")
    s1 = F.col("sum_qty_cents").cast("double")
    s2 = F.col("_sum_sq").cast("double")
    # Sample stddev from exact integer sums: deterministic double math.
    # NULL for single-row groups on BOTH engines (the CASE guards the
    # n=1 division). The discriminant clamps at 0: once the integer
    # sums pass 2^53 the double casts lose ulps and a near-zero
    # variance can round NEGATIVE — Spark would return NaN while DuckDB
    # sqrt(-x) hard-errors, failing the gate with an oracle abort.
    disc = F.greatest((n * s2 - s1 * s1) / (n * (n - 1)), F.lit(0.0))
    stddev = F.when(F.col("n_rows") > 1, F.sqrt(disc) / F.lit(100.0))
    return grouped.select(
        "l_returnflag",
        "n_rows",
        "n_suppliers",
        "min_qty_cents",
        "max_qty_cents",
        "sum_qty_cents",
        F.round(stddev, 6).alias("stddev_qty"),
    ).orderBy("l_returnflag")


_AGG_FULL_SQL = f"""
WITH g AS (
  SELECT l_returnflag,
         COUNT(*) AS n_rows,
         COUNT(DISTINCT l_suppkey) AS n_suppliers,
         MIN({o_cents('l_quantity')}) AS min_qty_cents,
         MAX({o_cents('l_quantity')}) AS max_qty_cents,
         CAST(SUM({o_cents('l_quantity')}) AS BIGINT) AS sum_qty_cents,
         CAST(SUM({o_cents('l_quantity')} * {o_cents('l_quantity')}) AS BIGINT) AS sum_sq
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows, n_suppliers, min_qty_cents, max_qty_cents, sum_qty_cents,
       CASE WHEN n_rows > 1 THEN
         ROUND(sqrt(GREATEST(
                  (CAST(n_rows AS DOUBLE) * CAST(sum_sq AS DOUBLE)
                   - CAST(sum_qty_cents AS DOUBLE) * CAST(sum_qty_cents AS DOUBLE))
                  / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1)),
                  0.0)) / 100.0,
               6) END AS stddev_qty
FROM g ORDER BY l_returnflag
"""


def _agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = tables(spark, sf_dir, "customer", "nation", "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_name", "n_name")
    )


def _agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = tables(spark, sf_dir, "customer", "nation", "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .cube("r_name", "c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_name", "c_mktsegment")
    )


def _window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag(cents("o_totalprice")).over(w).alias("prev_cents"),
        F.lead(cents("o_totalprice")).over(w).alias("next_cents"),
    )


def _union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = tables(spark, sf_dir, "customer", "supplier")
    c = cust.select(F.lit("cust").alias("side"), F.col("c_nationkey").alias("nationkey"))
    s = supp.select(F.lit("supp").alias("side"), F.col("s_nationkey").alias("nationkey"))
    return (
        c.unionByName(s)
        .groupBy("side", "nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy("side", "nationkey")
    )


def _agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_suppkey").alias("approx_suppliers"))
        .orderBy("l_returnflag")
    )


def _agg_approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive signal for the HLL sketch (agg_approx_distinct is
    rows-only by nature): the exact distinct counts ARE oracle-verified
    cross-engine, and the sketch must land within the published HLL++
    envelope — |approx − exact| ≤ 3·rsd·exact with Spark's default
    rsd = 0.05 (15%). One boolean per group pins the bound in the hash."""
    (li,) = tables(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.approx_count_distinct("l_suppkey").alias("_approx"),
    )
    return g.select(
        "l_returnflag",
        "exact_suppliers",
        (
            F.abs(F.col("_approx") - F.col("exact_suppliers"))
            <= F.col("exact_suppliers") * F.lit(0.15)
        ).alias("within_bound"),
    ).orderBy("l_returnflag")


# --- Sort / limit (O1) --------------------------------------------------------


def _order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select("o_orderkey", cents("o_totalprice").alias("total_cents"))
    )


# --- Set operations -----------------------------------------------------------


def _setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = tables(spark, sf_dir, "customer", "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .union(supp.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


def _setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = tables(spark, sf_dir, "customer", "supplier")
    return cust.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supp.select(F.col("s_nationkey").alias("nationkey"))
    )


def _setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    # subtract == EXCEPT DISTINCT (set difference); subtract only the
    # urgent-order customers so the result is non-empty — all-orders
    # made this a vacuous always-0-rows gate row
    return cust.select(F.col("c_custkey").alias("custkey")).subtract(
        orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("custkey")
        )
    )


# --- Window functions ----------------------------------------------------------


def _window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", cents("o_totalprice").alias("total_cents"), "rn")
    )


def _window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents("o_totalprice")).over(w).alias("running_cents"),
    )


# --- Date math ------------------------------------------------------------------


def _window_first_last_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first(cents("o_totalprice")).over(frame).alias("first_cents"),
        F.last(cents("o_totalprice")).over(frame).alias("last_cents"),
        F.ntile(4).over(w).alias("quartile"),
    )


def _window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) — the
    one window class no other entry exercises; integer-cents order key
    so ranks are deterministic, 9-dp rounding on the two ratios (exact
    small-integer divisions, the rounding is belt-and-braces)."""
    (cust,) = tables(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        cents("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_nationkey",
        "c_custkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


_WINDOW_DISTRIBUTION_SQL = f"""
SELECT c_nationkey, c_custkey,
       ROUND(percent_rank() OVER w, 9) AS pct_rank,
       ROUND(cume_dist() OVER w, 9) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY {o_cents('c_acctbal')} ASC, c_custkey ASC)
"""


_FIRST_LAST_SQL = f"""
SELECT o_custkey, o_orderkey,
       first_value({o_cents('o_totalprice')}) OVER w2 AS first_cents,
       last_value({o_cents('o_totalprice')}) OVER w2 AS last_cents,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def _date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.year("o_orderdate").cast("int").alias("year"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            sum_cents("o_totalprice", "total_cents"),
        )
        .orderBy("month")
    )


# --- Conditional aggregation ------------------------------------------------------


def _case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "n_high_disc"
            ),
            F.sum(F.when(F.col("l_quantity") < 10, 1).otherwise(0)).alias(
                "n_small_qty"
            ),
            F.sum(
                F.when(F.col("l_tax") > 0.0, cents("l_extendedprice")).otherwise(0)
            ).alias("taxed_cents"),
        )
        .orderBy("l_linestatus")
    )


def _scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_front_door(_SCALAR_SUBQ_SQL, "orders")(spark, sf_dir)



# above-average orders per status: scalar subquery in both dialects;
# the threshold compares in the exact cents domain
_SCALAR_SUBQ_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_above_avg
FROM orders
WHERE {o_cents('o_totalprice')} > (
  -- ROUND before CAST: a bare CAST(double AS BIGINT) truncates in
  -- Spark but rounds half-to-even in DuckDB, so the threshold would
  -- differ by 1 cent whenever the average's fraction is >= 0.5
  SELECT CAST(ROUND(AVG({o_cents('o_totalprice')})) AS BIGINT) FROM orders
)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def _pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy").alias("year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("year")
    )


_PIVOT_SQL = """
SELECT strftime(o_orderdate, '%Y') AS year,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
FROM orders GROUP BY 1 ORDER BY year
"""


def _string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, region = tables(spark, sf_dir, "nation", "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
        )
        .orderBy("r_name")
    )


_STRING_AGG_SQL = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def _agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: the cents domain is spelled inline in the percentile expr
    # strings below (F.expr needs SQL text); keep in sync with
    # plans/base.cents if the money policy ever changes
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(CAST(ROUND(l_quantity * 100, 0) AS BIGINT), 0.5)"
            ).alias("median_qty_cents"),
            F.expr(
                "percentile(CAST(ROUND(l_quantity * 100, 0) AS BIGINT), 0.9)"
            ).alias("p90_qty_cents"),
        )
        .orderBy("l_returnflag")
    )


_MEDIAN_SQL = f"""
SELECT l_returnflag,
       quantile_cont({o_cents('l_quantity')}, 0.5) AS median_qty_cents,
       quantile_cont({o_cents('l_quantity')}, 0.9) AS p90_qty_cents
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def _join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    buckets = spark.createDataFrame(
        [("small", 0.0, 17.0), ("medium", 17.0, 34.0), ("large", 34.0, 100.0)],
        "bucket string, lo double, hi double",
    )
    # non-equi interval join: tiny bucket table broadcasts (the legitimate
    # nested-loop case — 3 rows probe per lineitem row)
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), sum_cents("l_quantity", "qty_cents"))
        .orderBy("bucket")
    )


_JOIN_RANGE_SQL = f"""
WITH buckets(bucket, lo, hi) AS (
  VALUES ('small', 0.0, 17.0), ('medium', 17.0, 34.0), ('large', 34.0, 100.0)
)
SELECT bucket, COUNT(*) AS n, {o_sum_cents('l_quantity', 'qty_cents')}
FROM lineitem JOIN buckets ON l_quantity >= lo AND l_quantity < hi
GROUP BY bucket ORDER BY bucket
"""


# --- Pure-SQL entry (spark.sql surface) ---------------------------------------

_TOPK_SUPPLIERS_SQL = f"""
SELECT l_suppkey, COUNT(*) AS n_items,
       CAST(SUM({o_cents('l_extendedprice')}) AS BIGINT) AS rev_cents
FROM lineitem
GROUP BY l_suppkey
ORDER BY rev_cents DESC, l_suppkey ASC
LIMIT 10
"""


def _sql_topk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The same ANSI text runs in both engines — the engine's SQL front door.
    return _sql_front_door(_TOPK_SUPPLIERS_SQL, "lineitem")(spark, sf_dir)


# Correlated EXISTS (Catalyst: rewritten to left-semi join) combined with
# NOT IN (null-aware left-anti join) in predicate position — the subquery
# shapes P6/P8 generalize to when users write them as SQL instead of the
# DataFrame semi/anti API (join_semi / join_anti cover that form).
_EXISTS_IN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def _exists_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_front_door(_EXISTS_IN_SQL, "customer", "orders")(spark, sf_dir)



# TPC-H Q3 shape (shipping priority): 3-table join with selective filters
# on both fact tables, grouped revenue, top-10. Exercises Catalyst join
# reordering + AQE broadcast of the filtered customer dimension; revenue
# follows the plans/base.py exact-cents policy (element-wise round, BIGINT
# sum). Ties broken by l_orderkey so the LIMIT is deterministic.
_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


def _sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_front_door(_SHIPPING_PRIORITY_SQL, "customer", "orders", "lineitem")(spark, sf_dir)



def _quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile binning (feature discretization): NTILE(10) over the
    total order (value, key tiebreak), then per-bin count + exact-cents
    bounds. One global-sort window at fixture scale; at 100 TB swap the
    window for approx_percentile cut points — the per-bin summary output
    is the same shape."""
    (orders,) = tables(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    w = Window.orderBy(c.asc(), F.col("o_orderkey").asc())
    binned = orders.select(
        c.alias("price_c"), F.ntile(10).over(w).alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("price_c").alias("lo_c"),
            F.max("price_c").alias("hi_c"),
        )
        .orderBy("bin")
    )


_QUANTILE_BINS_SQL = f"""
WITH binned AS (
  SELECT {o_cents('o_totalprice')} AS price_c,
         NTILE(10) OVER (ORDER BY {o_cents('o_totalprice')} ASC,
                         o_orderkey ASC) AS bin
  FROM orders
)
SELECT bin, COUNT(*) AS n,
       CAST(MIN(price_c) AS BIGINT) AS lo_c,
       CAST(MAX(price_c) AS BIGINT) AS hi_c
FROM binned GROUP BY bin ORDER BY bin
"""


def _unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via DataFrame.unpivot (the inverse of pivot):
    three cents measures become (measure, value_c) rows. Narrow scan,
    no shuffle — unpivot is a generator projection."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    wide = lineitem.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        cents("l_quantity").alias("qty_c"),
        cents("l_extendedprice").alias("price_c"),
        cents("l_discount").alias("disc_c"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["qty_c", "price_c", "disc_c"],
        "measure",
        "value_c",
    )


_UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT l_orderkey, l_linenumber,
         {o_cents('l_quantity')} AS qty_c,
         {o_cents('l_extendedprice')} AS price_c,
         {o_cents('l_discount')} AS disc_c
  FROM lineitem WHERE l_orderkey % 50 = 0
)
SELECT l_orderkey, l_linenumber, 'qty_c' AS measure, qty_c AS value_c FROM wide
UNION ALL
SELECT l_orderkey, l_linenumber, 'price_c', price_c FROM wide
UNION ALL
SELECT l_orderkey, l_linenumber, 'disc_c', disc_c FROM wide
"""


_LOCAL_SUPPLIER_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name
"""


def _sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table snowflake where customer and supplier
    share a nation. Catalyst broadcasts the four dim tables and reorders
    the joins; the fact side shuffles once on the group key."""
    return _sql_front_door(
        _LOCAL_SUPPLIER_SQL,
        "customer", "orders", "lineitem", "supplier", "nation", "region",
    )(spark, sf_dir)


_FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(ROUND((l_extendedprice * l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def _sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate must
    push to the parquet scan and the sum is one map-side-combined pass
    with no shuffle beyond the final single-row gather."""
    return _sql_front_door(_FORECAST_REVENUE_SQL, "lineitem")(spark, sf_dir)


_SHIPMODE_PRIORITY_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def _sql_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted to the fixture's columns: linestatus
    stands in for shipmode): join + conditional counts per group."""
    return _sql_front_door(_SHIPMODE_PRIORITY_SQL, "orders", "lineitem")(
        spark, sf_dir
    )


_RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, acctbal_cents, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


def _sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer over a date
    window, top-20 — pushed scan filters on both fact tables, broadcast
    dims, one shuffle on the customer group key."""
    return _sql_front_door(
        _RETURNED_ITEMS_SQL, "customer", "orders", "lineitem", "nation"
    )(spark, sf_dir)


def _sql_front_door(sql: str, *tabs: str):
    """Build a catalog callable running the same ANSI text through
    spark.sql — the pattern every TPC-H shape entry shares."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sids_data_pipeline_spark.sources.tables import load_table

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for t in tabs:
            load_table(spark, t, sf_dir).createOrReplaceTempView(t)
        return spark.sql(sql)

    return run


# TPC-H Q9 shape (product type profit), fixture-adapted: the fixture has
# no partsupp, so supply cost is proxied as 0.8 × retail price per unit.
# Profit rounds to cents PER LINE (one double expression, identical text
# both engines) before the BIGINT sum — order-free.
_PRODUCT_PROFIT_SQL = """
SELECT nation, o_year, CAST(SUM(amount_cents) AS BIGINT) AS profit_cents
FROM (
  SELECT n_name AS nation,
         EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(ROUND((l_extendedprice * (1 - l_discount)
                     - p_retailprice * 0.8 * l_quantity) * 100) AS BIGINT)
           AS amount_cents
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) t
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

# TPC-H Q11 shape (important stock identification), fixture-adapted:
# lineitem revenue stands in for partsupp stock value. The classic
# HAVING SUM > fraction × (scalar subquery over the SAME aggregate) is
# restated exactly in integers: value × 500 > total ⇔ value > 0.2% of
# total — no float fraction, no ulp ambiguity at the cut.
_IMPORTANT_STOCK_SQL = """
WITH ps AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, value_cents
FROM ps
WHERE value_cents * 500 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM ps)
ORDER BY value_cents DESC, l_partkey
"""

# TPC-H Q16 shape (parts/supplier relationship), fixture-adapted: the
# observed (part, supplier) pairs in lineitem stand in for partsupp;
# negative-balance suppliers play the complaints exclusion (null-aware
# NOT IN anti-join).
_PART_SUPPLIER_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 14, 19, 23)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# TPC-H Q2 shape (minimum-cost supplier), fixture-adapted: the observed
# (part, supplier) pairs in lineitem stand in for partsupp (Q16
# precedent) and supply cost is proxied as the cheapest observed line
# total for the pair — an exact BIGINT, so the correlated MIN-equality
# probe has no float ambiguity. Catalyst decorrelates the scalar
# subquery into a per-part aggregate joined back; region/nation/supplier
# are broadcast dims, so the only big shuffle is the ps GROUP BY.
_MIN_COST_SUPPLIER_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS ps_cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_cost_cents
FROM part
JOIN ps ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size IN (5, 15, 25, 35, 45)
  AND p_type IN ('STANDARD', 'LARGE')
  AND r_name = 'ASIA'
  AND ps_cost_cents = (
    SELECT MIN(ps2.ps_cost_cents)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

# TPC-H Q20 shape (potential part promotion), fixture-adapted: available
# stock per (part, supplier) is proxied as the pair's total shipped
# quantity (integer-valued in the fixture, summed as BIGINT), and the
# promotion window is shipyear 1997 — "availqty > 1/2 × window demand"
# is restated as the exact-integer cross-multiplication avail × 2 >
# window. The correlated SUM decorrelates to a grouped aggregate; the
# nested IN chains are left-semi joins (part filter broadcast).
_EXCESS_STOCK_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS ps_availqty
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_2', 'NATION_5', 'NATION_8')
  AND s_suppkey IN (
    SELECT ps_suppkey FROM ps
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
      AND ps_availqty * 2 > (
        SELECT COALESCE(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT), 0)
        FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'))
ORDER BY s_suppkey
"""


# Correlated LATERAL derived table (per-customer top-N) — the SQL
# spelling of groupwise top-k; Catalyst decorrelates the LIMIT subquery
# into a ranked window. Same ANSI text on both engines.
_LATERAL_TOPN_SQL = """
SELECT c_custkey, t.o_orderkey, t.cents
FROM customer, LATERAL (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_custkey = c_custkey
  ORDER BY cents DESC, o_orderkey LIMIT 2
) t
WHERE c_custkey % 10 = 0
ORDER BY c_custkey, cents DESC, o_orderkey
"""


def _json_variant_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion surface (semi-structured columns without a
    schema): JSON → parse_json → typed variant_get extraction. DuckDB
    has no VARIANT, so the oracle is value-mirrored from the source
    columns (map_scalars precedent) — the gate compares values, not
    storage idioms."""
    (orders,) = tables(spark, sf_dir, "orders")
    v = F.parse_json(
        F.to_json(
            F.struct(
                F.col("o_orderpriority").alias("p"),
                F.col("o_custkey").alias("c"),
                (cents("o_totalprice")).alias("t"),
            )
        )
    )
    keyed = orders.filter(F.col("o_orderkey") % 100 < 3).select(
        "o_orderkey", v.alias("v")
    )
    return keyed.select(
        "o_orderkey",
        F.expr("variant_get(v, '$.p', 'string')").alias("p"),
        F.expr("variant_get(v, '$.c', 'long')").alias("c"),
        F.expr("variant_get(v, '$.t', 'long')").alias("t_cents"),
    )


_JSON_VARIANT_SQL = f"""
SELECT o_orderkey,
       o_orderpriority AS p,
       o_custkey AS c,
       {o_cents('o_totalprice')} AS t_cents
FROM orders
WHERE o_orderkey % 100 < 3
"""


# TPC-H Q13 shape (customer order distribution): the left-outer-join-
# with-ON-filter + double aggregation pattern. COUNT(o_orderkey) counts
# matches only (NULL-skipping), so no-order customers land in c_count=0.
# Scale: orders shuffles once on o_custkey (map-side partial count), the
# second aggregation groups a 1500-row-per-sf frame — negligible.
_CUSTOMER_DISTRIBUTION_SQL = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


_sql_lateral_topn = _sql_front_door(_LATERAL_TOPN_SQL, "customer", "orders")

_sql_product_profit = _sql_front_door(
    _PRODUCT_PROFIT_SQL, "part", "lineitem", "supplier", "orders", "nation"
)
_sql_important_stock = _sql_front_door(
    _IMPORTANT_STOCK_SQL, "lineitem", "supplier", "nation"
)
_sql_part_supplier = _sql_front_door(_PART_SUPPLIER_SQL, "lineitem", "part", "supplier")

_sql_min_cost_supplier = _sql_front_door(
    _MIN_COST_SUPPLIER_SQL, "lineitem", "part", "supplier", "nation", "region"
)
_sql_excess_stock = _sql_front_door(
    _EXCESS_STOCK_SQL, "lineitem", "part", "supplier", "nation"
)

# Q13: same ANSI text both engines; semantics documented on the SQL + Query entry.
_sql_customer_distribution = _sql_front_door(_CUSTOMER_DISTRIBUTION_SQL, 'customer', 'orders')


# TPC-H Q17 shape (small-quantity-order revenue), decorrelated the way
# Catalyst itself rewrites the correlated scalar subquery: per-part
# aggregate joined back to the fact. The classic form compares
# l_quantity < 0.2 * AVG(l_quantity) — a float average whose last ulp
# depends on summation order, so the engine's exact-integer policy
# (plans/base.py) restates it as 5 * qty_cents * cnt < sum_qty_cents,
# an all-BIGINT inequality that is partition-order independent (the
# algebra: qty < 0.2*sum/cnt ⇔ 5*qty*cnt < sum, exact in integers).
_SMALL_QTY_REVENUE_SQL = """
WITH pq AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c_sum,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents_sum,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq ON pq.l_partkey = lineitem.l_partkey
WHERE p_brand = 'Brand#1'
  AND CAST(ROUND(l_quantity * 100) AS BIGINT) * cnt * 5 < qty_c_sum
"""


# Q17: per-part average threshold in exact integers (see SQL comment).
_sql_small_qty_revenue = _sql_front_door(_SMALL_QTY_REVENUE_SQL, 'lineitem', 'part')


# TPC-H Q18 shape (large-volume customers): IN over a grouped HAVING
# subquery — Catalyst plans it as an aggregate + left-semi join; the
# qty threshold (300 units = 30000 cents) keeps the semi side small.
_LARGE_VOLUME_SQL = """
SELECT c_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) > 30000
)
GROUP BY c_custkey, o_orderkey
ORDER BY qty_cents DESC, o_orderkey
LIMIT 20
"""


# Q18: IN (GROUP BY ... HAVING) semi-join + re-aggregation.
_sql_large_volume_customer = _sql_front_door(_LARGE_VOLUME_SQL, 'customer', 'orders', 'lineitem')


# TPC-H Q21 shape (suppliers who kept waiting), adapted to the fixture's
# columns: the reference TPC-H predicate "only supplier whose lineitem
# missed its commit date" becomes "only supplier with a returned ('R')
# lineitem in a multi-supplier order" — same correlated EXISTS +
# NOT EXISTS structure (semi + anti join against the same fact table).
_WAITING_SUPPLIERS_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# Q21: correlated EXISTS + NOT EXISTS on one shuffle key.
_sql_waiting_suppliers = _sql_front_door(_WAITING_SUPPLIERS_SQL, 'supplier', 'lineitem', 'orders', 'nation')


# TPC-H Q22 shape (global sales opportunity), fixture-adapted: country
# code = last two digits of c_name (the fixture has no c_phone), "no
# orders" = no URGENT orders (every fixture customer has orders). The
# above-average-balance cut uses the exact-integer restatement of
# c_acctbal > AVG(...): acctbal_cents * n > sum_cents over the positive-
# balance population — order-independent, unlike the float AVG.
_SALES_OPPORTUNITY_SQL = """
WITH pos AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(acctbal_cents) AS BIGINT) AS totacctbal_cents
FROM (
  SELECT SUBSTRING(c_name, 17, 2) AS cntrycode,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer, pos
  WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
) t
GROUP BY cntrycode
ORDER BY cntrycode
"""


# Q22: uncorrelated scalar aggregate + NOT EXISTS anti-join.
_sql_sales_opportunity = _sql_front_door(_SALES_OPPORTUNITY_SQL, 'customer', 'orders')


# TPC-H Q4 shape (order-priority checking), fixture-adapted: the
# late-delivery EXISTS (l_commitdate < l_receiptdate — columns the
# fixture lacks) becomes a returned-lineitem EXISTS; the decorrelation
# (aggregate-free left-semi on the fact key) is identical.
_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# TPC-H Q7 shape (volume shipping): bidirectional nation-pair revenue by
# ship year. The OR-of-pairs predicate lands after two broadcast nation
# joins; EXTRACT(YEAR ...) is the same ANSI spelling in both engines.
_VOLUME_SHIPPING_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol_cents) AS BIGINT) AS revenue_cents
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS vol_cents
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) t
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# TPC-H Q8 shape (market share): conditional share of exact-cents sums
# per year. The division is ONE double op over two exact integers —
# deterministic — and both engines compute the identical expression.
_MARKET_SHARE_SQL = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol_cents
                           ELSE 0 END) AS DOUBLE)
             / SUM(vol_cents), 6) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         n_name AS nation,
         CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS vol_cents
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN part ON p_partkey = l_partkey
  WHERE p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
) t
GROUP BY o_year
ORDER BY o_year
"""


# TPC-H Q14 shape (promotion effect): percentage of revenue from a part
# type band in a ship-date month; same exact-integer ratio pattern.
_PROMO_REVENUE_SQL = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                   THEN vol_cents ELSE 0 END) AS DOUBLE)
             / SUM(vol_cents), 6) AS promo_revenue_pct
FROM (
  SELECT p_type,
         CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS vol_cents
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
) t
"""


# TPC-H Q15 shape (top supplier): a revenue "view" CTE consumed twice —
# once for the global MAX scalar, once for the equality probe. Catalyst
# plans the scalar as a single-row broadcast; exact cents make the
# equality well-defined (a float revenue tie would be engine-dependent).
_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_cents
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_cents = (SELECT MAX(total_cents) FROM revenue)
ORDER BY s_suppkey
"""


# TPC-H Q19 shape (discounted revenue): the classic OR-of-ANDs predicate
# — three brand/quantity bands that must still join on the equi-key and
# push the common l_quantity bounds into the scan.
_OR_BANDS_SQL = """
SELECT CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


_sql_order_priority = _sql_front_door(_ORDER_PRIORITY_SQL, "orders", "lineitem")
_sql_volume_shipping = _sql_front_door(
    _VOLUME_SHIPPING_SQL, "supplier", "lineitem", "orders", "customer", "nation"
)
_sql_market_share = _sql_front_door(
    _MARKET_SHARE_SQL, "lineitem", "orders", "supplier", "nation", "part"
)
_sql_promo_revenue = _sql_front_door(_PROMO_REVENUE_SQL, "lineitem", "part")
_sql_top_supplier = _sql_front_door(_TOP_SUPPLIER_SQL, "lineitem", "supplier")
_sql_or_bands = _sql_front_door(_OR_BANDS_SQL, "lineitem", "part")


def _array_json_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    arr = F.sequence(F.lit(1), (F.col("o_orderkey") % 5 + 1).cast("int"))
    js = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("p")
        )
    )
    return orders.filter(F.col("o_orderkey") % 100 < 3).select(
        "o_orderkey",
        F.size(arr).alias("arr_len"),
        F.aggregate(
            F.transform(arr, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.array_max(F.filter(arr, lambda x: x % 2 == 1)).alias("max_odd"),
        F.get_json_object(js, "$.p").alias("json_p"),
    )


_ARRAY_JSON_SQL = """
SELECT o_orderkey,
       CAST(len(r) AS INT) AS arr_len,
       CAST(list_sum(list_transform(r, x -> x * x)) AS BIGINT) AS sum_sq,
       CAST(list_max(list_filter(r, x -> x % 2 = 1)) AS INT) AS max_odd,
       json_extract_string(
         to_json(struct_pack(k := o_orderkey, p := o_orderpriority)), '$.p'
       ) AS json_p
FROM (SELECT *, range(1, o_orderkey % 5 + 2) AS r FROM orders)
WHERE o_orderkey % 100 < 3
"""


def _map_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    m = F.map_concat(
        F.map_from_arrays(
            F.array(F.lit("u"), F.lit("v")), F.array(k % 7, k % 11)
        ),
        F.create_map(F.lit("w"), k % 13),
    )
    return orders.filter(k % 100 < 3).select(
        "o_orderkey",
        F.element_at(m, "u").alias("u_val"),
        F.size(m).alias("n_keys"),
        F.size(F.map_filter(m, lambda _, v: v >= 5)).alias("n_big_vals"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
    )


# Value-mirrored oracle (like pivot's CASE mirror): DuckDB's MAP surface
# differs (map_extract returns a list), so the oracle computes the same
# lookups arithmetically — the gate compares values, not plan idioms.
_MAP_SCALARS_SQL = """
SELECT o_orderkey,
       o_orderkey % 7 AS u_val,
       CAST(3 AS INT) AS n_keys,
       CAST((CASE WHEN o_orderkey % 7 >= 5 THEN 1 ELSE 0 END)
          + (CASE WHEN o_orderkey % 11 >= 5 THEN 1 ELSE 0 END)
          + (CASE WHEN o_orderkey % 13 >= 5 THEN 1 ELSE 0 END) AS INT) AS n_big_vals,
       'u,v,w' AS keys_csv
FROM orders
WHERE o_orderkey % 100 < 3
"""


# Identical ANSI text runs on both engines (GROUPING() disambiguates the
# rollup NULLs from data NULLs). The Spark side goes through spark.sql —
# the SQL front door, like _sql_topk_suppliers.
_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def _agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_front_door(_GROUPING_SETS_SQL, "orders")(spark, sf_dir)


def _agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.operators.skew import salted_agg

    (li,) = tables(spark, sf_dir, "lineitem")
    sized = li.withColumn("_qty_cents", cents("l_quantity"))
    out = salted_agg(
        sized,
        ["l_returnflag"],
        {
            "n": ("count", "l_orderkey"),
            "sum_qty_cents": ("sum", "_qty_cents"),
            "min_qty_cents": ("min", "_qty_cents"),
            "max_qty_cents": ("max", "_qty_cents"),
        },
    )
    return out.orderBy("l_returnflag")


_SALTED_AGG_SQL = f"""
SELECT l_returnflag,
       COUNT(l_orderkey) AS n,
       CAST(SUM({o_cents('l_quantity')}) AS BIGINT) AS sum_qty_cents,
       CAST(MIN({o_cents('l_quantity')}) AS BIGINT) AS min_qty_cents,
       CAST(MAX({o_cents('l_quantity')}) AS BIGINT) AS max_qty_cents
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def _join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.operators.skew import salted_join

    li, nation = tables(spark, sf_dir, "lineitem", "nation")
    # a 3-value key joined against a tiny dim: the hot-key shape where a
    # non-broadcast join would funnel each flag into one task
    dim = nation.filter(F.col("n_nationkey") < 3).select(
        F.col("n_nationkey"),
        F.expr("element_at(array('A','N','R'), CAST(n_nationkey AS INT) % 3 + 1)")
        .alias("l_returnflag"),
        F.col("n_name"),
    )
    joined = salted_join(li, dim, ["l_returnflag"], num_salts=8)
    return joined.groupBy("l_returnflag", "n_name").agg(
        F.count("*").alias("n")
    ).orderBy("l_returnflag", "n_name")


_SALTED_JOIN_SQL = """
WITH dim AS (
  SELECT n_nationkey,
         (['A','N','R'])[CAST(n_nationkey AS INT) % 3 + 1] AS l_returnflag,
         n_name
  FROM nation WHERE n_nationkey < 3
)
SELECT l.l_returnflag, d.n_name, COUNT(*) AS n
FROM lineitem l JOIN dim d USING (l_returnflag)
GROUP BY l.l_returnflag, d.n_name
ORDER BY l.l_returnflag, d.n_name
"""


QUERIES: list[Query] = [
    Query(
        "pricing_summary",
        _pricing_summary,
        _PRICING_SQL,
        doc="A1 superset: grouped sums/avgs/count over lineitem (TPC-H Q1 shape)",
        tags=("aggregate",),
    ),
    Query(
        "proj_select",
        _proj_select,
        f"SELECT l_orderkey, l_linenumber, {o_cents('l_extendedprice')} AS price_cents FROM lineitem",
        doc="P1/P2 projection with computed column",
        tags=("projection",),
    ),
    Query(
        "proj_star_prefix",
        _proj_star_prefix,
        f"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               {o_cents('o_totalprice')} AS total_cents,
               epoch_us(o_orderdate) AS o_orderdate_us,
               o_orderpriority, c_name
        FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        doc="P3 wide projection from a join",
        tags=("projection", "join"),
    ),
    Query(
        "filter_range",
        _filter_range,
        f"""
        SELECT l_orderkey, l_linenumber, {o_cents('l_quantity')} AS qty_cents
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20 AND l_discount BETWEEN 0.02 AND 0.05
        """,
        doc="P5 range predicates (pushed to parquet scan)",
        tags=("filter",),
    ),
    Query("str_funcs", _str_funcs, _STR_SQL, doc="F1-F4 string scalars", tags=("scalar",)),
    Query(
        "agg_salted_skew",
        _agg_salted_skew,
        _SALTED_AGG_SQL,
        doc="skew-proof two-phase salted aggregation (equals direct groupBy)",
        tags=("aggregate", "skew"),
    ),
    Query(
        "join_salted_skew",
        _join_salted_skew,
        _SALTED_JOIN_SQL,
        doc="salted hot-key join: left scatters over salts, dim replicates",
        tags=("join", "skew"),
    ),
    Query(
        "array_json_scalars",
        _array_json_scalars,
        _ARRAY_JSON_SQL,
        doc="array higher-order functions (transform/filter/aggregate) + "
            "JSON build/extract scalars",
        tags=("scalar", "array", "json"),
    ),
    Query(
        "map_scalars",
        _map_scalars,
        _MAP_SCALARS_SQL,
        doc="map scalars (create/concat/filter/keys/element_at), "
            "value-mirrored oracle",
        tags=("scalar", "map"),
    ),
    Query(
        "agg_grouping_sets",
        _agg_grouping_sets,
        _GROUPING_SETS_SQL,
        doc="GROUPING SETS with GROUPING() markers (same ANSI text on both engines)",
        tags=("aggregate",),
    ),
    Query(
        "join_equi",
        _join_equi,
        """
        SELECT o_orderkey, c_custkey, c_name, c_mktsegment
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
        """,
        doc="J2 equi left join",
        tags=("join",),
    ),
    Query(
        "join_full_outer",
        _join_full_outer,
        _JOIN_FULL_OUTER_SQL,
        doc="FULL OUTER with unmatched rows on both sides (null extension "
            "verified in both directions)",
        tags=("join",),
    ),
    Query(
        "join_broadcast_dims",
        _join_broadcast_dims,
        f"""
        SELECT r_name, COUNT(*) AS n_customers,
               {o_sum_cents('c_acctbal', 'acctbal_cents')}
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
        doc="snowflake dims broadcast join + agg",
        tags=("join", "aggregate"),
    ),
    Query(
        "join_semi",
        _join_semi,
        """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        """,
        doc="P8 membership semi join",
        tags=("join",),
    ),
    Query(
        "join_anti",
        _join_anti,
        """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        """,
        doc="P6 anti join shape (urgent slice: non-empty result)",
        tags=("join",),
    ),
    Query(
        "agg_full",
        _agg_full,
        _AGG_FULL_SQL,
        doc="count/distinct/min/max/sum + exact-integer stddev",
        tags=("aggregate",),
    ),
    Query(
        "agg_rollup",
        _agg_rollup,
        """
        SELECT r_name, n_name, COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name, n_name
        """,
        doc="hierarchical rollup aggregation",
        tags=("aggregate",),
    ),
    Query(
        "agg_cube",
        _agg_cube,
        """
        SELECT r_name, c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, c_mktsegment)
        ORDER BY r_name, c_mktsegment
        """,
        doc="CUBE grouping sets",
        tags=("aggregate",),
    ),
    Query(
        "window_lag_lead",
        _window_lag_lead,
        f"""
        SELECT o_custkey, o_orderkey,
               lag({o_cents('o_totalprice')}) OVER w AS prev_cents,
               lead({o_cents('o_totalprice')}) OVER w AS next_cents
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        """,
        doc="lag/lead analytic functions",
        tags=("window",),
    ),
    Query(
        "union_all_tagged",
        _union_all_tagged,
        """
        SELECT side, nationkey, COUNT(*) AS n FROM (
          SELECT 'cust' AS side, c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT 'supp' AS side, s_nationkey AS nationkey FROM supplier
        ) GROUP BY side, nationkey ORDER BY side, nationkey
        """,
        doc="UNION ALL + grouped count",
        tags=("setop", "aggregate"),
    ),
    Query(
        "agg_approx_distinct",
        _agg_approx_distinct,
        None,  # HLL sketches differ across engines by design → rows-only check
        doc="approx_count_distinct (sketch; rows-only)",
        tags=("aggregate",),
    ),
    Query(
        "agg_approx_distinct_gate",
        _agg_approx_distinct_gate,
        """
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS exact_suppliers,
               TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        doc="positive signal for the HLL sketch: exact distinct counts "
            "verified cross-engine, plus |approx−exact| ≤ 3·rsd·exact "
            "(rsd 0.05 → 15%, the published HLL++ 3σ envelope)",
        tags=("aggregate", "evaluation"),
    ),
    Query(
        "order_limit",
        _order_limit,
        f"""
        SELECT o_orderkey, {o_cents('o_totalprice')} AS total_cents
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
        """,
        doc="O1 total order + LIMIT",
        tags=("sort",),
    ),
    Query(
        "setop_union",
        _setop_union,
        "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier",
        doc="UNION distinct",
        tags=("setop",),
    ),
    Query(
        "setop_intersect",
        _setop_intersect,
        "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
        doc="INTERSECT",
        tags=("setop",),
    ),
    Query(
        "setop_except",
        _setop_except,
        "SELECT c_custkey AS custkey FROM customer EXCEPT "
        "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'",
        doc="EXCEPT (urgent slice: non-empty result)",
        tags=("setop",),
    ),
    Query(
        "window_rank",
        _window_rank,
        f"""
        SELECT o_custkey, o_orderkey, total_cents, rn FROM (
          SELECT o_custkey, o_orderkey, {o_cents('o_totalprice')} AS total_cents,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
          FROM orders
        ) WHERE rn <= 3
        """,
        doc="O2 shape: ranked top-k per partition",
        tags=("window",),
    ),
    Query(
        "window_running",
        _window_running,
        f"""
        SELECT o_custkey, o_orderkey,
               CAST(SUM({o_cents('o_totalprice')}) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS running_cents
        FROM orders
        """,
        doc="running aggregate window frame",
        tags=("window",),
    ),
    Query(
        "window_first_last_ntile",
        _window_first_last_ntile,
        _FIRST_LAST_SQL,
        doc="first/last value over the full frame + ntile bucketing",
        tags=("window",),
    ),
    Query(
        "window_distribution",
        _window_distribution,
        _WINDOW_DISTRIBUTION_SQL,
        doc="percent_rank + cume_dist over a deterministic integer-cents "
            "order (the distribution window class)",
        tags=("window",),
    ),
    Query(
        "date_math",
        _date_math,
        f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(year(o_orderdate) AS INT) AS year,
               COUNT(*) AS n_orders,
               {o_sum_cents('o_totalprice', 'total_cents')}
        FROM orders GROUP BY 1, 2 ORDER BY month
        """,
        doc="date truncation/extraction + monthly agg",
        tags=("scalar", "aggregate"),
    ),
    Query(
        "case_when",
        _case_when,
        f"""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
               CAST(SUM(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_qty,
               CAST(SUM(CASE WHEN l_tax > 0.0 THEN {o_cents('l_extendedprice')} ELSE 0 END) AS BIGINT) AS taxed_cents
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        doc="conditional aggregation",
        tags=("aggregate",),
    ),
    Query(
        "sql_topk_suppliers",
        _sql_topk_suppliers,
        _TOPK_SUPPLIERS_SQL,
        doc="same ANSI text through spark.sql and DuckDB",
        tags=("sql", "sort"),
    ),
    Query(
        "scalar_subquery",
        _scalar_subquery,
        _SCALAR_SUBQ_SQL,
        doc="scalar subquery threshold (same ANSI text in both engines)",
        tags=("sql", "subquery"),
    ),
    Query(
        "exists_in_subquery",
        _exists_in_subquery,
        _EXISTS_IN_SQL,
        doc="correlated EXISTS (semi) + NOT IN (null-aware anti) predicates",
        tags=("sql", "subquery", "join"),
    ),
    Query(
        "sql_shipping_priority",
        _sql_shipping_priority,
        _SHIPPING_PRIORITY_SQL,
        doc="TPC-H Q3 shape: 3-table join, grouped revenue cents, top-10",
        tags=("sql", "join", "aggregate", "sort"),
    ),
    Query(
        "feature_quantile_bins",
        _quantile_bins,
        _QUANTILE_BINS_SQL,
        doc="exact decile binning (NTILE over a total order) with "
            "per-bin exact-cents bounds",
        tags=("window", "profile"),
    ),
    Query(
        "unpivot_measures",
        _unpivot_measures,
        _UNPIVOT_SQL,
        doc="wide→long melt (DataFrame.unpivot, the inverse of pivot): "
            "generator projection, no shuffle",
        tags=("projection", "pivot"),
    ),
    Query(
        "sql_local_supplier_volume",
        _sql_local_supplier_volume,
        _LOCAL_SUPPLIER_SQL,
        doc="TPC-H Q5 shape: 6-table snowflake, same-nation customer/"
            "supplier equi-constraint, broadcast dims, one fact shuffle",
        tags=("sql", "join", "aggregate"),
    ),
    Query(
        "sql_returned_items",
        _sql_returned_items,
        _RETURNED_ITEMS_SQL,
        doc="TPC-H Q10 shape: returned-item revenue per customer, "
            "date-windowed, top-20",
        tags=("sql", "join", "aggregate", "sort"),
    ),
    Query(
        "sql_forecast_revenue",
        _sql_forecast_revenue,
        _FORECAST_REVENUE_SQL,
        doc="TPC-H Q6 shape: scan-filter-aggregate, all predicates "
            "pushed, no shuffle before the single-row gather",
        tags=("sql", "aggregate", "scan"),
    ),
    Query(
        "sql_shipmode_priority",
        _sql_shipmode_priority,
        _SHIPMODE_PRIORITY_SQL,
        doc="TPC-H Q12 shape: join + conditional counts per linestatus",
        tags=("sql", "join", "aggregate"),
    ),
    Query(
        "pivot_status",
        _pivot_status,
        _PIVOT_SQL,
        doc="pivot by order status (CASE-mirrored oracle)",
        tags=("aggregate", "pivot"),
    ),
    Query(
        "string_agg_nations",
        _string_agg,
        _STRING_AGG_SQL,
        doc="ordered string aggregation (array_sort ∘ collect_list)",
        tags=("aggregate",),
    ),
    Query(
        "agg_median",
        _agg_median,
        _MEDIAN_SQL,
        doc="exact interpolated percentiles over the integer cents domain",
        tags=("aggregate",),
    ),
    Query(
        "join_range_buckets",
        _join_range,
        _JOIN_RANGE_SQL,
        doc="non-equi interval join (broadcast bucket table)",
        tags=("join",),
    ),
    Query(
        "sql_customer_distribution",
        _sql_customer_distribution,
        _CUSTOMER_DISTRIBUTION_SQL,
        doc="TPC-H Q13 shape: filtered left outer join + double aggregation",
        tags=("sql", "join", "aggregate"),
    ),
    Query(
        "sql_small_qty_revenue",
        _sql_small_qty_revenue,
        _SMALL_QTY_REVENUE_SQL,
        doc="TPC-H Q17 shape: per-part average threshold (exact-integer "
            "restatement) against the fact scan",
        tags=("sql", "join", "aggregate", "subquery"),
    ),
    Query(
        "sql_large_volume_customer",
        _sql_large_volume_customer,
        _LARGE_VOLUME_SQL,
        doc="TPC-H Q18 shape: IN (GROUP BY … HAVING) semi-join + "
            "re-aggregation, top-20",
        tags=("sql", "join", "aggregate", "subquery", "sort"),
    ),
    Query(
        "sql_waiting_suppliers",
        _sql_waiting_suppliers,
        _WAITING_SUPPLIERS_SQL,
        doc="TPC-H Q21 shape: correlated EXISTS + NOT EXISTS against the "
            "same fact (semi + anti on one shuffle key)",
        tags=("sql", "join", "subquery", "aggregate"),
    ),
    Query(
        "sql_sales_opportunity",
        _sql_sales_opportunity,
        _SALES_OPPORTUNITY_SQL,
        doc="TPC-H Q22 shape: uncorrelated scalar aggregate + NOT EXISTS "
            "anti-join + derived group key",
        tags=("sql", "subquery", "aggregate"),
    ),
    Query(
        "sql_order_priority",
        _sql_order_priority,
        _ORDER_PRIORITY_SQL,
        doc="TPC-H Q4 shape: date-windowed EXISTS semi-join, priority counts",
        tags=("sql", "subquery", "aggregate"),
    ),
    Query(
        "sql_volume_shipping",
        _sql_volume_shipping,
        _VOLUME_SHIPPING_SQL,
        doc="TPC-H Q7 shape: bidirectional nation-pair revenue by ship year "
            "(two broadcast nation joins + OR-of-pairs)",
        tags=("sql", "join", "aggregate"),
    ),
    Query(
        "sql_market_share",
        _sql_market_share,
        _MARKET_SHARE_SQL,
        doc="TPC-H Q8 shape: conditional share of exact-cents sums per year",
        tags=("sql", "join", "aggregate"),
    ),
    Query(
        "sql_promo_revenue",
        _sql_promo_revenue,
        _PROMO_REVENUE_SQL,
        doc="TPC-H Q14 shape: promo revenue percentage (exact-integer ratio)",
        tags=("sql", "join", "aggregate"),
    ),
    Query(
        "sql_top_supplier",
        _sql_top_supplier,
        _TOP_SUPPLIER_SQL,
        doc="TPC-H Q15 shape: revenue CTE consumed twice, scalar MAX probe "
            "(exact cents make the equality well-defined)",
        tags=("sql", "subquery", "aggregate"),
    ),
    Query(
        "sql_or_bands",
        _sql_or_bands,
        _OR_BANDS_SQL,
        doc="TPC-H Q19 shape: OR-of-ANDs brand/quantity bands over the "
            "equi-join",
        tags=("sql", "join", "filter", "aggregate"),
    ),
    Query(
        "sql_product_profit",
        _sql_product_profit,
        _PRODUCT_PROFIT_SQL,
        doc="TPC-H Q9 shape: profit per supplier-nation and year "
            "(per-line cents rounding, cost proxied from retail price)",
        tags=("sql", "join", "aggregate"),
    ),
    Query(
        "sql_important_stock",
        _sql_important_stock,
        _IMPORTANT_STOCK_SQL,
        doc="TPC-H Q11 shape: grouped value vs fraction-of-global scalar "
            "subquery, integer-exact cut",
        tags=("sql", "subquery", "aggregate"),
    ),
    Query(
        "sql_lateral_topn",
        _sql_lateral_topn,
        _LATERAL_TOPN_SQL,
        doc="correlated LATERAL derived table: per-customer top-N as the "
            "SQL spelling of groupwise top-k (same ANSI text both engines)",
        tags=("sql", "join", "subquery", "sort"),
    ),
    Query(
        "json_variant_scalars",
        _json_variant_scalars,
        _JSON_VARIANT_SQL,
        doc="VARIANT semi-structured columns: parse_json + typed "
            "variant_get extraction (value-mirrored oracle)",
        tags=("sql", "json", "scalar"),
    ),
    Query(
        "sql_part_supplier",
        _sql_part_supplier,
        _PART_SUPPLIER_SQL,
        doc="TPC-H Q16 shape: distinct-supplier counts per part attrs "
            "with null-aware NOT IN exclusion",
        tags=("sql", "join", "subquery", "aggregate"),
    ),
    Query(
        "sql_min_cost_supplier",
        _sql_min_cost_supplier,
        _MIN_COST_SUPPLIER_SQL,
        doc="TPC-H Q2 shape: correlated MIN-cost equality probe over the "
            "lineitem-derived partsupp (exact-cents cost proxy)",
        tags=("sql", "join", "subquery", "sort"),
    ),
    Query(
        "sql_excess_stock",
        _sql_excess_stock,
        _EXCESS_STOCK_SQL,
        doc="TPC-H Q20 shape: nested IN chains with a correlated "
            "windowed-demand SUM, exact-integer threshold",
        tags=("sql", "join", "subquery", "aggregate"),
    ),
]
