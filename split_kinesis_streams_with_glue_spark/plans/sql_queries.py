"""Ad-hoc SQL query surface (SURVEY.md §2.5) — the Athena-equivalent layer.

The reference's declared query capability is full ANSI SQL over the split
tables (reference README.md:36, 312-314; demo query image/image7.png). Spark
SQL provides it natively; these queries pin down the surface operator by
operator, each with a DuckDB oracle.

Written DataFrame-first (Catalyst plans: scans with pushed filters/pruned
columns, broadcast hash joins for dims, partial aggregation) with a few
``spark.sql`` entries to exercise the SQL front end itself.

Determinism: double aggregates are ROUND()ed (both engines agree far below
the rounding grain); top-k orderings carry a unique tiebreak key.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas-UDF type hints must resolve here

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.plans.registry import load, query


# ---------------------------------------------------------------- scan/limit

@query(
    "scan_limit",
    oracle="""
    SELECT * FROM customer ORDER BY c_custkey LIMIT 10
    """,
)
def scan_limit(spark, sf_dir):
    """The reference's demonstrated Athena query (image/image7.png), made
    deterministic with an ORDER BY. Catalyst: TakeOrderedAndProject — no
    global sort, each partition keeps 10, driver merges."""
    return load(spark, sf_dir, "customer").orderBy("c_custkey").limit(10)


# -------------------------------------------------------------- aggregations

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-side filter pushdown + two-phase hash aggregate
    (map-side partial combine — the key to agg at 100 TB)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query("agg_approx_count_distinct", oracle=None)
def agg_approx_count_distinct(spark, sf_dir):
    """HLL sketch — approximate by construction, so rows-only check (the
    exact twin is agg_count_distinct). At scale this replaces the expensive
    distinct shuffle with a mergeable fixed-size sketch."""
    return (
        load(spark, sf_dir, "lineitem")
        .agg(F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"))
    )


@query(
    "agg_approx_distinct_error",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM lineitem
    """,
)
def agg_approx_distinct_error(spark, sf_dir):
    """Checkable contract for the HLL sketch: the sketch itself is
    approximate by construction (rows-only check), but its error bound IS
    oracle-able — assert |approx - exact| / exact <= 5% (the sketch runs at
    rsd 0.01, so 5% is a comfortable margin, not a tautology)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", 0.01)
                - F.countDistinct("l_orderkey")
            )
            / F.countDistinct("l_orderkey")
            <= 0.05
        ).alias("within_5pct"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(AVG(c_acctbal), 4) AS avg_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS std_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_stats(spark, sf_dir):
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
        )
    )


# -------------------------------------------------------------------- joins

@query(
    "join_broadcast_dims",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           COUNT(*) AS n_customers, ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def join_broadcast_dims(spark, sf_dir):
    """Star-schema join: explicitly broadcast the small dims so the fact
    scan never shuffles — the 100 TB-safe plan (BroadcastHashJoin)."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "join_left_with_empty",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_with_empty(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS nationkey,
           COALESCE(a.n_cust, 0) AS n_cust, COALESCE(b.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) b
    ON a.k = b.k
    """,
)
def join_full_outer(spark, sf_dir):
    a = load(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_cust"))
    b = load(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        a.join(b, "k", "full_outer")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@query(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross_small(spark, sf_dir):
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_range_events",
    oracle="""
    SELECT a.event_id AS a_id, COUNT(*) AS n_followers
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY a.event_id
    """,
)
def join_range_events(spark, sf_dir):
    """Equi + range (theta) join: per-user self-join bounded to a 1-hour
    window. The equi key keeps it a hash/sort-merge join (the range is a
    post-join predicate), so it scales — no nested-loop over the full fact."""
    e = load(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("a.event_id").alias("a_id"))
        .agg(F.count(F.lit(1)).alias("n_followers"))
    )


# ------------------------------------------------------------------ windows

@query(
    "window_rank_topn",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS rnk,
             DENSE_RANK() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS drnk
      FROM customer) t
    WHERE rn <= 5
    """,
)
def window_rank_topn(spark, sf_dir):
    """Per-group top-N — the canonical window pattern; one shuffle on the
    partition key, sort within partitions."""
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_mktsegment", "c_custkey", "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def window_lag_lead(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id", "event_id",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
        )
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
    )


@query(
    "window_ntile",
    oracle="""
    SELECT c_custkey, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
    """,
)
def window_ntile(spark, sf_dir):
    w = W.orderBy("c_acctbal", "c_custkey")
    return load(spark, sf_dir, "customer").select(
        "c_custkey", F.ntile(4).over(w).alias("quartile")
    )


# ------------------------------------------------------------- sorts / top-k

@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders(spark, sf_dir):
    """Global top-k without global sort (TakeOrderedAndProject)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ------------------------------------------------------------------ set ops

@query(
    "set_union_all",
    oracle="""
    SELECT k FROM (SELECT c_nationkey AS k FROM customer
                   UNION ALL SELECT s_nationkey FROM supplier) t
    """,
)
def set_union_all(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS k FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_except(spark, sf_dir):
    """Set EXCEPT (distinct) — ``subtract``, not ``exceptAll`` (the latter is
    multiset difference)."""
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    return o.subtract(c)


@query(
    "set_except_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT ALL SELECT s_nationkey FROM supplier
    """,
)
def set_except_all(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.exceptAll(s)


@query(
    "set_intersect_all",
    since=6,
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT ALL SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_all(spark, sf_dir):
    """Multiset intersection — each key keeps min(count_left, count_right)
    copies; completes SURVEY §2.5's set-op list (the round-5 verdict's
    one named SQL-surface gap)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s)


# ------------------------------------------------------------- scalar funcs

@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           c_name LIKE '%1%' AS has_one,
           TRIM(CONCAT('  ', c_name, '  ')) AS trimmed
    FROM customer
    """,
)
def string_funcs(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
           CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dy,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def date_funcs(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(8,2)))
                * (1 + CAST(l_tax AS DECIMAL(8,2))) AS DOUBLE) AS charged,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    """,
)
def math_funcs(spark, sf_dir):
    """Money math is decimal-exact on both engines: rounding a double product
    of 2-decimal inputs lands on half-way boundaries where Spark (HALF_UP)
    and DuckDB disagree — decimal arithmetic sidesteps the boundary."""
    li = load(spark, sf_dir, "lineitem")
    charged = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(8,2)"))
        * (F.lit(1) + F.col("l_tax").cast("decimal(8,2)"))
    ).cast("double")
    return li.select(
        "l_orderkey", "l_linenumber",
        charged.alias("charged"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "decimal_money_math",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS exact_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def decimal_money_math(spark, sf_dir):
    """Decimal-safe money math (the reference's ticket_price concern,
    README.md:210): cast to DECIMAL before summing → exact, order-independent
    aggregation on both engines."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("exact_total")
        )
    )


# --------------------------------------------------------- array / map / json

@query(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events
    """,
)
def json_extract_props(spark, sf_dir):
    """The events.props JSON column (SURVEY.md §1.2) via get_json_object —
    Jackson partial parse, JVM-side."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@query(
    "from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def from_json_struct(spark, sf_dir):
    """from_json into a typed struct — the same machinery that parses the
    CDC envelope."""
    return (
        load(spark, sf_dir, "events")
        .select("event_id", F.from_json("props", "k BIGINT").alias("p"))
        .select("event_id", F.col("p.k").alias("k"))
    )


@query(
    "explode_words",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split_regex(text, '\\s+')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word
    """,
)
def explode_words(spark, sf_dir):
    """explode(split(...)) — row-generating lateral view; word-count over
    documents."""
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "array_hof_embedding_norm",
    oracle="""
    SELECT vec_id,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 4)
             AS sq_norm
    FROM embeddings
    """,
)
def array_hof_embedding_norm(spark, sf_dir):
    """Array higher-order functions (transform + aggregate) over the
    embedding column — JVM-side, no UDF."""
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sq_norm"),
    )


@query(
    "array_contains_filter",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE list_contains(string_split_regex(text, '\\s+'), 'spark')
    """,
)
def array_contains_filter(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.filter(F.array_contains(F.split("text", r"\s+"), "spark")).select(
        "doc_id", "n_chars"
    )


# --------------------------------------------------------------- subqueries

@query(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def subquery_scalar(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def subquery_in(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


@query(
    "subquery_correlated_exists",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    """,
)
def subquery_correlated_exists(spark, sf_dir):
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
        """
    )


# ------------------------------------------------------------- UDF surface

@query(
    "pandas_udf_revenue",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_orderkey
    """,
)
def pandas_udf_revenue(spark, sf_dir):
    """The UDF escape hatch, done the fast way: an Arrow-vectorized pandas
    UDF (batch columnar transfer, ~10-100x over row-at-a-time Python UDFs).
    Exists to pin the surface — the engine prefers the built-in expression
    (see q1_pricing_summary) whenever one exists."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load(spark, sf_dir, "lineitem")
    return (
        li.withColumn("net", net_price("l_extendedprice", "l_discount"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("net").cast("decimal(18,4)")).cast("double").alias("revenue")
        )
    )


# ------------------------------------------------------------ reshaping


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS f_total,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS o_total,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS p_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    """groupBy().pivot() — long→wide reshaping. Pivot values are declared
    up front so the plan is a single aggregate (no extra distinct-values
    job, which at 100 TB would be a full scan)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
        .select(
            "o_orderpriority",
            F.round(F.coalesce("F", F.lit(0.0)), 2).alias("f_total"),
            F.round(F.coalesce("O", F.lit(0.0)), 2).alias("o_total"),
            F.round(F.coalesce("P", F.lit(0.0)), 2).alias("p_total"),
        )
    )


@query(
    "unpivot_lineitem_amounts",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'price' AS amount_kind,
           ROUND(l_extendedprice, 2) AS amount
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', ROUND(l_discount, 2)
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', ROUND(l_tax, 2)
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def unpivot_lineitem_amounts(spark, sf_dir):
    """unpivot/melt — wide→long. One pass, no join: each input row emits
    three (kind, amount) rows via the native UNPIVOT operator."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "amount_kind",
        "amount",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(
            F.create_map(
                F.lit("l_extendedprice"), F.lit("price"),
                F.lit("l_discount"), F.lit("discount"),
                F.lit("l_tax"), F.lit("tax"),
            ),
            F.col("amount_kind"),
        ).alias("amount_kind"),
        F.round("amount", 2).alias("amount"),
    )


@query(
    "window_sliding_avg",
    oracle="""
    WITH w AS (
      -- a 1h/30min sliding window: every event belongs to exactly the two
      -- windows starting at its 30-min grid floor and 30 min before it
      SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) - s.n * INTERVAL 30 MINUTE
                  AS TIMESTAMP) AS window_start,
             value
      FROM events, (SELECT 0 AS n UNION ALL SELECT 1) s
    )
    SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
    FROM w GROUP BY window_start
    """,
)
def window_sliding_avg(spark, sf_dir):
    """Sliding event-time windows (1 h length, 30 min slide) — each event
    lands in 2 overlapping windows; same operator watermarks cleanly on a
    stream."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


# ------------------------------------------------------------ percentiles


@query(
    "percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_exact(spark, sf_dir):
    """Exact interpolated percentiles (PERCENTILE_CONT semantics) per
    group. For 100 TB use approx_percentile (sketch, mergeable, one pass)
    — kept as the no-oracle twin below."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        )
    )


@query("percentiles_approx", oracle=None)
def percentiles_approx(spark, sf_dir):
    """approx_percentile — the scale path: a mergeable KLL-style sketch,
    single pass, bounded memory; rank error <= 1/accuracy. Rows-only check
    (sketch output is engine-specific by design; the exact twin above is
    oracle-checked, and percentiles_approx_contract bounds this one's rank
    error in oracle-checkable form)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
            F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95"),
        )
    )


@query(
    "percentiles_approx_contract",
    oracle="""
    SELECT l_returnflag, TRUE AS p50_in_band, TRUE AS p95_in_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_approx_contract(spark, sf_dir):
    """Checkable contract for the percentile sketch: at accuracy 10000 the
    rank error is <= 0.01%, so the approximate p50/p95 must land between
    the EXACT quantiles one whole percentile either side — a generous band
    that still catches a broken sketch, merge bug, or accuracy regression."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
            F.percentile_approx("l_extendedprice", 0.95, 10000).alias("a95"),
            F.percentile("l_extendedprice", 0.49).alias("e49"),
            F.percentile("l_extendedprice", 0.51).alias("e51"),
            F.percentile("l_extendedprice", 0.94).alias("e94"),
            F.percentile("l_extendedprice", 0.96).alias("e96"),
        )
        .select(
            "l_returnflag",
            F.col("a50").between(F.col("e49"), F.col("e51")).alias("p50_in_band"),
            F.col("a95").between(F.col("e94"), F.col("e96")).alias("p95_in_band"),
        )
    )


# ------------------------------------------------------------ maps / lateral


@query(
    "map_from_entries_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.tag') AS tag
    FROM events WHERE event_id % 10 = 0
    """,
)
def map_from_entries_props(spark, sf_dir):
    """JSON → MapType → map_keys/values/element_at — the props column as a
    real map, not a struct (schema-free key access)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").cast("bigint").alias("k"),
        F.element_at(m, "tag").alias("tag"),
    )


@query(
    "posexplode_tokens",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS l
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok FROM (
      SELECT doc_id, UNNEST(range(len(l))) AS pos, UNNEST(l) AS tok FROM t
    ) u WHERE tok <> ''
    """,
)
def posexplode_tokens(spark, sf_dir):
    """posexplode — ordinal-preserving lateral view (token position is the
    payload for sequence models)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return (
        d.select("doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "tok")
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 5 <> 0 THEN 1 ELSE o_custkey END AS k
          FROM orders) o
    JOIN customer c ON c.c_custkey = o.k
    """,
)
def join_salted_skew(spark, sf_dir):
    """Skew-salted join: 80% of orders forced onto one hot key, joined via
    salt-scatter + replicated small side — result must equal the plain
    join exactly (salting changes distribution, never semantics)."""
    from split_kinesis_streams_with_glue_spark.operators.skew import salted_join

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 != 0, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("k"),
    )
    cust = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "k")
    return salted_join(orders, cust, on="k").select("o_orderkey", "c_name")


@query(
    "udf_python_rowwise",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier
    FROM customer
    """,
)
def udf_python_rowwise(spark, sf_dir):
    """Row-at-a-time Python UDF — pinned ONLY to complete the UDF surface
    (SURVEY.md §2.5). This is the slow path: every row crosses the
    JVM↔Python boundary pickled, exactly what the engine core forbids
    (tests/test_plans.py asserts no BatchEvalPython in core operators; the
    built-in CASE twin is what production code uses)."""
    @F.udf("string")
    def tier(bal):
        return "debt" if bal < 0 else ("mid" if bal < 5000 else "high")

    return load(spark, sf_dir, "customer").select(
        "c_custkey", tier("c_acctbal").alias("tier")
    )


@query(
    "pandas_udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
             AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pandas_udaf_weighted_avg(spark, sf_dir):
    """Pandas GROUPED_AGG UDAF (Arrow-batched user aggregate): per-group
    quantity-weighted mean price. The UDAF form matters at scale because
    Spark still shuffles only (flag, price, qty) columns and the numpy body
    runs vectorized per group partition."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        )
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           to_json(list_sort(list(n_name))) AS nation_arr_json
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_listagg_ordered(spark, sf_dir):
    """Ordered string/array aggregation (LISTAGG / array_agg): collect_list
    is unordered by contract, so determinism comes from sorting the
    collected array before joining — the only portable semantics.

    The sorted array itself is emitted as JSON text, not array<string>:
    the driver's pandas canonicalizer cannot hash list cells (round-3 red
    row), and JSON is the harness-representable canonical form both
    engines agree on byte-for-byte."""
    n = load(spark, sf_dir, "nation")
    arr = F.array_sort(F.collect_list("n_name"))
    return n.groupBy("n_regionkey").agg(
        F.array_join(arr, ",").alias("nations"),
        F.to_json(arr).alias("nation_arr_json"),
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT a.o_orderkey, b.o_orderkey AS matched_key
    FROM (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN NULL
                      ELSE o_orderkey % 100 END AS k
          FROM orders WHERE o_orderkey <= 500) a
    JOIN (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN NULL
                      ELSE o_orderkey % 100 END AS k
          FROM orders WHERE o_orderkey <= 500) b
      ON a.k IS NOT DISTINCT FROM b.k AND a.o_orderkey < b.o_orderkey
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — still hash-joinable (NULL is
    one partition key), unlike a general theta join."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    k = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderkey") % 100
    )
    a = o.select(F.col("o_orderkey"), k.alias("k"))
    b = o.select(F.col("o_orderkey").alias("matched_key"), k.alias("k2"))
    return (
        a.join(b, a["k"].eqNullSafe(b["k2"]) & (a["o_orderkey"] < b["matched_key"]))
        .select("o_orderkey", "matched_key")
    )


@query(
    "events_timeseries_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
      FROM events
    ),
    days AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    actual AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT d.day, COALESCE(a.n, 0) AS n_purchases
    FROM days d LEFT JOIN actual a USING (day)
    """,
)
def events_timeseries_gapfill(spark, sf_dir):
    """Dense daily series with zero-filled gaps: generate the full day
    spine with sequence() (no driver-side loop — the spine is computed from
    a 1-row min/max agg and exploded), then left-join the actual counts."""
    ev = load(spark, sf_dir, "events")
    spine = (
        ev.agg(
            F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    actual = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(actual, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).alias("n_purchases")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (adapted to fixture columns): selective dim filter ->
    fact join chain -> agg -> global top-10. customer(BUILDING) broadcasts
    into orders, that result broadcasts into lineitem where the shipdate
    predicate is pushed to the scan; the ORDER BY + LIMIT plans as
    TakeOrderedAndProject (no global sort shuffle)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(o.join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape (adapted): five-way join where every dimension
    (region->nation->supplier, customer) broadcasts and only the
    orders-lineitem fact join shuffles; the c_nationkey = s_nationkey
    "local supplier" predicate rides the join output."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark, sf_dir):
    """first/last/nth value over an unbounded frame: each customer's
    earliest, latest, and second order price side by side (frame-complete,
    so last_value is well-defined)."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    ).distinct()


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2)
             AS wk_total
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based, not row-based): per customer, the rolling
    sum of order totals within the trailing 7 days — orders on the same day
    share the frame regardless of row order, which a ROWS frame gets wrong."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("wk_total"),
    )


# ----------------------------------------------- TPC-H decision-support suite
# The reference's stated query layer is "any ANSI SQL Athena runs over the
# split tables" (reference README.md:36,312-314). Q1/Q3/Q5 above pin the
# scan-agg and star-join shapes; the queries below complete the classic
# decision-support shapes the fixture schema supports (no partsupp /
# commitdate / phone columns, so predicates are adapted, shapes preserved).


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join — lineitem
    is filtered and deduplicated map-side before the shuffle, so the semi
    join moves one boolean per orderkey, not the lineitem fact table."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: the predicate-pushdown showcase. All three filters reach
    the Parquet scan (PushedFilters), only 4 of 11 columns are read
    (ReadSchema), and the single-row aggregate is a two-phase partial sum —
    at 100 TB this query is pure scan bandwidth."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           n_name, c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer. Date-filtered
    orders and the nation dim broadcast; only the lineitem-side join output
    shuffles for the aggregate; top-20 plans as TakeOrderedAndProject.
    Revenue sums in DECIMAL (exact, accumulation-order-independent) because
    the top-20 cutoff must rank identically in both engines."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: order-count histogram. The LEFT join keeps
    zero-order customers (COUNT of a null column skips them); two cascaded
    aggregates, the second over at most |distinct counts| rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation ratio. part broadcasts into
    the date-pruned lineitem scan; both sums come out of one pass."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q16_parts_supplier",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#23'
      AND p_size IN (1, 9, 17, 25, 33, 41, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier(spark, sf_dir):
    """TPC-H Q16 shape (lineitem stands in for partsupp): NOT IN plans as a
    null-aware anti join — broadcast here since the excluded-supplier set is
    small — then COUNT(DISTINCT) expands to a two-shuffle distinct-then-count
    pipeline with partial aggregation."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49))
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17: correlated scalar aggregate subquery. Catalyst
    decorrelates it to an aggregate-then-join on l_partkey — one extra
    shuffle over the filtered fact, never a per-row subquery execution."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey)
        """
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: IN over a grouped-HAVING subquery — plans as an aggregate
    producing the qualifying orderkeys, semi-joined back into the fact
    chain. The qualifying set is tiny, so Spark broadcasts the semi side."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        """
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-column predicates. The common
    bounds (p_size <= 15, l_quantity <= 30) are derivable and the OR of
    single-table conjuncts is pushed to each scan; the join itself stays a
    broadcast hash join with the residual OR as a post-join filter."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@query(
    "q22_sales_opportunity",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0
                         AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q22_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (nationkey stands in for the phone country code):
    an uncorrelated scalar-average subquery (computed once, broadcast as a
    literal), a NOT EXISTS anti join against recent orders, then a
    two-phase aggregate over the survivors."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0
                             AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        GROUP BY c_nationkey
        """
    )


# Round-2d: the nine remaining classic decision-support shapes. The fixture
# has no partsupp table, so Q2/Q11/Q15/Q20 derive the part-supplier relation
# from lineitem (GROUP BY l_partkey, l_suppkey) — same join topology, the
# "partsupp" input is one extra aggregate. No commitdate/receiptdate/shipmode,
# so Q12/Q21 measure lateness as l_shipdate vs o_orderdate + 60 days.


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(ps_supplycost + 5e-10, 4) AS cost
    FROM part
    JOIN partsupp ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: min-cost supplier per part via a correlated scalar
    MIN subquery. partsupp is derived from lineitem (min observed unit
    price per part-supplier pair — one groupBy, exact doubles so the
    equality join on cost is bit-identical across engines). Catalyst
    decorrelates the scalar MIN into an aggregate joined back on
    ps_partkey; region/nation/supplier all broadcast.

    The emitted cost rounds with a +5e-10 nudge on BOTH sides: the
    price/quantity quotient can TERMINATE in 5-7 decimal digits
    (2-decimal price over a 2^a*5^b quantity), landing exactly on a
    4-dp half boundary that Spark (BigDecimal HALF_UP on the exact
    binary value) and DuckDB (decimal-rendered round) resolve
    differently — seen at sf0.001 (209.93/8 = 26.24125). Ties sit at
    multiples of 1e-7 from the boundary and non-terminating quotients
    >= ~1e-8 away, so the 5e-10 nudge canonicalizes every tie to
    round-up in both engines and can never flip a non-tie."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    # the derived partsupp is referenced twice (outer join chain + the
    # decorrelated MIN); Catalyst inlines CTEs, which would aggregate
    # lineitem twice — materialize it once (it is ~|part|x|supp| rows,
    # far smaller than lineitem; in TPC-H proper it IS a stored table)
    li = load(spark, sf_dir, "lineitem")
    partsupp = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
        .localCheckpoint(eager=True)
    )
    partsupp.createOrReplaceTempView("partsupp")
    return spark.sql(
        """
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               ROUND(ps_supplycost + 5e-10, 4) AS cost
        FROM part
        JOIN partsupp ON p_partkey = ps_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
          AND ps_supplycost = (
            SELECT MIN(ps_supplycost)
            FROM partsupp ps2
            JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
            WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_8')
              OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_7'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    Both nation dims broadcast with their disjunctive pair filter applied
    AFTER the join (the OR spans both sides); lineitem's date filter is
    pushed to the scan, and the only shuffles are the two fact joins plus
    the final small aggregate."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_8")) | (
        (F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_7")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_8' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') allnations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, by year. Every dimension broadcasts (part pre-filtered on type,
    customer restricted to the region via nation->region); numerator and
    denominator come out of a single conditional-aggregation pass."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nation = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("ck"))
    supp_nation = n.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("ck"), "inner")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_8", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%bolt%') profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit per supplier-nation per year for a part
    family. The fixture has no ps_supplycost, so cost is the documented
    stand-in 0.1 * p_retailprice * l_quantity — same join topology (part
    name LIKE filter broadcast into the fact chain, orders joined only for
    the year). One fact shuffle, then a small two-column aggregate."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey IN (3, 8, 13)
      GROUP BY l_partkey)
    SELECT ps_partkey, CAST(value AS DOUBLE) AS value
    FROM ps
    WHERE value * 1000 > (SELECT SUM(value) FROM ps)
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part value concentration with a HAVING against
    a global-total scalar subquery. Value sums in DECIMAL so the
    threshold comparison (value * 1000 > total) is exact in both engines —
    a double sum could flip borderline parts on accumulation order. The
    scalar total reuses the same aggregate — the ps frame is materialized
    once (localCheckpoint) because Catalyst inlines CTEs, which would run
    the lineitem aggregate twice for its two references."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey").isin(3, 8, 13))
    ps = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("value"))
        .localCheckpoint(eager=True)
    )
    ps.createOrReplaceTempView("ps")
    return spark.sql(
        """
        SELECT ps_partkey, CAST(value AS DOUBLE) AS value
        FROM ps
        WHERE value * 1000 > (SELECT SUM(value) FROM ps)
        """
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (SELECT o_orderpriority,
                 CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
                      THEN 'SLOW' ELSE 'FAST' END AS delay_bucket
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00') t
    GROUP BY delay_bucket
    """,
)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: the fixture has no shipmode/commit/receipt dates,
    so lines bucket by ship delay (l_shipdate vs o_orderdate + 60 days) —
    same conditional-aggregation pivot on order priority. One fact join
    (orders broadcasts after the date filter prunes lineitem), two CASE
    sums in a single pass; BIGINT casts pin the DuckDB HUGEINT artifact."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(o), F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn(
            "delay_bucket",
            F.when(
                F.col("l_shipdate")
                >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                "SLOW",
            ).otherwise("FAST"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) hitting the quarter's max revenue.
    Revenue accumulates in DECIMAL so the equality against MAX is exact
    (a double sum would make 'the max row' engine-dependent). The revenue
    CTE (one row per supplier) is referenced twice — materialized once
    (localCheckpoint) since CTE inlining would scan-aggregate the
    quarter's lineitem twice."""
    li = load(spark, sf_dir, "lineitem")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("total_revenue")
        )
        .localCheckpoint(eager=True)
    )
    revenue.createOrReplaceTempView("revenue")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@query(
    "q20_potential_promotion",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT sp.l_suppkey FROM (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey) sp
      WHERE sp.qty * 2 > (
        SELECT SUM(CAST(l_quantity AS DECIMAL(18,4))) FROM lineitem l2
        WHERE l2.l_partkey = sp.l_partkey
          AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l2.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: nested IN with a correlated half-of-total
    aggregate. Without ps_availqty the predicate becomes 'supplier shipped
    more than half of a part's year volume' (dominant supplier) — same
    structure: inner grouped aggregate, correlated scalar SUM on the outer
    part key, decorrelated by Catalyst into an aggregate-join. DECIMAL
    quantities keep the 2x comparison exact in both engines."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          SELECT sp.l_suppkey FROM (
            SELECT l_suppkey, l_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey) sp
          WHERE sp.qty * 2 > (
            SELECT SUM(CAST(l_quantity AS DECIMAL(18,4))) FROM lineitem l2
            WHERE l2.l_partkey = sp.l_partkey
              AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l2.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
        """
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND s_nationkey IN (3, 8)
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finished orders. Lateness = shipped over 60 days after
    order date (no receipt/commit dates in the fixture). The EXISTS
    becomes a left-semi and the NOT EXISTS a null-safe left-anti on
    l_orderkey — both correlate only on equality keys, so Catalyst
    decorrelates without a per-row subquery; lineitem is touched three
    times but each pass is column-pruned to 2-3 columns."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND s_nationkey IN (3, 8)
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """
    )


@query(
    "join_interval_bucketed",
    oracle="""
    WITH incidents AS (
      SELECT event_id AS incident_id, ts AS w_start,
             ts + INTERVAL 30 MINUTE AS w_end
      FROM events WHERE event_id % 50 = 0
    )
    SELECT incident_id, COUNT(*) AS n_events
    FROM incidents JOIN events e
      ON e.ts >= w_start AND e.ts < w_end
    GROUP BY incident_id
    """,
)
def join_interval_bucketed(spark, sf_dir):
    """KEYLESS interval containment join (operators/rangejoin.py): events
    falling inside incident windows that share no equi key with them.
    Spark's planner alone can only nested-loop this shape; the operator
    discretizes time into 30-min buckets, replicates each interval onto
    the <= 2 buckets it overlaps, and equi-joins on the bucket — plan
    contains a hash/sort-merge join, never BroadcastNestedLoop (asserted
    in tests/test_plans.py)."""
    from split_kinesis_streams_with_glue_spark.operators.rangejoin import (
        interval_point_join,
    )

    ev = load(spark, sf_dir, "events")
    incidents = ev.filter(F.col("event_id") % 50 == 0).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("w_end"),
    )
    joined = interval_point_join(
        ev.select(F.col("ts")), incidents, "ts", "w_start", "w_end",
        bucket_width_seconds=1800,
    )
    return joined.groupBy("incident_id").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "agg_histogram",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000.0 THEN 13
                ELSE CAST(FLOOR(o_totalprice / 50000.0) AS INTEGER) + 1
           END AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Equi-width histogram via width_bucket (PostgreSQL semantics in both
    engines: values below range -> 0, above -> n+1): the one-pass
    distribution profile for any numeric column. Partial aggregation
    map-side, 14 output rows max regardless of input size."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "subquery_lateral_topn",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
)
def subquery_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each customer's
    two most expensive orders, the per-row-subquery formulation of
    grouped top-N. Catalyst decorrelates it into a window ranking over
    one pk-shuffle — never a per-customer subquery execution — so the
    declarative LATERAL form costs the same as the hand-written
    row_number() <= 2 plan."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )


@query(
    "agg_mode_segment",
    since=6,
    oracle="""
    WITH c AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    ),
    r AS (
      SELECT c_mktsegment, c_nationkey, n,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, c_nationkey) AS rn
      FROM c
    )
    SELECT c_mktsegment,
           CAST(c_nationkey AS BIGINT) AS mode_nationkey,
           CAST(n AS BIGINT) AS n_rows
    FROM r WHERE rn = 1
    """,
)
def agg_mode_segment(spark, sf_dir):
    """Deterministic per-group MODE (most frequent nation per market
    segment): SQL's MODE() leaves ties implementation-defined, so the
    argmax is explicit — (count desc, smaller key) via a struct max over
    the bounded contingency frame, the same deterministic-argmax idiom
    as knn_classify's vote. Completes the SQL aggregate surface next to
    the percentile/histogram family."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = c.groupBy("c_mktsegment").agg(
        F.max(
            F.struct(
                F.col("n"), (-F.col("c_nationkey")).alias("negk")
            )
        ).alias("b")
    )
    return best.select(
        "c_mktsegment",
        (-F.col("b.negk")).cast("bigint").alias("mode_nationkey"),
        F.col("b.n").cast("bigint").alias("n_rows"),
    )


@query(
    "agg_conditional_surface",
    since=6,
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) FILTER (c_acctbal < 0) AS BIGINT) AS n_negative,
           bool_and(c_acctbal > -1000.0) AS all_above_floor,
           bool_or(c_acctbal > 9000.0) AS any_vip,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_conditional_surface(spark, sf_dir):
    """Conditional/boolean aggregate surface — count_if, every/bool_and,
    any/bool_or per group: the SQL:2023 boolean aggregates a dashboard
    filter bar compiles to, rounding out the aggregate family next to
    mode/percentiles/histograms. One map-side-combining pass."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count_if(F.col("c_acctbal") < 0).cast("bigint").alias("n_negative"),
        F.bool_and(F.col("c_acctbal") > -1000.0).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9000.0).alias("any_vip"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
