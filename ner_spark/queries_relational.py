"""Layer-C relational operator sweep (SURVEY.md §2.2, §2.4–§2.8) over the
driver testdata tables, each differentially tested against DuckDB.

Every query names the SURVEY operator row it covers. DataFrame-first:
Catalyst handles pushdown/pruning/join selection; hints only where the
operator row *is* the hint (broadcast, shuffle_hash).
"""

from __future__ import annotations

# module-level: pandas_udf resolves postponed-evaluation type hints
# ('pd.Series') against module globals
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ner_spark.operators.relational import asof_join
from ner_spark.registry import register, t
from ner_spark.session import set_confs

# Fixture-scale knobs that let Catalyst's InjectRuntimeFilter engage on a
# tiny input (production defaults: 10 GB probe-side scan, 10 MB creation
# side — they trigger on their own at scale). Shared with the plan-pin
# test so the demo and its gate cannot drift.
BLOOM_INJECT_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}

# ---------------------------------------------------------------------------
# scans / projection / filters (C1, C3, C4, C5, C6)
# ---------------------------------------------------------------------------


@register(
    "proj_filter_pushdown",
    """
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount BETWEEN 0.02 AND 0.06
    """,
)
def proj_filter_pushdown(spark, sf):
    """C3/C4: projection + predicate pushed to the parquet scan."""
    return (
        t(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") < "1996-01-01")
            & F.col("l_discount").between(0.02, 0.06)
        )
        .select("l_orderkey", "l_extendedprice")
    )


@register(
    "dedup_hygiene",
    """
    SELECT DISTINCT l_orderkey, l_linenumber
    FROM lineitem WHERE l_quantity IS NOT NULL
    """,
)
def dedup_hygiene(spark, sf):
    """C5: dropna + dropDuplicates."""
    return (
        t(spark, sf, "lineitem")
        .dropna(subset=["l_quantity"])
        .select("l_orderkey", "l_linenumber")
        .dropDuplicates(["l_orderkey", "l_linenumber"])
    )


@register(
    "conditional_recode",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS price_band,
           ROUND(o_totalprice / 1000.0, 6) AS price_k
    FROM orders
    """,
)
def conditional_recode(spark, sf):
    """C6: when/otherwise conditional expressions."""
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.round(F.col("o_totalprice") / 1000.0, 6).alias("price_k"),
    )


# ---------------------------------------------------------------------------
# aggregations (C15–C20, B7/B9 shapes)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 1) AS sum_qty,
           ROUND(SUM(l_extendedprice), 1) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 1) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf):
    """C15 hash aggregate (TPC-H Q1 shape): partial+final agg, pushdown."""
    li = t(spark, sf, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 1).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "distinct_agg",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_agg(spark, sf):
    """C16: exact distinct aggregation (expand + two-phase agg)."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@register(
    "rollup_counts",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 1) AS revenue
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_counts(spark, sf):
    """C17: rollup."""
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 1).alias("revenue"),
        )
    )


@register(
    "cube_counts",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_counts(spark, sf):
    """C17: cube."""
    return (
        t(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "grouping_sets",
    """
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
)
def grouping_sets(spark, sf):
    """C17: explicit grouping sets (SQL path exercises the same plan)."""
    c = t(spark, sf, "customer")
    c.createOrReplaceTempView("__c_gs")
    return c.sparkSession.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM __c_gs GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@register(
    "percentiles",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentiles(spark, sf):
    """C18: exact percentiles (interpolated, both engines)."""
    return (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
        )
    )


@register(
    "histogram_buckets",
    """
    SELECT CAST(LEAST(GREATEST(FLOOR(o_totalprice / 50000), 0), 9) AS BIGINT)
             AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def histogram_buckets(spark, sf):
    """C18: histogram via explicit bucket arithmetic (engine-neutral)."""
    return (
        t(spark, sf, "orders")
        .select(
            F.least(F.greatest(F.floor(F.col("o_totalprice") / 50000), F.lit(0)), F.lit(9))
            .cast("bigint")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "pivot_status",
    """
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status(spark, sf):
    """C20: pivot."""
    p = (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("P", F.lit(0)).alias("status_p"),
    )


@register(
    "collect_ordered",
    """
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderdate, o_orderkey),
                           ',') AS order_keys
    FROM orders GROUP BY o_custkey
    """,
)
def collect_ordered(spark, sf):
    """C19: deterministic ordered collect_list via array_sort(struct).

    The ordered list is emitted as a comma-joined string: the value check
    canonicalizes rows through a pandas sort, and array-typed cells are
    unhashable there — the string carries identical information."""
    o = t(spark, sf, "orders")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("o_orderdate", "o_orderkey"))
                ),
                lambda s: s["o_orderkey"].cast("string"),
            ),
        ).alias("order_keys")
    )


@register(
    "salted_two_level_agg",
    """
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 6) AS spend
    FROM orders GROUP BY o_custkey
    """,
)
def salted_two_level_agg(spark, sf):
    """B9: salted two-level aggregation — partial agg on (key, salt), final
    on key; result must equal the plain groupBy (the salting is transparent)."""
    o = t(spark, sf, "orders").withColumn(
        "__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(8))
    )
    partial = o.groupBy("o_custkey", "__salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("o_totalprice").alias("ps")
    )
    return partial.groupBy("o_custkey").agg(
        F.sum("pn").alias("n_orders"), F.round(F.sum("ps"), 6).alias("spend")
    )


# ---------------------------------------------------------------------------
# joins (C7–C14)
# ---------------------------------------------------------------------------


@register(
    "join_broadcast",
    """
    SELECT r.r_name, COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast(spark, sf):
    """C7: broadcast hash join (explicit hint on the small dim)."""
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@register(
    "join_sort_merge",
    """
    SELECT o.o_orderpriority,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 1) AS revenue,
           COUNT(*) AS n
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_sort_merge(spark, sf):
    """C8: big⋈big equi join (sort-merge above broadcast threshold)."""
    o = t(spark, sf, "orders").hint("merge")
    li = t(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "join_shuffle_hash",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           ROUND(AVG(o.o_totalprice), 4) AS avg_price
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_shuffle_hash(spark, sf):
    """C9: shuffled hash join via hint (skips the sort)."""
    c = t(spark, sf, "customer").hint("shuffle_hash")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@register(
    "join_semi",
    """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark, sf):
    """C13: left-semi join."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_anti",
    """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
)
def join_anti(spark, sf):
    """C13: left-anti join — customers without a high-value order.

    The build side is filtered (o_totalprice > 300000) so the anti-join
    has survivors at every sf: every customer has SOME order in the
    driver data, so the unfiltered version returned 0 rows and the
    differential check was vacuous."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_full_outer",
    """
    SELECT COALESCE(a.k, b.k) AS nationkey,
           COALESCE(a.n_cust, 0) AS n_cust, COALESCE(b.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) b
    ON a.k = b.k
    """,
)
def join_full_outer(spark, sf):
    """C14: full outer join."""
    c = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "k", "full_outer")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "join_theta_bnlj",
    """
    SELECT r.r_name, COUNT(*) AS n_higher
    FROM region r JOIN nation n ON n.n_regionkey > r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_theta_bnlj(spark, sf):
    """C10: non-equi theta join (broadcast nested loop)."""
    r = t(spark, sf, "region")
    n = t(spark, sf, "nation")
    return (
        r.join(n, n.n_regionkey > r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_higher"))
    )


@register(
    "join_range",
    """
    SELECT b.bucket, COUNT(*) AS n, ROUND(SUM(e.value), 6) AS total
    FROM events e
    JOIN (SELECT CAST(UNNEST(generate_series(0, 19)) AS BIGINT) AS bucket) b
      ON e.value >= b.bucket * 50 AND e.value < (b.bucket + 1) * 50
    GROUP BY b.bucket
    """,
)
def join_range(spark, sf):
    """C11: range/interval join against generated buckets."""
    e = t(spark, sf, "events")
    b = e.sparkSession.range(0, 20).select(F.col("id").alias("bucket"))
    return (
        e.join(
            F.broadcast(b),
            (e.value >= b.bucket * 50) & (e.value < (b.bucket + 1) * 50),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
    )


@register(
    "join_asof",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, MAX(value) AS last_purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.event_id, p.last_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof(spark, sf):
    """C12: as-of join (latest purchase at-or-before each click) via the
    union+window trick; oracle uses DuckDB's native ASOF JOIN."""
    e = t(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    return asof_join(
        clicks, purchases, ["user_id"], "ts", "ts", ["last_purchase_value"]
    ).select("user_id", "event_id", "last_purchase_value")


# ---------------------------------------------------------------------------
# windows / sorts / limits / set ops (C21–C25)
# ---------------------------------------------------------------------------


@register(
    "window_rank_topk",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def window_rank_topk(spark, sf):
    """C21/C23: per-group top-k via row_number with deterministic tiebreak."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_ranks",
    """
    SELECT o_orderkey,
           RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_orderstatus
                              ORDER BY o_totalprice DESC, o_orderkey) AS drnk,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def window_ranks(spark, sf):
    """C21: rank / dense_rank / ntile."""
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.rank().over(W.orderBy(F.desc("o_totalprice"), "o_orderkey")).alias("rnk"),
        F.dense_rank()
        .over(W.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), "o_orderkey"))
        .alias("drnk"),
        F.ntile(4).over(W.orderBy("o_totalprice", "o_orderkey")).alias("quartile"),
    )


@register(
    "window_running",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS running_total,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS sliding_avg
    FROM events
    """,
)
def window_running(spark, sf):
    """C22: frame-spec running + sliding aggregates."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 6).alias(
            "running_total"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("sliding_avg"),
    )


@register(
    "window_lag_lead",
    """
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta,
           LEAD(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def window_lag_lead(spark, sf):
    """C22/B14: lag/lead turn-context shape."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "topk_global",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_global(spark, sf):
    """C23/C24: global top-k (TakeOrderedAndProject — no full sort)."""
    return (
        t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "sort_limit_offset",
    """
    SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 5
    """,
)
def sort_limit_offset(spark, sf):
    """C24: sort / limit / offset."""
    return (
        t(spark, sf, "orders").orderBy("o_orderkey").select("o_orderkey").offset(5).limit(20)
    )


@register(
    "set_ops",
    """
    SELECT k, 'both' AS src FROM
      (SELECT n_nationkey AS k FROM nation
       INTERSECT SELECT c_nationkey AS k FROM customer)
    UNION ALL
    SELECT k, 'nation_only' AS src FROM
      (SELECT n_nationkey AS k FROM nation
       EXCEPT SELECT c_nationkey AS k FROM customer)
    """,
)
def set_ops(spark, sf):
    """C25: intersect / except / union."""
    n = t(spark, sf, "nation").select(F.col("n_nationkey").alias("k"))
    c = t(spark, sf, "customer").select(F.col("c_nationkey").cast("bigint").alias("k"))
    both = n.intersect(c).withColumn("src", F.lit("both"))
    only = n.exceptAll(c.distinct()).withColumn("src", F.lit("nation_only"))
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# scalar functions (§2.8)
# ---------------------------------------------------------------------------


@register(
    "string_funcs",
    """
    SELECT doc_id,
           LENGTH(text) AS n_chars2,
           UPPER(SUBSTRING(text, 1, 10)) AS head10,
           levenshtein(lang, 'en') AS lang_dist,
           REGEXP_REPLACE(text, '[aeiou]', '', 'g') AS devowelled,
           CONCAT_WS('|', lang, source) AS tag,
           MD5(text) AS text_md5
    FROM documents
    """,
)
def string_funcs(spark, sf):
    """§2.8 strings: length/substr/upper/levenshtein/regexp/concat_ws/md5."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars2"),
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.levenshtein("lang", F.lit("en")).alias("lang_dist"),
        F.regexp_replace("text", "[aeiou]", "").alias("devowelled"),
        F.concat_ws("|", "lang", "source").alias("tag"),
        F.md5("text").alias("text_md5"),
    )


@register(
    "date_funcs",
    """
    SELECT event_id,
           date_trunc('month', ts) AS month_start,
           CAST(extract(year FROM ts) AS INT) AS yr,
           CAST(extract(hour FROM ts) AS INT) AS hr,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS unix_sec
    FROM events
    """,
)
def date_funcs(spark, sf):
    """§2.8 date/time: trunc/extract/unix."""
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        F.date_trunc("month", "ts").alias("month_start"),
        F.year("ts").alias("yr"),
        F.hour("ts").alias("hr"),
        F.unix_timestamp("ts").alias("unix_sec"),
    )


@register(
    "math_funcs",
    """
    SELECT o_orderkey,
           ROUND(LN(o_totalprice), 6) AS log_price,
           ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
           ROUND(POW(o_totalprice / 100000, 2), 6) AS sq_ratio,
           ABS(CAST(o_custkey AS BIGINT) - 1000) AS key_dist
    FROM orders
    """,
)
def math_funcs(spark, sf):
    """§2.8 math: log/sqrt/pow/abs."""
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.log("o_totalprice"), 6).alias("log_price"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        F.round(F.pow(F.col("o_totalprice") / 100000, 2), 6).alias("sq_ratio"),
        F.abs(F.col("o_custkey").cast("bigint") - 1000).alias("key_dist"),
    )


@register(
    "array_funcs",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim
    FROM embeddings
    """,
)
def array_funcs(spark, sf):
    """§2.8 arrays: size/aggregate/transform/element_at on vectors."""
    e = t(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sq_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_dim"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_dim"),
    )


@register(
    "json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def json_funcs(spark, sf):
    """§2.8 JSON: extraction from the props payload."""
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.when(F.get_json_object("props", "$.k").cast("bigint") > 50, "high")
        .otherwise("low")
        .alias("k_band"),
    )


@register(
    "map_funcs",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(json_keys(props)[1]) AS first_key,
           MAX(len(json_keys(props))) AS max_props
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def map_funcs(spark, sf):
    """§2.8 map: props parsed to map<string,int> (from_json — str_to_map
    would apply to k=v syntax), then element_at / map_keys / map_entries
    over it, aggregated per event type."""
    e = t(spark, sf, "events")
    m = F.from_json("props", "map<string,int>")
    # try_element_at, not element_at: under Spark 4 ANSI mode a missing map
    # key (or an empty key array) throws, while the DuckDB oracle's
    # json_extract_string / json_keys[1] return NULL — NULL-on-missing is
    # the contract semantics
    return (
        e.select(
            "event_type",
            F.try_element_at(m, F.lit("k")).alias("kv"),
            F.try_element_at(F.map_keys(m), F.lit(1)).alias("k0"),
            F.size(F.map_entries(m)).alias("n_props"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("kv").cast("bigint")).alias("sum_k"),
            F.min("k0").alias("first_key"),
            F.max(F.col("n_props").cast("bigint")).alias("max_props"),
        )
        .orderBy("event_type")
    )


@register(
    "join_asof_cogroup",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, MAX(value) AS last_purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.event_id, p.last_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof_cogroup(spark, sf):
    """C12 alternative physical strategy (§2.10 cogrouped map): the same
    as-of join as `join_asof`, via cogroup().applyInPandas with
    pd.merge_asof per user — co-partitioned, sort only within groups.
    Same DuckDB oracle as the union+window variant: two independent Spark
    plans differentially checked against one SQL definition."""
    import pandas as pd

    # Each cogroup side gets its OWN scan: when both derive from one read
    # (shared attribute ids), Spark 4.1's column pruning under a
    # zero-column parent (e.g. df.count()) misbinds the right side's
    # attributes to the left's and the UDF receives a right batch without
    # `ts` (worker KeyError). Full materialization is unaffected, so the
    # differential never caught it; tests/test_plan_shapes.py pins the
    # count() path now. Two scans of the same parquet cost nothing extra
    # here — both are pruned + pushed down independently.
    clicks = t(spark, sf, "events").where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        t(spark, sf, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(
                columns=["user_id", "event_id", "last_purchase_value"]
            )
        out = pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            right.sort_values("ts", kind="mergesort")[
                ["ts", "last_purchase_value"]
            ],
            on="ts",
            direction="backward",
        )
        return out[["user_id", "event_id", "last_purchase_value"]]

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            merge, "user_id bigint, event_id bigint, last_purchase_value double"
        )
    )


@register(
    "grouped_agg_pandas_udf",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def grouped_agg_pandas_udf(spark, sf):
    """§2.10 grouped-agg pandas UDF: quantity-weighted mean price per
    return flag. The UDF receives each group's columns as Arrow-batched
    pandas Series and returns one scalar — the custom-UDAF surface (the
    other §2.10 rows cover map / scalar / grouped-map / cogrouped-map).
    Differential note: both engines compute sum(p*q)/sum(q) in float64;
    ROUND(..., 6) absorbs accumulation-order noise per registry policy."""

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(wavg("l_extendedprice", "l_quantity"), 6).alias("wavg_price")
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q3_shipping",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark, sf):
    """TPC-H Q3 shape (shipping priority): selective dim filter →
    fact-fact join → hash agg → top-10. Plan shape at scale: both date
    filters push into the parquet scans, the filtered customer side
    broadcasts (segment cut ≈ 1/5 of an already-small dim), so the only
    shuffle is orders⋈lineitem on orderkey + the final agg; the top-10
    is TakeOrderedAndProject (no global sort). Revenue groups are
    per-orderkey (≤7 lineitems) so ROUND(...,6) is add-order-safe;
    deterministic l_orderkey tiebreak pins the LIMIT cut."""
    c = t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").where(F.col("o_orderdate") < "1998-06-01")
    li = t(spark, sf, "lineitem").where(F.col("l_shipdate") > "1998-06-01")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 1) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier(spark, sf):
    """TPC-H Q5 shape (local-supplier revenue): 6-table join — the
    join-ordering / broadcast-selection workout. nation/region are
    forced broadcasts (constant-sized); supplier and customer carry NO
    broadcast hint — at TPC-H proportions they are 1/1000th of lineitem
    but still grow with scale, so the right physical join is
    size-dependent and AQE's runtime statistics should pick it (BHJ at
    this sf, SMJ/SHJ on a 100-TB warehouse where forcing a broadcast
    would OOM the executors). The date filter pushes into the orders
    scan and DPP can prune lineitem at the orderkey join on a
    partitioned warehouse. ROUND(...,1) on the nation-level sum absorbs
    cross-engine accumulation-order noise (registry policy, same as
    pricing_summary)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "subquery_corr_scalar",
    """
    SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT ROUND(1.2 * AVG(c2.c_acctbal), 6)
      FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def subquery_corr_scalar(spark, sf):
    """Correlated scalar subquery (customers 20% above their nation's
    mean balance), run through spark.sql so Catalyst's subquery
    decorrelation (RewriteCorrelatedScalarSubquery) plans it — the
    optimized plan is an aggregate on the correlation key joined back to
    the outer table, not a per-row re-execution; at scale that is one
    small agg + one broadcast join instead of N subquery probes.
    ROUND(threshold, 6) on both engines pins the float boundary."""
    t(spark, sf, "customer").createOrReplaceTempView("__cust_sq")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
        FROM __cust_sq c
        WHERE c.c_acctbal > (
          SELECT ROUND(1.2 * AVG(c2.c_acctbal), 6)
          FROM __cust_sq c2 WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "batch_sessionize",
    """
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM x)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def batch_sessionize(spark, sf):
    """Sessionization in batch mode via F.session_window (the same
    expression the S3 streaming path uses — session_window works on
    static DataFrames), giving the session operator a DuckDB
    differential: the oracle is the classic gaps-and-islands rewrite
    (lag + running sum of session breaks).

    Boundary semantics (probed, not assumed): an event at exactly
    prev_ts + gap MERGES into the open session — a new session starts
    only when the gap is strictly exceeded — and session_end =
    last_event_ts + gap; the oracle's `> INTERVAL 30 MINUTE` break
    condition and MAX(ts) + gap reproduce both. Scale shape: one
    shuffle on user_id; Spark's session merge is a partial-aggregation
    friendly hash agg, not a window sort."""
    e = t(spark, sf, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "window_distribution",
    """
    SELECT o_orderkey, o_orderstatus,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey), 9) AS pr,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey), 9) AS cd
    FROM orders
    """,
)
def window_distribution(spark, sf):
    """C21 completion: distribution window functions (percent_rank,
    cume_dist) per order-status partition. o_orderkey in the ORDER BY
    makes the frame ordering total, so both engines produce identical
    rank positions; 9-decimal rounding kills representation noise in the
    rank ratios."""
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )


# ---------------------------------------------------------------------------
# round-2 additions: more Catalyst decorrelation shapes, IGNORE NULLS
# windows, lateral explode (C21/C22 completion + §4.1 optimizer rows)
# ---------------------------------------------------------------------------


@register(
    "tpch_q17_small_qty",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17_small_qty(spark, sf):
    """TPC-H Q17 shape (small-quantity-order revenue): correlated AVG
    subquery against the *fact* table, filtered by a selective dim
    predicate. The scale-critical rewrite is Catalyst's decorrelation:
    the optimized plan computes one per-partkey AVG aggregate over
    lineitem and joins it back (agg + join), instead of re-scanning
    lineitem per outer row — at 100 TB that is the difference between
    2 passes and N passes. p_brand pushes into the part scan and the
    brand-filtered part side broadcasts into both the outer join and
    (post-decorrelation) the threshold join. Threshold comparison uses
    exact small-int arithmetic (quantities are whole numbers, AVG of
    <=50-row groups is exact in double on both engines); only the final
    single-row sum is rounded."""
    t(spark, sf, "lineitem").createOrReplaceTempView("__li_q17")
    t(spark, sf, "part").createOrReplaceTempView("__part_q17")
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM __li_q17 JOIN __part_q17 ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'
          AND l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM __li_q17 l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@register(
    "tpch_q18_large_volume",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 6) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume(spark, sf):
    """TPC-H Q18 shape (large-volume customer): IN-subquery over a
    grouped HAVING aggregate. Catalyst rewrites the IN to a left-semi
    join against the aggregated keys (RewritePredicateSubquery), so the
    physical plan is agg(lineitem) -> semi-join -> 3-way join -> agg ->
    TakeOrderedAndProject. At scale the semi side is tiny (orders whose
    total quantity exceeds the threshold) and AQE broadcasts it,
    pre-filtering the lineitem re-scan before the wide join. Quantity
    sums are exact (<=7 whole-number lineitems per order); the 250
    threshold lands ~1 per 100 orders in the driver data so the result
    is non-vacuous at every sf."""
    t(spark, sf, "customer").createOrReplaceTempView("__cust_q18")
    t(spark, sf, "orders").createOrReplaceTempView("__ord_q18")
    t(spark, sf, "lineitem").createOrReplaceTempView("__li_q18")
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROUND(SUM(l_quantity), 6) AS total_qty
        FROM __cust_q18
        JOIN __ord_q18 ON c_custkey = o_custkey
        JOIN __li_q18 ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM __li_q18
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """
    )


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 1) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_12')
          OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_7'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf):
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations, grouped by (supplier nation, customer nation, ship year).
    The nation dim is joined TWICE under different roles — the
    disjunctive nation-pair predicate can only be applied after both
    joins, so the scale-relevant plan keeps both nation joins broadcast
    (25 rows) and leaves lineitem⋈orders⋈customer as the only
    shuffles; the shipdate range pushes into the lineitem scan. Groups
    are the 2 nation-pair × year cells; double sums over ≤40-row groups
    make ROUND(...,1) add-order-safe."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    s = t(spark, sf, "supplier")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_12")
    ) | ((F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_7"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q14_promo_revenue",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
           / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
)
def tpch_q14_promo_revenue(spark, sf):
    """TPC-H Q14 shape (promo revenue): conditional aggregate over a
    fact⋈dim join — the shipdate month pushes into the lineitem scan
    (~1/70th of the fact), part broadcasts, and the ratio is computed in
    one hash-aggregate pass (two conditional sums, no second scan). The
    single-row division happens after both sums complete; ROUND(...,4)
    on the percentage absorbs accumulation-order noise."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    p = t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q19_disjunctive",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 1) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive(spark, sf):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate): an
    OR of three conjunct groups mixing dim columns (brand, size) and
    fact columns (quantity). The scale point is what the optimizer can
    still push despite the OR: the per-side implied disjunctions
    (p_brand IN (...) AND p_size <= 35; l_quantity BETWEEN 1 AND 30)
    are derivable and the whole residual predicate evaluates inside the
    broadcast-hash-join's whole-stage codegen — no fact shuffle at all.
    Single-row output, ROUND(...,1)."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.where(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def tpch_q21_waiting_supplier(spark, sf):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    the driver schema (no commit/receipt dates → 'this supplier shipped
    last in a multi-supplier order', which preserves the interesting
    structure: EXISTS + NOT EXISTS, both correlated on the outer fact
    row with a non-equi conjunct in the anti branch). Catalyst rewrites
    them to a LEFT SEMI and a LEFT ANTI self-join of lineitem on
    orderkey (RewritePredicateSubquery) — two fact-fact shuffle joins
    co-partitioned on the same key, which at 100 TB reuse one exchange;
    nation broadcasts and the status filter pushes into the orders
    scan. Deterministic (numwait DESC, s_name) cut."""
    for name, alias in [
        ("supplier", "__s_q21"),
        ("lineitem", "__li_q21"),
        ("orders", "__ord_q21"),
        ("nation", "__n_q21"),
    ]:
        t(spark, sf, name).createOrReplaceTempView(alias)
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM __s_q21
        JOIN __li_q21 l1 ON s_suppkey = l1.l_suppkey
        JOIN __ord_q21 ON o_orderkey = l1.l_orderkey
        JOIN __n_q21 ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
          AND EXISTS (SELECT 1 FROM __li_q21 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM __li_q21 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
        """
    )


@register(
    "tpch_q22_dormant_value",
    """
    SELECT c_mktsegment, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def tpch_q22_dormant_value(spark, sf):
    """TPC-H Q22 shape (global-sales-opportunity), adapted to the
    driver schema (every customer has orders and name prefixes are
    constant → 'above-average-balance customers with no RECENT order',
    grouped by segment). Preserves both structural features: an
    uncorrelated scalar AVG subquery (computed once, broadcast into the
    filter) and a correlated NOT EXISTS with an extra local predicate →
    LEFT ANTI join against the date-filtered orders (the filter pushes
    into the orders scan BEFORE the anti join, shrinking its build
    side). Sum over ≤10-row groups → ROUND(...,2) is add-order-safe."""
    t(spark, sf, "customer").createOrReplaceTempView("__cust_q22")
    t(spark, sf, "orders").createOrReplaceTempView("__ord_q22")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM __cust_q22
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM __cust_q22
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM __ord_q22
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


@register(
    "window_first_last",
    """
    SELECT event_id, user_id,
           ROUND(FIRST_VALUE(value) OVER w_run, 6) AS first_val,
           ROUND(LAST_VALUE(value) OVER w_full, 6) AS last_val,
           ROUND(NTH_VALUE(value, 2) OVER w_full, 6) AS second_val,
           ROUND(FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                 IGNORE NULLS) OVER w_run, 6) AS first_purchase_val
    FROM events
    WINDOW
      w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_full AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark, sf):
    """C21/C22 completion: first_value / last_value / nth_value with
    explicit frames, plus IGNORE NULLS (running 'first purchase seen so
    far' — NULL until the user's first purchase event). The full-frame
    variants pin the classic last_value footgun (default frame stops at
    CURRENT ROW); the ordering is total (ts, event_id) so both engines
    agree row-for-row. One shuffle on user_id; all four functions share
    the same sort."""
    e = t(spark, sf, "events")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_full = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(w_run), 6).alias("first_val"),
        F.round(F.last("value").over(w_full), 6).alias("last_val"),
        F.round(F.nth_value("value", 2).over(w_full), 6).alias("second_val"),
        F.round(F.first(purchase_val, ignorenulls=True).over(w_run), 6).alias(
            "first_purchase_val"
        ),
    )


@register(
    "explode_lateral",
    """
    SELECT vec_id, CAST(pos AS INT) AS pos,
           ROUND(CAST(embedding[pos + 1] AS DOUBLE), 6) AS val
    FROM embeddings, range(8) r(pos)
    WHERE pos < len(embedding)
    """,
)
def explode_lateral(spark, sf):
    """Lateral array expansion (posexplode) — the generator-expression
    row-multiplier every shingle/posting-list operator in queries_text
    builds on, exercised directly: first 8 dims of each embedding with
    their ordinal. Generate is pipelined inside whole-stage codegen (no
    shuffle, no Python); the pos<8 cut happens before the generate via
    slice so only 8 elements per row are materialized. Oracle uses a
    bounded range join (DuckDB's UNNEST has no ordinality clause)."""
    e = t(spark, sf, "embeddings")
    return (
        e.select(
            "vec_id",
            F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "val"),
        )
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            F.round(F.col("val").cast("double"), 6).alias("val"),
        )
    )


# ---------------------------------------------------------------------------
# bucketed co-located join + distributed sketches (100-TB layout/approx ops)
# ---------------------------------------------------------------------------

# session-scoped registry of already-written bucketed table pairs
_BUCKETED: dict[str, tuple[str, str]] = {}


def _ensure_bucketed(spark, sf) -> tuple[str, str]:
    """Write orders/lineitem as bucketed+sorted tables (8 buckets on the
    join key) into a per-session temp warehouse, once per (session, sf).

    The write repartitions by the bucket key first: repartition's hash
    (murmur3 pmod n) is the same function bucketing uses, so every task
    holds exactly one bucket and each bucket lands in ONE file — the
    precondition for Spark to mark the scan output as both hash-
    partitioned AND sorted, eliminating the Exchange and the Sort under
    a join on the bucket key. On a warehouse this layout cost is paid
    once at ingest and amortized over every subsequent co-located join."""
    import re
    import tempfile

    tag = re.sub(r"[^0-9a-zA-Z]+", "_", str(sf)).strip("_")
    key = f"{tag}@{id(spark)}"
    if key in _BUCKETED:
        return _BUCKETED[key]
    names = (f"bkt_orders_{tag}", f"bkt_lineitem_{tag}")
    base = tempfile.mkdtemp(prefix="ner_spark_bucketed_")
    for name, src, bkey in (
        (names[0], "orders", "o_orderkey"),
        (names[1], "lineitem", "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            t(spark, sf, src)
            .repartition(8, F.col(bkey))
            .write.bucketBy(8, bkey)
            .sortBy(bkey)
            .option("path", f"{base}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    _BUCKETED[key] = names
    return names


@register(
    "join_bucketed",
    """
    SELECT o_orderstatus, l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 1) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus, l_returnflag
    """,
)
def join_bucketed(spark, sf):
    """Shuffle-free co-located join via bucketing: both fact tables are
    bucketed+sorted on the join key (8 buckets, one file per bucket), so
    the SortMergeJoin consumes the scans' existing distribution — no
    Exchange and no Sort on either side (pinned by
    tests/test_plan_shapes.py). This is the §4/scale answer to the
    repeated orders⋈lineitem join: at 100 TB the bucketed layout turns
    every such join from a full 2-sided shuffle into a local merge.
    Results are identical to the plain parquet join, which is what the
    oracle checks."""
    o_name, li_name = _ensure_bucketed(spark, sf)
    o = spark.table(o_name)
    li = spark.table(li_name)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
            ).alias("revenue"),
        )
    )


@register("sketch_distinct_quantiles")
def sketch_distinct_quantiles(spark, sf):
    """Distributed sketches — the 100-TB substitute for exact DISTINCT /
    exact percentiles: Apache DataSketches HLL (hll_sketch_agg) built
    per group, merged across groups with hll_union_agg (the two-phase
    shape a warehouse uses: persist per-partition sketch bytes, merge at
    read time), plus HLL++ approx_count_distinct and t-digest-style
    approx_percentile. All are partial-aggregable: map-side combine
    produces fixed-size state regardless of input rows, so the shuffle
    carries sketches, not values.

    No SQL oracle — sketch estimates are engine-specific by design
    (driver records rows-only); tests/test_sketches.py bounds the
    estimates against exact counts/percentiles (|err| <= 5%)."""
    e = t(spark, sf, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("event_id").alias("sk"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("n_ids_hllpp"),
        F.expr(
            "approx_percentile(value, array(0.5, 0.95), 10000)"
        ).alias("pcts"),
    )
    per_type_out = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("n_ids_hll"),
        "n_ids_hllpp",
        F.round(F.element_at("pcts", 1), 6).alias("p50"),
        F.round(F.element_at("pcts", 2), 6).alias("p95"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_ids_hll")
    ).select(
        F.lit("__all__").alias("event_type"),
        "n_ids_hll",
        F.lit(None).cast("long").alias("n_ids_hllpp"),
        F.lit(None).cast("double").alias("p50"),
        F.lit(None).cast("double").alias("p95"),
    )
    return per_type_out.unionByName(merged)


@register(
    "join_null_aware_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def join_null_aware_anti(spark, sf):
    """NOT IN anti join — the null-aware variant (C13 completion):
    standard SQL NOT IN returns no rows if the subquery produces a
    single NULL, so Spark cannot plan a plain LeftAnti; it plans a
    null-aware anti join (BroadcastHashJoin LeftAnti with
    isNullAwareAntiJoin=true) that tracks subquery-side nulls at run
    time. The subquery side (high-value order custkeys) is tiny and
    broadcast; the customer scan streams past it map-side — at 100 TB
    this stays a zero-shuffle scan-side filter. Plan pinned in
    tests/test_plan_shapes.py."""
    t(spark, sf, "customer").createOrReplaceTempView("__cust_naaj")
    t(spark, sf, "orders").createOrReplaceTempView("__ord_naaj")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM __cust_naaj
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM __ord_naaj WHERE o_totalprice > 400000)
        """
    )


# session-scoped registry of partitioned-layout event tables
_PARTITIONED: dict[str, str] = {}


def _ensure_partitioned_events(spark, sf) -> str:
    """Write the events table hive-partitioned by event_type, once per
    (session, sf) — the disk layout a 100-TB warehouse uses so that
    partition-key predicates prune directories at file-listing time
    instead of reading+filtering."""
    import re
    import tempfile

    key = f"{re.sub(r'[^0-9a-zA-Z]+', '_', str(sf))}@{id(spark)}"
    if key not in _PARTITIONED:
        path = tempfile.mkdtemp(prefix="ner_spark_parted_")
        t(spark, sf, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(path)
        _PARTITIONED[key] = path
    return _PARTITIONED[key]


@register(
    "scan_partition_pruned",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(value), 6) AS total_value
    FROM events
    WHERE event_type = 'purchase' AND value > 50
    GROUP BY user_id
    """,
)
def scan_partition_pruned(spark, sf):
    """Static partition pruning (C3/C4 at the layout level): events
    written partitioned by event_type, read back with a partition-key
    predicate — the scan lists only the matching directory
    (PartitionFilters in the plan; 1-of-5 partitions read, pinned in
    tests/test_plan_shapes.py) while the value predicate pushes into the
    parquet row groups as a DataFilter. Same answer as filtering the
    unpartitioned table, which is what the oracle checks."""
    path = _ensure_partitioned_events(spark, sf)
    e = spark.read.parquet(path)
    return (
        e.where((F.col("event_type") == "purchase") & (F.col("value") > 50))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@register(
    "merge_upsert_orders",
    """
    WITH delta AS (
      SELECT o_orderkey, ROUND(o_totalprice * 1.05, 6) AS o_totalprice,
             'U' AS o_orderstatus
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, ROUND(o_totalprice, 6), 'N'
      FROM orders WHERE o_orderkey % 101 = 0)
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 6) AS o_totalprice,
           o.o_orderstatus, 'base' AS src
    FROM orders o ANTI JOIN delta d ON o.o_orderkey = d.o_orderkey
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderstatus, 'delta' AS src FROM delta
    """,
)
def merge_upsert_orders(spark, sf):
    """MERGE INTO semantics as a dataflow (the logical plan behind
    io.merge_upsert): a CDC delta of price updates (matched -> UPDATE)
    and late-arriving orders (not matched -> INSERT) applied to the
    orders table. Matched rows must appear exactly once with the new
    values, unmatched base rows unchanged, inserts appended — which is
    exactly what the oracle's anti-join+union states in ANSI SQL.

    Scale shape: the delta is broadcast into a LEFT ANTI hash join
    against the fact (a CDC batch is small relative to the table), so
    the fact side never shuffles — the same bet Iceberg's copy-on-write
    MERGE makes. The delta keys are derived deterministically from the
    table itself so the query is self-contained at every sf.
    """
    o = t(spark, sf, "orders")
    updates = o.where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 1.05, 6).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    )
    inserts = o.where(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.round("o_totalprice", 6).alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    delta = updates.unionByName(inserts)
    base = (
        o.join(F.broadcast(delta.select("o_orderkey")), "o_orderkey", "left_anti")
        .select(
            "o_orderkey",
            F.round("o_totalprice", 6).alias("o_totalprice"),
            "o_orderstatus",
            F.lit("base").alias("src"),
        )
    )
    return base.unionByName(delta.withColumn("src", F.lit("delta")))


@register(
    "json_variant",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(NULL AS VARCHAR) AS missing_val,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def json_variant(spark, sf):
    """Semi-structured access via Spark 4's VARIANT type: parse_json once
    into the binary variant encoding, then typed variant_get paths — the
    engine-native alternative to per-access string re-parsing
    (json_funcs covers the classic get_json_object path; at scale
    variant parses each props cell once and every subsequent path access
    is a binary probe, and Parquet variant shredding pushes the parse
    into the scan). try_variant_get yields NULL on a missing path,
    matching the oracle's json_extract_string semantics — the same
    missing-key contract ADVICE round 1 pinned for map element_at."""
    e = t(spark, sf, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return v.select(
        "event_id",
        k.alias("k_val"),
        F.try_variant_get("v", "$.missing", "string").alias("missing_val"),
        F.when(k > 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "window_sliding_events",
    """
    SELECT window_start, event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM (
      SELECT e.*,
             -- CAST(double AS BIGINT) ROUNDS in DuckDB; events carry
             -- sub-second ts, so floor() explicitly like Spark does
             to_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300
                          - k * 300)
               AT TIME ZONE 'UTC' AS window_start
      FROM events e CROSS JOIN UNNEST([0, 1]) AS t(k)
    )
    GROUP BY window_start, event_type
    """,
)
def window_sliding_events(spark, sf):
    """S2 completion: SLIDING event-time windows in batch mode —
    F.window(ts, '10 minutes', '5 minutes') assigns each event to
    duration/slide = 2 epoch-aligned windows (the same expression the
    streaming path uses; tumbling is stream_windowed_mentions). The
    oracle replays Spark's window-assignment law literally: window
    starts are floor(epoch/slide)*slide - k*slide for k in 0..1. Scale
    shape: the 2x row expansion happens inside the hash-aggregate's
    input (a Generate, no extra shuffle) and partial aggregation still
    combines map-side, so the single exchange carries (window,type)
    partials, not the doubled event stream."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "join_lateral_topk",
    """
    SELECT c_custkey, c_mktsegment, o.o_orderkey,
           ROUND(o.o_totalprice, 6) AS o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c_mktsegment = 'MACHINERY'
    """,
)
def join_lateral_topk(spark, sf):
    """Correlated LATERAL subquery with ORDER BY + LIMIT — top-2 orders
    per customer. The naive reading is a per-outer-row re-scan of
    orders; Catalyst's DecorrelateInnerQuery turns the correlated LIMIT
    into a partition-local rank over o_custkey joined back to the outer
    (one shuffle of orders, one join — the same shape you'd hand-write
    with row_number), so per-customer cost does not multiply the orders
    scan at 100 TB. The executed plan is better still: WindowGroupLimit
    runs a PARTIAL top-2-per-key pass map-side, so the exchange carries
    at most 2 rows per customer, not the orders table. The
    deterministic (price DESC, orderkey) tiebreak
    pins the LIMIT-2 cut on both engines; the segment filter prunes the
    outer before the join."""
    t(spark, sf, "customer").createOrReplaceTempView("__cust_lat")
    t(spark, sf, "orders").createOrReplaceTempView("__ord_lat")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, o.o_orderkey,
               ROUND(o.o_totalprice, 6) AS o_totalprice
        FROM __cust_lat, LATERAL (
          SELECT o_orderkey, o_totalprice FROM __ord_lat
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c_mktsegment = 'MACHINERY'
        """
    )


@register(
    "recursive_cte_chain",
    """
    WITH RECURSIVE seq AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders),
    chain(o_custkey, rn, o_orderkey, running_total) AS (
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.o_custkey, s.rn, s.o_orderkey,
             c.running_total + s.o_totalprice
      FROM chain c JOIN seq s
        ON s.o_custkey = c.o_custkey AND s.rn = c.rn + 1
      WHERE c.rn < 12)
    SELECT o_custkey, rn, o_orderkey, ROUND(running_total, 6) AS running_total
    FROM chain
    """,
)
def recursive_cte_chain(spark, sf):
    """WITH RECURSIVE (new in Spark 4): linked-list recursion down each
    customer's order history, one join per level against the rn-indexed
    orders — both engines run the IDENTICAL recursive SQL, and because
    the recursion fixes the accumulation order, the float running total
    is bitwise-reproducible across engines (no agg reordering).
    Execution shape: Spark iterates UnionLoop levels driver-side, each
    level a join of the previous frontier against the windowed seq; the
    frontier shrinks as chains end (~N/chain-length rows per level).
    Depth is capped at 12 levels (first 12 orders per customer) — each
    level pays a fixed per-iteration scheduling cost, so uncapped tail
    chains (~45 levels here) quadruple wall time for <2% more rows;
    production recursions should always carry such a guard anyway
    (spark.sql.cteRecursionLevelLimit merely errors at 100).
    This entry pins the SQL-surface feature; for million-row frontiers
    the iterative-DataFrame operators (operators/graph.py BFS,
    operators/coref.py CC) remain the scale path — they checkpoint per
    round and re-use one shuffled adjacency, which the generic UnionLoop
    does not. The window cumsum equivalence is separately asserted in
    tests/test_recursive_cte.py.

    The seq relation is materialized (localCheckpoint) BEFORE the
    recursion: a plain CTE referenced from the recursive step is
    re-evaluated at every level, so the window over orders would run
    12x — measured 2x wall on the materialized form."""
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
    ).localCheckpoint(eager=True)
    seq.createOrReplaceTempView("__seq_rcte")
    return spark.sql(
        """
        WITH RECURSIVE chain(o_custkey, rn, o_orderkey, running_total) AS (
          SELECT o_custkey, rn, o_orderkey, o_totalprice
          FROM __seq_rcte WHERE rn = 1
          UNION ALL
          SELECT s.o_custkey, s.rn, s.o_orderkey,
                 c.running_total + s.o_totalprice
          FROM chain c JOIN __seq_rcte s
            ON s.o_custkey = c.o_custkey AND s.rn = c.rn + 1
          WHERE c.rn < 12)
        SELECT o_custkey, rn, o_orderkey,
               ROUND(running_total, 6) AS running_total
        FROM chain
        """
    )


@register(
    "fuzzy_match_parts",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_match_parts(spark, sf):
    """Blocked fuzzy-match self-join (the entity-linking primitive for
    dirty catalogs): candidate pairs come from an EQUI join on a cheap
    blocking key (p_size) — never the all-pairs cross product — then
    Levenshtein <= 2 filters within the block. Spark's three-argument
    levenshtein(l, r, threshold) early-exits the DP once the distance
    provably exceeds the bound (O(threshold * len) instead of
    O(len^2)), and evaluates inside the join's codegen. At 100 TB the
    blocking key is the scale contract: per-block cost is quadratic, so
    blocks must be bounded (here <= ~40 parts/size) exactly like the
    LSH band buckets and ngram df-cap in the dedup family; a skewed
    block would get the same salting treatment. The oracle runs the
    plain two-argument form — identical semantics, DuckDB just lacks
    the early-exit."""
    a = t(spark, sf, "part").select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_size").alias("size_a"),
    )
    b = t(spark, sf, "part").select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_size").alias("size_b"),
    )
    # threshold form returns -1 (not the true distance) once the bound
    # is exceeded, so the in-bound test is `>= 0`, never `<= k`
    dist = F.levenshtein("name_a", "name_b", 2)
    return (
        a.join(
            b,
            (F.col("size_a") == F.col("size_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .where(dist >= 0)
        .select(
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
    )


@register(
    "kg_export_ntriples",
    r"""
    SELECT line, md5(line) AS line_md5 FROM (
      SELECT '<urn:supplier:' || l_suppkey || '> <urn:rel:supplies> '
             || '<urn:part:' || l_partkey || '> .' AS line
      FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
      UNION ALL
      SELECT '<urn:part:' || p_partkey || '> <urn:prop:name> "'
             || replace(replace(p_name, '\', '\\'), '"', '\"')
             || '" .' AS line
      FROM part)
    """,
)
def kg_export_ntriples(spark, sf):
    """KG materialization format: serialize edges as W3C N-Triples lines
    — URI triples for the supplies relation (distinct supplier→part
    pairs) plus literal triples for part names with the N-Triples
    escaping order (backslash FIRST, then quote — the reverse order
    corrupts pre-escaped backslashes). The md5 per line proves
    byte-identical serialization across engines, the same trick as
    text_pii_scrub/text_normalize. Scale shape: one distinct shuffle on
    the edge key; formatting is row-parallel inside codegen and the
    real sink is a text write of `line` — at 100 TB this is the export
    job that hands the KG to a triple store."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    uri = (
        li.select("l_suppkey", "l_partkey")
        .distinct()
        .select(
            F.concat(
                F.lit("<urn:supplier:"),
                F.col("l_suppkey").cast("string"),
                F.lit("> <urn:rel:supplies> <urn:part:"),
                F.col("l_partkey").cast("string"),
                F.lit("> ."),
            ).alias("line")
        )
    )
    esc = F.replace(
        F.replace(F.col("p_name"), F.lit("\\"), F.lit("\\\\")),
        F.lit('"'),
        F.lit('\\"'),
    )
    lit_t = p.select(
        F.concat(
            F.lit("<urn:part:"),
            F.col("p_partkey").cast("string"),
            F.lit('> <urn:prop:name> "'),
            esc,
            F.lit('" .'),
        ).alias("line")
    )
    out = uri.unionAll(lit_t)
    return out.select("line", F.md5("line").alias("line_md5"))


@register(
    "unpivot_lineitem_metrics",
    """
    SELECT l_orderkey, l_linenumber, metric, ROUND(val, 6) AS val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem WHERE l_orderkey % 10 = 0)
    UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice,
                                l_discount, l_tax))
    """,
)
def unpivot_lineitem_metrics(spark, sf):
    """C20's inverse: unpivot/melt wide metric columns into long
    (key, metric, value) rows — the shape feature stores and metric
    pipelines ingest. Spark's DataFrame.unpivot is a Generate (Expand)
    inside the scan stage: the 4x row expansion never shuffles, and
    column pruning still reaches the parquet scan for the 6 referenced
    columns. The orderkey%10 cut keeps the differential mass bounded;
    UNPIVOT drops NULL cells on both engines (none exist here)."""
    li = t(spark, sf, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "metric",
            "val",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "metric",
            F.round("val", 6).alias("val"),
        )
    )


@register(
    "window_range_time",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER w_hour, 6) AS hour_sum,
           COUNT(*) OVER w_hour AS hour_n
    FROM events
    WINDOW w_hour AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                            AND CURRENT ROW)
    """,
)
def window_range_time(spark, sf):
    """C22 completion: event-time RANGE frames — the trailing-hour
    rolling aggregate per user, the physical-unit frame ROWS cannot
    express. RANGE frames are peer-inclusive (every row with equal ts
    is in or out together), so the result is order-independent and
    needs no tiebreak — unlike every ROWS entry in this registry, which
    pins a total order. One shuffle on user_id; the frame scan is the
    sliding-window pass inside the sort-based window operator."""
    t(spark, sf, "events").createOrReplaceTempView("__ev_rt")
    return spark.sql(
        """
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER w_hour, 6) AS hour_sum,
               COUNT(*) OVER w_hour AS hour_n
        FROM __ev_rt
        WINDOW w_hour AS (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                AND CURRENT ROW)
        """
    )


@register(
    "array_hof_funcs",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           len(list_filter(embedding,
               x -> CAST(x AS DOUBLE) > 2.0)) > 0 AS has_big,
           len(list_filter(embedding,
               x -> NOT (abs(CAST(x AS DOUBLE)) < 10))) = 0 AS all_small
    FROM embeddings
    """,
)
def array_hof_funcs(spark, sf):
    """§2.8 completion: the predicate higher-order functions — filter,
    exists, forall — over the embedding vectors, all evaluated inside
    whole-stage codegen (no shuffle, no Python). The oracle expresses
    exists/forall as length-of-filter identities, the common subset
    DuckDB's list functions share with Spark's HOFs; comparisons are on
    exactly-representable float-to-double casts, so booleans are
    engine-identical."""
    e = t(spark, sf, "embeddings")
    x_pos = F.filter("embedding", lambda x: x > F.lit(0.0))
    return e.select(
        "vec_id",
        F.size(x_pos).alias("n_pos"),
        F.exists("embedding", lambda x: x.cast("double") > 2.0).alias(
            "has_big"
        ),
        F.forall("embedding", lambda x: F.abs(x.cast("double")) < 10).alias(
            "all_small"
        ),
    )


@register(
    "join_bloom_runtime",
    """
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE), 4) AS rev
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
)
def join_bloom_runtime(spark, sf):
    """Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter):
    the selective dim-side predicate (o_orderpriority = '1-URGENT',
    ~1/5 of orders) is turned into a bloom_filter_agg subquery whose
    might_contain() probe is pushed onto the lineitem scan, so the fact
    side drops ~4/5 of its rows BEFORE the join shuffle. This is the
    row-level sibling of dynamic partition pruning and the big lever on
    a 100 TB fact scan whose join key is not the partition key: the
    filter costs one tiny aggregate over the already-filtered dim and
    removes the dominant shuffle volume. Injection requires the join to
    be non-broadcast (isProbablyShuffleJoin) and the probe-side scan to
    clear applicationSideScanSizeThreshold, so at fixture scale both
    knobs are set for the duration of ONE eager execution
    (localCheckpoint) and restored before returning — at production
    scale the default thresholds (10 GB scan, 10 MB creation side)
    trigger on their own. The injected plan shape is pinned in
    tests/test_plan_shapes.py; values are conf-independent (the bloom
    filter is a pure pre-filter; false positives only re-join rows the
    join itself discards)."""
    with set_confs(spark, BLOOM_INJECT_CONFS):
        li = t(spark, sf, "lineitem")
        o = t(spark, sf, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                # decimal-sum then round: exact accumulation, so the
                # result is independent of partial-agg order (the bloom
                # plan and the DuckDB oracle sum in different orders)
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                    .cast("double"),
                    4,
                ).alias("rev"),
            )
        )
        # Execute NOW, while the injection knobs are live; the returned
        # frame is the materialized result, so restoring the session
        # confs cannot un-inject the filter.
        return out.localCheckpoint(eager=True)
