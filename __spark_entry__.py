"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on /root/testdata/sf0.001
queries()      -> name -> (spark, sf_dir) -> DataFrame, one per operator
                  family from SURVEY.md §2 plus the training-data operators
oracle_sql()   -> name -> DuckDB ANSI SQL over the pre-registered views
                  (region nation customer supplier part orders lineitem
                  events documents embeddings); omitted entries get a
                  rows-only check (non-SQL-expressible ops).

Column names/rounding are aligned pairwise: every aggregate/computed column
is aliased identically in the Spark plan and the SQL text.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from commerce_logs_pipeline_spark.functions import text as TX
from commerce_logs_pipeline_spark.functions.similarity import cosine
from commerce_logs_pipeline_spark.operators import ann, asof, dedup, windows
from commerce_logs_pipeline_spark.operators.router import routed_counts
from commerce_logs_pipeline_spark.operators.skew import conv_turn_counts_salted


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Q1 family: scans, filters, grouped aggregates (SURVEY §2.5 A1/A6)
# ---------------------------------------------------------------------------
def q_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_filter_pushdown_revenue(spark, sf):  # TPC-H Q6 shape (F4/X2 pushdown)
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


SQL_FILTER_PUSHDOWN = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Join family (SURVEY §2.4)
# ---------------------------------------------------------------------------
def q_shipping_priority(spark, sf):  # TPC-H Q3 shape; top-10 (W4)
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1996-06-30"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_SHIPPING = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_region_revenue(spark, sf):  # TPC-H Q5 shape: multi-join, broadcast dims
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_broadcast_dim_join(spark, sf):  # J1/J2 broadcast enrich shape
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    c = _t(spark, sf, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


SQL_BROADCAST_DIM = """
SELECT r_name, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_anti_join(spark, sf):  # J7 anti-join semantics
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


SQL_ANTI = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_semi_join(spark, sf):
    s = _t(spark, sf, "supplier")
    li = _t(spark, sf, "lineitem")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


SQL_SEMI = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
"""


# ---------------------------------------------------------------------------
# Window / top-k / latest-per-key / pagination (SURVEY §2.6)
# ---------------------------------------------------------------------------
def q_latest_order_per_customer(spark, sf):  # W2 compaction analog
    o = _t(spark, sf, "orders")
    return windows.latest_per_key(
        o, ["o_custkey"], [F.desc("o_orderdate"), F.desc("o_orderkey")]
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


SQL_LATEST_ORDER = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""


def q_topk_per_group(spark, sf):  # W3 two-phase partial top-k
    c = _t(spark, sf, "customer")
    return windows.topk_per_group(
        c.select("c_mktsegment", "c_custkey", "c_acctbal"),
        ["c_mktsegment"], "c_acctbal", 3, ascending=False, tiebreak="c_custkey",
        two_phase=True,
    )


SQL_TOPK = """
SELECT c_mktsegment, c_custkey, c_acctbal FROM customer
QUALIFY row_number() OVER (
    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) <= 3
"""


def q_pagination(spark, sf):  # W5 skip/limit
    # Retired from the driver registry in r5 (50-entry driver window;
    # the operator stays covered by tests/test_windows_asof_multimodal.py
    # and this query remains runnable via tools/check_oracle-style use).
    o = _t(spark, sf, "orders")
    return windows.paginate(
        o.select("o_orderkey", "o_totalprice"), [F.asc("o_orderkey")], 100, 50
    )


SQL_PAGINATION = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey OFFSET 100 LIMIT 50
"""


def q_union_parties(spark, sf):  # O3 multi-source union
    # Retired from the driver registry in r5 (50-entry driver window made
    # room for doc_curation_flags; VERDICT r4 flagged this entry as
    # operator-redundant). O3 stays covered by tests/test_entry_queries.py
    # which runs this query against SQL_UNION through the same protocol.
    c = _t(spark, sf, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("kind", "nationkey").agg(
        F.count("*").alias("n")
    )


SQL_UNION = """
SELECT kind, nationkey, count(*) AS n FROM (
    SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier
) GROUP BY kind, nationkey
"""


def q_rollup(spark, sf):  # A6 multi-dim rollup
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


SQL_ROLLUP = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_distinct_counts(spark, sf):  # A7
    e = _t(spark, sf, "events")
    return e.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("n_days"),
    )


SQL_DISTINCT = """
SELECT count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_event_types,
       count(DISTINCT date_trunc('day', ts)) AS n_days
FROM events
"""


# ---------------------------------------------------------------------------
# Events: router/rollup/window/session analogs (SURVEY §2.5/§2.6/§2.8)
# ---------------------------------------------------------------------------
def q_route_counts(spark, sf):  # router fan-out counts (A4)
    e = _t(spark, sf, "events")
    counts = e.groupBy("event_type").agg(F.count("*").alias("n"))
    total = Window.partitionBy()
    return counts.withColumn(
        "pct", F.round(F.col("n") / F.sum("n").over(total), 4)
    )


SQL_ROUTE_COUNTS = """
SELECT event_type, count(*) AS n,
       round(count(*)::DOUBLE / sum(count(*)) OVER (), 4) AS pct
FROM events GROUP BY event_type
"""


def q_error_rate_by_user(spark, sf):  # A6 error-rate rollup
    e = _t(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
        F.round(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("error_rate"),
    )


SQL_ERROR_RATE = """
SELECT user_id, count(*) AS n,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors,
       round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 4) AS error_rate
FROM events GROUP BY user_id
"""


def q_value_percentiles(spark, sf):
    """A5/A6 latency-percentile reporting analog: EXACT p50/p95/p99 per
    event type (Spark ``percentile`` — linear interpolation, the same
    type-7 quantile DuckDB's quantile_cont computes). Exact, not
    percentile_approx: the oracle must hash-match; at scale swap in
    percentile_approx for one-pass sketching."""
    e = _t(spark, sf, "events")
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("n"), pct.alias("_p"))
        .select(
            "event_type",
            "n",
            F.round(F.element_at("_p", 1), 4).alias("p50"),
            F.round(F.element_at("_p", 2), 4).alias("p95"),
            F.round(F.element_at("_p", 3), 4).alias("p99"),
        )
    )


SQL_VALUE_PCT = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


def q_hourly_rollup(spark, sf):  # T-window tumbling rollup
    e = _t(spark, sf, "events")
    # sum not avg: the source values carry 2 decimals, so a 2-decimal
    # rounding of the SUM is never near a rounding boundary (avg of n
    # values lands exactly on x.xx5 boundaries and Spark/DuckDB round
    # binary doubles there differently)
    return (
        e.withColumn("hour", F.date_trunc("hour", "ts"))
        .groupBy("hour")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


SQL_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1
"""


def q_json_extract(spark, sf):  # F9 nested-path projection
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select((k % 10).alias("k_bucket")).groupBy("k_bucket").agg(
        F.count("*").alias("n")
    )


SQL_JSON_EXTRACT = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       count(*) AS n
FROM events GROUP BY 1
"""


def q_windowed_rates(spark, sf):  # W7 rolling window
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    # rolling SUM (see q_hourly_rollup note on avg rounding boundaries)
    return e.select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("roll_sum")
    )


SQL_WINDOWED = """
SELECT event_id,
       round(sum(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2) AS roll_sum
FROM events
"""


def q_sessionize(spark, sf):  # T1 inactivity-gap sessions
    e = _t(spark, sf, "events")
    stats = windows.session_stats(
        e, "user_id", "ts", gap_seconds=1800, tiebreak=["event_id"]
    )
    return stats.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("duration_sec").alias("max_duration_sec"),
        F.max("n_events").alias("max_session_events"),
    )


SQL_SESSIONIZE = """
WITH flags AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR floor(epoch(ts))::BIGINT
                     - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                THEN 1 ELSE 0 END AS nw
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, ts,
           sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
    FROM flags
), per_session AS (
    SELECT user_id, sid, count(*) AS n_events,
           floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT
               AS duration_sec
    FROM sess GROUP BY user_id, sid
)
SELECT user_id, count(*) AS n_sessions,
       max(duration_sec) AS max_duration_sec,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id
"""


def q_range_correlate(spark, sf):  # J5 time-tolerance correlation
    e = _t(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event_id"), F.col("ts").alias("p_ts")
    )
    pairs = asof.range_correlate(
        errors, purchases, on=["user_id"], left_ts="ts", right_ts="p_ts",
        tolerance_sec=600,
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


SQL_RANGE_CORRELATE = """
SELECT e.user_id, count(*) AS n_pairs
FROM events e JOIN events p
  ON e.user_id = p.user_id
 AND e.event_type = 'error' AND p.event_type = 'purchase'
 AND abs(floor(epoch(e.ts))::BIGINT - floor(epoch(p.ts))::BIGINT) <= 600
GROUP BY e.user_id
"""


def q_asof_join(spark, sf):  # as-of: nearest prior signup per purchase
    e = _t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_event_id"),
        F.col("ts").alias("signup_ts"),
    )
    joined = asof.asof_join(
        purchases, signups, on=["user_id"], left_ts="ts", right_ts="signup_ts",
        tolerance_sec=7200, direction="backward", tiebreak=["signup_event_id"],
        left_id="event_id",
    )
    return joined.select(
        F.col("event_id").alias("purchase_event_id"), "signup_event_id"
    )


SQL_ASOF = """
SELECT p.event_id AS purchase_event_id, s.event_id AS signup_event_id
FROM events p JOIN events s
  ON p.user_id = s.user_id
 AND p.event_type = 'purchase' AND s.event_type = 'signup'
 AND floor(epoch(p.ts))::BIGINT - floor(epoch(s.ts))::BIGINT BETWEEN 0 AND 7200
QUALIFY row_number() OVER (
    PARTITION BY p.event_id
    ORDER BY floor(epoch(p.ts))::BIGINT - floor(epoch(s.ts))::BIGINT,
             s.ts, s.event_id) = 1
"""


# ---------------------------------------------------------------------------
# Documents: text analysis + dedup family (training-data operators)
# ---------------------------------------------------------------------------
# [] for empty/whitespace-only docs — string_split_regex('') yields ['']
# in DuckDB while the Spark tokens() yields []; the CASE keeps the two
# tokenizers aligned if an empty doc ever enters the fixture
_SQL_TOKS = (
    "(CASE WHEN trim(text) = '' THEN []::VARCHAR[] "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END)"
)


def q_doc_token_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(TX.token_count(F.col("text"))), 2).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
    )


SQL_DOC_TOKEN_STATS = f"""
SELECT lang, count(*) AS n_docs,
       round(avg(len({_SQL_TOKS})), 2) AS avg_tokens,
       round(avg(length(text)), 2) AS avg_chars
FROM documents GROUP BY lang
"""


def q_token_methods(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("ws_tokens"),
        TX.bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


SQL_TOKEN_METHODS = f"""
SELECT doc_id,
       CAST(len({_SQL_TOKS}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '(\\w+|[^\\w\\s])')) AS BIGINT)
           AS bpe_tokens
FROM documents
"""

_MARKERS = {
    "en": "['the','and','of','to','is']",
    "es": "['el','la','los','que','de']",
    "de": "['der','die','das','und','nicht']",
    "fr": "['le','la','les','et','est']",
}
_SQL_SCORES = ",\n       ".join(
    f"len(list_filter({_SQL_TOKS}, x -> list_contains({m}, x))) AS s_{lang}"
    for lang, m in _MARKERS.items()
)


def q_lang_id(spark, sf):
    # Tokenize-once shape (r6): TX.lang_id re-tokenizes inside each of
    # the 4 marker scores and references every score twice (greatest +
    # CASE) — ~8 tokenizer/filter subtree evaluations per row outside
    # codegen CSE. Here the token array and the 4 scores are materialized
    # as their own (multi-referenced, collapse-surviving) columns, so the
    # tokenizer runs once and each score once; the decision tree is the
    # same greatest + priority CASE, so `detected` is value-identical.
    d = _t(spark, sf, "documents")
    toksd = d.select(
        "lang", TX.tokens(F.lower(F.col("text"))).alias("_tl")
    )
    def _score(marr):
        # one-arg lambda: F.filter dispatches on arity (2 args = element,
        # index), so the marker array must be captured by closure
        return F.size(
            F.filter(F.col("_tl"), lambda t: F.array_contains(marr, t))
        )

    score_cols = []
    for lang in TX.LANG_PRIORITY:
        marr = F.array(*[F.lit(m) for m in TX.LANG_MARKERS[lang]])
        score_cols.append(_score(marr).alias(f"_s_{lang}"))
    scored = toksd.select("lang", *score_cols)
    m = F.greatest(*[F.col(f"_s_{lang}") for lang in TX.LANG_PRIORITY])
    out = F.lit("und")
    for lang in reversed(TX.LANG_PRIORITY):
        out = F.when(F.col(f"_s_{lang}") == m, F.lit(lang)).otherwise(out)
    detected = F.when(m == 0, F.lit("und")).otherwise(out)
    return (
        scored.select("lang", detected.alias("detected"))
        .groupBy("lang", "detected")
        .agg(F.count("*").alias("n"))
    )


SQL_LANG_ID = f"""
WITH scored AS (
    SELECT lang,
       {_SQL_SCORES}
    FROM documents
), labeled AS (
    SELECT lang,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                ELSE 'fr' END AS detected
    FROM scored
)
SELECT lang, detected, count(*) AS n FROM labeled GROUP BY lang, detected
"""

_SQL_SW = "['the','a','an','and','or','of','to','in','is','it','that']"


def q_doc_quality(spark, sf):
    # Tokenize-once shape (r6): the original composed TX.quality_score on
    # top of the three displayed features, re-running the tokenizer and
    # both ratio subtrees (higher-order filters are outside codegen CSE).
    # Here every raw feature is computed in ONE projection and both the
    # rounded display value and the threshold test read the alias —
    # multi-referenced non-trivial aliases survive CollapseProject, so
    # each feature evaluates once per row. Values are identical: same
    # formulas, same rounding, thresholds on the same raw doubles.
    d = _t(spark, sf, "documents")
    sw = F.array(*[F.lit(s) for s in TX.STOPWORDS_EN])
    toks = TX.tokens(F.lower(F.col("text")))
    praw = F.when(
        F.length("text") > 0,
        (F.length("text")
         - F.length(F.regexp_replace("text", r"[^\w\s]", "")))
        / F.length("text"),
    ).otherwise(F.lit(0.0))
    # _tl is referenced three times below (stopword filter, two sizes), so
    # CollapseProject keeps it materialized — the tokenizer runs once per
    # row. n_tokens reads the same array: lower() never changes the
    # whitespace split, so size(tokens(lower(text))) == size(tokens(text))
    # (and the DuckDB oracle tokenizes the lowered text anyway).
    feat = (
        d.select("doc_id", "text", toks.alias("_tl"))
        .select(
            "doc_id",
            F.size("_tl").alias("_n"),
            praw.alias("_praw"),
            F.size(
                F.filter(F.col("_tl"), lambda t: F.array_contains(sw, t))
            ).alias("_nsw"),
        )
        .select(
            "doc_id",
            "_n",
            "_praw",
            F.when(F.col("_n") > 0, F.col("_nsw") / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias("_swraw"),
        )
    )
    return feat.select(
        "doc_id",
        F.col("_n").cast("long").alias("n_tokens"),
        F.round("_praw", 4).alias("punct_ratio"),
        F.round("_swraw", 4).alias("stopword_ratio"),
        F.round(
            F.when((F.col("_n") >= 10) & (F.col("_n") <= 100_000), F.lit(0.4))
            .otherwise(F.lit(0.0))
            + F.when(F.col("_praw") < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
            + F.when(F.col("_swraw") > 0.05, F.lit(0.3)).otherwise(F.lit(0.0)),
            2,
        ).alias("quality"),
    )


SQL_DOC_QUALITY = f"""
WITH base AS (
    SELECT doc_id, text, {_SQL_TOKS} AS toks,
           CASE WHEN length(text) > 0 THEN
               (length(text)
                - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                   ::DOUBLE / length(text)
           ELSE 0.0 END AS praw
    FROM documents
), feat AS (
    SELECT doc_id, len(toks) AS n_tokens, praw,
           CASE WHEN len(toks) > 0 THEN
               len(list_filter(toks, x -> list_contains({_SQL_SW}, x)))::DOUBLE
                   / len(toks)
           ELSE 0.0 END AS swraw
    FROM base
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(praw, 4) AS punct_ratio,
       round(swraw, 4) AS stopword_ratio,
       round((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN praw < 0.2 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN swraw > 0.05 THEN 0.3 ELSE 0.0 END), 2)::DOUBLE
           AS quality
FROM feat
"""


def q_doc_fingerprints(spark, sf):  # U5 deterministic content hashing
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id", TX.content_md5(F.col("text")).alias("content_hash")
    )


SQL_FINGERPRINTS = """
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_hash
FROM documents
"""


def q_pii_scan(spark, sf):
    """PII scan + redaction over a corpus CONSTRUCTED identically in both
    engines (the documents tables carry no PII-shaped text, so the
    fixture is the deterministic concat below — same transcript-oracle
    discipline: operate in Spark, re-derive in SQL). Checks pattern
    counts AND the md5 of the fully redacted text."""
    i = F.col("id")

    def s(c):
        return c.cast("string")

    text = F.concat(
        F.lit("doc "), s(i),
        F.lit(" contact user"), s(i), F.lit("@example.com "),
        F.when(
            i % 3 == 0,
            F.concat(F.lit("ip 10.0."), s(i % 200), F.lit("."), s(i % 7)),
        ).otherwise(F.lit("noip")),
        F.lit(" "),
        F.when(
            i % 5 == 0,
            F.concat(F.lit("call +1 555 0"), s(F.lit(100) + (i % 900))),
        ).otherwise(F.lit("nophone")),
        F.when(
            i % 4 == 0,
            F.concat(
                F.lit(" ssn 123-45-"), F.lpad(s((i * 7) % 10000), 4, "0")
            ),
        ).otherwise(F.lit(" nossn")),
        # card-shaped candidates at i%6=0; Luhn-VALID only at i%12=0 —
        # exercises the checksum gate (n_cc counts valid only; redaction
        # scrubs both shapes)
        F.when(
            i % 6 == 0,
            F.when(i % 12 == 0, F.lit(" cc 4111 1111 1111 1111 end"))
            .otherwise(F.lit(" cc 4111-1111-1111-1112 end")),
        ).otherwise(F.lit(" nocc")),
    )
    df = spark.range(2000).withColumn("text", text)
    return df.select(
        "id",
        TX.pii_counts(F.col("text"))["n_email"].alias("n_email"),
        TX.pii_counts(F.col("text"))["n_ip"].alias("n_ip"),
        TX.pii_counts(F.col("text"))["n_phone"].alias("n_phone"),
        TX.pii_counts(F.col("text"))["n_ssn"].alias("n_ssn"),
        TX.pii_counts(F.col("text"))["n_cc"].alias("n_cc"),
        F.md5(TX.redact_pii(F.col("text"))).alias("redacted_md5"),
    ).orderBy("id")


def _sql_pii_scan() -> str:
    from commerce_logs_pipeline_spark.functions.text import (
        CC_RX, EMAIL_RX, IPV4_RX, PHONE_RX, SSN_RX,
    )

    # string-concat template (not f-string: the regexes carry {2,})
    red = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "regexp_replace(text, '"
        + EMAIL_RX + "', '<EMAIL>', 'g'), '"
        + IPV4_RX + "', '<IP>', 'g'), '"
        + SSN_RX + "', '<SSN>', 'g'), '"
        + CC_RX + "', '<CC>', 'g'), '"
        + PHONE_RX + "', '<PHONE>', 'g')"
    )
    # portable Luhn twin of functions.text.luhn_valid: strip separators,
    # reverse, double every 2nd digit with 9-fold wrap, sum % 10 = 0
    luhn = (
        "list_sum(list_transform(generate_series(1, "
        "length(replace(replace(c, ' ', ''), '-', ''))), i -> "
        "CASE WHEN i % 2 = 0 THEN "
        "CASE WHEN CAST(reverse(replace(replace(c, ' ', ''), '-', ''))[i] "
        "AS INT) * 2 > 9 "
        "THEN CAST(reverse(replace(replace(c, ' ', ''), '-', ''))[i] "
        "AS INT) * 2 - 9 "
        "ELSE CAST(reverse(replace(replace(c, ' ', ''), '-', ''))[i] "
        "AS INT) * 2 END "
        "ELSE CAST(reverse(replace(replace(c, ' ', ''), '-', ''))[i] "
        "AS INT) END)) % 10 = 0"
    )
    return (
        """
WITH t AS (
    SELECT i AS id,
           'doc ' || i || ' contact user' || i || '@example.com ' ||
           CASE WHEN i % 3 = 0
                THEN 'ip 10.0.' || (i % 200) || '.' || (i % 7)
                ELSE 'noip' END || ' ' ||
           CASE WHEN i % 5 = 0
                THEN 'call +1 555 0' || (100 + i % 900)
                ELSE 'nophone' END ||
           CASE WHEN i % 4 = 0
                THEN ' ssn 123-45-' ||
                     lpad(CAST((i * 7) % 10000 AS VARCHAR), 4, '0')
                ELSE ' nossn' END ||
           CASE WHEN i % 6 = 0 THEN
                CASE WHEN i % 12 = 0 THEN ' cc 4111 1111 1111 1111 end'
                     ELSE ' cc 4111-1111-1111-1112 end' END
                ELSE ' nocc' END AS text
    FROM generate_series(0, 1999) s(i)
)
SELECT id,
       CAST(len(regexp_extract_all(text, '""" + EMAIL_RX + """')) AS INT)
           AS n_email,
       CAST(len(regexp_extract_all(text, '""" + IPV4_RX + """')) AS INT)
           AS n_ip,
       CAST(len(regexp_extract_all(text, '""" + PHONE_RX + """')) AS INT)
           AS n_phone,
       CAST(len(regexp_extract_all(text, '""" + SSN_RX + """')) AS INT)
           AS n_ssn,
       CAST(len(list_filter(regexp_extract_all(text, '""" + CC_RX + """'),
            c -> """ + luhn + """)) AS INT) AS n_cc,
       md5(""" + red + """) AS redacted_md5
FROM t ORDER BY id
"""
    )


def q_exact_dup_groups(spark, sf):
    return dedup.exact_dup_groups(_t(spark, sf, "documents"))


SQL_EXACT_DUPS = """
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_hash,
       count(*) AS n_dups, min(doc_id) AS keep_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""

_SQL_SHINGLES = (
    f"list_distinct(list_transform(generate_series(1, len({_SQL_TOKS}) - 2), "
    f"i -> concat_ws(' ', {_SQL_TOKS}[i], {_SQL_TOKS}[i+1], {_SQL_TOKS}[i+2])))"
)


_NGRAM_MAX_BUCKET = 5  # exercises the hot-shingle guard at sf0.01 (max freq 7)


def q_ngram_jaccard(spark, sf):
    # hash_shingles=False: the DuckDB oracle joins on exact shingle
    # strings, so the Spark side keys the inverted index the same way
    # (production default keys on xxhash64(shingle) — see bench.py)
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf, "documents"), k=3, threshold=0.18,
        max_bucket=_NGRAM_MAX_BUCKET, hash_shingles=False,
    )


SQL_NGRAM_JACCARD = f"""
WITH sh AS (
    SELECT doc_id AS id, {_SQL_SHINGLES} AS shs
    FROM documents WHERE len({_SQL_TOKS}) >= 3
), e AS (
    SELECT id, unnest(shs) AS shingle FROM sh
), surv AS (
    SELECT id, shingle FROM e
    QUALIFY count(*) OVER (PARTITION BY shingle) <= {_NGRAM_MAX_BUCKET}
), n AS (
    SELECT id, count(*) AS n FROM surv GROUP BY id
), p AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
    FROM surv a JOIN surv b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(common::DOUBLE / (na.n + nb.n - common), 4) AS jaccard
FROM p JOIN n na ON na.id = id_a JOIN n nb ON nb.id = id_b
WHERE round(common::DOUBLE / (na.n + nb.n - common), 4) >= 0.18
"""

_MH_BUCKET = 200


def q_minhash_lsh(spark, sf):
    # portable=True: the md5 hash family end-to-end so DuckDB reproduces
    # signatures and buckets exactly (production default is xxhash64 —
    # statistically equivalent candidates; see bench.py)
    return dedup.minhash_lsh_pairs(
        _t(spark, sf, "documents"), k=3, n_hashes=8, bands=4,
        verify_threshold=0.15, max_bucket=_MH_BUCKET, portable=True,
    )


def _sql_minhash_text() -> str:
    from commerce_logs_pipeline_spark.functions.similarity import (
        UH_P1,
        UH_P2,
        minhash_consts,
    )

    consts = minhash_consts(8)
    mins = ",\n           ".join(
        f"list_min(list_transform(xl, x -> ({a} * x + {b}) % {UH_P2})) AS s{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_rows = "\n    UNION ALL\n".join(
        f"    SELECT id, {bi} AS band, "
        f"md5(s{2 * bi}::VARCHAR || ',' || s{2 * bi + 1}::VARCHAR) AS bucket "
        "FROM sig"
        for bi in range(4)
    )
    return f"""
WITH sh AS (
    SELECT doc_id AS id, {_SQL_SHINGLES} AS shs
    FROM documents WHERE len({_SQL_TOKS}) >= 3
), xs AS (
    SELECT id, list_transform(shs, t ->
        CAST(('0x' || substring(md5('0:' || t), 1, 15)) AS BIGINT) % {UH_P1})
        AS xl
    FROM sh
), sig AS (
    SELECT id,
           {mins}
    FROM xs
), bands AS (
{band_rows}
), keep AS (
    SELECT band, bucket FROM bands GROUP BY band, bucket
    HAVING count(*) <= {_MH_BUCKET}
), bk AS (
    SELECT b.id, b.band, b.bucket FROM bands b JOIN keep USING (band, bucket)
), cand AS (
    SELECT a.id AS id_a, b.id AS id_b
    FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.id < b.id
    GROUP BY 1, 2
), v AS (
    SELECT id_a, id_b, sa.shs AS sh_a, sb.shs AS sh_b
    FROM cand JOIN sh sa ON sa.id = id_a JOIN sh sb ON sb.id = id_b
)
SELECT id_a, id_b,
       round(len(list_intersect(sh_a, sh_b))::DOUBLE
             / len(list_distinct(sh_a || sh_b)), 4) AS jaccard
FROM v
WHERE round(len(list_intersect(sh_a, sh_b))::DOUBLE
            / len(list_distinct(sh_a || sh_b)), 4) >= 0.15
"""


SQL_MINHASH = _sql_minhash_text()


_SH_BUCKET = 500


def q_simhash_dups(spark, sf):
    return dedup.simhash_dups(
        _t(spark, sf, "documents"), max_hamming=6, max_bucket=_SH_BUCKET,
        portable=True,
    )


def _sql_simhash_text() -> str:
    # portable md5 hashes carry 60 bits; bits 60-63 are identically 0
    bit_terms = "\n         + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {b}) & 1 = 1)) > n "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(60)
    )
    block_rows = "\n    UNION ALL\n".join(
        f"    SELECT id, fp, {bi} AS block, (fp >> {bi * 16}) & 65535 AS key "
        "FROM fp"
        for bi in range(4)
    )
    return f"""
WITH tok AS (
    SELECT doc_id AS id, {_SQL_TOKS} AS toks
    FROM documents WHERE len({_SQL_TOKS}) > 0
), hl AS (
    SELECT id, len(toks) AS n,
           list_transform(toks, t ->
               CAST(('0x' || substring(md5('0:' || t), 1, 15)) AS BIGINT))
               AS hs
    FROM tok
), fp AS (
    SELECT id,
           {bit_terms} AS fp
    FROM hl
), blocks AS (
{block_rows}
), keep AS (
    SELECT block, key FROM blocks GROUP BY block, key
    HAVING count(*) <= {_SH_BUCKET}
), bk AS (
    SELECT b.id, b.fp, b.block, b.key
    FROM blocks b JOIN keep USING (block, key)
), pairs AS (
    SELECT a.id AS id_a, b.id AS id_b,
           any_value(a.fp) AS fp_a, any_value(b.fp) AS fp_b
    FROM bk a JOIN bk b ON a.block = b.block AND a.key = b.key
                        AND a.id < b.id
    GROUP BY 1, 2
)
SELECT id_a, id_b, bit_count(xor(fp_a, fp_b)) AS hamming
FROM pairs WHERE bit_count(xor(fp_a, fp_b)) <= 6
"""


SQL_SIMHASH = _sql_simhash_text()


def q_near_dup_clusters(spark, sf):
    """Connected components over the simhash near-dup pairs -> canonical
    (id, cluster_id = min member) for keep-one-per-cluster dedup; the
    DuckDB oracle recomputes components with a recursive CTE over the
    identical pair set."""
    docs = _t(spark, sf, "documents")
    pairs = dedup.simhash_dups(
        docs, max_hamming=6, max_bucket=_SH_BUCKET, portable=True
    )
    return dedup.dup_clusters(
        pairs, all_ids=docs.select("doc_id")
    ).orderBy("id")


def _sql_near_dup_clusters() -> str:
    return f"""
WITH RECURSIVE pairs AS ({SQL_SIMHASH}
), edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
), reach(id, comp) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id
)
SELECT id, CAST(min(comp) AS BIGINT) AS cluster_id
FROM reach GROUP BY id ORDER BY id
"""


def q_corpus_curation(spark, sf):
    """Flagship training-data curation composite — the ops composing:
    quality gate (token count) -> exact dedup (keep min id per content
    hash) -> simhash near-dup pairs -> connected components -> keep one
    canonical doc per cluster -> corpus stats. One row out; the DuckDB
    oracle re-derives every stage including the recursive components."""
    docs = _t(spark, sf, "documents")
    filtered = docs.filter(TX.token_count(F.col("text")) >= 10).select(
        "doc_id", "text"
    )
    hashed = filtered.withColumn("_h", TX.content_md5(F.col("text")))
    kept0 = (
        hashed.join(
            hashed.groupBy("_h").agg(F.min("doc_id").alias("doc_id")),
            on=["_h", "doc_id"],
        )
        .select("doc_id", "text")
    )
    pairs = dedup.simhash_dups(
        kept0, max_hamming=6, max_bucket=_SH_BUCKET, portable=True
    )
    clusters = dedup.dup_clusters(pairs, all_ids=kept0.select("doc_id"))
    kept = (
        clusters.filter(F.col("id") == F.col("cluster_id"))
        .select(F.col("id").alias("doc_id"))
        .join(kept0, on="doc_id")
    )
    return (
        docs.agg(F.count("*").alias("n_total"))
        .crossJoin(filtered.agg(F.count("*").alias("n_quality")))
        .crossJoin(kept0.agg(F.count("*").alias("n_after_exact")))
        .crossJoin(
            kept.agg(
                F.count("*").alias("n_kept"),
                F.sum(TX.token_count(F.col("text")).cast("long")).alias(
                    "total_tokens"
                ),
            )
        )
    )


def _sql_corpus_curation() -> str:
    sim = SQL_SIMHASH.replace("FROM documents WHERE", "FROM kept0 WHERE")
    return f"""
WITH RECURSIVE filtered AS (
    SELECT doc_id, text FROM documents WHERE len({_SQL_TOKS}) >= 10
), kept0 AS (
    SELECT doc_id, text FROM (
        SELECT doc_id, text, row_number() OVER (
            PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
            ORDER BY doc_id) AS rn
        FROM filtered)
    WHERE rn = 1
), pairs AS ({sim}
), edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
), reach(id, comp) AS (
    SELECT doc_id, doc_id FROM kept0
    UNION
    SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id
), comp AS (
    SELECT id, min(comp) AS cluster_id FROM reach GROUP BY id
), kept AS (
    SELECT k.doc_id, k.text
    FROM kept0 k JOIN comp ON comp.id = k.doc_id
                          AND comp.cluster_id = k.doc_id
)
SELECT (SELECT count(*) FROM documents) AS n_total,
       (SELECT count(*) FROM filtered) AS n_quality,
       (SELECT count(*) FROM kept0) AS n_after_exact,
       count(*) AS n_kept,
       CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS total_tokens
FROM kept
"""


def q_doc_curation(spark, sf):
    """Intra-doc repetition metrics (Gopher/MassiveText filter family,
    operators/curation.repetition_scores, 3-gram) joined with benchmark
    13-gram decontamination (curation.decontaminate) — the benchmark is a
    deterministic eval-set stand-in: the 50-token window [11..60] of every
    20th document. Production path (hashed=True) carries 8-byte xxhash64
    gram keys; the DuckDB oracle re-derives identical counts from gram
    STRINGS (counts depend only on gram equality classes)."""
    from commerce_logs_pipeline_spark.operators import curation

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0).select(
        F.concat_ws(
            " ", F.slice(TX.tokens(F.lower(F.col("text"))), 11, 50)
        ).alias("text")
    )
    rep = curation.repetition_scores(d, n=3)
    dec = curation.decontaminate(d, bench, n=13)
    return rep.join(dec, "doc_id")


def _sql_doc_curation() -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), pos3 AS (
    SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
    FROM toks
), grams3 AS (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g FROM pos3
), counts3 AS (
    SELECT doc_id, g, count(*) AS c FROM grams3 GROUP BY doc_id, g
), rep AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS total_ngrams,
           CAST(max(c) AS BIGINT) AS top_ngram_count,
           CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT)
               AS dup_ngram_occurrences
    FROM counts3 GROUP BY doc_id
), bench AS (
    SELECT t[11:60] AS bt FROM toks WHERE doc_id % 20 = 0
), bpos AS (
    SELECT bt, unnest(generate_series(1, greatest(len(bt) - 12, 0))) AS i
    FROM bench
), bgrams AS (
    SELECT DISTINCT array_to_string(bt[i:i+12], ' ') AS g FROM bpos
), dpos AS (
    SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 12, 0))) AS i
    FROM toks
), dgrams AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+12], ' ') AS g FROM dpos
), hits AS (
    SELECT doc_id, count(*) AS matched FROM dgrams JOIN bgrams USING (g)
    GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(rep.total_ngrams, 0) AS total_ngrams,
       coalesce(rep.top_ngram_count, 0) AS top_ngram_count,
       coalesce(rep.dup_ngram_occurrences, 0) AS dup_ngram_occurrences,
       CASE WHEN coalesce(rep.total_ngrams, 0) > 0
            THEN round(rep.top_ngram_count / rep.total_ngrams::DOUBLE, 6)
            ELSE 0.0 END AS top_ngram_frac,
       CASE WHEN coalesce(rep.total_ngrams, 0) > 0
            THEN round(rep.dup_ngram_occurrences / rep.total_ngrams::DOUBLE, 6)
            ELSE 0.0 END AS dup_ngram_frac,
       CAST(coalesce(hits.matched, 0) AS BIGINT) AS matched_ngrams,
       coalesce(hits.matched, 0) > 0 AS contaminated
FROM documents d
LEFT JOIN rep ON d.doc_id = rep.doc_id
LEFT JOIN hits ON d.doc_id = hits.doc_id
"""


def q_dataset_split_mix(spark, sf):
    """Dataset assembly (operators/sampling.py): downsample documents to a
    source-domain target mixture (weights derived from the source index:
    w = 1 + N%4 for srcN — no hardcoded source list, works at every SF),
    then deterministic 80/10/10 train/val/test assignment; returns per
    (split, source) counts + an id checksum. Hash-gated (never rand()) so
    membership is idempotent under task retries and re-derivable by an
    external engine — the DuckDB oracle recomputes both gates from the
    same md5 family and exact-integer thresholds (HUGEINT math)."""
    from commerce_logs_pipeline_spark.operators import sampling

    d = _t(spark, sf, "documents")
    sources = [r[0] for r in d.select("source").distinct().collect()]
    weights = {s: 1 + int(s[3:]) % 4 for s in sources}
    mixed = sampling.resample_to_mix(
        d, "source", weights, seed=202, portable=True
    )
    split = sampling.split_assign(
        mixed,
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=101,
        portable=True,
    )
    return split.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("docid_sum"),
    )


# exact integer split thresholds on the 2^60 portable-hash space
_SPLIT_T1 = (16**15 * 800_000) // 1_000_000
_SPLIT_T2 = (16**15 * 900_000) // 1_000_000


def _sql_dataset_split_mix() -> str:
    return f"""
WITH counts AS (
    SELECT source, count(*) AS c,
           1 + (CAST(substring(source, 4) AS INTEGER) % 4) AS w
    FROM documents GROUP BY source
), tot AS (
    SELECT CAST(sum(w) AS HUGEINT) AS bigw FROM counts
), nstar AS (
    SELECT min((CAST(c AS HUGEINT) * (SELECT bigw FROM tot)) // w) AS n
    FROM counts
), thr AS (
    SELECT source,
           (CAST(w AS HUGEINT) * (SELECT n FROM nstar)
            * CAST(1152921504606846976 AS HUGEINT))
           // ((SELECT bigw FROM tot) * CAST(c AS HUGEINT)) AS t
    FROM counts
), mixed AS (
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr USING (source)
    WHERE CAST(('0x' || substring(
              md5('202:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          < thr.t
), split AS (
    SELECT doc_id, source,
           CASE WHEN h < {_SPLIT_T1} THEN 'train'
                WHEN h < {_SPLIT_T2} THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               CAST(('0x' || substring(
                   md5('101:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               AS h
        FROM mixed
    )
)
SELECT split, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS docid_sum
FROM split GROUP BY split, source
"""


def q_tfidf_topk_terms(spark, sf):
    """Per-document top-3 terms by smoothed TF-IDF
    (operators/vocab.tfidf_topk): corpus document frequency via one
    distinct-terms explode, score = round(tf*(ln((N+1)/(df+1))+1), 6)
    ranked with a term-asc tiebreak so ordering is engine-portable."""
    from commerce_logs_pipeline_spark.operators import vocab

    return vocab.tfidf_topk(_t(spark, sf, "documents"), k=3)


def _sql_tfidf_topk_terms() -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), terms AS (
    SELECT doc_id, unnest(t) AS term FROM toks
), tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM terms GROUP BY doc_id, term
), df AS (
    SELECT term, count(DISTINCT doc_id) AS dfc FROM terms GROUP BY term
), scored AS (
    SELECT doc_id, term, tf,
           round(tf * (ln(((SELECT count(*) FROM documents) + 1.0)
                          / (dfc + 1.0)) + 1.0), 6) AS tfidf
    FROM tf JOIN df USING (term)
), ranked AS (
    SELECT doc_id, term, tf, tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, term ASC) AS rank
    FROM scored
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, tfidf
FROM ranked WHERE rank <= 3
"""


def q_dataset_pack(spark, sf):
    """Sequence packing (operators/packing.py): hash-shuffle documents,
    range-shard, then greedy token-budget scan — every doc gets a
    deterministic (pack_id, pack_pos) under capacity=256 whitespace
    tokens. The DuckDB oracle replays the identical greedy scan with a
    recursive CTE over the same portable-hash ordering (all shards
    advance one row per recursion step), so assignments match
    bit-for-bit."""
    from commerce_logs_pipeline_spark.operators import packing

    d = _t(spark, sf, "documents").withColumn(
        "n_tokens", TX.token_count(F.col("text"))
    )
    return packing.pack_greedy(
        d,
        tokens_col="n_tokens",
        capacity=256,
        n_shards=8,
        seed=7,
        portable=True,
    )


def _sql_dataset_pack() -> str:
    # 2^40 = the shard shift in packing.pack_greedy's global pack ids
    return """
WITH RECURSIVE ordered AS (
    SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard, n_tokens,
           row_number() OVER (PARTITION BY h % 8
                              ORDER BY h, doc_id) AS rn
    FROM (
        SELECT doc_id,
               CAST(('0x' || substring(
                   md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               AS h,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE length(string_split_regex(trim(text), '\\s+'))
               END AS n_tokens
        FROM documents
    )
), packed AS (
    SELECT shard, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS pack, 0 AS pos, n_tokens AS acc
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.shard, o.doc_id, o.n_tokens, o.rn,
           CASE WHEN p.acc + o.n_tokens <= 256
                THEN p.pack ELSE p.pack + 1 END,
           CASE WHEN p.acc + o.n_tokens <= 256 THEN p.pos + 1 ELSE 0 END,
           CASE WHEN p.acc + o.n_tokens <= 256
                THEN p.acc + o.n_tokens ELSE o.n_tokens END
    FROM ordered o JOIN packed p
      ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT doc_id, shard,
       CAST(shard AS BIGINT) * 1099511627776 + pack AS pack_id,
       CAST(pos AS INTEGER) AS pack_pos,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(acc AS BIGINT) AS pack_fill
FROM packed
"""


def q_embedding_topk(spark, sf):  # brute-force ANN baseline
    emb = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 20)
    return ann.brute_force_topk(emb, queries, k=5)


SQL_EMB_TOPK = """
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id < 20
), c AS (
    SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
    SELECT query_id, neighbor_id,
           round(list_dot_product(cv, qv)
                 / (sqrt(list_dot_product(cv, cv))
                    * sqrt(list_dot_product(qv, qv))), 4) AS cos
    FROM c, q WHERE neighbor_id != query_id
)
SELECT query_id, neighbor_id, cos FROM scored
QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5
"""


def q_embedding_dups_lsh(spark, sf):
    return dedup.embedding_dups(
        _t(spark, sf, "embeddings").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        ),
        threshold=0.3, n_planes=6, dim=64,
    )


def _sql_plane_bits(n_planes: int, dim: int, vcol: str = "v") -> str:
    from commerce_logs_pipeline_spark.functions.similarity import plane_matrix

    return "\n         + ".join(
        f"(CASE WHEN list_dot_product({vcol}, ["
        + ",".join(str(s) for s in plane)
        + f"]) >= 0 THEN {2 ** p} ELSE 0 END)"
        for p, plane in enumerate(plane_matrix(n_planes, dim))
    )


def _sql_embedding_dups_text() -> str:
    bits = _sql_plane_bits(6, 64)
    return f"""
WITH e AS (
    SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
), b AS (
    SELECT id, v,
           {bits} AS bucket
    FROM e
)
SELECT a.id AS id_a, bb.id AS id_b,
       round(list_dot_product(a.v, bb.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(bb.v, bb.v))), 4) AS cos
FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.id < bb.id
WHERE round(list_dot_product(a.v, bb.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(bb.v, bb.v))), 4) >= 0.3
"""


SQL_EMBEDDING_DUPS = _sql_embedding_dups_text()


def q_embedding_topk_lsh(spark, sf):  # ANN bulk path: bucketed approximate top-k
    emb = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 20)
    return ann.lsh_topk(emb, queries, k=5, n_planes=6, dim=64)


def _sql_emb_topk_lsh() -> str:
    return f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), b AS (
    SELECT vec_id, v,
           {_sql_plane_bits(6, 64)} AS bucket
    FROM e
), q AS (
    SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 20
), c AS (
    SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b
), s AS (
    SELECT query_id, neighbor_id,
           round(list_dot_product(cv, qv)
                 / (sqrt(list_dot_product(cv, cv))
                    * sqrt(list_dot_product(qv, qv))), 4) AS cos
    FROM c JOIN q USING (bucket)
    WHERE neighbor_id != query_id
)
SELECT query_id, neighbor_id, cos FROM s
QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5
"""


def q_embedding_topk_ivf(spark, sf):
    """IVF(flat) ANN: deterministic sampled-centroid quantizer (16 cells,
    nprobe=2) — the data-adaptive scale path next to hyperplane LSH."""
    emb = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 20)
    # use_numpy=False: the Column-literal twin is the one the DuckDB
    # oracle reproduces bit-for-bit (production default is the numpy path)
    return ann.ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=2, use_numpy=False
    )


def _sql_emb_topk_ivf() -> str:
    # same quantizer derivation: centroids = 16 lowest vec_ids, cell =
    # rank order; sq-dist via the identical (a.a - 2 a.b) + b.b identity
    # rounded to 6 dp, argmin tie-broken on cell — bit-for-bit the Spark
    # plan's assignment
    return """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cent AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
    FROM e ORDER BY vec_id LIMIT 16
), dists AS (
    SELECT e.vec_id, e.v, cent.cell,
           round((list_dot_product(e.v, e.v)
                  - 2.0 * list_dot_product(e.v, cent.cv))
                 + list_dot_product(cent.cv, cent.cv), 6) AS d
    FROM e, cent
), assign AS (
    SELECT vec_id, v, cell FROM dists
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY d, cell) = 1
), probes AS (
    SELECT vec_id AS query_id, v AS qv, cell FROM dists
    WHERE vec_id < 20
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY d, cell) <= 2
), s AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round(list_dot_product(a.v, p.qv)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(p.qv, p.qv))), 4) AS cos
    FROM assign a JOIN probes p USING (cell)
    WHERE a.vec_id != p.query_id
)
SELECT query_id, neighbor_id, cos FROM s
QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5
"""


def q_ann_recall_at_k(spark, sf):
    """Measured ANN approximation quality (VERDICT r3 #4): per-query
    recall@5 of multiprobe LSH top-k (probes=1 — each query also probes
    the bucket across its weakest plane) against brute-force top-k."""
    emb = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 20)
    approx = ann.lsh_topk(emb, queries, k=5, n_planes=6, dim=64, probes=1)
    exact = ann.brute_force_topk(emb, queries, k=5)
    return ann.recall_at_k(approx, exact).orderBy("query_id")


def _sql_margin_pairs(n_planes: int, dim: int, vcol: str = "v") -> str:
    """[[round(abs(margin_p), 6), 2^p], ...] — the multiprobe ranking
    list; lexicographic list_sort matches Spark's array_sort on
    struct(m, bit) including the bit tie-break."""
    from commerce_logs_pipeline_spark.functions.similarity import plane_matrix

    return ",\n             ".join(
        f"[round(abs(list_dot_product({vcol}, ["
        + ",".join(str(s) for s in plane)
        + f"])), 6), {float(2 ** p)}]"
        for p, plane in enumerate(plane_matrix(n_planes, dim))
    )


def _sql_ann_recall() -> str:
    return f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), b AS (
    SELECT vec_id, v,
           {_sql_plane_bits(6, 64)} AS bucket
    FROM e
), q0 AS (
    SELECT vec_id AS query_id, bucket,
           CAST(list_sort([{_sql_margin_pairs(6, 64)}])[1][2] AS INT)
               AS wbit
    FROM b WHERE vec_id < 20
), qp AS (
    SELECT query_id, bucket FROM q0
    UNION ALL
    SELECT query_id, xor(bucket, wbit) FROM q0
), cand AS (
    SELECT DISTINCT query_id, c.vec_id AS neighbor_id
    FROM b c JOIN qp USING (bucket)
    WHERE c.vec_id != query_id
), s AS (
    SELECT cand.query_id, cand.neighbor_id,
           round(list_dot_product(cb.v, qb.v)
                 / (sqrt(list_dot_product(cb.v, cb.v))
                    * sqrt(list_dot_product(qb.v, qb.v))), 4) AS cos
    FROM cand
    JOIN b qb ON qb.vec_id = cand.query_id
    JOIN b cb ON cb.vec_id = cand.neighbor_id
), approx AS (
    SELECT query_id, neighbor_id FROM s
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5
), ex AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_dot_product(c.v, q.v)
                 / (sqrt(list_dot_product(c.v, c.v))
                    * sqrt(list_dot_product(q.v, q.v))), 4) AS cos
    FROM e c, e q WHERE q.vec_id < 20 AND c.vec_id != q.vec_id
), exact AS (
    SELECT query_id, neighbor_id FROM ex
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5
), hits AS (
    SELECT a.query_id, count(*) AS h
    FROM approx a JOIN exact USING (query_id, neighbor_id)
    GROUP BY a.query_id
)
SELECT exact.query_id,
       round(coalesce(any_value(h), 0) * 1.0 / count(*), 4) AS recall
FROM exact LEFT JOIN hits USING (query_id)
GROUP BY exact.query_id
ORDER BY exact.query_id
"""


# ---------------------------------------------------------------------------
# Transcript pipeline (flagship). The corpus is synthesized with the
# PORTABLE generator (md5-derived mixing, integer-exact skew) so DuckDB can
# re-derive every per-row value from the construction logic: the oracle does
# NOT parse JSON — it recomputes the ground-truth category/status/latency of
# each row directly, making these true end-to-end checks of the Spark
# construct->parse->route->aggregate path.
# ---------------------------------------------------------------------------
_TN = 20_000
_TN_CONVS = _TN // 40
_TK_DIV = 10**18 // _TN_CONVS


def _transcripts(spark, n=_TN):
    from commerce_logs_pipeline_spark.synth import generate_transcripts

    # materialize the synthesized corpus: the text column is an expensive
    # generator expression, and projection collapse would otherwise inline
    # it into EVERY parse column that reads text (measured 4x re-synthesis
    # on the tool-rate query). Real deployments read text from storage.
    # The explicit repartition matters (r6): the generator ends in a
    # window shuffle whose output AQE coalesces to ONE partition at this
    # row count, and localCheckpoint freezes that layout — every
    # downstream parse then ran single-threaded (measured 1.2 s + 0.9 s
    # one-task parse stages). Spread the checkpoint across the cores.
    return (
        generate_transcripts(spark, n, portable=True)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )


def _pm(salt: int, expr: str = "i") -> str:
    """DuckDB replica of synth's portable mix (md5 -> 15 hex -> int)."""
    return (
        f"CAST(('0x' || substring(md5('{salt}:' || {expr}::VARCHAR), 1, 15)) "
        "AS BIGINT)"
    )


def _sql_list(xs) -> str:
    return "[" + ",".join(f"'{x}'" if isinstance(x, str) else str(x) for x in xs) + "]"


def _sql_transcript_base() -> str:
    """Shared CTE: per-row ground truth for the portable transcript corpus.

    Mirrors synth.generate_transcripts(portable=True) branch-for-branch:
    dialect selector d, quadratic-skew conv assignment, and the category
    each text payload must route to after parsing.
    """
    from commerce_logs_pipeline_spark.synth import LEVELS, STATUS, TOOLS

    return f"""
WITH g AS (
    SELECT i,
           {_pm(2)} % 1000 AS d,
           {_pm(1)} % 1000000000 AS m,
           ({_sql_list(LEVELS)})[{_pm(8)} % {len(LEVELS)} + 1] AS level,
           ({_sql_list(TOOLS)})[{_pm(9)} % {len(TOOLS)} + 1] AS tool_name,
           ({_sql_list(STATUS)})[{_pm(3)} % {len(STATUS)} + 1] AS status,
           {_pm(10)} % 500 AS latency,
           {_pm(11)} % 100000 AS nbytes,
           (['user','assistant'])[{_pm(17)} % 2 + 1] AS chat_role
    FROM generate_series(0, {_TN - 1}) AS s(i)
), base AS (
    SELECT i, d, status, latency, nbytes, tool_name,
           least({_TN_CONVS - 1}, (m * m) // {_TK_DIV}) AS conv_num,
           CASE WHEN d < 250 THEN 'http'
                WHEN d < 450 THEN 'proxy'
                WHEN d < 650 THEN
                    CASE WHEN level = 'ERROR' THEN 'error' ELSE 'app' END
                WHEN d < 800 THEN 'container'
                WHEN d < 900 THEN 'tool_call'
                WHEN d < 955 THEN
                    CASE WHEN chat_role = 'user' THEN 'user_turn'
                         ELSE 'assistant_turn' END
                WHEN d < 994 THEN 'skipped'
                ELSE 'parse_error' END AS category
    FROM g
)
"""


def q_transcript_route_counts(spark, sf):
    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts

    return routed_counts(parse_transcripts(_transcripts(spark))).orderBy(
        "category"
    )


def _sql_route_counts() -> str:
    return (
        _sql_transcript_base()
        + "SELECT category, count(*) AS n FROM base GROUP BY category"
    )


def q_transcript_conv_counts(spark, sf):
    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts

    return conv_turn_counts_salted(parse_transcripts(_transcripts(spark)))


def _sql_conv_counts() -> str:
    return _sql_transcript_base() + f""", seq AS (
    SELECT conv_num, category,
           row_number() OVER (PARTITION BY conv_num ORDER BY i) - 1 AS turn_idx
    FROM base
), t AS (
    SELECT 'conv-' || lpad(conv_num::VARCHAR, 8, '0') AS conv_id,
           category, turn_idx,
           make_timestamp((1704067200 + (conv_num % 30) * 86400
                           + {_pm(19, "conv_num")} % 43200
                           + turn_idx * 7) * 1000000) AS ts
    FROM seq
)
SELECT conv_id, count(*) AS n_turns,
       max(turn_idx) AS max_turn_idx,
       CAST(sum(CASE WHEN category IN ('error','parse_error') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors,
       CAST(sum(CASE WHEN category = 'tool_call' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool_calls,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM t GROUP BY conv_id
"""


def q_transcript_tool_rates(spark, sf):
    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts
    from commerce_logs_pipeline_spark.plans.aggregate import per_tool_call_rates

    return per_tool_call_rates(parse_transcripts(_transcripts(spark)))


def _sql_tool_rates() -> str:
    return _sql_transcript_base() + """
SELECT tool_name, count(*) AS calls,
       round(sum(CASE WHEN status >= 500 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 4) AS error_rate,
       round(avg(latency), 2) AS avg_latency_ms,
       max(latency) AS p100_latency_ms
FROM base WHERE category = 'tool_call' GROUP BY tool_name
"""


def q_transcript_status_class(spark, sf):
    """P-H oracle: the '-'->0 coercion, dynamic-typed statusCode, and the
    skip-rows-still-carry-status subtlety are all value-checked here."""
    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts
    from commerce_logs_pipeline_spark.plans.aggregate import status_class_rollup

    return status_class_rollup(parse_transcripts(_transcripts(spark)))


def _sql_status_class() -> str:
    # Ground truth per synth branch: http (d<250) carries status/nbytes/
    # latency; apache proxy (250<=d<450) has bytes '-'->0 when d%7=0; the
    # skip-rule rows (dash 970-979, rtsp 980-987, method 988-993) parse as
    # category 'skipped' but their context/status fields still coerce.
    return _sql_transcript_base() + """, coerced AS (
    SELECT category,
           CASE WHEN d < 450 THEN status
                WHEN d >= 970 AND d < 980 THEN 400
                WHEN d >= 980 AND d < 988 THEN 454
                WHEN d >= 988 AND d < 994 THEN 401
                END AS status_code,
           CASE WHEN d < 250 THEN nbytes
                WHEN d < 450 THEN CASE WHEN d % 7 = 0 THEN 0 ELSE nbytes END
                WHEN d >= 970 AND d < 994 THEN 0
                END AS bytes_sent,
           CASE WHEN d < 450 THEN latency
                WHEN d >= 970 AND d < 988 THEN 0
                WHEN d >= 988 AND d < 994 THEN 1
                END AS response_time_ms
    FROM base
)
SELECT category,
       (status_code // 100)::VARCHAR || 'xx' AS status_class,
       count(*) AS n,
       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
       round(avg(response_time_ms), 2) AS avg_response_ms
FROM coerced WHERE status_code IS NOT NULL
GROUP BY category, status_class
"""


def q_expr_predicate(spark, sf):  # F8: arbitrary expression predicate via expr()
    e = _t(spark, sf, "events")
    return (
        e.filter(F.expr("value > 100 AND event_type IN ('purchase', 'view')"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


SQL_EXPR_PREDICATE = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
FROM events
WHERE value > 100 AND event_type IN ('purchase', 'view')
GROUP BY event_type
"""


def q_trace_assembly(spark, sf):  # designed correlator stage, realized
    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts
    from commerce_logs_pipeline_spark.plans.traces import assemble_traces

    # the parsed frame feeds three plan subtrees (server spans, correlate
    # left, correlate right); checkpoint it once instead of re-running the
    # synth+parse kernel per subtree
    parsed = parse_transcripts(_transcripts(spark)).localCheckpoint()
    traces = assemble_traces(parsed)
    return traces.groupBy("kind", "status_code_otel").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("trace_id").alias("n_traces"),
    )


def _sql_trace_assembly() -> str:
    # Ground truth: SERVER spans are the http/proxy rows (status>=500 ->
    # ERROR); INTERNAL spans are app/error rows attached to one parent by
    # (thread match desc, |turn gap| asc, parent turn asc) within the 60s
    # window (7s turn spacing -> |dturn| <= 8). Parent trace identity is
    # (conv, parent turn) — injective with the sha-derived trace_id.
    return _sql_transcript_base() + f""", seq AS (
    SELECT i, d, conv_num, category, status,
           row_number() OVER (PARTITION BY conv_num ORDER BY i) - 1
               AS turn_idx,
           {_pm(15)} % 20 AS thr
    FROM base
), spans AS (
    SELECT conv_num, turn_idx, status,
           CASE WHEN d < 250 THEN thr END AS thr
    FROM seq WHERE category IN ('http', 'proxy')
), ev AS (
    SELECT conv_num, turn_idx, thr, category
    FROM seq WHERE category IN ('app', 'error')
), chosen AS (
    SELECT e.conv_num, e.category AS ev_cat, s.turn_idx AS sp_turn
    FROM ev e JOIN spans s
      ON e.conv_num = s.conv_num
     AND abs(e.turn_idx - s.turn_idx) * 7 <= 60
    QUALIFY row_number() OVER (
        PARTITION BY e.conv_num, e.turn_idx
        ORDER BY CASE WHEN s.thr = e.thr THEN 1 ELSE 0 END DESC,
                 abs(e.turn_idx - s.turn_idx) ASC,
                 s.turn_idx ASC) = 1
)
SELECT 'SERVER' AS kind,
       CASE WHEN status >= 500 THEN 'ERROR' ELSE 'OK' END AS status_code_otel,
       count(*) AS n_spans, count(*) AS n_traces
FROM spans GROUP BY 2
UNION ALL
SELECT 'INTERNAL' AS kind,
       CASE WHEN ev_cat = 'error' THEN 'ERROR' ELSE 'OK' END,
       count(*), count(DISTINCT conv_num * 100000 + sp_turn)
FROM chosen GROUP BY 2
"""


def q_profile_fields(spark, sf):
    """P-M field-frequency profiler over the WHOLE portable corpus
    (sample_rows >= corpus makes the normally sample-based profiler
    deterministic, so the oracle can re-derive every path count from the
    dialect construction)."""
    from commerce_logs_pipeline_spark.functions.profile import (
        profile_json_fields,
    )

    return profile_json_fields(_transcripts(spark), "text", sample_rows=_TN)


def _sql_profile_fields() -> str:
    # per-dialect JSON key inventory (top-level + second-level paths), as
    # constructed by synth.generate_transcripts — the profiler must
    # recover exactly these counts. Dialect populations come from the d
    # selector; bad_json (994<=d<998) and non-JSON rows don't parse.
    apache_keys = [
        "localServerName", "remoteHost", "requestFirstLine", "responseTime",
        "status", "bytes", "referer", "userAgent", "cache status",
        "remoteUser", "identdUsername", "time",
    ]
    paths: list[tuple[str, str]] = [
        ("Logs", "n_http + n_app + n_dash + n_meth + n_nots"),
        ("kubernetes", "n_http + n_apache + n_app + n_cont + n_dash"
                       " + n_rtsp + n_meth + n_nots"),
        ("@timestamp", "n_apache + n_cont + n_rtsp"),
        ("logs", "n_apache + n_rtsp"),
        ("stream", "n_cont"),
        ("log", "n_cont"),
        ("time", "n_cont"),
        ("Logs.timeMillis", "n_http + n_dash + n_meth"),
        ("Logs.contextMap", "n_http + n_dash + n_meth"),
        ("Logs.thread", "n_http + n_app"),
        ("Logs.instant", "n_app"),
        ("Logs.level", "n_app + n_nots"),
        ("Logs.loggerName", "n_app + n_nots"),
        ("Logs.message", "n_app + n_nots"),
        ("Logs.thrown", "n_app_err"),
        ("kubernetes.pod_name", "n_http + n_apache + n_app + n_cont"
                                " + n_dash + n_rtsp + n_meth + n_nots"),
        ("kubernetes.pod_ip", "n_apache + n_rtsp"),
    ] + [(f"logs.{k}", "n_apache + n_rtsp") for k in apache_keys]
    rows = "\n    UNION ALL\n".join(
        f"    SELECT '{p}' AS path, CAST({expr} AS BIGINT) AS n_present "
        "FROM counts"
        for p, expr in paths
    )
    return _sql_transcript_base() + f""", counts AS (
    SELECT
        count(*) FILTER (d < 250) AS n_http,
        count(*) FILTER (d >= 250 AND d < 450) AS n_apache,
        count(*) FILTER (d >= 450 AND d < 650) AS n_app,
        count(*) FILTER (d >= 450 AND d < 650 AND level = 'ERROR')
            AS n_app_err,
        count(*) FILTER (d >= 650 AND d < 800) AS n_cont,
        count(*) FILTER (d >= 970 AND d < 980) AS n_dash,
        count(*) FILTER (d >= 980 AND d < 988) AS n_rtsp,
        count(*) FILTER (d >= 988 AND d < 994) AS n_meth,
        count(*) FILTER (d >= 998) AS n_nots
    FROM g
), p AS (
{rows}
)
SELECT path, n_present,
       round(n_present::DOUBLE /
             (SELECT n_http + n_apache + n_app + n_cont + n_dash
                     + n_rtsp + n_meth + n_nots FROM counts), 4) AS presence
FROM p
"""


# ---------------------------------------------------------------------------
# Selector surface (F1 blob-name parse + F2 predicate registry): synthesize
# blob names with the portable mix, parse+classify them with the registry in
# Spark, and let DuckDB re-derive ground truth from the construction — an
# end-to-end value check of the structural parser and all 7 predicates.
# ---------------------------------------------------------------------------
_SEL_PODS = [
    "apache2-igc-9db94ff4f-b6w9z", "apache2-igc-nat-7c58b477db-42fg8",
    "api-d64987b96-ctnd7", "backoffice-677f87b859-x9xn8",
    "backgroundprocessing-7f56bcb6f-h6j87", "jsapps-6cb865fc5b-bgg2c",
    "imageprocessing-64bd7f67f4-t8bqn", "zookeeper-1", "solr-0",
    "hybris-autoscaler-7cb9764759-vrhrc",
]
_SEL_NS = ["default", "default", "default", "kube-system"]
_SEL_CONTAINERS = [
    "proxy", "platform", "jsapps", "imageprocessing", "zookeeper",
    "cache-cleaner", "sidecar", "hybris-autoscaler",
]
_SEL_N = 10_000


def q_selector_classify(spark, sf):
    from commerce_logs_pipeline_spark.functions.selectors import classify_blob

    def pm(salt):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col("id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")

    def pick(arr, salt):
        a = F.array(*[F.lit(x) for x in arr])
        return F.element_at(a, (pm(salt) % len(arr) + 1).cast("int"))

    df = spark.range(_SEL_N)
    date = F.concat(F.lit("202506"), F.lpad((pm(1) % 7 + 13).cast("string"), 2, "0"))
    pod = pick(_SEL_PODS, 2)
    ns = pick(_SEL_NS, 3)
    container = pick(_SEL_CONTAINERS, 4)
    cid = F.md5(F.col("id").cast("string"))
    blob = (
        F.when(pm(5) % 20 == 0, F.lit("invalid-blob-name.gz"))
        .when(
            pm(5) % 20 == 1,
            F.format_string("%s.%s_%s_%s-%s", date, pod, ns, container, cid),
        )
        .otherwise(
            F.format_string("%s.%s_%s_%s-%s.gz", date, pod, ns, container, cid)
        )
    )
    # Parse-once shape (r6): materialize the blob name and its parsed
    # struct as real columns before classifying — classify_blob over an
    # inline expression re-expands the md5 synth + parse subtree for
    # every one of the registry's ~25 field references (measured ~2.9 s
    # of driver-side analysis+codegen for 0.4 s of execution).
    from commerce_logs_pipeline_spark.functions.selectors import (
        classify_parsed,
        parse_blob_name,
    )

    return (
        df.select(blob.alias("blob_name"))
        .select("blob_name", parse_blob_name(F.col("blob_name")).alias("_p"))
        .select(
            F.coalesce(classify_parsed(F.col("_p")), F.lit("unmatched"))
            .alias("selector")
        )
        .groupBy("selector")
        .agg(F.count("*").alias("n"))
    )


def _sql_selector_classify() -> str:
    def sql_pick(arr, salt):
        return (
            "(" + _sql_list(arr) + f")[{_pm(salt)} % {len(arr)} + 1]"
        )

    return f"""
WITH g AS (
    SELECT i, {_pm(5)} % 20 AS inv,
           {sql_pick(_SEL_PODS, 2)} AS pod,
           {sql_pick(_SEL_NS, 3)} AS ns,
           {sql_pick(_SEL_CONTAINERS, 4)} AS container
    FROM generate_series(0, {_SEL_N - 1}) AS s(i)
), labeled AS (
    SELECT CASE
        WHEN inv IN (0, 1) THEN 'unmatched'
        WHEN starts_with(pod, 'apache2-igc-')
             AND NOT starts_with(pod, 'apache2-igc-nat-')
             AND ns = 'default' AND container = 'proxy' THEN 'apache-proxy'
        WHEN starts_with(pod, 'api-') AND container = 'platform' THEN 'api'
        WHEN starts_with(pod, 'backoffice') AND container = 'platform'
            THEN 'backoffice'
        WHEN starts_with(pod, 'backgroundprocessing')
             AND container = 'platform' THEN 'background-processing'
        WHEN starts_with(pod, 'jsapps') AND container = 'jsapps'
            THEN 'jsapps'
        WHEN starts_with(pod, 'imageprocessing')
             AND container = 'imageprocessing' THEN 'imageprocessing'
        WHEN starts_with(pod, 'zookeeper') AND container = 'zookeeper'
            THEN 'zookeeper'
        ELSE 'unmatched' END AS selector
    FROM g
)
SELECT selector, count(*) AS n FROM labeled GROUP BY selector
"""


# ---------------------------------------------------------------------------
# Blob event keys (P-K/F7): generate -> parse roundtrip under aggregation.
# ---------------------------------------------------------------------------
_KEY_SUBS = ["s1", "s2", "s3"]
_KEY_ENVS = ["prod", "stage", "dev"]
_KEY_TYPES = ["line-1", "line-2", "blob-created", "blob-closed", "observed"]
_KEY_N = 8_000


def q_blob_event_keys(spark, sf):
    from commerce_logs_pipeline_spark.functions.selectors import (
        generate_blob_event_key,
        parse_blob_event_key,
    )

    def pm(salt):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col("id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")

    def pick(arr, salt):
        a = F.array(*[F.lit(x) for x in arr])
        return F.element_at(a, (pm(salt) % len(arr) + 1).cast("int"))

    df = spark.range(_KEY_N)
    blob = F.concat(
        F.lit("kubernetes/20250613.pod-"),
        (pm(4) % 100).cast("string"),
        F.lit("_default_c-"),
        F.md5(F.col("id").cast("string")),
        F.lit(".gz"),
    )
    key = F.when(
        pm(5) % 10 == 0, F.lit("not-a-valid-key")  # parse-failure rows
    ).otherwise(
        generate_blob_event_key(pick(_KEY_SUBS, 1), pick(_KEY_ENVS, 2),
                                pick(_KEY_TYPES, 3), blob)
    )
    parsed = df.select(parse_blob_event_key(key).alias("k"))
    return (
        parsed.groupBy(
            F.coalesce(F.col("k.environment"), F.lit("invalid")).alias("environment"),
            F.coalesce(F.col("k.event_type"), F.lit("invalid")).alias("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("k.is_log_line").cast("int")).cast("long")
            .alias("n_log_lines"),
        )
    )


def _sql_blob_event_keys() -> str:
    return f"""
WITH g AS (
    SELECT i, {_pm(5)} % 10 AS inv,
           ({_sql_list(_KEY_ENVS)})[{_pm(2)} % {len(_KEY_ENVS)} + 1] AS env,
           ({_sql_list(_KEY_TYPES)})[{_pm(3)} % {len(_KEY_TYPES)} + 1] AS et
    FROM generate_series(0, {_KEY_N - 1}) AS s(i)
), lab AS (
    SELECT CASE WHEN inv = 0 THEN 'invalid' ELSE env END AS environment,
           CASE WHEN inv = 0 THEN 'invalid' ELSE et END AS event_type,
           CASE WHEN inv = 0 THEN 0
                WHEN starts_with(et, 'line-') THEN 1 ELSE 0 END AS ll
    FROM g
)
SELECT environment, event_type, count(*) AS n,
       CAST(sum(ll) AS BIGINT) AS n_log_lines
FROM lab GROUP BY environment, event_type
"""


# ---------------------------------------------------------------------------
# Manifest fold (A3/J3): synthesized completion-event log -> folded state.
# Duplicate deliveries are synthesized as IDENTICAL rows per
# (day, bucket, run) triple, so the dedup-then-fold is deterministic.
# ---------------------------------------------------------------------------
_MF_N = 5_000


def q_manifest_fold(spark, sf):
    from commerce_logs_pipeline_spark.plans.checkpoint import fold_manifest

    def pm(salt, col):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 15), 16, 10
        ).cast("long")

    i = F.col("id").cast("string")
    day_num = pm(21, i) % 28 + 1
    bucket = (pm(22, i) % 16).cast("int")
    run_num = pm(23, i) % 40
    trip = F.concat_ws(
        "|", day_num.cast("string"), bucket.cast("string"),
        run_num.cast("string"),
    )
    ev = spark.range(_MF_N).select(
        F.format_string("2024-01-%02d", day_num.cast("int")).alias("day"),
        bucket.alias("bucket"),
        F.when(pm(31, trip) % 4 == 0, F.lit("closed")).otherwise(F.lit("open"))
        .alias("status"),
        (pm(32, trip) % 1000).alias("max_turn_watermark"),
        (pm(33, trip) % 10000).alias("rows_processed"),
        (pm(36, trip) % 9000).alias("rows_routed"),
        (pm(34, trip) % 500).alias("rows_skipped"),
        (pm(35, trip) % 100).alias("rows_error"),
        F.timestamp_seconds(F.lit(1704067200) + pm(37, trip) % 86400)
        .alias("first_processed_ts"),
        F.timestamp_seconds(
            F.lit(1704067200) + pm(37, trip) % 86400 + pm(38, trip) % 3600
        ).alias("last_processed_ts"),
        F.concat(F.lit("r"), run_num.cast("string")).alias("run_id"),
        F.timestamp_seconds(F.lit(1700000000) + run_num * 1000).alias(
            "updated_at"
        ),
    )
    return fold_manifest(ev)


def _sql_manifest_fold() -> str:
    def pmt(salt):
        return (
            f"CAST(('0x' || substring(md5('{salt}:' || trip), 1, 15)) "
            "AS BIGINT)"
        )

    return f"""
WITH g AS (
    SELECT {_pm(21)} % 28 + 1 AS day_num,
           {_pm(22)} % 16 AS bucket,
           {_pm(23)} % 40 AS run_num
    FROM generate_series(0, {_MF_N - 1}) AS s(i)
), trips AS (
    SELECT DISTINCT day_num, bucket, run_num,
           day_num::VARCHAR || '|' || bucket::VARCHAR || '|'
               || run_num::VARCHAR AS trip
    FROM g
), ev AS (
    SELECT '2024-01-' || lpad(day_num::VARCHAR, 2, '0') AS day,
           bucket,
           CASE WHEN {pmt(31)} % 4 = 0 THEN 'closed' ELSE 'open' END
               AS status,
           {pmt(32)} % 1000 AS wm,
           {pmt(33)} % 10000 AS rp,
           {pmt(36)} % 9000 AS rr,
           {pmt(34)} % 500 AS rs,
           {pmt(35)} % 100 AS re,
           make_timestamp((1704067200 + {pmt(37)} % 86400) * 1000000)
               AS first_ts,
           make_timestamp((1704067200 + {pmt(37)} % 86400
                           + {pmt(38)} % 3600) * 1000000) AS last_ts,
           'r' || run_num::VARCHAR AS run_id,
           make_timestamp((1700000000 + run_num * 1000) * 1000000) AS upd
    FROM trips
)
SELECT day, bucket,
       CASE WHEN max(CASE WHEN status = 'closed' THEN 1 ELSE 0 END) = 1
            THEN 'closed' ELSE 'open' END AS status,
       max(wm) AS max_turn_watermark,
       CAST(sum(rp) AS BIGINT) AS rows_processed,
       CAST(sum(rr) AS BIGINT) AS rows_routed,
       CAST(sum(rs) AS BIGINT) AS rows_skipped,
       CAST(sum(re) AS BIGINT) AS rows_error,
       min(first_ts) AS first_processed_ts,
       max(last_ts) AS last_processed_ts,
       arg_max(run_id, upd) AS run_id,
       max(upd) AS updated_at
FROM ev GROUP BY day, bucket
"""


def q_media_image_features(spark, sf):
    """Per-kind media query (r5: folded into the single registered
    `media_features` union so all three branches fit the driver's
    50-entry check window; kept for targeted local checks).

    Multimodal plumbing (decode stubbed behind a deterministic fake):
    the mapInPandas Arrow path, schema, and byte-level features are real
    and now VALUE-CHECKED — the oracle re-derives every feature from the
    synthetic byte construction."""
    from commerce_logs_pipeline_spark.sources.multimodal import (
        extract_image_features,
        synth_media,
    )

    return extract_image_features(synth_media(spark, 96))


def _sql_media_features() -> str:
    # synth_media: content = md5('media-{i}').digest * (i%7+1); images at
    # i%3=0. Byte mean/std are invariant under block repetition, so the
    # stats derive from the 16 base digest bytes; the sha runs over the
    # hex of the full repeated content.
    return """
WITH g AS (
    SELECT i, i % 7 + 1 AS k, md5('media-' || i::VARCHAR) AS hx
    FROM generate_series(0, 95) AS s(i) WHERE i % 3 = 0
), f AS (
    SELECT 'm-' || lpad(i::VARCHAR, 4, '0') AS media_id,
           sha256(lower(hex(repeat(unhex(hx), k)))) AS content_sha,
           CAST(16 * k AS BIGINT) AS n_bytes,
           list_transform(generate_series(1, 16), j ->
               CAST(('0x' || substring(hx, 2 * j - 1, 2)) AS INT)::DOUBLE)
               AS l
    FROM g
)
SELECT media_id, content_sha, n_bytes,
       list_avg(l) AS feat_mean,
       sqrt(list_avg(list_transform(l,
            x -> (x - list_avg(l)) * (x - list_avg(l))))) AS feat_std,
       224 AS resized_w, 224 AS resized_h
FROM f
"""


def q_media_audio_features(spark, sf):
    """Audio branch of the multimodal plumbing (same Arrow mapInPandas
    path as images): content id, size, byterate vs declared duration,
    byte-amplitude stats — every value re-derived by the oracle from the
    synthetic byte construction."""
    from commerce_logs_pipeline_spark.sources.multimodal import (
        extract_audio_features,
        synth_media,
    )

    return extract_audio_features(synth_media(spark, 96))


def _sql_media_audio() -> str:
    # synth_media: audio rows at i%3=1; content = md5('media-{i}').digest
    # repeated (i%7+1) times; duration_ms = 3000 + 17*i. Byte mean/std are
    # invariant under block repetition -> derive from the 16 digest bytes.
    return """
WITH g AS (
    SELECT i, i % 7 + 1 AS k, CAST(3000 + 17 * i AS BIGINT) AS dur,
           md5('media-' || i::VARCHAR) AS hx
    FROM generate_series(0, 95) AS s(i) WHERE i % 3 = 1
), f AS (
    SELECT 'm-' || lpad(i::VARCHAR, 4, '0') AS media_id,
           sha256(lower(hex(repeat(unhex(hx), k)))) AS content_sha,
           CAST(16 * k AS BIGINT) AS n_bytes,
           dur AS duration_ms,
           list_transform(generate_series(1, 16), j ->
               CAST(('0x' || substring(hx, 2 * j - 1, 2)) AS INT)::DOUBLE)
               AS l
    FROM g
)
SELECT media_id, content_sha, n_bytes, duration_ms,
       (n_bytes * 1000.0) / duration_ms AS bytes_per_sec,
       list_avg(l) AS amp_mean,
       sqrt(list_avg(list_transform(l,
            x -> (x - list_avg(l)) * (x - list_avg(l))))) AS amp_std
FROM f
"""


def q_media_video_frames(spark, sf):
    """Video branch: one row per planned frame with a deterministic
    8-byte window into the container bytes standing in for the codec's
    frame buffer (no codec libs here); the oracle re-derives every
    window with plain hex-string math over the same construction."""
    from commerce_logs_pipeline_spark.sources.multimodal import (
        extract_video_frames,
        synth_media,
    )

    return extract_video_frames(synth_media(spark, 96)).orderBy(
        "media_id", "frame_ts_ms"
    )


def _sql_media_video() -> str:
    # videos at i%3=2; content hex = repeat(md5 hex, i%7+1); frame grid
    # 0..duration step 1000; window start (0-based bytes) =
    # (frame_idx * 7) % max(bytes - 7, 1), 8 bytes = 16 hex chars
    return """
WITH g AS (
    SELECT i, i % 7 + 1 AS k, 3000 + i * 17 AS dur,
           repeat(md5('media-' || i::VARCHAR), i % 7 + 1) AS hx
    FROM generate_series(0, 95) AS s(i) WHERE i % 3 = 2
), fr AS (
    SELECT i, k, hx,
           unnest(generate_series(0, dur, 1000)) AS t
    FROM g
)
SELECT 'm-' || lpad(i::VARCHAR, 4, '0') AS media_id,
       CAST(t AS BIGINT) AS frame_ts_ms,
       CAST(16 * k AS BIGINT) AS n_bytes,
       substring(hx,
                 CAST(2 * (((t // 1000) * 7) % greatest(16 * k - 7, 1))
                      + 1 AS INT),
                 16) AS frame_hex
FROM fr
ORDER BY media_id, frame_ts_ms
"""


def q_media_features(spark, sf):
    """All three multimodal branches (image/audio/video) in one driver
    query: union of the kind-specific shapes normalized to
    (kind, media_id, content_sha, n_bytes, stat_a, stat_b, stat_c, detail).
    image: stat_a/b = byte mean/std, detail = resize target;
    audio: stat_a/b = amplitude mean/std, stat_c = bytes/sec,
    detail = duration_ms; video: one row per planned frame, stat_c =
    frame_ts_ms, detail = the 8-byte frame window hex."""
    from commerce_logs_pipeline_spark.sources.multimodal import (
        extract_audio_features,
        extract_image_features,
        extract_video_frames,
        synth_media,
    )

    m = synth_media(spark, 96)
    img = extract_image_features(m).select(
        F.lit("image").alias("kind"),
        "media_id",
        "content_sha",
        "n_bytes",
        F.col("feat_mean").alias("stat_a"),
        F.col("feat_std").alias("stat_b"),
        F.lit(None).cast("double").alias("stat_c"),
        F.concat_ws("x", "resized_w", "resized_h").alias("detail"),
    )
    aud = extract_audio_features(m).select(
        F.lit("audio").alias("kind"),
        "media_id",
        "content_sha",
        "n_bytes",
        F.col("amp_mean").alias("stat_a"),
        F.col("amp_std").alias("stat_b"),
        F.col("bytes_per_sec").alias("stat_c"),
        F.col("duration_ms").cast("string").alias("detail"),
    )
    vid = extract_video_frames(m).select(
        F.lit("video").alias("kind"),
        "media_id",
        F.lit(None).cast("string").alias("content_sha"),
        "n_bytes",
        F.lit(None).cast("double").alias("stat_a"),
        F.lit(None).cast("double").alias("stat_b"),
        F.col("frame_ts_ms").cast("double").alias("stat_c"),
        F.col("frame_hex").alias("detail"),
    )
    return img.unionByName(aud).unionByName(vid)


def _sql_media_features_all() -> str:
    # Union of the three kind-specific oracles over the same synthetic
    # construction (see _sql_media_features/_sql_media_audio/_sql_media_video
    # for the per-branch derivations).
    return """
WITH g AS (
    SELECT i, i % 7 + 1 AS k, 3000 + 17 * i AS dur,
           md5('media-' || i::VARCHAR) AS hx
    FROM generate_series(0, 95) AS s(i)
), f AS (
    SELECT i, k, dur, hx,
           'm-' || lpad(i::VARCHAR, 4, '0') AS media_id,
           sha256(lower(hex(repeat(unhex(hx), k)))) AS content_sha,
           CAST(16 * k AS BIGINT) AS n_bytes,
           list_transform(generate_series(1, 16), j ->
               CAST(('0x' || substring(hx, 2 * j - 1, 2)) AS INT)::DOUBLE)
               AS l
    FROM g
)
SELECT 'image' AS kind, media_id, content_sha, n_bytes,
       list_avg(l) AS stat_a,
       sqrt(list_avg(list_transform(l,
            x -> (x - list_avg(l)) * (x - list_avg(l))))) AS stat_b,
       CAST(NULL AS DOUBLE) AS stat_c,
       '224x224' AS detail
FROM f WHERE i % 3 = 0
UNION ALL
SELECT 'audio' AS kind, media_id, content_sha, n_bytes,
       list_avg(l) AS stat_a,
       sqrt(list_avg(list_transform(l,
            x -> (x - list_avg(l)) * (x - list_avg(l))))) AS stat_b,
       (n_bytes * 1000.0) / dur AS stat_c,
       dur::VARCHAR AS detail
FROM f WHERE i % 3 = 1
UNION ALL
SELECT 'video' AS kind, media_id,
       CAST(NULL AS VARCHAR) AS content_sha, n_bytes,
       CAST(NULL AS DOUBLE) AS stat_a,
       CAST(NULL AS DOUBLE) AS stat_b,
       CAST(t AS DOUBLE) AS stat_c,
       substring(repeat(hx, k),
                 CAST(2 * (((t // 1000) * 7) % greatest(16 * k - 7, 1))
                      + 1 AS INT),
                 16) AS detail
FROM (
    SELECT i, k, hx, media_id, n_bytes,
           unnest(generate_series(0, dur, 1000)) AS t
    FROM f WHERE i % 3 = 2
) fr
"""


# ---------------------------------------------------------------------------
# A8 partition-stats listing (explore_raw_logs.py:210-260 analog): per
# (day, bucket) rows / distinct streams / payload bytes / first / last.
# Bucket uses the portable md5 hash so DuckDB reproduces the partitioning.
# ---------------------------------------------------------------------------
def q_partition_stats(spark, sf):
    from commerce_logs_pipeline_spark.plans.aggregate import partition_stats

    e = _t(spark, sf, "events")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pb:"), F.col("user_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % 16
    ).cast("int")
    df = e.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).withColumn(
        "bucket", bucket
    )
    return partition_stats(
        df, payload_col="props", ts_col="ts", stream_col="user_id"
    )


SQL_PARTITION_STATS = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(CAST(('0x' || substring(md5('pb:' || user_id::VARCHAR), 1, 15))
                 AS BIGINT) % 16 AS INT) AS bucket,
       count(*) AS n_rows,
       count(DISTINCT user_id) AS n_streams,
       CAST(sum(octet_length(encode(props))) AS BIGINT) AS payload_bytes,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------
_REGISTRY: dict[str, tuple[Callable, str | None]] = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING),
    "filter_pushdown_revenue": (q_filter_pushdown_revenue, SQL_FILTER_PUSHDOWN),
    # shipping_priority_top10 retired r5 (W4 stays covered by the same
    # protocol in tests/test_entry_queries.py; entry() still runs it) to
    # keep the registry inside the driver's 50-entry correctness window.
    "region_revenue": (q_region_revenue, SQL_REGION_REVENUE),
    "broadcast_dim_join": (q_broadcast_dim_join, SQL_BROADCAST_DIM),
    # anti_join_customers retired r5 (J7's anti half; semi_join_suppliers
    # remains the driver-checked J7 witness with a non-empty result set —
    # the anti query matches 0 rows at every SF, a weaker hash signal.
    # Oracle parity kept in tests/test_entry_queries.py).
    "semi_join_suppliers": (q_semi_join, SQL_SEMI),
    "latest_order_per_customer": (q_latest_order_per_customer, SQL_LATEST_ORDER),
    "topk_per_group": (q_topk_per_group, SQL_TOPK),
    "rollup_orders": (q_rollup, SQL_ROLLUP),
    "distinct_counts": (q_distinct_counts, SQL_DISTINCT),
    "route_event_counts": (q_route_counts, SQL_ROUTE_COUNTS),
    "error_rate_by_user": (q_error_rate_by_user, SQL_ERROR_RATE),
    # hourly_rollup retired r5 (tumbling-window rollup overlaps A1/A6
    # coverage by rollup_orders + windowed_rolling_avg; oracle parity kept
    # in tests/test_entry_queries.py).
    "value_percentiles_by_type": (q_value_percentiles, SQL_VALUE_PCT),
    "json_extract_props": (q_json_extract, SQL_JSON_EXTRACT),
    "windowed_rolling_avg": (q_windowed_rates, SQL_WINDOWED),
    "sessionize_events": (q_sessionize, SQL_SESSIONIZE),
    "range_correlate": (q_range_correlate, SQL_RANGE_CORRELATE),
    "asof_join_prior_signup": (q_asof_join, SQL_ASOF),
    "doc_token_stats": (q_doc_token_stats, SQL_DOC_TOKEN_STATS),
    "token_count_methods": (q_token_methods, SQL_TOKEN_METHODS),
    "lang_id_confusion": (q_lang_id, SQL_LANG_ID),
    "doc_quality_scores": (q_doc_quality, SQL_DOC_QUALITY),
    "doc_fingerprints": (q_doc_fingerprints, SQL_FINGERPRINTS),
    "exact_dup_groups": (q_exact_dup_groups, SQL_EXACT_DUPS),
    "ngram_jaccard_pairs": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "minhash_lsh_pairs": (q_minhash_lsh, SQL_MINHASH),
    "simhash_dups": (q_simhash_dups, SQL_SIMHASH),
    "near_dup_clusters": (q_near_dup_clusters, _sql_near_dup_clusters()),
    "pii_scan": (q_pii_scan, _sql_pii_scan()),
    "corpus_curation": (q_corpus_curation, _sql_corpus_curation()),
    "doc_curation_flags": (q_doc_curation, _sql_doc_curation()),
    "dataset_split_mix": (q_dataset_split_mix, _sql_dataset_split_mix()),
    "tfidf_topk_terms": (q_tfidf_topk_terms, _sql_tfidf_topk_terms()),
    "dataset_pack": (q_dataset_pack, _sql_dataset_pack()),
    "embedding_topk_bruteforce": (q_embedding_topk, SQL_EMB_TOPK),
    "embedding_topk_lsh": (q_embedding_topk_lsh, _sql_emb_topk_lsh()),
    "embedding_dups_lsh": (q_embedding_dups_lsh, SQL_EMBEDDING_DUPS),
    "ann_recall_at_k": (q_ann_recall_at_k, _sql_ann_recall()),
    "embedding_topk_ivf": (q_embedding_topk_ivf, _sql_emb_topk_ivf()),
    "expr_predicate_filter": (q_expr_predicate, SQL_EXPR_PREDICATE),
    "trace_assembly": (q_trace_assembly, _sql_trace_assembly()),
    "profile_json_fields": (q_profile_fields, _sql_profile_fields()),
    "transcript_route_counts": (q_transcript_route_counts, _sql_route_counts()),
    "transcript_conv_counts": (q_transcript_conv_counts, _sql_conv_counts()),
    "transcript_tool_rates": (q_transcript_tool_rates, _sql_tool_rates()),
    "transcript_status_class": (q_transcript_status_class, _sql_status_class()),
    "selector_classified_counts": (q_selector_classify, _sql_selector_classify()),
    "blob_event_key_counts": (q_blob_event_keys, _sql_blob_event_keys()),
    "manifest_fold_state": (q_manifest_fold, _sql_manifest_fold()),
    "partition_stats": (q_partition_stats, SQL_PARTITION_STATS),
    "media_features": (q_media_features, _sql_media_features_all()),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
