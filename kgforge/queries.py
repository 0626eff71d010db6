"""Operator-library queries + DuckDB oracle SQL (driver correctness gate).

One named query per implemented operator family from SURVEY.md §2, each a
``(spark_fn, oracle_sql)`` pair over the driver's read-only parquet tables.
Cross-engine determinism rules used throughout (see tools/check_oracles.py):

- double SUMs go through decimal casts (exact, order-insensitive) and back
  to double; AVG/STDDEV outputs are rounded symmetrically on both sides;
- timestamps leave the query as formatted strings;
- every top-k has a total tie-break order;
- md5 (identical hex in both engines) is the portable hash for dedup /
  MinHash / SimHash oracles; the scale path swaps xxhash64 in.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgforge import textops, vectorops


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None -> driver runs rows-only check


REGISTRY: dict[str, Q] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Q(fn, sql)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(col, scale: int = 2):
    """Exact, order-insensitive SUM of a fixed-point double column -> double.

    The testdata money/quantity columns are exact <=2-decimal values, so the
    decimal cast is lossless in both engines and the sum is exact — immune
    to float accumulation-order differences across engines/parallelism.
    """
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def _exact_stddev(col, scale: int = 2):
    """Sample stddev via exact decimal sums (closed form) — deterministic
    across engines, unlike streaming stddev accumulators."""
    d = col.cast(f"decimal(18,{scale})")
    n = F.count(col).cast("double")
    sx = F.sum(d).cast("double")
    sxx = F.sum(d * d).cast("double")
    return F.when(
        n > 1,
        F.sqrt(F.greatest(F.lit(0.0), (sxx - sx * sx / n) / (n - F.lit(1.0)))),
    ).otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# Relational core (SURVEY.md §2.2, §2.5-2.9)
# ---------------------------------------------------------------------------


@q(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(cast(l_quantity as decimal(18,2)))::double AS sum_qty,
           sum(cast(l_extendedprice as decimal(18,2)))::double AS sum_base_price,
           sum(cast(l_extendedprice as decimal(18,2))
               * cast(1 - l_discount as decimal(18,2)))::double AS sum_disc_price,
           round(sum(cast(l_quantity as decimal(18,2)))::double / count(*), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """Flagship (A3/A15 shape — partial+final hash agg, pushdown-friendly)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                _dec_sum(F.col("l_quantity")) / F.count("*"), 4
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "q02_filter_project",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice BETWEEN 1000 AND 50000
    """,
)
def q02_filter_project(spark, sf_dir):
    """P1-P3: predicate + projection (pushed to the parquet scan)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(1000, 50000)
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


@q(
    "q03_top_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_totalprice
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) = 1
    """,
)
def q03_top_order_per_customer(spark, sf_dir):
    """A8: per-group arg-max via row_number window (top post semantics,
    metrics_calculator.py:56)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_totalprice").alias("top_totalprice"),
        )
    )


@q(
    "q04_weekly_stats",
    """
    WITH weekly AS (
        SELECT event_type,
               strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, count(*) AS n_weeks, sum(n)::bigint AS n_events,
           round(sum(n)::double / count(*), 4) AS avg_weekly,
           round(CASE WHEN count(*) > 1 THEN
               sqrt(greatest(0.0,
                   (sum(n::double * n::double) - sum(n)::double * sum(n)::double / count(*))
                   / (count(*) - 1.0)))
             END, 4) AS stddev_weekly
    FROM weekly GROUP BY event_type
    """,
)
def q04_weekly_stats(spark, sf_dir):
    """A6: two-level agg — weekly counts then mean/std
    (metrics_calculator.py:36-44)."""
    e = t(spark, sf_dir, "events")
    weekly = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
            "week_start"
        ),
    ).agg(F.count("*").alias("n"))
    n = F.count("*").cast("double")
    sx = F.sum("n").cast("double")
    sxx = F.sum(F.col("n").cast("double") * F.col("n").cast("double"))
    return weekly.groupBy("event_type").agg(
        F.count("*").alias("n_weeks"),
        F.sum("n").alias("n_events"),
        F.round(F.sum("n").cast("double") / F.count("*"), 4).alias("avg_weekly"),
        F.round(
            F.when(
                F.count("*") > 1,
                F.sqrt(
                    F.greatest(F.lit(0.0), (sxx - sx * sx / n) / (n - F.lit(1.0)))
                ),
            ),
            4,
        ).alias("stddev_weekly"),
    )


@q(
    "q05_value_stats",
    """
    SELECT event_type,
           round(sum(cast(nullif(value, 0) as decimal(18,2)))::double
                 / count(nullif(value, 0)), 4) AS avg_value,
           round(median(nullif(value, 0)), 4) AS median_value,
           max(value) AS max_value, min(value) AS min_value,
           round(CASE WHEN count(value) > 1 THEN
               sqrt(greatest(0.0,
                   (sum(cast(value as decimal(18,2)) * cast(value as decimal(18,2)))::double
                    - sum(cast(value as decimal(18,2)))::double
                      * sum(cast(value as decimal(18,2)))::double / count(value))
                   / (count(value) - 1.0)))
             END, 3) AS stddev_value,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q05_value_stats(spark, sf_dir):
    """A7: view-stats shape incl. 0->null and exact median
    (metrics_calculator.py:46-57)."""
    e = t(spark, sf_dir, "events")
    nz = F.nullif(F.col("value"), F.lit(0))
    return e.groupBy("event_type").agg(
        F.round(_dec_sum(nz) / F.count(nz), 4).alias("avg_value"),
        F.round(F.median(nz), 4).alias("median_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.round(_exact_stddev(F.col("value")), 3).alias("stddev_value"),
        F.count("*").alias("n"),
    )


@q(
    "q06_monthly_trend",
    """
    SELECT year(ts) AS y, month(ts) AS m,
           round(sum(cast(value as decimal(18,2)))::double / count(value), 4) AS avg_value,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def q06_monthly_trend(spark, sf_dir):
    """A10: calendar-bucketed engagement trend (metrics_calculator.py:91-97)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(F.year("ts").alias("y"), F.month("ts").alias("m")).agg(
        F.round(_dec_sum(F.col("value")) / F.count("value"), 4).alias("avg_value"),
        F.count("*").alias("n_events"),
    )


@q(
    "q07_segment_revenue",
    """
    SELECT c_mktsegment, count(*) AS n_orders,
           sum(cast(o_totalprice as decimal(18,2)))::double AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q07_segment_revenue(spark, sf_dir):
    """J2: broadcast hash join (small dim side explicitly broadcast)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@q(
    "q08_region_rollup",
    """
    SELECT r_name, n_name, count(*) AS n_cust,
           sum(cast(c_acctbal as decimal(18,2)))::double AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q08_region_rollup(spark, sf_dir):
    """A15: grouping-sets/rollup over a two-hop dimension join."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    return j.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_cust"),
        _dec_sum(F.col("c_acctbal")).alias("total_bal"),
    )


@q(
    "q09_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q09_distinct_users(spark, sf_dir):
    """D1/A5: exact distinct (expand-style two-phase agg under AQE)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@q(
    "q10_union_dedup",
    """
    SELECT count(*) AS n_rows, count(DISTINCT o_custkey) AS n_custs
    FROM (SELECT DISTINCT * FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders))
    """,
)
def q10_union_dedup(spark, sf_dir):
    """D2+D4: union-all then exact dedup (the dedup the reference never did
    despite hashing rows — telegram_scraper.py:310)."""
    o = t(spark, sf_dir, "orders")
    u = o.unionByName(o).dropDuplicates()
    return u.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@q(
    "q11_topk_orders",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q11_topk_orders(spark, sf_dir):
    """O3: top-k -> TakeOrderedAndProject (no global sort)."""
    o = t(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(
        10
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@q(
    "q12_dateparts",
    """
    SELECT year(ts) AS y, weekofyear(ts) AS iso_week, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q12_dateparts(spark, sf_dir):
    """F13: date-part derivation (year/ISO week, data_loader.py:50-55)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        F.year("ts").alias("y"), F.weekofyear("ts").alias("iso_week")
    ).agg(F.count("*").alias("n"))


@q(
    "q13_customers_without_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q13_customers_without_orders(spark, sf_dir):
    """left_anti join — the lineage-resume shape (SURVEY.md §2.6)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@q(
    "q14_conditional_agg",
    """
    SELECT l_linestatus,
           sum(cast(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END
               as decimal(18,2)))::double AS returned_qty,
           sum(cast(l_quantity as decimal(18,2)))::double AS total_qty,
           round(sum(cast(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END
                 as decimal(18,2)))::double
                 / sum(cast(l_quantity as decimal(18,2)))::double, 4)
               AS returned_share
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q14_conditional_agg(spark, sf_dir):
    """A2: conditional sum(when(...)) consistency-agg shape
    (data_pipeline.py:267-283)."""
    li = t(spark, sf_dir, "lineitem")
    returned = _dec_sum(
        F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(F.lit(0))
    )
    total = _dec_sum(F.col("l_quantity"))
    return li.groupBy("l_linestatus").agg(
        returned.alias("returned_qty"),
        total.alias("total_qty"),
        F.round(returned / total, 4).alias("returned_share"),
    )


@q(
    "q15_argmax_month",
    """
    WITH m AS (
        SELECT event_type, year(ts) AS y, month(ts) AS mo,
               round(sum(cast(value as decimal(18,2)))::double / count(value), 4) AS avg_value
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, y AS best_year, mo AS best_month, avg_value AS best_avg
    FROM m
    QUALIFY row_number() OVER (
        PARTITION BY event_type ORDER BY avg_value DESC, y, mo
    ) = 1
    """,
)
def q15_argmax_month(spark, sf_dir):
    """O4: arg-max month (best/worst month, metrics_calculator.py:96-97)."""
    e = t(spark, sf_dir, "events")
    m = e.groupBy(
        "event_type", F.year("ts").alias("y"), F.month("ts").alias("mo")
    ).agg(
        F.round(_dec_sum(F.col("value")) / F.count("value"), 4).alias("avg_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("avg_value").desc(), F.col("y"), F.col("mo")
    )
    return (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("y").alias("best_year"),
            F.col("mo").alias("best_month"),
            F.col("avg_value").alias("best_avg"),
        )
    )


@q(
    "q16_lag_delta",
    """
    WITH d AS (
        SELECT event_type,
               cast(value as decimal(18,2)) - lag(cast(value as decimal(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS delta
        FROM events
    )
    SELECT event_type,
           round(sum(delta)::double / count(delta), 4) AS avg_delta,
           count(delta) AS n_deltas
    FROM d GROUP BY event_type
    """,
)
def q16_lag_delta(spark, sf_dir):
    """§2.9 lag/lead window (error-context / prev-tag shape,
    interpret.py:1121-1127)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vdec = F.col("value").cast("decimal(18,2)")
    d = e.withColumn("delta", vdec - F.lag(vdec).over(w))
    return d.groupBy("event_type").agg(
        F.round(F.sum("delta").cast("double") / F.count("delta"), 4).alias(
            "avg_delta"
        ),
        F.count("delta").alias("n_deltas"),
    )


@q(
    "q17_weighted_score",
    """
    WITH stats AS (
        SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer
    ), cnt AS (
        SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey,
           round(least(100.0,
               0.4 * 100.0 * least(1.0, greatest(0.0, (c_acctbal - lo) / (hi - lo)))
             + 0.6 * 100.0 * least(1.0, coalesce(n_orders, 0) / 20.0)
           ), 4) AS lending_score
    FROM (SELECT * FROM customer CROSS JOIN stats) c
    LEFT JOIN cnt ON c_custkey = o_custkey
    """,
)
def q17_weighted_score(spark, sf_dir):
    """F18/F19: clamped min-max normalize + weighted lending score
    (metrics_calculator.py:100-116, weights config/config.py:14-19)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    stats = c.agg(
        F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi")
    )
    cnt = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    # stats is 1 row -> broadcast is always safe. cnt is |customers| rows —
    # fact-cardinality, so NO broadcast hint: let AQE pick (it will broadcast
    # while small and shuffle-join at scale instead of OOMing the driver).
    j = c.crossJoin(F.broadcast(stats)).join(
        cnt, c["c_custkey"] == cnt["o_custkey"], "left"
    )
    bal_norm = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0), (F.col("c_acctbal") - F.col("lo")) / (F.col("hi") - F.col("lo"))
        ),
    )
    ord_norm = F.least(F.lit(1.0), F.coalesce(F.col("n_orders"), F.lit(0)) / F.lit(20.0))
    return j.select(
        "c_custkey",
        F.round(
            F.least(F.lit(100.0), 0.4 * 100.0 * bal_norm + 0.6 * 100.0 * ord_norm), 4
        ).alias("lending_score"),
    )


# ---------------------------------------------------------------------------
# Documents: hashing, regex, tokens, dedup, quality, lang-id (§2.3, brief ops)
# ---------------------------------------------------------------------------


@q(
    "q18_sha256_buckets",
    """
    SELECT substring(sha256(text), 1, 1) AS bucket,
           count(*) AS n, count(DISTINCT sha256(text)) AS n_distinct
    FROM documents GROUP BY 1
    """,
)
def q18_sha256_buckets(spark, sf_dir):
    """F10: sha2(content,256) per-row invariant, bucketed
    (telegram_scraper.py:151-155)."""
    d = t(spark, sf_dir, "documents")
    sha = F.sha2(F.col("text"), 256)
    return d.groupBy(F.substring(sha, 1, 1).alias("bucket")).agg(
        F.count("*").alias("n"),
        F.countDistinct(F.sha2(F.col("text"), 256)).alias("n_distinct"),
    )


@q(
    "q19_regex_extract",
    """
    SELECT tok AS keyword, count(*) AS n
    FROM (SELECT unnest(regexp_extract_all(text, '(spark|join|hash|merge)', 1)) AS tok
          FROM documents)
    GROUP BY tok
    """,
)
def q19_regex_extract(spark, sf_dir):
    """F1-F3 shape: regexp_extract_all -> explode -> count (the entity
    extraction triple, data_cleaner.py:70-79)."""
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit("(spark|join|hash|merge)"), 1)
    return (
        d.select(F.explode(toks).alias("keyword"))
        .groupBy("keyword")
        .agg(F.count("*").alias("n"))
    )


@q(
    "q20_token_counts",
    """
    SELECT tok AS token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY n DESC, token LIMIT 20
    """,
)
def q20_token_counts(spark, sf_dir):
    """F14+A1: tokenize -> explode -> tag-distribution-style count
    (data_pipeline.py:264-265)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@q(
    "q21_exact_dedup",
    """
    SELECT count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_distinct_texts,
           count(*) - count(DISTINCT md5(text)) AS n_dup_docs
    FROM documents
    """,
)
def q21_exact_dedup(spark, sf_dir):
    """Exact dedup via content hash (training-data pipeline op #1)."""
    d = t(spark, sf_dir, "documents")
    md = F.md5(F.col("text"))
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(md).alias("n_distinct_texts"),
        (F.count("*") - F.countDistinct(md)).alias("n_dup_docs"),
    )


_SHINGLE_SQL = """
        list_transform(
            range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
            i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
        )
"""


@q(
    "q22_minhash_lsh",
    f"""
    WITH sigs AS (
        SELECT doc_id, b.band,
               list_aggregate(
                   list_transform({_SHINGLE_SQL},
                                  s -> md5('b' || b.band || '|' || s)),
                   'min') AS sig
        FROM documents, (SELECT unnest([0, 1]) AS band) b
    ), buckets AS (
        SELECT band, sig, count(*) AS n FROM sigs GROUP BY band, sig
    )
    SELECT band, count(*) AS n_buckets,
           sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::bigint AS n_multi_buckets,
           sum(n * (n - 1) / 2)::double AS n_candidate_pairs
    FROM buckets GROUP BY band
    """,
)
def q22_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup blocking: shingle -> banded min-hash ->
    bucket stats (same structure as kgforge.link at scale)."""
    d = t(spark, sf_dir, "documents")
    sh = textops.word_shingles(F.col("text"), 3)
    sigs = None
    for band in (0, 1):
        s = d.select(
            "doc_id",
            F.lit(band).alias("band"),
            textops.minhash_band_sig(sh, band).alias("sig"),
        )
        sigs = s if sigs is None else sigs.unionByName(s)
    buckets = sigs.groupBy("band", "sig").agg(F.count("*").alias("n"))
    return buckets.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_multi_buckets"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("double").alias(
            "n_candidate_pairs"
        ),
    )


@q(
    "q23_ngram_jaccard",
    f"""
    WITH sigs AS (
        SELECT doc_id,
               list_aggregate(
                   list_transform({_SHINGLE_SQL}, s -> md5('b0|' || s)),
                   'min') AS sig
        FROM documents
    ), pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
    ), toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
    ), inter AS (
        SELECT p.a_id, p.b_id, count(*) AS i
        FROM pairs p
        JOIN toks ta ON ta.doc_id = p.a_id
        JOIN toks tb ON tb.doc_id = p.b_id AND tb.tok = ta.tok
        GROUP BY p.a_id, p.b_id
    )
    SELECT i.a_id, i.b_id,
           round(i.i * 1.0 / (sa.n + sb.n - i.i), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.a_id
    JOIN sizes sb ON sb.doc_id = i.b_id
    """,
)
def q23_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup scoring over LSH-blocked pairs only
    (never O(n^2) — the blocked-join scale shape)."""
    d = t(spark, sf_dir, "documents")
    sh = textops.word_shingles(F.col("text"), 3)
    sigs = d.select(
        "doc_id", textops.minhash_band_sig(sh, 0).alias("sig")
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.sig") == F.col("b.sig")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))

    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = toks.alias("ta")
    tb = toks.alias("tb")
    inter = (
        pairs.join(ta, F.col("ta.doc_id") == F.col("a_id"))
        .join(
            tb,
            (F.col("tb.doc_id") == F.col("b_id")) & (F.col("tb.tok") == F.col("ta.tok")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("a_id"))
        .join(sb, F.col("sb.doc_id") == F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i")), 4
            ).alias("jaccard"),
        )
    )


def _simhash_sql() -> str:
    bit_terms = []
    for b in range(16):
        bit_terms.append(
            f"""CASE WHEN list_sum(list_transform(string_split(text, ' '),
                t -> CASE WHEN substring(md5(t), {b + 1}, 1)
                          IN ('1','3','5','7','9','b','d','f')
                     THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END"""
        )
    return " + ".join(bit_terms)


@q(
    "q24_simhash",
    f"""
    SELECT simhash, count(*) AS n
    FROM (SELECT ({_simhash_sql()}) AS simhash FROM documents)
    GROUP BY simhash
    """,
)
def q24_simhash(spark, sf_dir):
    """SimHash near-dup fingerprint (16-bit), histogram by signature."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(textops.simhash16(F.col("text")).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n"))
    )


@q("q41_simhash64_fast", None)
def q41_simhash64_fast(spark, sf_dir):
    """Scale-path SimHash (64-bit, one xxhash64 per token, materialized
    hash array + scalar folds) — the production twin of q24; rows-only
    (DuckDB has no xxhash64). Deterministic. Same-window A/B at sf0.1
    warm (r3 bench artifact): md5 16-bit (q24) 4.76s, xxhash64 16-bit
    (q55) 1.39s (3.4x), xxhash64 64-bit (this) 4.18s — 4x the width for
    3x the 16-bit-fast time, still beating md5 at a quarter the width."""
    d = t(spark, sf_dir, "documents")
    return (
        textops.with_simhash_fast(d, "text")
        .groupBy("simhash")
        .agg(F.count("*").alias("n"))
    )


@q("q55_simhash16_fast", None)
def q55_simhash16_fast(spark, sf_dir):
    """Same-WIDTH hash A/B twin of q24 (VERDICT r2 next-round #9): 16-bit
    SimHash with the xxhash64-materialized shape, so q24 (md5 inline, 16
    folds) vs q55 (xxhash64 precomputed, 16 folds) isolates the HASH cost —
    q41 is the same scale shape at 64-bit width (4x the fold count) and is
    not a like-for-like hash comparison. All three run adjacently in
    bench.py's headline so the A/B lands inside one weather window of one
    artifact. Rows-only (DuckDB has no xxhash64). Deterministic."""
    d = t(spark, sf_dir, "documents")
    return (
        textops.with_simhash_fast(d, "text", bits=16)
        .groupBy("simhash")
        .agg(F.count("*").alias("n"))
    )


@q(
    "q45_stratified_sample",
    """
    SELECT source, count(*) AS n_kept
    FROM documents
    WHERE md5(cast(doc_id AS varchar)) <
          CASE source WHEN 'src0' THEN '8' WHEN 'src1' THEN '4' ELSE '1a' END
    GROUP BY source
    """,
)
def q45_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (training-data domain mixing):
    keep a doc iff md5(doc_id) falls under its source's rate threshold
    (50% / 25% / ~10%) — hash-threshold sampling is reproducible across
    engines, runs, and partitionings, unlike rand()-based TABLESAMPLE, and
    is exactly how corpus mixture weights are applied at 100 TB (pure
    map-side filter, no shuffle)."""
    d = t(spark, sf_dir, "documents")
    thr = (
        F.when(F.col("source") == "src0", F.lit("8"))
        .when(F.col("source") == "src1", F.lit("4"))
        .otherwise(F.lit("1a"))
    )
    return (
        d.filter(F.md5(F.col("doc_id").cast("string")) < thr)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )


@q(
    "q46_sequence_packing",
    """
    WITH sized AS (
        SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT lang, doc_id, n_tokens,
               floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0)::bigint
                 AS pack_id
        FROM sized
    ), packs AS (
        SELECT lang, pack_id, count(*) AS n_docs,
               sum(n_tokens)::bigint AS n_tokens
        FROM packed GROUP BY lang, pack_id
    )
    SELECT lang, count(*) AS n_packs, max(n_tokens) AS max_pack_tokens,
           round(avg(n_docs), 4) AS avg_docs_per_pack
    FROM packs GROUP BY lang
    """,
)
def q46_sequence_packing(spark, sf_dir):
    """Sequence packing (context-window assembly for LLM training): docs
    packed into ~2048-token budgets per language in doc_id order via ONE
    window cumulative sum — pack_id = floor((cumsum - n)/budget). At scale
    the window partitions by (lang, shard) so no global sort exists."""
    d = t(spark, sf_dir, "documents")
    sized = d.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = sized.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0),
    )
    packs = packed.groupBy("lang", "pack_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    return packs.groupBy("lang").agg(
        F.count("*").alias("n_packs"),
        F.max("n_tokens").alias("max_pack_tokens"),
        F.round(F.avg("n_docs"), 4).alias("avg_docs_per_pack"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    shard_col=None,
) -> DataFrame:
    """Sharded sequence packing — the 100 TB path (VERDICT r2 #3).

    ``Window.partitionBy(lang)`` alone gives ONE reducer task per language:
    at corpus scale the dominant language is ~half the rows flowing through
    a single task's sort. Here the window partitions by (lang, shard) with
    shard = pmod(xxhash64(doc_id), n_shards) — n_shards independent sorts
    per language, each ~1/n_shards of the data — and pack ids are made
    unique PER LANGUAGE by offsetting with the shard (shard * 2^40 +
    local id, disjoint within a language because a shard's local ids are
    < 2^40 at any real scale). Two languages sharing a shard reuse the
    same pack_id values, so consumers MUST key on (lang, pack_id) — as
    q46/q50 do (ADVICE r3).
    Packing quality is unchanged: a greedy cumsum pack within any doc
    subset still fills ~budget tokens per pack; only WHICH docs share a
    pack differs from the global order (an explicitly order-free contract
    for pretraining mixes).

    ``shard_col`` overrides the shard expression (the oracle query passes
    ``doc_id % S`` so DuckDB can reproduce the exact assignment; production
    keeps the hash default, which also absorbs adversarial doc_id
    patterns).

    Returns (lang, shard, pack_id, doc_id, n_tokens).
    """
    sized = docs.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    shard = (
        shard_col
        if shard_col is not None
        else F.pmod(F.xxhash64("doc_id"), F.lit(n_shards))
    )
    sized = sized.withColumn("shard", shard.cast("long"))
    w = Window.partitionBy("lang", "shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return sized.withColumn(
        "pack_id",
        F.col("shard") * F.lit(1 << 40)
        + F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / float(budget)),
    )


@q(
    "q50_sequence_packing_sharded",
    """
    WITH sized AS (
        SELECT lang, doc_id, doc_id % 8 AS shard,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT lang, shard, n_tokens,
               shard * 1099511627776
               + floor((sum(n_tokens) OVER (
                     PARTITION BY lang, shard ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0) AS pack_id
        FROM sized
    ), packs AS (
        SELECT lang, pack_id, count(*) AS n_docs,
               sum(n_tokens)::bigint AS n_tokens
        FROM packed GROUP BY lang, pack_id
    )
    SELECT lang, count(*) AS n_packs, max(n_tokens) AS max_pack_tokens,
           round(avg(n_docs), 4) AS avg_docs_per_pack
    FROM packs GROUP BY lang
    """,
)
def q50_sequence_packing_sharded(spark, sf_dir):
    """The sharded (scale-path) packing, oracle-checked: shard = doc_id % 8
    here so DuckDB reproduces the exact assignment; production default is
    pmod(xxhash64(doc_id), S). q46 keeps the single-window twin."""
    d = t(spark, sf_dir, "documents")
    packed = pack_sequences(
        d, budget=2048, n_shards=8, shard_col=F.pmod(F.col("doc_id"), F.lit(8))
    )
    packs = packed.groupBy("lang", "pack_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    return packs.groupBy("lang").agg(
        F.count("*").alias("n_packs"),
        F.max("n_tokens").alias("max_pack_tokens"),
        F.round(F.avg("n_docs"), 4).alias("avg_docs_per_pack"),
    )


def global_shuffle(docs: DataFrame, seed: int = 42, key_col: str = "doc_id") -> DataFrame:
    """Deterministic global training-order shuffle (VERDICT r3 #7) — the
    standard LLM-pipeline op of fixing a reproducible corpus order before
    sequence packing (feeds pack_sequences/q46/q50).

    Order = sort by md5(seed ':' key): a pure function of (seed, row key),
    so the permutation is identical across engines, partition counts, and
    input orders — unlike Spark's own ``rand(seed)``, whose draws depend on
    partition layout. Spark executes ``orderBy`` as a range-partitioned
    distributed sort (sample -> range boundaries -> shuffle -> in-partition
    sort): every partition sorts ~1/N of the corpus, no single-reducer
    stage (plan-asserted in tests). The 100 TB path swaps xxhash64 for md5
    (~3x cheaper per r3's measured A/B, same shape) at the cost of DuckDB
    reproducibility; md5 is the oracle-checkable twin.
    """
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))
    )
    return docs.withColumn("shuffle_key", key).orderBy("shuffle_key", key_col)


@q(
    "q68_global_shuffle",
    """
    WITH keyed AS (
        SELECT doc_id, md5('42:' || doc_id) AS shuffle_key FROM documents
    ), topn AS (
        SELECT doc_id, shuffle_key FROM keyed
        ORDER BY shuffle_key, doc_id LIMIT 50
    )
    SELECT row_number() OVER (ORDER BY shuffle_key, doc_id) AS position,
           doc_id, shuffle_key
    FROM topn
    """,
)
def q68_global_shuffle(spark, sf_dir):
    """Seeded corpus shuffle, oracle-checked: the first 50 docs of the
    seed-42 global order with their positions and keys. The limit keeps
    the oracle row set small; the FULL permutation's determinism (seed
    stability, partitioning invariance, distinct seeds -> distinct orders)
    is property-tested in tests/test_textops.py."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    top = global_shuffle(d, seed=42).limit(50)
    w = Window.orderBy("shuffle_key", "doc_id")
    return top.withColumn("position", F.row_number().over(w)).select(
        "position", "doc_id", "shuffle_key"
    )


_EMAIL_PAT = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_LONGNUM_PAT = r"[0-9]{9,}"
_URL_PAT = r"https?://[^ ]+"

# Irregular (non-floorable) order-value bands: a true range join, not a
# width-division shortcut.
_BANDS = [(0, 900), (900, 2500), (2500, 7000), (7000, 20000), (20000, 10**9)]


@q(
    "q54_range_join_bands",
    f"""
    WITH bands(band_id, lo, hi) AS (VALUES
        {", ".join(f"({i}, {lo}, {hi})" for i, (lo, hi) in enumerate(_BANDS))}
    )
    SELECT band_id, cast(lo AS double) AS lo,
           count(*) AS n_orders,
           sum(cast(o_totalprice AS decimal(18,2)))::double AS sum_price
    FROM orders JOIN bands
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id, lo
    """,
)
def q54_range_join_bands(spark, sf_dir):
    """Range join (an operator Spark lacks natively — the brief's as-of /
    range-join family): each order lands in the irregular value band
    containing its price, via a BROADCAST non-equi join. Scale shape: the
    band table is always tiny -> BroadcastNestedLoopJoin keeps the fact
    side map-only (no shuffle before the band agg); for two LARGE interval
    sets the same semantics would bucket both sides by overlapping coarse
    grid cells first (the q34 blocking discipline)."""
    o = t(spark, sf_dir, "orders").select("o_totalprice")
    bands = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(_BANDS)],
        "band_id int, lo double, hi double",
    )
    j = o.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return j.groupBy("band_id", "lo").agg(
        F.count("*").alias("n_orders"),
        _dec_sum(F.col("o_totalprice")).alias("sum_price"),
    )


def grid_range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    cell: float = 1000.0,
) -> DataFrame:
    """LARGE-LARGE range join via coarse-grid bucketing (VERDICT r3 #8 —
    the documented scale variant q54's broadcast path can't cover).

    Neither side broadcasts: intervals explode to the grid cells they
    overlap (sequence(floor(lo/cell), floor((hi-eps)/cell)) — cheap when
    cell ~ interval width, so each interval lands in O(1) cells), points
    map to exactly ONE cell (floor(v/cell) — no post-join dedup needed),
    and the two sides meet in a shuffled EQUI-join on cell followed by the
    exact lo <= v < hi filter. Plan-asserted: SortMergeJoin, no broadcast,
    no cartesian (tests/test_plans.py). Skewed cells (a hot value range)
    are handled by AQE skew-join the same as any equi-join; cell size
    trades explode factor against per-cell fan-in.
    """
    eps = 1e-9
    # drop empty/inverted intervals BEFORE the sequence: hi <= lo can
    # never match (v >= lo AND v < hi is unsatisfiable), and Spark's
    # sequence(start, stop) with start > stop silently produces a
    # DESCENDING range — an inverted interval would explode into millions
    # of spurious cells (code-review r4)
    cells = intervals.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / cell),
                F.floor((F.col(hi_col) - F.lit(eps)) / cell),
            )
        ),
    )
    pts = points.withColumn("cell", F.floor(F.col(value_col) / cell))
    return pts.join(cells.hint("merge"), "cell").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )


@q(
    "q69_range_join_grid",
    """
    WITH bands AS (
        SELECT i AS band_id, (i * 500)::double AS lo,
               (i * 500 + 2200)::double AS hi
        FROM range(0, 200) t(i)
    )
    SELECT band_id, count(*) AS n_orders,
           sum(cast(o_totalprice AS decimal(18,2)))::double AS sum_price
    FROM orders JOIN bands
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id
    """,
)
def q69_range_join_grid(spark, sf_dir):
    """The large-large range join: 200 overlapping price bands x orders
    through grid_range_join (cell=1000, each band spans ~3 cells), agg per
    band. The DuckDB oracle runs the plain non-equi join — identical
    results prove the grid decomposition is lossless. The Spark side
    deliberately avoids broadcast (merge hint): this is the shape both
    sides keep at fact-scale."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bands = spark.range(0, 200).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 500).cast("double").alias("lo"),
        (F.col("id") * 500 + 2200).cast("double").alias("hi"),
    )
    j = grid_range_join(o, bands, "o_totalprice", cell=1000.0)
    return j.groupBy("band_id").agg(
        F.count("*").alias("n_orders"),
        _dec_sum(F.col("o_totalprice")).alias("sum_price"),
    )


@q(
    "q70_domain_mix_temperature",
    """
    WITH counts AS (
        SELECT source, count(*) AS n_s,
               CAST(round(sqrt(n_s) * 1000000) AS BIGINT) AS w_q
        FROM documents GROUP BY source
    ), tot AS (
        SELECT sum(w_q) AS w_tot_q, sum(n_s) AS n_tot FROM counts
    ), rates AS (
        SELECT source, n_s,
               CAST(round(least(1.0,
                   (w_q / w_tot_q) * (n_tot / 2.0) / n_s) * 1000000)
                    AS BIGINT) AS rate_ppm
        FROM counts, tot
    )
    SELECT r.source, r.n_s, r.rate_ppm, count(*) AS n_kept
    FROM documents d JOIN rates r USING (source)
    WHERE (((d.doc_id % 2147483647) * 48271) % 2147483647) % 1000000
          < r.rate_ppm
    GROUP BY r.source, r.n_s, r.rate_ppm
    """,
)
def q70_domain_mix_temperature(spark, sf_dir):
    """Temperature-weighted domain mixing (the pretraining-mix op behind
    q45's flat-rate sampling): per-source sampling rates DERIVED from the
    data — weight w_s = n_s^T with T=0.5 (sqrt upsamples rare sources,
    the standard multilingual/multi-domain reweighting), target half the
    corpus, rate_s = min(1, share_s * N_target / n_s) quantized to ppm so
    the keep decision is an exact INTEGER comparison in both engines.
    Keep iff lehmer_hash(doc_id) ppm-bucket < rate_ppm: deterministic
    across engines/partitionings like q45, but with the rate table
    computed from a tiny per-source agg that is broadcast back — the
    corpus side stays one map-side filter (no shuffle of the 100 TB fact
    table). The hash is a MINSTD Lehmer step ((id mod 2^31-1) * 48271
    mod 2^31-1): every intermediate fits int64 for ANY doc_id (the
    earlier Knuth multiply overflowed past doc_id ~3.5e9 — wrapping in
    Spark, erroring in DuckDB; code-review r4). Ids 2^31-1 apart share a
    keep decision — irrelevant statistically at trillion-doc scale, and
    production swaps xxhash64 for the Lehmer step anyway.

    Determinism (ADVICE r4): the temperature weights are quantized to
    integer micros (w_q = round(sqrt(n_s)*1e6), never a .5 boundary since
    sqrt(int) is either irrational or integral) BEFORE summing, so w_tot
    is an exact integer sum — order-independent across Spark partial-agg
    order, DuckDB scan order, and reruns. The old sum(sqrt(n_s)) was an
    order-dependent float reduction that could flip a rate_ppm landing
    within an ulp of a rounding boundary."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count("*").alias("n_s")).withColumn(
        "w_q", F.round(F.sqrt("n_s") * 1000000).cast("long")
    )
    tot = counts.agg(
        F.sum("w_q").alias("w_tot_q"), F.sum("n_s").alias("n_tot")
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.col("w_q") / F.col("w_tot_q"))
                    * (F.col("n_tot") / F.lit(2.0))
                    / F.col("n_s"),
                )
                * 1000000
            )
            .cast("long")
            .alias("rate_ppm"),
        )
    )
    h = (
        ((F.col("doc_id") % F.lit(2147483647)) * F.lit(48271))
        % F.lit(2147483647)
    ) % F.lit(1000000)
    kept = d.join(F.broadcast(rates), "source").filter(h < F.col("rate_ppm"))
    return kept.groupBy("source", "n_s", "rate_ppm").agg(
        F.count("*").alias("n_kept")
    )


@q(
    "q71_embedding_quantize_int8",
    """
    WITH q AS (
        SELECT vec_id, label,
               list_min(embedding)::double AS zero_point,
               (list_max(embedding)::double - list_min(embedding)::double)
                   / 255.0 AS scale,
               list_sum(list_transform(embedding, x ->
                   CASE WHEN list_max(embedding) = list_min(embedding)
                        THEN 0.0
                        ELSE round((x::double - list_min(embedding)::double) /
                             ((list_max(embedding)::double
                               - list_min(embedding)::double) / 255.0))
                   END
               ))::bigint AS qsum
        FROM embeddings
    )
    SELECT label, count(*) AS n_vecs,
           sum(qsum)::bigint AS total_qsum,
           round(avg(scale), 6) AS avg_scale,
           round(avg(zero_point), 6) AS avg_zero
    FROM q GROUP BY label
    """,
)
def q71_embedding_quantize_int8(spark, sf_dir):
    """Per-vector affine int8 quantization (the storage/ANN-compression
    op for embedding tables at 100 TB): scale=(max-min)/255, zero=min,
    q_i = round((x_i-zero)/scale) — all inside Catalyst array expressions
    (aggregate/transform), zero Python, map-only until the per-label agg.
    The per-vector quantized checksum (exact integer) makes every element
    of every vector part of the verified result. Elementwise double math
    is engine-deterministic (no accumulation-order dependence; qsum is a
    sum of exact small integers)."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    vmin = F.array_min(emb).cast("double")
    vmax = F.array_max(emb).cast("double")
    scale = (vmax - vmin) / F.lit(255.0)
    # constant vector -> scale 0: quantized value defined as 0 (every
    # element equals the zero point); without the guard Spark folds NaN
    # to 0 while DuckDB yields NULL — an engine mismatch (code-review r4)
    qelem = lambda x: F.when(  # noqa: E731
        vmax == vmin, F.lit(0.0)
    ).otherwise(F.round((x.cast("double") - vmin) / scale))
    qsum = F.aggregate(
        F.transform(emb, qelem), F.lit(0.0), lambda acc, v: acc + v
    ).cast("long")
    per_vec = e.select(
        "vec_id",
        "label",
        vmin.alias("zero_point"),
        scale.alias("scale"),
        qsum.alias("qsum"),
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum("qsum").alias("total_qsum"),
        F.round(F.avg("scale"), 6).alias("avg_scale"),
        F.round(F.avg("zero_point"), 6).alias("avg_zero"),
    )


@q(
    "q56_decontamination",
    f"""
    WITH eval_ngrams AS (
        SELECT DISTINCT unnest({_SHINGLE_SQL}) AS ngram
        FROM documents WHERE doc_id % 97 = 0
    ), doc_ngrams AS (
        SELECT DISTINCT doc_id, unnest({_SHINGLE_SQL}) AS ngram
        FROM documents WHERE doc_id % 97 <> 0
    )
    SELECT d.doc_id, count(*) AS hits
    FROM doc_ngrams d JOIN eval_ngrams e USING (ngram)
    GROUP BY d.doc_id
    """,
)
def q56_decontamination(spark, sf_dir):
    """Benchmark decontamination (training-data hygiene): flag corpus
    documents sharing 3-word n-grams with a deterministic held-out "eval
    set" (doc_id % 97 == 0 stands in for the benchmark). Eval n-gram set
    is broadcast — corpus side stays map-only until the per-doc hit count.
    See textops.decontaminate_hits for the 100 TB shape."""
    d = t(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return textops.decontaminate_hits(
        d.filter(~is_eval), d.filter(is_eval), k=3, min_hits=1
    )


@q(
    "q57_tfidf_top_terms",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT doc_id, term,
               round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1), 4) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rk FROM (
        SELECT doc_id, term, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def q57_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per document (keyword extraction / vocab-building
    text analysis). Smoothed IDF = ln((N+1)/(df+1)) + 1; scores ROUNDED to
    4dp BEFORE ranking in both engines so the rank is engine-portable
    (ties broken by term). Scale shape: tf and df are partial-agg-friendly
    groupBys on (doc, term)/(term); the corpus count N joins in as a
    broadcast single-row cross join (never a collect); top-3 via
    per-doc-partitioned row_number — Catalyst turns the filter into
    WindowGroupLimit (partial top-k before the shuffle)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(textops.tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    total = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


@q(
    "q52_url_boilerplate",
    f"""
    WITH aug AS (
        SELECT doc_id, lang,
               text || CASE WHEN doc_id % 5 = 0
                    THEN ' see https://ex.org/p/' || cast(doc_id AS varchar)
                         || ' and http://m.ex.org/' || cast(doc_id AS varchar)
                    ELSE '' END AS text
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           sum(len(regexp_extract_all(text, '{_URL_PAT}')))::bigint AS n_urls,
           sum(CASE WHEN regexp_matches(text, '{_URL_PAT}')
                    THEN 1 ELSE 0 END)::bigint AS n_docs_with_url,
           sum(length(regexp_replace(text, '{_URL_PAT}', '', 'g'))
               - length(text))::bigint AS stripped_delta
    FROM aug GROUP BY lang
    """,
)
def q52_url_boilerplate(spark, sf_dir):
    """URL extraction + boilerplate stripping (training-data hygiene, the
    C4-style cleanup pass): per language, count URLs, URL-bearing docs, and
    the character delta after stripping. The synthetic corpus is URL-free,
    so every 5th doc is deterministically augmented (q47's technique).
    Pure Catalyst regexp, map-side before the one lang agg."""
    d = t(spark, sf_dir, "documents")
    aug = d.select(
        "lang",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" see https://ex.org/p/"),
                    F.col("doc_id").cast("string"),
                    F.lit(" and http://m.ex.org/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    stripped = F.regexp_replace(F.col("text"), _URL_PAT, "")
    return aug.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(_URL_PAT), 0))).alias(
            "n_urls"
        ),
        F.sum(
            F.when(F.col("text").rlike(_URL_PAT), 1).otherwise(0)
        ).alias("n_docs_with_url"),
        F.sum(F.length(stripped) - F.length("text")).alias("stripped_delta"),
    )


@q(
    "q53_repetition_ratio",
    """
    WITH r AS (
        SELECT lang,
               1.0 - len(list_distinct(string_split(text, ' ')))::double
                     / len(string_split(text, ' ')) AS rep
        FROM documents
    )
    SELECT lang, round(avg(rep), 4) AS avg_repetition,
           round(max(rep), 4) AS max_repetition,
           sum(CASE WHEN rep > 0.2 THEN 1 ELSE 0 END)::bigint AS n_repetitive
    FROM r GROUP BY lang
    """,
)
def q53_repetition_ratio(spark, sf_dir):
    """Token-repetition ratio (Gopher-style quality gate): 1 -
    distinct/total whitespace tokens per doc, aggregated per language with
    a >0.2 repetitive-doc count. Map-side arrays, one agg shuffle."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    rep = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    r = d.select("lang", rep.alias("rep"))
    return r.groupBy("lang").agg(
        F.round(F.avg("rep"), 4).alias("avg_repetition"),
        F.round(F.max("rep"), 4).alias("max_repetition"),
        F.sum(F.when(F.col("rep") > 0.2, 1).otherwise(0)).alias("n_repetitive"),
    )


@q(
    "q75_countmin_heavy_hitters",
    """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), exact AS (
        SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok
    ), cm AS (
        SELECT d, substr(md5(d || ':' || tok), 1, 2) AS bucket,
               count(*) AS bucket_n
        FROM toks, (SELECT unnest([0, 1, 2]) AS d)
        GROUP BY d, bucket
    ), topk AS (
        SELECT tok, exact_n FROM exact
        ORDER BY exact_n DESC, tok LIMIT 10
    )
    SELECT t.tok, t.exact_n,
           min(c.bucket_n)::bigint AS est_n,
           (min(c.bucket_n) - t.exact_n)::bigint AS overcount
    FROM topk t JOIN cm c
      ON c.bucket = substr(md5(c.d || ':' || t.tok), 1, 2)
    GROUP BY t.tok, t.exact_n
    """,
)
def q75_countmin_heavy_hitters(spark, sf_dir):
    """Count-min sketch heavy hitters — the third mergeable sketch next to
    q58 (quantiles) and q59 (distinct): token frequencies collapse into a
    depth=3 x width=256 counter grid (bucket = 2-hex-char md5 prefix, so
    the whole construction is engine-portable and HASH-verified, unlike
    typical binary sketch blobs), estimate = min over depths of the
    token's bucket count. At 100 TB the grid is 768 partially-aggregated
    counters — mergeable map-side state where an exact token count would
    shuffle the full vocabulary; the top-10 exact counts ride along so the
    result exposes the one-sided overcount (est >= exact always, bounded
    by pytest)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_n"))
    depths = spark.range(3).select(F.col("id").cast("int").alias("d"))
    bucket_of = lambda dcol, tokcol: F.substring(  # noqa: E731
        F.md5(F.concat(dcol.cast("string"), F.lit(":"), tokcol)), 1, 2
    )
    cm = (
        toks.crossJoin(F.broadcast(depths))
        .groupBy("d", bucket_of(F.col("d"), F.col("tok")).alias("bucket"))
        .agg(F.count("*").alias("bucket_n"))
    )
    topk = exact.orderBy(F.col("exact_n").desc(), "tok").limit(10)
    probed = topk.join(
        F.broadcast(cm),
        F.col("bucket") == bucket_of(F.col("d"), F.col("tok")),
    )
    return probed.groupBy("tok", "exact_n").agg(
        F.min("bucket_n").alias("est_n"),
        (F.min("bucket_n") - F.col("exact_n")).alias("overcount"),
    )


@q(
    "q74_cdc_upsert",
    """
    WITH updates AS (
        SELECT o_custkey
               + CASE WHEN o_custkey % 5 = 0 THEN 1000000 ELSE 0 END AS key,
               sum(cast(o_totalprice AS decimal(18,2)))::double AS new_balance
        FROM orders GROUP BY key
    ), merged AS (
        SELECT coalesce(u.key, c.c_custkey) AS key,
               CASE WHEN u.key IS NOT NULL AND c.c_custkey IS NOT NULL
                        THEN 'updated'
                    WHEN u.key IS NOT NULL THEN 'inserted'
                    ELSE 'unchanged' END AS status,
               coalesce(u.new_balance, cast(c.c_acctbal AS double))
                   AS balance
        FROM updates u FULL OUTER JOIN customer c ON u.key = c.c_custkey
    )
    SELECT status, count(*) AS n_rows,
           sum(cast(balance AS decimal(18,2)))::double AS sum_balance
    FROM merged GROUP BY status
    """,
)
def q74_cdc_upsert(spark, sf_dir):
    """MERGE / CDC upsert semantics, Spark-native (the lakehouse pattern
    behind Iceberg/Delta MERGE INTO, expressed as full-outer-join +
    coalesce since no table format runtime ships in this sandbox — the
    materialize seam in kgforge.materialize is where MERGE INTO plugs
    in): a change set (per-customer order totals, with %5==0 keys shifted
    to simulate NEW entities) upserted into the customer dim; rows
    classified updated / inserted / unchanged with balance checksums.
    Scale shape: one shuffle join co-partitioned on the merge key — at
    warehouse scale the same plan with partition pruning on the target."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    updates = (
        o.withColumn(
            "key",
            F.col("o_custkey")
            + F.when(F.col("o_custkey") % 5 == 0, 1000000).otherwise(0),
        )
        .groupBy("key")
        .agg(_dec_sum(F.col("o_totalprice")).alias("new_balance"))
    )
    merged = updates.join(
        c, updates["key"] == c["c_custkey"], "full_outer"
    ).select(
        F.coalesce(updates["key"], c["c_custkey"]).alias("key"),
        F.when(
            updates["key"].isNotNull() & c["c_custkey"].isNotNull(), "updated"
        )
        .when(updates["key"].isNotNull(), "inserted")
        .otherwise("unchanged")
        .alias("status"),
        F.coalesce(
            updates["new_balance"], c["c_acctbal"].cast("double")
        ).alias("balance"),
    )
    return merged.groupBy("status").agg(
        F.count("*").alias("n_rows"),
        _dec_sum(F.col("balance")).alias("sum_balance"),
    )


@q(
    "q72_duplicated_window_ratio",
    f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest({_SHINGLE_SQL}) AS ngram
        FROM documents
    ), hot AS (
        SELECT ngram FROM sh GROUP BY ngram
        HAVING count(DISTINCT doc_id) >= 2
    ), per_doc AS (
        SELECT s.doc_id, count(*) AS n_windows,
               sum(CASE WHEN h.ngram IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
        FROM sh s LEFT JOIN hot h USING (ngram)
        GROUP BY s.doc_id
    )
    SELECT d.lang,
           round(avg(n_dup * 1.0 / n_windows), 4) AS avg_dup_ratio,
           sum(CASE WHEN n_dup * 2 >= n_windows THEN 1 ELSE 0 END)::bigint
               AS n_mostly_dup
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """,
)
def q72_duplicated_window_ratio(spark, sf_dir):
    """Within-corpus duplicated-text measurement (the corpus-level view of
    exact substring dedup, Lee et al.'s diagnostic): per doc, the fraction
    of its distinct 3-word windows that also occur in >=2 distinct docs;
    per-language average + count of mostly-duplicated docs. Scale shape:
    per-doc DISTINCT shingles map-side (array_distinct before explode),
    hot-window set via partial-agg groupBy, then one shuffled equi-join on
    ngram — never a doc-to-doc self-join; the hot set is data-sized, so no
    broadcast (unlike q56, whose eval side is tiny by construction)."""
    d = t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(textops.word_shingles(F.col("text"), 3))
        ).alias("ngram"),
    )
    hot = (
        sh.groupBy("ngram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("ngram", F.lit(1).alias("is_dup"))
    )
    per_doc = (
        sh.join(hot, "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup"),
        )
    )
    return (
        per_doc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.round(F.avg(F.col("n_dup") / F.col("n_windows")), 4).alias(
                "avg_dup_ratio"
            ),
            F.sum(
                F.when(F.col("n_dup") * 2 >= F.col("n_windows"), 1).otherwise(0)
            ).alias("n_mostly_dup"),
        )
    )


@q(
    "q73_quality_filter_funnel",
    f"""
    WITH feats AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_tokens,
               1.0 - len(list_distinct(string_split(text, ' ')))::double
                     / len(string_split(text, ' ')) AS rep,
               len(regexp_extract_all(text, '{_URL_PAT}')) AS n_urls
        FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           sum(CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END)::bigint AS n_too_short,
           sum(CASE WHEN rep > 0.2 THEN 1 ELSE 0 END)::bigint AS n_repetitive,
           sum(CASE WHEN n_urls >= 1 THEN 1 ELSE 0 END)::bigint AS n_url_heavy,
           sum(CASE WHEN n_tokens >= 10 AND rep <= 0.2 AND n_urls = 0
                    THEN 1 ELSE 0 END)::bigint AS n_kept
    FROM feats GROUP BY lang
    """,
)
def q73_quality_filter_funnel(spark, sf_dir):
    """C4-style quality-filter FUNNEL: the composed keep/drop decision a
    production corpus cleaner makes (too-short OR repetitive OR URL-heavy
    -> drop), with per-language counts for every reason plus the docs
    surviving all gates. One pass, all-Catalyst (split/array_distinct/
    regexp_extract_all), single agg shuffle — the full filter chain costs
    the same as any one of its members at 100 TB."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    rep = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    n_urls = F.size(F.regexp_extract_all("text", F.lit(_URL_PAT), 0))
    feats = d.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        rep.alias("rep"),
        n_urls.alias("n_urls"),
    )
    keep = (
        (F.col("n_tokens") >= 10) & (F.col("rep") <= 0.2) & (F.col("n_urls") == 0)
    )
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_tokens") < 10, 1).otherwise(0)).alias("n_too_short"),
        F.sum(F.when(F.col("rep") > 0.2, 1).otherwise(0)).alias("n_repetitive"),
        F.sum(F.when(F.col("n_urls") >= 1, 1).otherwise(0)).alias("n_url_heavy"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
    )


@q(
    "q47_pii_redaction",
    f"""
    WITH aug AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 7 = 0
                    THEN ' contact user' || cast(doc_id AS varchar)
                         || '@example.com or call 09' || cast(doc_id AS varchar)
                         || '1234567'
                    ELSE '' END AS text
        FROM documents
    )
    SELECT count(*) AS n_docs,
           sum(len(regexp_extract_all(text, '{_EMAIL_PAT}')))::bigint AS n_emails,
           sum(len(regexp_extract_all(text, '{_LONGNUM_PAT}')))::bigint AS n_longnums,
           sum(CASE WHEN regexp_replace(regexp_replace(text,
                     '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                     '{_LONGNUM_PAT}', '<NUM>', 'g') <> text
                    THEN 1 ELSE 0 END)::bigint AS n_redacted_docs
    FROM aug
    """,
)
def q47_pii_redaction(spark, sf_dir):
    """PII scrubbing (training-data hygiene): email + long-number redaction
    via regexp_replace chains, counted per corpus. The synthetic corpus is
    PII-free, so a deterministic augmentation (every 7th doc gets an email
    + phone) makes the oracle non-trivial. Pure Catalyst, map-only."""
    d = t(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"), F.col("doc_id").cast("string"),
                    F.lit("@example.com or call 09"),
                    F.col("doc_id").cast("string"), F.lit("1234567"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_PAT, "<EMAIL>"),
        _LONGNUM_PAT,
        "<NUM>",
    )
    return aug.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(_EMAIL_PAT), 0))).alias(
            "n_emails"
        ),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(_LONGNUM_PAT), 0))).alias(
            "n_longnums"
        ),
        F.sum(F.when(redacted != F.col("text"), 1).otherwise(0)).alias(
            "n_redacted_docs"
        ),
    )


@q(
    "q48_length_percentiles",
    """
    SELECT lang,
           round(quantile_cont(n_chars, 0.5), 4) AS p50,
           round(quantile_cont(n_chars, 0.9), 4) AS p90,
           round(quantile_cont(n_chars, 0.99), 4) AS p99,
           max(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def q48_length_percentiles(spark, sf_dir):
    """Exact length percentiles per language (corpus QC): Spark
    percentile() and DuckDB quantile_cont share the linear-interpolation
    definition, so the oracle is exact. At 100 TB swap percentile_approx
    (t-digest) in — deliberately NOT oracle'd (algorithm-dependent)."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 4).alias("p99"),
        F.max("n_chars").alias("max_chars"),
    )


@q("q58_sketch_percentiles", None)
def q58_sketch_percentiles(spark, sf_dir):
    """The 100 TB percentile path q48's docstring promises: mergeable
    sketch quantiles via percentile_approx (Greenwald-Khanna variant,
    accuracy 10000 -> max rank error 1e-4). One partial-agg pass, constant
    state per partition — an exact percentile at 100 TB needs a full sort
    per group, a sketch needs one mergeable summary. Rows-only by design:
    sketch outputs are algorithm-dependent (DuckDB's approx_quantile uses
    t-digest), so cross-engine value equality is the WRONG check — the
    pytest asserts each sketch value within rank tolerance of the exact
    q48 percentile instead."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.percentile_approx("n_chars", F.lit(0.9), F.lit(10000)).alias("p90"),
        F.percentile_approx("n_chars", F.lit(0.99), F.lit(10000)).alias("p99"),
        F.count("*").alias("n_docs"),
    )


@q("q59_hll_distinct", None)
def q59_hll_distinct(spark, sf_dir):
    """Sketch-family distinct counting: Apache DataSketches HLL via
    hll_sketch_agg/hll_sketch_estimate (mergeable across partitions and
    across DAYS — the streaming/incremental path that exact countDistinct
    cannot give at 100 TB) next to approx_count_distinct (HyperLogLog++)
    and the exact count as the in-row reference. Rows-only: estimates are
    algorithm/seed-dependent across engines; the pytest bounds relative
    error instead (HLL lgK=12 standard error ~1.6%)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "hll_users"
        ),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@q(
    "q60_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           sum(cast(props->>'k' AS bigint))::bigint AS sum_k,
           round(avg(cast(props->>'k' AS bigint)), 4) AS avg_k,
           max(cast(props->>'k' AS bigint)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q60_json_extract(spark, sf_dir):
    """Semi-structured JSON column surface (events.props is a JSON string):
    get_json_object path extraction -> typed aggregation. At scale prefer
    from_json with an explicit schema once per query (single parse,
    columnar) over repeated path probes; both stay JVM-side (Jackson), no
    Python. Map-side parse, one agg shuffle."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@q(
    "q61_cube_grouping",
    """
    SELECT event_type,
           year(ts) AS yr,
           2 * grouping(event_type) + grouping(year(ts)) AS gid,
           count(*) AS n,
           sum(cast(value AS decimal(18,2)))::double AS sum_value
    FROM events
    GROUP BY CUBE (event_type, year(ts))
    """,
)
def q61_cube_grouping(spark, sf_dir):
    """CUBE with grouping_id (multi-dimensional OLAP summary — all four
    (event_type, year) marginal combinations in ONE pass over the fact
    table instead of four scans; Spark expands grouping sets before the
    partial agg so it is still a single shuffle). grouping_id bit order
    matches 2*GROUPING(a)+GROUPING(b) in DuckDB."""
    e = t(spark, sf_dir, "events").select(
        "event_type", F.year("ts").alias("yr"), "value"
    )
    return e.cube("event_type", "yr").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
        _dec_sum(F.col("value")).alias("sum_value"),
    )


@q(
    "q62_intersect_except",
    """
    SELECT user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click' AND value > 100
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'view' AND value > 100
    )
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 100
    """,
)
def q62_intersect_except(spark, sf_dir):
    """Set-operator surface: users with a high-value click AND a high-value
    view but no high-value purchase (threshold chosen so every branch
    eliminates rows at both test scales). INTERSECT/EXCEPT compile to
    distinct + left-semi/left-anti hash joins on the same key — one shuffle
    partitioning reused across all three branches at scale."""
    e = t(spark, sf_dir, "events").filter(F.col("value") > 100)
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(views).subtract(buys)


@q(
    "q63_unpivot_metrics",
    """
    WITH agg AS (
        SELECT l_returnflag,
               sum(cast(l_quantity AS decimal(18,2)))::double AS qty,
               sum(cast(l_extendedprice AS decimal(18,2)))::double AS price,
               sum(cast(l_discount AS decimal(18,2)))::double AS disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag, 'qty' AS metric, qty AS value FROM agg
        UNION ALL
        SELECT l_returnflag, 'price', price FROM agg
        UNION ALL
        SELECT l_returnflag, 'disc', disc FROM agg
    )
    """,
)
def q63_unpivot_metrics(spark, sf_dir):
    """Wide-to-long unpivot (the inverse of q38's pivot) via ``stack`` —
    per-flag metric columns melt into (flag, metric, value) rows. stack is
    a generator expression evaluated map-side post-agg: no extra shuffle
    beyond the agg itself."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        _dec_sum(F.col("l_quantity")).alias("qty"),
        _dec_sum(F.col("l_extendedprice")).alias("price"),
        _dec_sum(F.col("l_discount")).alias("disc"),
    )
    return agg.select(
        "l_returnflag",
        F.expr("stack(3, 'qty', qty, 'price', price, 'disc', disc)").alias(
            "metric", "value"
        ),
    )


@q(
    "q64_gap_fill_locf",
    """
    WITH bounds AS (
        SELECT min(date_trunc('day', ts))::date AS d0,
               max(date_trunc('day', ts))::date AS d1
        FROM events
    ), days AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::date AS day
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), daily AS (
        SELECT event_type, date_trunc('day', ts)::date AS day,
               sum(cast(value AS decimal(18,2)))::double AS daily_value,
               count(*) AS n_events
        FROM events WHERE value > 200 GROUP BY event_type, day
    ), spine AS (
        SELECT event_type, day FROM types CROSS JOIN days
    )
    SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(d.n_events, 0) AS n_events,
           last_value(d.daily_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.day
               ROWS UNBOUNDED PRECEDING) AS locf_value
    FROM spine s LEFT JOIN daily d USING (event_type, day)
    """,
)
def q64_gap_fill_locf(spark, sf_dir):
    """Time-series gap fill: a generated date spine (sequence + explode —
    never a driver-side loop) cross-joined with the dimension, left-joined
    to sparse daily aggregates (value > 200 keeps 30-90% of cells empty at
    test scales), then last-observation-carried-forward via
    last(ignorenulls) over an ordered window. Scale shape: the spine is
    tiny (days x types) and BROADCAST; the fact side sees one agg shuffle
    and the LOCF window partitions by series key — embarrassingly parallel
    across series. Leading gaps before a series' first observation stay
    NULL in both engines."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("value") > 200)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            _dec_sum(F.col("value")).alias("daily_value"),
            F.count("*").alias("n_events"),
        )
    )
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = e.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(days))
    filled = spine.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # day emitted as yyyy-MM-dd string: the cross-engine comparator
    # stringifies DATE and TIMESTAMP differently
    return filled.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("daily_value", ignorenulls=True).over(w).alias("locf_value"),
    )


@q(
    "q65_dedup_keep_best",
    """
    WITH keyed AS (
        SELECT doc_id, n_chars,
               array_to_string((string_split(text, ' '))[1:5], ' ') AS dkey
        FROM documents
    ), ranked AS (
        SELECT doc_id, n_chars, dkey,
               row_number() OVER (
                   PARTITION BY dkey ORDER BY n_chars DESC, doc_id) AS rk,
               count(*) OVER (PARTITION BY dkey) AS group_size
        FROM keyed
    )
    SELECT doc_id, n_chars, group_size
    FROM ranked WHERE rk = 1
    """,
)
def q65_dedup_keep_best(spark, sf_dir):
    """Quality-aware dedup: among documents sharing a 5-token prefix
    fingerprint (title/URL-prefix-style key — 24 real collisions at test
    scale), KEEP THE BEST copy (longest, tie by min doc_id) rather than an
    arbitrary one — the policy real training pipelines want (drop the
    truncated scrape, keep the full page). One window over the key
    partitioning does rank + group size in a single shuffle; at 100 TB the
    same shape runs per near-dup CLUSTER (q93's CC output) with a learned
    quality score in place of length."""
    d = t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5)).alias("dkey"),
    )
    wk = Window.partitionBy("dkey")
    ranked = keyed.select(
        "doc_id",
        "n_chars",
        F.row_number()
        .over(wk.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .alias("rk"),
        F.count("*").over(wk).alias("group_size"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "doc_id", "n_chars", "group_size"
    )


@q(
    "q67_cogroup_funnel",
    """
    WITH clicks AS (
        SELECT user_id, min(ts) AS first_click
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ), buys AS (
        SELECT e.user_id, min(e.ts) AS first_buy
        FROM events e JOIN clicks c
          ON e.user_id = c.user_id AND e.ts > c.first_click
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT c.user_id,
           epoch_us(c.first_click) AS first_click_us,
           epoch_us(b.first_buy) AS first_buy_us,
           epoch_us(b.first_buy) - epoch_us(c.first_click) AS lag_us
    FROM clicks c LEFT JOIN buys b USING (user_id)
    """,
)
def q67_cogroup_funnel(spark, sf_dir):
    """Cogrouped applyInPandas (the remaining pandas-API entry point):
    per-user funnel reconciliation — first click, first purchase strictly
    AFTER that click, and the lag — computed by cogrouping the click and
    purchase streams on user_id and merging each pair of per-user frames
    in one Python function. The ORACLE is plain SQL (min + conditional
    join), so the cogroup path is hash-verified, not rows-only. Scale
    shape: one co-partitioned shuffle of both sides on the key, then
    embarrassingly parallel per-key Arrow batches; the per-key python
    work is O(events of that user). Epoch microseconds emitted as longs
    (cross-engine timestamp stringification differs)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")

    def merge(key, cdf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty:
            return pd.DataFrame(
                columns=["user_id", "first_click_us", "first_buy_us", "lag_us"]
            )
        first_click = cdf["ts"].min()
        after = bdf[bdf["ts"] > first_click]
        fc_us = first_click.value // 1000
        if after.empty:
            fb_us = None
            lag = None
        else:
            fb_us = after["ts"].min().value // 1000
            lag = fb_us - fc_us
        return pd.DataFrame(
            [(key[0], fc_us, fb_us, lag)],
            columns=["user_id", "first_click_us", "first_buy_us", "lag_us"],
        )

    return clicks.groupBy("user_id").cogroup(buys.groupBy("user_id")).applyInPandas(
        merge,
        schema="user_id long, first_click_us long, first_buy_us long, lag_us long",
    )


@q(
    "q25_quality_scores",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           round((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                 / len(string_split(text, ' ')), 4) AS avg_token_len,
           round(len(list_filter(string_split(text, ' '),
                     t -> t IN ('the','a','of','and','to','in','is','it'))) * 1.0
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           round(least(100.0, greatest(0.0,
               least(1.0, len(string_split(text, ' ')) / 100.0) * 50.0
             + (len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','of','and','to','in','is','it'))) * 1.0
                / len(string_split(text, ' '))) * 30.0
             + least(1.0, ((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                           / len(string_split(text, ' '))) / 10.0) * 20.0
           )), 4) AS quality_score
    FROM documents
    """,
)
def q25_quality_scores(spark, sf_dir):
    """Quality scoring: length/stopword/token-shape features + clamped
    weighted score (F18/F19 semantics over documents)."""
    return textops.quality_features(t(spark, sf_dir, "documents"))


@q(
    "q26_lang_id",
    """
    WITH scored AS (
        SELECT lang,
               len(list_filter(string_split(text,' '), t -> t IN ('the','a','and'))) AS s_en,
               len(list_filter(string_split(text,' '), t -> t IN ('el','la','de'))) AS s_es,
               len(list_filter(string_split(text,' '), t -> t IN ('der','die','das'))) AS s_de,
               len(list_filter(string_split(text,' '), t -> t IN ('le','la','et'))) AS s_fr
        FROM documents
    )
    SELECT lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS predicted,
           count(*) AS n
    FROM scored GROUP BY 1, 2
    """,
)
def q26_lang_id(spark, sf_dir):
    """Language-ID heuristic (marker stopword counts) — confusion matrix
    against the table's lang column."""
    d = t(spark, sf_dir, "documents")
    s = textops.lang_scores(F.col("text"))
    scored = d.select(
        "lang",
        s["en"].alias("s_en"),
        s["es"].alias("s_es"),
        s["de"].alias("s_de"),
        s["fr"].alias("s_fr"),
    )
    predicted = (
        F.when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr")),
            F.lit("en"),
        )
        .when(
            (F.col("s_es") >= F.col("s_de")) & (F.col("s_es") >= F.col("s_fr")),
            F.lit("es"),
        )
        .when(F.col("s_de") >= F.col("s_fr"), F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return scored.groupBy("lang", predicted.alias("predicted")).agg(
        F.count("*").alias("n")
    )


@q(
    "q27_fingerprint",
    f"""
    SELECT doc_id,
           list_aggregate(
               list_transform({_SHINGLE_SQL}, s -> md5('b0|' || s)), 'min'
           ) AS fingerprint
    FROM documents
    """,
)
def q27_fingerprint(spark, sf_dir):
    """Document fingerprinting: min-hash-of-shingles (winnowing-lite)."""
    d = t(spark, sf_dir, "documents")
    sh = textops.word_shingles(F.col("text"), 3)
    return d.select(
        "doc_id", textops.minhash_band_sig(sh, 0).alias("fingerprint")
    )


@q(
    "q28_token_totals",
    r"""
    SELECT sum(len(string_split(text, ' ')))::bigint AS total_ws_tokens,
           sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))::bigint AS total_bpe_tokens,
           count(*) AS n_docs
    FROM documents
    """,
)
def q28_token_totals(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex segmentation totals."""
    d = t(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " "))
    bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    )
    return d.agg(
        F.sum(ws).alias("total_ws_tokens"),
        F.sum(bpe).alias("total_bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Embeddings: similarity search (brief ops)
# ---------------------------------------------------------------------------

_COS_SQL = """
    list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> a.embedding[i]::double * q.embedding[i]::double))
    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> a.embedding[i]::double * a.embedding[i]::double)))
     * sqrt(list_sum(list_transform(range(1, len(q.embedding) + 1),
             i -> q.embedding[i]::double * q.embedding[i]::double))))
"""


@q(
    "q29_cosine_topk",
    f"""
    SELECT a.vec_id, round({_COS_SQL}, 6) AS cos_sim
    FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY cos_sim DESC, a.vec_id LIMIT 10
    """,
)
def q29_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs a query vector (ANN baseline)."""
    e = t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return vectorops.topk_cosine(e, list(qvec), 10)


def _cos_sql(x: str, y: str) -> str:
    """Parameterized DuckDB cosine between two list<float> expressions."""
    return f"""(
    list_sum(list_transform(range(1, len({x}) + 1),
             i -> {x}[i]::double * {y}[i]::double))
    / (sqrt(list_sum(list_transform(range(1, len({x}) + 1),
             i -> {x}[i]::double * {x}[i]::double)))
     * sqrt(list_sum(list_transform(range(1, len({y}) + 1),
             i -> {y}[i]::double * {y}[i]::double)))))"""


@q(
    "q43_ivf_topk",
    f"""
    WITH cent AS (
        SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
        ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT 16
    ), qtab AS (
        SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0
    ), scored AS (
        SELECT e.vec_id, e.embedding, c.c_id,
               round({_cos_sql('e.embedding', 'c.c_vec')}, 6) AS cs
        FROM embeddings e CROSS JOIN cent c
    ), assign AS (
        SELECT vec_id, embedding, c_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
            FROM scored
        ) WHERE rn = 1
    ), probe AS (
        SELECT c_id FROM cent, qtab
        ORDER BY round({_cos_sql('c_vec', 'q_vec')}, 6) DESC, c_id LIMIT 4
    )
    SELECT a.vec_id, round({_cos_sql('a.embedding', 'q_vec')}, 6) AS cos_sim
    FROM assign a JOIN probe USING (c_id) CROSS JOIN qtab
    ORDER BY cos_sim DESC, a.vec_id LIMIT 10
    """,
)
def q43_ivf_topk(spark, sf_dir):
    """IVF-Flat ANN search (the brief's other scale path next to LSH):
    deterministic centroid sample -> map-only nearest-centroid assignment
    (broadcast of k centroids, the one correct explicit broadcast) -> probe
    the nprobe nearest cells -> exact cosine top-k within ~nprobe/k of the
    corpus. vectorops.ivf_* documents the 100 TB layout (assignment
    bucketed by cell -> partition-pruned probes)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return vectorops.ivf_topk(e, list(qvec), k=10, n_centroids=16, nprobe=4)


def _kmeans_sql(k: int = 8, iters: int = 3) -> str:
    """DuckDB twin of vectorops.kmeans_fixed: the same fixed rounds
    unrolled as CTEs (assignment = argmax-cosine row_number; centroid
    update = exact-decimal positional means, the q31 technique)."""
    ctes = [
        f"""cent0 AS (
        SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
        ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT {k})"""
    ]
    for r in range(iters):
        ctes.append(f"""assign{r} AS (
        SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id, row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY round({_cos_sql('e.embedding', 'c.c_vec')}, 6) DESC,
                         c.c_id) AS rn
            FROM embeddings e CROSS JOIN cent{r} c
        ) WHERE rn = 1)""")
        ctes.append(f"""cent{r + 1} AS (
        SELECT c_id, list(c ORDER BY pos) AS c_vec FROM (
            SELECT a.c_id, u.pos,
                   sum(cast(round(e.embedding[u.pos], 6) as decimal(18,6)))::double
                     / count(*) AS c
            FROM assign{r} a
            JOIN embeddings e USING (vec_id),
                 unnest(range(1, len(e.embedding) + 1)) AS u(pos)
            GROUP BY a.c_id, u.pos
        ) GROUP BY c_id)""")
    ctes.append(f"""final_assign AS (
        SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id, row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY round({_cos_sql('e.embedding', 'c.c_vec')}, 6) DESC,
                         c.c_id) AS rn
            FROM embeddings e CROSS JOIN cent{iters} c
        ) WHERE rn = 1)""")
    return "WITH " + ",\n".join(ctes) + """
    SELECT c_id, count(*) AS n FROM final_assign GROUP BY c_id"""


@q("q44_kmeans_clusters", _kmeans_sql())
def q44_kmeans_clusters(spark, sf_dir):
    """Distributed k-means (A14 completion — the embedding-clustering
    operator): 3 fixed Lloyd rounds, k=8, deterministic md5-ordered init,
    broadcast-k assignment + exact-decimal positional-mean update; output
    = final cluster sizes, oracle-checked against the same rounds unrolled
    in DuckDB. Production variant loops to epsilon (vectorops.kmeans_fixed
    docstring)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return vectorops.kmeans_fixed(e, k=8, iters=3).groupBy("c_id").agg(
        F.count("*").alias("n")
    )


_BANDED_BUCKETS_SQL = "\nUNION ALL\n".join(
    f"SELECT vec_id, embedding, {b} AS band, "
    f"{vectorops.band_bucket_sql(b)} AS bucket FROM embeddings"
    for b in range(vectorops.EMB_BANDS)
)


@q(
    "q30_lsh_buckets",
    f"""
    WITH b AS ({_BANDED_BUCKETS_SQL})
    SELECT band, bucket, count(*) AS n FROM b GROUP BY band, bucket
    """,
)
def q30_lsh_buckets(spark, sf_dir):
    """Banded random-hyperplane LSH bucketing (the ANN blocking stage):
    EMB_BANDS bands x EMB_ROWS Rademacher sign-bits per band, exactly
    reproduced in the DuckDB oracle via decimal dot products."""
    e = t(spark, sf_dir, "embeddings")
    return vectorops.with_band_buckets(e.select("vec_id", "embedding")).groupBy(
        "band", "bucket"
    ).agg(F.count("*").alias("n"))


@q(
    "q31_centroid_cosine",
    """
    WITH flat AS (
        SELECT label, u.pos, embedding[u.pos] AS val
        FROM embeddings,
             unnest(range(1, len(embedding) + 1)) AS u(pos)
    ), centroid AS (
        SELECT label, pos,
               (sum(cast(round(val, 6) as decimal(18,6)))::double / count(*)) AS c
        FROM flat GROUP BY label, pos
    ), cvec AS (
        SELECT label, list(c ORDER BY pos) AS cv FROM centroid GROUP BY label
    ), sims AS (
        SELECT e.label,
               round(
                 list_sum(list_transform(range(1, len(e.embedding) + 1),
                          i -> e.embedding[i]::double * cv[i]))
                 / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                          i -> e.embedding[i]::double * e.embedding[i]::double)))
                  * sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                          i -> cv[i] * cv[i])))), 6) AS cos_c
        FROM embeddings e JOIN cvec USING (label)
    )
    SELECT label,
           (sum(cast(cos_c as decimal(18,6)))::double / count(*)) AS avg_cos,
           count(*) AS n
    FROM sims GROUP BY label
    """,
)
def q31_centroid_cosine(spark, sf_dir):
    """Per-label centroid + average member cosine (cluster-coherence agg,
    A14 analogue of interpret.py:682-703)."""
    e = t(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos0", "val")
    ).withColumn("pos", F.col("pos0") + 1)
    centroid = flat.groupBy("label", "pos").agg(
        (
            F.sum(F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("c")
    )
    cvec = centroid.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    j = e.join(F.broadcast(cvec), "label")
    cos_c = F.round(
        vectorops.dot(F.col("embedding"), F.col("cv"))
        / (vectorops.norm(F.col("embedding")) * vectorops.norm(F.col("cv"))),
        6,
    )
    sims = j.select("label", cos_c.alias("cos_c"))
    return sims.groupBy("label").agg(
        (F.sum(F.col("cos_c").cast("decimal(18,6)")).cast("double") / F.count("*")).alias(
            "avg_cos"
        ),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Streaming, multimodal, and the KG pipeline itself
# ---------------------------------------------------------------------------

_STREAM_SEQ = [0]


@q(
    "q32_streaming_counts",
    """
    SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type
    """,
)
def q32_streaming_counts(spark, sf_dir):
    """S1-analogue: Structured Streaming with availableNow trigger over the
    events parquet; complete-mode agg to a memory sink, result returned as a
    batch DataFrame (oracle: the equivalent batch aggregation)."""
    schema = t(spark, sf_dir, "events").schema
    _STREAM_SEQ[0] += 1
    qname = f"kgforge_stream_counts_{_STREAM_SEQ[0]}"
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    sq = (
        sdf.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.table(qname)


@q(
    "q33_multimodal_meta",
    """
    SELECT (octet_length(encode(text)) % 7 + 1) AS n_frames,
           count(*) AS n_docs,
           sum(octet_length(encode(text)))::bigint AS total_bytes
    FROM documents GROUP BY 1
    """,
)
def q33_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: binary payload -> mapInPandas decode stub ->
    typed metadata agg (codec stubbed; Spark-side plumbing real)."""
    from kgforge import multimodal

    d = t(spark, sf_dir, "documents")
    meta = multimodal.extract_media_meta(multimodal.with_binary_payload(d))
    return meta.groupBy("n_frames").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
    )


@q("q90_kg_triples", None)
def q90_kg_triples(spark, sf_dir):
    """The full KG pipeline (north rule) on the seeded synthetic corpus:
    extraction -> linking -> connected components -> canonicalize ->
    dedup triples. Non-SQL-expressible (iterative CC) -> rows-only check."""
    import tempfile

    from kgforge.pipeline import run_kg
    from kgforge.synth import synth_source_files

    out = tempfile.mkdtemp(prefix="kgforge_q90_")
    src = synth_source_files(spark, 600)
    triples = run_kg(spark, src, out, n_parts=8)
    return triples.select("subj", "pred", "obj").orderBy("subj", "pred", "obj")


@q("q91_mention_extraction", None)
def q91_mention_extraction(spark, sf_dir):
    """Batched NER mention extraction (N5/N6) over the synthetic corpus:
    per-entity-type mention counts. Rows-only (model path not in SQL)."""
    from kgforge.extract import extract_mentions, with_clean
    from kgforge.synth import synth_source_files

    src = with_clean(synth_source_files(spark, 800))
    m = extract_mentions(src)
    return m.groupBy("entity_type").agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("surface").alias("n_surfaces"),
    )


@q(
    "q34_embedding_neardup",
    f"""
    WITH b AS ({_BANDED_BUCKETS_SQL}),
    cand AS (
        SELECT DISTINCT l.vec_id AS a_id, r.vec_id AS b_id
        FROM b l JOIN b r
          ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id
    )
    SELECT a_id, b_id, round({_COS_SQL}, 6) AS cos_sim
    FROM cand
    JOIN embeddings a ON a.vec_id = a_id
    JOIN embeddings q ON q.vec_id = b_id
    ORDER BY cos_sim DESC, a_id, b_id LIMIT 20
    """,
)
def q34_embedding_neardup(spark, sf_dir):
    """Embedding near-dup: banded sign-LSH blocked self-join (never
    O(n^2); any-band match, AND-of-r bits within a band) -> exact cosine on
    candidates -> top-20 pairs. Production variant with hot-bucket salting:
    vectorops.embedding_candidate_pairs."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bb = vectorops.with_band_buckets(e)
    l = bb.select("band", "bucket", F.col("vec_id").alias("a_id"))
    r = bb.select(
        "band", "bucket",
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("vec_b"),
    )
    cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    withv = cand.join(
        e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("vec_a")),
        "a_id",
    )
    cos = F.round(vectorops.cosine(F.col("vec_a"), F.col("vec_b")), 6)
    return (
        withv.select("a_id", "b_id", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "a_id", "b_id")
        .limit(20)
    )


_PROBED_BUCKETS_SQL = "\nUNION ALL\n".join(
    [
        f"SELECT vec_id, embedding, {b} AS band, "
        f"{vectorops.band_bucket_sql(b)} AS bucket FROM embeddings"
        for b in range(vectorops.EMB_BANDS)
    ]
    + [vectorops.band_probe_bucket_sql(b) for b in range(vectorops.EMB_BANDS)]
)


@q(
    "q51_embedding_neardup_multiprobe",
    f"""
    WITH b AS ({_PROBED_BUCKETS_SQL}),
    cand AS (
        SELECT DISTINCT l.vec_id AS a_id, r.vec_id AS b_id
        FROM b l JOIN b r
          ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id
    )
    SELECT a_id, b_id, round({_COS_SQL}, 6) AS cos_sim
    FROM cand
    JOIN embeddings a ON a.vec_id = a_id
    JOIN embeddings q ON q.vec_id = b_id
    ORDER BY cos_sim DESC, a_id, b_id LIMIT 20
    """,
)
def q51_embedding_neardup_multiprobe(spark, sf_dir):
    """Multi-probe embedding near-dup (VERDICT r2 next-round #8): each band
    probes its exact bucket AND the flipped-lowest-|margin| bucket — recall
    recovered without more bands, 2x candidate rows, same join shape as
    q34. Fully oracle-checked (exact-decimal margins make the probe choice
    engine-identical), not rows-only."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bb = vectorops.with_band_buckets_multiprobe(e)
    l = bb.select("band", "bucket", F.col("vec_id").alias("a_id"))
    r = bb.select(
        "band", "bucket",
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("vec_b"),
    )
    cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    withv = cand.join(
        e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("vec_a")),
        "a_id",
    )
    cos = F.round(vectorops.cosine(F.col("vec_a"), F.col("vec_b")), 6)
    return (
        withv.select("a_id", "b_id", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "a_id", "b_id")
        .limit(20)
    )


@q(
    "q35_sessionization",
    """
    WITH g AS (
        SELECT user_id, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM (SELECT * FROM g ORDER BY user_id, event_id)
    )
    SELECT user_id, count(DISTINCT session_id)::bigint AS n_sessions,
           count(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def q35_sessionization(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via cumulative-sum
    window — the batch twin of a streaming session window."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    g = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = g.withColumn("session_id", F.sum("new_session").over(w2))
    return s.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@q(
    "q36_rank_functions",
    """
    SELECT event_type, quartile, count(*) AS n,
           round(min(pr), 4) AS min_pr, round(max(pr), 4) AS max_pr
    FROM (
        SELECT event_type,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pr
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    )
    GROUP BY event_type, quartile
    """,
)
def q36_rank_functions(spark, sf_dir):
    """ntile + percent_rank windows (rank-function family coverage)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = e.select(
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )
    return r.groupBy("event_type", "quartile").agg(
        F.count("*").alias("n"),
        F.round(F.min("pr"), 4).alias("min_pr"),
        F.round(F.max("pr"), 4).alias("max_pr"),
    )


@q(
    "q37_string_functions",
    """
    SELECT count(DISTINCT upper(source)) AS n_upper,
           count(DISTINCT substring(text, 1, 8)) AS n_prefix,
           count(DISTINCT concat(lang, ':', source)) AS n_concat,
           count(DISTINCT lpad(lang, 6, '_')) AS n_pad,
           sum(length(replace(text, ' ', '')))::bigint AS chars_no_space
    FROM documents
    """,
)
def q37_string_functions(spark, sf_dir):
    """String-function family: upper/substr/concat/lpad/replace (F-ops)."""
    d = t(spark, sf_dir, "documents")
    return d.agg(
        F.countDistinct(F.upper("source")).alias("n_upper"),
        F.countDistinct(F.substring("text", 1, 8)).alias("n_prefix"),
        F.countDistinct(F.concat_ws(":", "lang", "source")).alias("n_concat"),
        F.countDistinct(F.lpad("lang", 6, "_")).alias("n_pad"),
        F.sum(F.length(F.regexp_replace(F.col("text"), " ", ""))).alias(
            "chars_no_space"
        ),
    )


@q(
    "q38_pivot",
    """
    SELECT year(ts) AS y,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::bigint AS click,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::bigint AS error,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::bigint AS purchase,
           sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::bigint AS signup,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::bigint AS view
    FROM events GROUP BY 1
    """,
)
def q38_pivot(spark, sf_dir):
    """A14 — pivot count per (group, category) (interpret.py:682-703
    cluster x label shape). Explicit value list keeps the schema static."""
    e = t(spark, sf_dir, "events")
    cats = ["click", "error", "purchase", "signup", "view"]
    out = (
        e.groupBy(F.year("ts").alias("y"))
        .pivot("event_type", cats)
        .agg(F.count(F.lit(1)))
    )
    return out.select("y", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in cats])


@q(
    "q39_array_ops",
    """
    SELECT list_position(string_split(text, ' '), 'spark') AS first_spark_pos,
           count(*) AS n
    FROM documents
    GROUP BY 1
    """,
)
def q39_array_ops(spark, sf_dir):
    """F15 — array_position token-index lookup (conll_annotator.py:91-94),
    histogrammed (0 = token absent in both engines' conventions)."""
    d = t(spark, sf_dir, "documents")
    pos = F.array_position(F.split(F.col("text"), " "), "spark")
    return d.groupBy(pos.alias("first_spark_pos")).agg(F.count("*").alias("n"))


@q("q92_vendor_scorecards", None)
def q92_vendor_scorecards(spark, sf_dir):
    """Vendor analytics (reference §3.3): posts -> batched NER -> per-vendor
    aggregates -> weighted lending scorecards. Rows-only (model path);
    q92b is the hash-verified twin through the regex mention path."""
    from kgforge.scorecard import generate_scorecards
    from kgforge.synth import synth_messages

    return generate_scorecards(synth_messages(spark, 400)).select(
        "channel", "n_posts", "avg_weekly_posts", "avg_views",
        "top_post_id", "avg_price", "product_variety", "lending_score",
    )


@q(
    "q92b_vendor_scorecards_regex",
    """
    WITH posts AS (
        SELECT 'vendor_' || (user_id % 20) AS channel,
               event_id AS message_id, ts AS date,
               CAST(round(value * 100) AS BIGINT) AS views,
               props, event_type
        FROM events
    ), posting AS (
        SELECT channel, round(avg(n), 4) AS avg_weekly_posts
        FROM (SELECT channel, year(date) AS y, weekofyear(date) AS w,
                     count(*) AS n
              FROM posts GROUP BY channel, y, w)
        GROUP BY channel
    ), viewagg AS (
        SELECT channel, count(*) AS n_posts,
               round(avg(nullif(views, 0)), 4) AS avg_views
        FROM posts GROUP BY channel
    ), top AS (
        SELECT channel, message_id AS top_post_id
        FROM (SELECT channel, message_id,
                     row_number() OVER (PARTITION BY channel
                                        ORDER BY views DESC, message_id) AS rn
              FROM posts)
        WHERE rn = 1
    ), price AS (
        SELECT channel, round(avg(amount), 4) AS avg_price
        FROM (SELECT channel,
                     try_cast(unnest(regexp_extract_all(props, '([0-9]+)', 1))
                              AS double) AS amount
              FROM posts)
        GROUP BY channel
    ), variety AS (
        SELECT channel, count(DISTINCT event_type) AS product_variety
        FROM posts GROUP BY channel
    )
    SELECT p.channel, v.n_posts, p.avg_weekly_posts, v.avg_views,
           t.top_post_id, pr.avg_price, vr.product_variety,
           round(least(100.0, 100.0 * (
               0.4 * least(1.0, greatest(0.0, coalesce(v.avg_views, 0) / 5000.0))
             + 0.3 * least(1.0, greatest(0.0, coalesce(p.avg_weekly_posts, 0) / 5.0))
             + 0.2 * least(1.0, greatest(0.0, coalesce(pr.avg_price, 0) / 10000.0))
             + 0.1 * least(1.0, greatest(0.0, coalesce(vr.product_variety, 0) / 50.0))
           )), 4) AS lending_score
    FROM posting p
    JOIN viewagg v USING (channel)
    LEFT JOIN top t USING (channel)
    LEFT JOIN price pr USING (channel)
    LEFT JOIN variety vr USING (channel)
    """,
)
def q92b_vendor_scorecards_regex(spark, sf_dir):
    """The north-rule scorecard block (A6-A10 + F18/F19), HASH-VERIFIED
    (VERDICT r3 #6): the same vendor_metrics -> lending_scores DAG as q92,
    fed by DETERMINISTIC regex mentions (regexp_extract_all, the F1-F3
    Catalyst path) over the events table instead of the stand-in model —
    every aggregate, window, weight and cap is reproduced by the DuckDB
    oracle. channel = user_id bucket, views = scaled value, PRICE mentions
    = digit runs in the props JSON, PRODUCT surface = event_type."""
    from kgforge.scorecard import lending_scores, vendor_metrics

    ev = t(spark, sf_dir, "events")
    posts = ev.select(
        F.concat(F.lit("vendor_"), (F.col("user_id") % 20).cast("string")).alias("channel"),
        F.col("event_id").alias("message_id"),
        F.col("ts").alias("date"),
        F.round(F.col("value") * 100).cast("long").alias("views"),
        "props",
        "event_type",
    )
    price_m = posts.select(
        "channel",
        "message_id",
        F.lit("PRICE").alias("entity_type"),
        F.explode(
            F.regexp_extract_all("props", F.lit("([0-9]+)"), 1)
        ).alias("surface"),
    )
    prod_m = posts.select(
        "channel",
        "message_id",
        F.lit("PRODUCT").alias("entity_type"),
        F.col("event_type").alias("surface"),
    )
    mentions = price_m.unionByName(prod_m)
    scored = lending_scores(
        vendor_metrics(posts.drop("props", "event_type"), mentions)
    )
    return scored.select(
        "channel", "n_posts", "avg_weekly_posts", "avg_views",
        "top_post_id", "avg_price", "product_variety", "lending_score",
    )


def doc_neardup_components(d: DataFrame) -> DataFrame:
    """documents -> (mention_id=doc_id, component_id) via xxhash64 MinHash
    band signatures -> band-equality candidate pairs -> iterative connected
    components. Shared by q93 (dedup) and q66 (leakage-free split)."""
    from kgforge import canon

    sh = textops.word_shingles(F.col("text"), 3)
    # production path: xxhash64 band signatures (minhash_band_sig_fast);
    # the md5 twin stays in q22 where the DuckDB oracle needs it
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                textops.minhash_band_sig_fast(sh, band).alias("sig"),
            )
            for band in (0, 1)
        ]
    )
    sigs = d.select(
        F.col("doc_id").alias("mention_id"), F.explode(bands_arr).alias("bs")
    ).select("mention_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.mention_id") < F.col("b.mention_id")),
        )
        .select(
            F.col("a.mention_id").alias("src"),
            F.col("b.mention_id").alias("dst"),
            F.lit(1.0).alias("sim"),
        )
        .dropDuplicates(["src", "dst"])
    )
    vertices = d.select(F.col("doc_id").alias("mention_id"))
    return canon.connected_components(vertices, edges)


@q("q93_doc_neardup_dedup", None)
def q93_doc_neardup_dedup(spark, sf_dir):
    """Near-duplicate DOCUMENT dedup end-to-end: MinHash band signatures ->
    candidate pairs -> connected components (transitive closure) -> keep
    min doc_id per cluster. The corpus-curation composition of kgforge.link
    + kgforge.canon; rows-only (iterative CC not SQL-expressible)."""
    d = t(spark, sf_dir, "documents")
    assign = doc_neardup_components(d)
    survivors = assign.groupBy("component_id").agg(
        F.min("mention_id").alias("kept_doc_id"),
        F.count("*").alias("cluster_size"),
    )
    return survivors.select(
        F.count("*").alias("n_clusters"),
        F.sum(F.when(F.col("cluster_size") > 1, 1).otherwise(0)).alias(
            "n_neardup_clusters"
        ),
        F.sum("cluster_size").alias("n_docs"),
        F.max("cluster_size").alias("max_cluster"),
    )


def leakage_free_split(
    d: DataFrame, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Train/val/test split with NO leakage across near-duplicate clusters:
    the split is assigned to the CLUSTER (hash of its component id), and
    every member document inherits it — a near-dup of a training doc can
    never land in test (the contamination q45's per-doc hash split cannot
    rule out). Returns (doc_id, component_id, split). Deterministic; the
    pytest asserts the no-cluster-spans-two-splits invariant."""
    assign = doc_neardup_components(d)
    bucket = F.pmod(F.xxhash64(F.col("component_id").cast("string")), F.lit(100))
    return assign.select(
        F.col("mention_id").alias("doc_id"),
        "component_id",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


@q("q66_leakage_free_split", None)
def q66_leakage_free_split(spark, sf_dir):
    """Cluster-aware corpus split summary: near-dup components (q93's
    machinery) -> split-by-cluster-hash -> per-split doc and cluster
    counts. Rows-only (iterative CC not SQL-expressible); the splitting
    invariant is pytest-asserted instead."""
    d = t(spark, sf_dir, "documents")
    s = leakage_free_split(d)
    return s.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("component_id").alias("n_clusters"),
    )


_Q42_CANDIDATES = [
    # the reference's comparison table shape (compare_model.py:430-440):
    # model, f1, inference_ms, size_mb, train_min
    ("afroxlmr-large", 0.9231, 31.0, 2200.0, 96.0),
    ("xlmr-base", 0.9045, 17.0, 1100.0, 54.0),
    ("mbert-cased", 0.8712, 14.0, 680.0, 47.0),
    ("distil-mbert", 0.8423, 9.0, 540.0, 31.0),
    ("afro-xlmr-mini", 0.8120, 6.0, 290.0, 22.0),
]
_Q42_VALUES = ", ".join(
    f"('{m}', {f1}, {ms}, {mb}, {mins})" for m, f1, ms, mb, mins in _Q42_CANDIDATES
)


@q(
    "q42_model_score_ranking",
    f"""
    WITH cand(model, f1, inference_ms, size_mb, train_min) AS (
        VALUES {_Q42_VALUES}
    ), scored AS (
        SELECT model,
               round(0.5 * f1
                   + 0.2 * (1 - inference_ms / max(inference_ms) OVER ())
                   + 0.2 * (1 - size_mb / max(size_mb) OVER ())
                   + 0.1 * (1 - train_min / max(train_min) OVER ()), 6)
                 AS weighted_score
        FROM cand
    )
    SELECT model, weighted_score,
           row_number() OVER (ORDER BY weighted_score DESC, model) AS rank
    FROM scored ORDER BY rank
    """,
)
def q42_model_score_ranking(spark, sf_dir):
    """Model-comparison weighted-score ranking (compare_model.py:473-481
    formula verbatim: 0.5*F1 + 0.2*speed + 0.2*size + 0.1*time, each cost
    max-normalized over the candidate set) — the SQL-expressible half of
    the comparison harness (kgforge.compare; full distributed-eval variant:
    q95)."""
    from kgforge.compare import weighted_ranking

    cand = spark.createDataFrame(
        _Q42_CANDIDATES, "model string, f1 double, inference_ms double, "
        "size_mb double, train_min double"
    )
    ranked = weighted_ranking(cand)
    return ranked.select(
        "model", "weighted_score", F.col("rank").cast("long").alias("rank")
    ).orderBy("rank")


@q("q94_eval_report", None)
def q94_eval_report(spark, sf_dir):
    """Evaluation-report job composition (interpret.py analogue, rows-only):
    golden (repaired) vs predicted (raw) tags over a deterministic synth
    corpus -> true->pred confusion histogram (the report's error_confusions
    table; full artifact: jobs/run_interpret.py)."""
    from kgforge.jobs.run_interpret import golden_and_predicted
    from kgforge.metrics import error_cases
    from kgforge.report import error_confusions

    golden, predicted = golden_and_predicted(spark, None, 200)
    return error_confusions(error_cases(golden, predicted))


@q("q95_model_comparison", None)
def q95_model_comparison(spark, sf_dir):
    """Full model-comparison harness (rows-only): N stand-in candidates,
    each span-evaluated DISTRIBUTED against the golden corpus, then the
    reference's weighted-score ranking — winner = rank 1."""
    from kgforge.compare import compare_models
    from kgforge.jobs.run_interpret import golden_and_predicted

    golden, _ = golden_and_predicted(spark, None, 200)
    return compare_models(spark, golden)


@q("q96_tokenized_rows", None)
def q96_tokenized_rows(spark, sf_dir):
    """Tokenized-training-rows production (train_ner.py:252-303 analogue,
    rows-only): (sent_id, input_ids, labels) via one mapInPandas pass,
    summarized as the per-label supervised-position histogram (the -100
    sentinel positions excluded, like the reference's loss mask)."""
    from kgforge.alignment import tokenized_training_rows
    from kgforge.jobs.run_interpret import golden_and_predicted

    sentences, _ = golden_and_predicted(spark, None, 200)
    rows = tokenized_training_rows(sentences)
    return (
        rows.select(F.explode("labels").alias("label_id"))
        .filter(F.col("label_id") != -100)
        .groupBy("label_id")
        .agg(F.count("*").alias("n"))
        .orderBy("label_id")
    )


@q("q49_media_features", None)
def q49_media_features(spark, sf_dir):
    """REAL multimodal decode (rows-only; stdlib codecs): a mixed media
    table (P6 PPM images, real zlib-decoded PNGs with rotating scanline
    filters, PCM16 WAVs, baseline JPEGs — 4:4:4 and 4:2:0 alternating —
    plus one corrupt JPEG that the dispatcher must skip) -> decode +
    resize/frame-sample + features via mapInPandas -> per-kind aggregate.
    Exercises the un-stubbed decode_real path (VERDICT r1 missing #4; PNG
    added r4 per VERDICT r3 #3; JPEG added r5 per VERDICT r4 #3)."""
    import numpy as np

    from kgforge.multimodal import (
        decode_ppm,
        encode_jpeg,
        encode_png,
        encode_ppm,
        encode_wav,
        extract_media_features,
    )

    rows = []
    for i in range(48):
        if i % 4 == 0:
            rows.append((i, bytearray(encode_ppm(16 + i % 5, 12 + i % 3, seed=i))))
        elif i % 4 == 1:
            img = decode_ppm(encode_ppm(10 + i % 4, 8 + i % 3, seed=i))
            rows.append((i, bytearray(encode_png(np.asarray(img), filter_type=i % 5))))
        elif i % 4 == 2:
            img = decode_ppm(encode_ppm(12 + i % 5, 10 + i % 3, seed=i))
            rows.append((i, bytearray(encode_jpeg(
                np.asarray(img), quant=8, subsample=bool(i % 8 == 2)
            ))))
        else:
            rows.append((i, bytearray(encode_wav(400 + i * 7, seed=i))))
    rows.append((99, bytearray(b"\xff\xd8\xff\xe0fakejpeg")))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = extract_media_features(media)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_frames").alias("total_frames"),
            F.round(F.sum(F.element_at("features", 1)), 4).alias("sum_feat0"),
        )
        .orderBy("kind")
    )


@q(
    "q40_asof_join",
    """
    WITH probes AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ), quotes AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           (epoch_ms(p.ts) - epoch_ms(v.ts))::bigint AS lag_ms,
           v.value AS view_value
    FROM probes p ASOF LEFT JOIN quotes v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q40_asof_join(spark, sf_dir):
    """As-of join — an operator Spark lacks, composed from existing ops
    (task brief): each purchase matched to the same user's latest view at
    or before it. Union both sides with a tag, one window pass per user
    ordered by (ts, tag), carry the last view forward with
    last(..., ignoreNulls) — one shuffle, no range explosion. Oracle:
    DuckDB's native ASOF JOIN."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_view_id"),
        F.lit(None).cast("double").alias("_view_value"),
        F.lit(None).cast("timestamp").alias("_view_ts"),
    )
    quotes = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("_tag"),
        F.col("event_id").alias("_view_id"),
        F.col("value").alias("_view_value"),
        F.col("ts").alias("_view_ts"),
    )
    # views sort before purchases at equal ts (as-of '>=' semantics)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_tag", "_view_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = probes.unionByName(quotes).select(
        "*",
        F.last("_view_id", ignorenulls=True).over(w).alias("view_id"),
        F.last("_view_value", ignorenulls=True).over(w).alias("view_value"),
        F.last("_view_ts", ignorenulls=True).over(w).alias("matched_ts"),
    )
    return merged.filter(F.col("_tag") == 1).select(
        "purchase_id",
        "view_id",
        (
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(F.col("matched_ts").cast("timestamp"))
        ).alias("lag_ms"),
        "view_value",
    )


# ---------------------------------------------------------------------------
# Driver-snapshot rotation (VERDICT r2 #2; made DETERMINISTIC per VERDICT r3 #1)
# ---------------------------------------------------------------------------
# The correctness driver snapshots only a PREFIX of this registry (~50
# entries; r2/r3 covered exactly the first 50 definitions), so with 70+
# registered queries some get no CORRECTNESS row each round. Rounds 2-3
# used hand-maintained _FRONT/_BACK lists; that left 24 queries riding on
# rows two rounds old. Ordering is now DERIVED from the driver's own
# CORRECTNESS_r*.json artifacts committed at the repo root:
#
#   1. the north-rule pipeline checks (q90-q93) are pinned first — they
#      must never rotate outside the cap;
#   2. then every query ordered by the LAST ROUND in which it has a driver
#      row, ascending (never-verified first), tie-broken by definition
#      order (stable and auditable).
#
# A query verified in round N therefore automatically yields its slot to
# the round-N absentees in round N+1: no query's latest driver row can go
# stale by more than ceil(n_registered / cap) - 1 ≈ 1 round. Same files ->
# same order (the artifacts are committed, so this is reproducible), and
# with no artifacts present (fresh clone without driver output) the order
# degrades to pinned + definition order. Every (fn, sql) pair is
# unchanged — this is presentation order only.

_PINNED = [
    "q90_kg_triples",
    "q91_mention_extraction",
    "q92_vendor_scorecards",
    "q93_doc_neardup_dedup",
]
# fail fast on renames: a typo here would silently unpin (ADVICE r3).
# Explicit raise, not assert — `python -O` strips asserts, and a stripped
# guard is the exact silent-unpin failure it exists to catch (ADVICE r4).
if set(_PINNED) - set(REGISTRY):
    raise ValueError(
        f"_PINNED names not in REGISTRY: {sorted(set(_PINNED) - set(REGISTRY))}"
    )


def _row_verified(row) -> bool:
    """True iff a CORRECTNESS row is a PASS (oracle green, or the weaker
    rows-only check for entries without oracle SQL). A failed row must NOT
    count as 'seen' — otherwise the rotation would push a just-fixed query
    to the back and the fix would go unverified for two more rounds
    (code-review r4)."""
    if not isinstance(row, dict):
        return False
    if row.get("err") not in (None, "no_oracle"):
        return False
    return row.get("hash_match") is not False and row.get("rows_match") is not False


def _last_driver_round() -> dict[str, int]:
    """query name -> latest round number with a PASSING CORRECTNESS row."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name, row in rows.items():
                if _row_verified(row):
                    seen[name] = max(seen.get(name, 0), rnd)
    return seen


def apply_rotation(seen: dict[str, int] | None = None) -> None:
    """Reorder REGISTRY in place: pinned first, then by last-verified
    driver round ascending (never-verified first), tie-broken by
    definition order.

    Explicit function (ADVICE r4) so the ordering is unit-testable with an
    injected `seen` map and re-runnable after artifacts change, rather
    than an anonymous import-time block. It still runs once at import —
    the driver contract (`__spark_entry__.queries()`) needs the rotated
    order present at import with no extra call site — but the inputs are
    the COMMITTED CORRECTNESS_r*.json artifacts (the driver commits each
    round's artifact with the round), so same tree -> same order, and a
    fresh clone without artifacts degrades to pinned + definition order.
    """
    if seen is None:
        seen = _last_driver_round()
    defn = {name: i for i, name in enumerate(REGISTRY)}
    rotated = _PINNED + sorted(
        (k for k in REGISTRY if k not in _PINNED),
        key=lambda k: (seen.get(k, -1), defn[k]),
    )
    ordered = {k: REGISTRY[k] for k in rotated}
    REGISTRY.clear()
    REGISTRY.update(ordered)


apply_rotation()
