"""M4 — scalar / calendar / binning / encoding layer (SURVEY.md §2.8).

Every function here is a pure Catalyst expression (JVM codegen, no UDFs):
date extracts, cyclical + Fourier encodings, fixed and quantile binning,
string normalization, null strategies, frequency/label encoding, the
holiday-proximity join, and conditional column rewrites.

Cross-engine notes: ISO day-of-week convention everywhere; DuckDB has no
``initcap`` so title-casing is spelled as upper(first)||lower(rest) on both
sides; quantile bins use ntile over a UNIQUE ordering (ties would make the
bin engine-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hackatonbigdata_spark.catalog import Catalog
from hackatonbigdata_spark.functions.core import iso_dow, r4
from hackatonbigdata_spark.registry import register

# Fixed small holiday dim (Brazilian national holidays 1995-1998 subset) —
# the reference broadcast-joins `holidays.Brazil`
# (/root/reference/src/features/business_features_engine.py:388-453).
HOLIDAYS = [
    "1995-01-01", "1995-04-21", "1995-09-07", "1995-12-25",
    "1996-01-01", "1996-04-21", "1996-09-07", "1996-12-25",
    "1997-01-01", "1997-04-21", "1997-09-07", "1997-12-25",
    "1998-01-01", "1998-04-21", "1998-09-07", "1998-12-25",
]
_HOLIDAYS_SQL = ", ".join(f"(TIMESTAMP '{d} 00:00:00')" for d in HOLIDAYS)


@register(
    "calendar_extract",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(isodow(o_orderdate) AS INTEGER) AS dow,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
       CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END AS is_weekend,
       CASE WHEN day(o_orderdate) = 1 THEN 1 ELSE 0 END AS is_month_start,
       CASE WHEN o_orderdate = last_day(o_orderdate) + INTERVAL 0 DAY THEN 1 ELSE 0 END
         AS is_month_end,
       CAST(least(CAST(ceil(day(o_orderdate) / 7.0) AS INTEGER), 4) AS INTEGER)
         AS week_of_month,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
         AS days_since_epoch
FROM orders
""",
)
def calendar_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full calendar-extract block
    (/root/reference/src/features/temporal.py:69-87,
    temporal_features_engine.py:77-99; week_of_month clipped ≤4 per :94-95)."""
    t = Catalog(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        iso_dow(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("wk"),
        F.when(iso_dow(d) >= 6, 1).otherwise(0).alias("is_weekend"),
        F.when(F.dayofmonth(d) == 1, 1).otherwise(0).alias("is_month_start"),
        F.when(d.cast("date") == F.last_day(d), 1).otherwise(0).alias("is_month_end"),
        F.least(F.ceil(F.dayofmonth(d) / 7.0).cast("int"), F.lit(4)).alias("week_of_month"),
        F.datediff(d, F.lit("1995-01-01")).alias("days_since_epoch"),
    )


@register(
    "cyclical_fourier",
    oracle="""
WITH b AS (
  SELECT o_orderkey,
         CAST(month(o_orderdate) AS DOUBLE) AS mo,
         CAST(isodow(o_orderdate) AS DOUBLE) AS dw,
         CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS DOUBLE) AS t
  FROM orders
)
SELECT o_orderkey,
       round(sin(2 * pi() * mo / 12), 4) AS month_sin,
       round(cos(2 * pi() * mo / 12), 4) AS month_cos,
       round(sin(2 * pi() * dw / 7), 4) AS dow_sin,
       round(cos(2 * pi() * dw / 7), 4) AS dow_cos,
       round(sin(2 * pi() * 1 * t / 7), 4) AS fourier_w1_sin,
       round(cos(2 * pi() * 1 * t / 7), 4) AS fourier_w1_cos,
       round(sin(2 * pi() * 2 * t / 7), 4) AS fourier_w2_sin,
       round(sin(2 * pi() * 1 * t / 365), 4) AS fourier_y1_sin,
       round(cos(2 * pi() * 1 * t / 365), 4) AS fourier_y1_cos
FROM b
""",
)
def cyclical_fourier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclical sin/cos encodings + Fourier harmonics over days-since-epoch
    (/root/reference/src/features/temporal.py:89-101,
    temporal_features_engine.py:283-313)."""
    import math

    t = Catalog(spark, sf_dir)
    d = F.col("o_orderdate")
    mo = F.month(d).cast("double")
    dw = iso_dow(d).cast("double")
    tt = F.datediff(d, F.lit("1995-01-01")).cast("double")
    two_pi = F.lit(2 * math.pi)
    return t.orders.select(
        "o_orderkey",
        r4(F.sin(two_pi * mo / 12)).alias("month_sin"),
        r4(F.cos(two_pi * mo / 12)).alias("month_cos"),
        r4(F.sin(two_pi * dw / 7)).alias("dow_sin"),
        r4(F.cos(two_pi * dw / 7)).alias("dow_cos"),
        r4(F.sin(two_pi * 1 * tt / 7)).alias("fourier_w1_sin"),
        r4(F.cos(two_pi * 1 * tt / 7)).alias("fourier_w1_cos"),
        r4(F.sin(two_pi * 2 * tt / 7)).alias("fourier_w2_sin"),
        r4(F.sin(two_pi * 1 * tt / 365)).alias("fourier_y1_sin"),
        r4(F.cos(two_pi * 1 * tt / 365)).alias("fourier_y1_cos"),
    )


@register(
    "binning_fixed_tiers",
    oracle="""
SELECT p_partkey, p_retailprice,
       CASE WHEN p_retailprice < 950 THEN 'budget'
            WHEN p_retailprice < 1100 THEN 'mid'
            WHEN p_retailprice < 1400 THEN 'premium'
            ELSE 'luxury' END AS price_tier,
       CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_tier
FROM part
""",
)
def binning_fixed_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-edge binning (pd.cut) as when-chains
    (/root/reference/src/data/preprocessors.py:281-287,
    business_features_engine.py:102-107)."""
    t = Catalog(spark, sf_dir)
    p = F.col("p_retailprice")
    return t.part.select(
        "p_partkey",
        "p_retailprice",
        F.when(p < 950, "budget")
        .when(p < 1100, "mid")
        .when(p < 1400, "premium")
        .otherwise("luxury")
        .alias("price_tier"),
        F.when(F.col("p_size") < 10, "S").when(F.col("p_size") < 30, "M").otherwise("L").alias(
            "size_tier"
        ),
    )


@register(
    "binning_quantile_ntile",
    oracle="""
WITH e AS (
  SELECT floor(quantile_cont(p_retailprice, 0.2) * 10000 + 0.5) / 10000 AS q1,
         floor(quantile_cont(p_retailprice, 0.4) * 10000 + 0.5) / 10000 AS q2,
         floor(quantile_cont(p_retailprice, 0.6) * 10000 + 0.5) / 10000 AS q3,
         floor(quantile_cont(p_retailprice, 0.8) * 10000 + 0.5) / 10000 AS q4
  FROM part
)
SELECT p_partkey, p_retailprice,
       CAST(1 + (CASE WHEN p_retailprice > q1 THEN 1 ELSE 0 END)
              + (CASE WHEN p_retailprice > q2 THEN 1 ELSE 0 END)
              + (CASE WHEN p_retailprice > q3 THEN 1 ELSE 0 END)
              + (CASE WHEN p_retailprice > q4 THEN 1 ELSE 0 END) AS BIGINT)
         AS price_quintile
FROM part, e
""",
)
def binning_quantile_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning (pd.qcut semantics: right-closed value bins at the
    0.2/0.4/0.6/0.8 quantile edges, ties share a bin)
    (/root/reference/src/features/business_features_engine.py:287-292).

    Scale: four scalar quantile edges cross-joined back as a broadcast row —
    no global sort or single-partition ntile window anywhere in the plan.
    At 100 TB swap ``F.percentile`` for ``F.percentile_approx``."""
    t = Catalog(spark, sf_dir)
    edges = t.part.agg(
        *[
            r4(F.percentile("p_retailprice", F.lit(q))).alias(f"q{i}")
            for i, q in enumerate((0.2, 0.4, 0.6, 0.8), start=1)
        ]
    )
    quintile = F.lit(1)
    for i in range(1, 5):
        quintile = quintile + F.when(F.col("p_retailprice") > F.col(f"q{i}"), 1).otherwise(0)
    return (
        t.part.crossJoin(F.broadcast(edges))
        .select("p_partkey", "p_retailprice", quintile.cast("long").alias("price_quintile"))
    )


@register(
    "string_normalize",
    oracle="""
SELECT p_partkey,
       trim(p_name) AS name_trim,
       upper(substring(trim(p_name), 1, 1)) || lower(substring(trim(p_name), 2)) AS name_title,
       p_brand || '_' || p_type AS brand_type_key,
       replace(p_type, ' ', '_') AS type_slug
FROM part
""",
)
def string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String normalization + composite keys
    (/root/reference/src/data/clean_data.py:190-192,255-256;
    aggregation_features_engine.py:302,451).  Title-case spelled portably
    (DuckDB lacks initcap)."""
    t = Catalog(spark, sf_dir)
    trimmed = F.trim(F.col("p_name"))
    return t.part.select(
        "p_partkey",
        trimmed.alias("name_trim"),
        F.concat(
            F.upper(F.substring(trimmed, 1, 1)), F.lower(F.expr("substring(trim(p_name), 2)"))
        ).alias("name_title"),
        F.concat_ws("_", "p_brand", "p_type").alias("brand_type_key"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
    )


@register(
    "null_strategies",
    oracle="""
WITH s AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_discount > 0.05 THEN NULL ELSE l_extendedprice END AS price_sparse,
         CASE WHEN l_quantity > 45 THEN CAST('infinity' AS DOUBLE) ELSE l_tax END AS tax_raw,
         CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS flag_sparse
  FROM lineitem
), med AS (
  SELECT floor(quantile_cont(price_sparse, 0.5) * 10000 + 0.5) / 10000 AS median_price FROM s
)
SELECT l_orderkey, l_linenumber,
       round(coalesce(price_sparse, 0), 4) AS price_fill0,
       round(coalesce(price_sparse, median_price), 4) AS price_fill_median,
       coalesce(flag_sparse, 'Unknown') AS flag_fill,
       round(CASE WHEN isinf(tax_raw) THEN NULL ELSE tax_raw END, 4) AS tax_noinf
FROM s, med
""",
)
def null_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null handling suite: fill-0 / fill-median / fill-'Unknown' /
    ±inf→null (/root/reference/src/features/temporal.py:164-170,296-299;
    lightgbm_master.py:186-195).  Median computed in-plan and quantized
    before filling so both engines insert the identical double."""
    t = Catalog(spark, sf_dir)
    s = t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") > 0.05, F.lit(None)).otherwise(F.col("l_extendedprice")).alias("price_sparse"),
        F.when(F.col("l_quantity") > 45, F.lit(float("inf"))).otherwise(F.col("l_tax")).alias("tax_raw"),
        F.when(F.col("l_returnflag") == "N", F.lit(None)).otherwise(F.col("l_returnflag")).alias("flag_sparse"),
    )
    med = s.agg(r4(F.percentile("price_sparse", F.lit(0.5))).alias("median_price"))
    inf = F.lit(float("inf"))
    return (
        s.crossJoin(F.broadcast(med))
        .select(
            "l_orderkey",
            "l_linenumber",
            r4(F.coalesce("price_sparse", F.lit(0.0))).alias("price_fill0"),
            r4(F.coalesce("price_sparse", "median_price")).alias("price_fill_median"),
            F.coalesce("flag_sparse", F.lit("Unknown")).alias("flag_fill"),
            r4(
                F.when(F.abs(F.col("tax_raw")) == inf, F.lit(None)).otherwise(F.col("tax_raw"))
            ).alias("tax_noinf"),
        )
    )


@register(
    "frequency_encoding",
    oracle="""
SELECT p_partkey, p_brand,
       CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS brand_freq,
       round(count(*) OVER (PARTITION BY p_brand) * 1.0 / count(*) OVER (), 4) AS brand_freq_ratio
FROM part
""",
)
def frequency_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency encoding of a categorical
    (/root/reference/src/data/preprocessors.py:210-248): per-brand counts
    via an unordered keyed window (one shuffle, no join-back); the global
    denominator is a scalar aggregate broadcast back — never an
    empty-partition window, which would funnel every row into one task."""
    t = Catalog(spark, sf_dir)
    wb = W.partitionBy("p_brand")
    tot = t.part.agg(F.count(F.lit(1)).alias("_total_rows"))
    return (
        t.part.crossJoin(F.broadcast(tot))
        .select(
            "p_partkey",
            "p_brand",
            F.count(F.lit(1)).over(wb).cast("long").alias("brand_freq"),
            r4(F.count(F.lit(1)).over(wb) * F.lit(1.0) / F.col("_total_rows")).alias(
                "brand_freq_ratio"
            ),
        )
    )


@register(
    "label_encode_other",
    oracle="""
WITH f AS (
  SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand
), lab AS (
  SELECT p_brand, cnt,
         CASE WHEN cnt >= 70 THEN p_brand ELSE '__other__' END AS brand_bucket
  FROM f
), codes AS (
  SELECT DISTINCT brand_bucket,
         CAST(dense_rank() OVER (ORDER BY brand_bucket) AS BIGINT) AS brand_code
  FROM lab
)
SELECT p.p_partkey, p.p_brand, l.brand_bucket, c.brand_code
FROM part p JOIN lab l ON p.p_brand = l.p_brand
JOIN codes c ON l.brand_bucket = c.brand_bucket
""",
)
def label_encode_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label encoding with an '__other__' bucket for rare categories
    (/root/reference/src/data/preprocessors.py:210-248).  Codes assigned by
    dense_rank over the bucket name — deterministic, unlike hash/seen-order
    encoders."""
    t = Catalog(spark, sf_dir)
    f = t.part.groupBy("p_brand").agg(F.count(F.lit(1)).alias("cnt"))
    lab = f.select(
        "p_brand",
        F.when(F.col("cnt") >= 70, F.col("p_brand")).otherwise("__other__").alias("brand_bucket"),
    )
    codes = (
        lab.select("brand_bucket")
        .distinct()
        .withColumn("brand_code", F.dense_rank().over(W.orderBy("brand_bucket")).cast("long"))
    )
    return (
        t.part.select("p_partkey", "p_brand")
        .join(F.broadcast(lab), "p_brand")
        .join(F.broadcast(codes), "brand_bucket")
        .select("p_partkey", "p_brand", "brand_bucket", "brand_code")
    )


@register(
    "holiday_proximity",
    oracle=f"""
WITH holidays(h) AS (VALUES {_HOLIDAYS_SQL}),
d AS (SELECT DISTINCT o_orderdate FROM orders)
SELECT o_orderdate,
       CAST(min(abs(date_diff('day', h, o_orderdate))) AS INTEGER) AS days_to_holiday,
       CASE WHEN min(abs(date_diff('day', h, o_orderdate))) <= 3 THEN 1 ELSE 0 END
         AS is_holiday_window
FROM d CROSS JOIN holidays
GROUP BY o_orderdate
""",
)
def holiday_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holiday proximity via a broadcast cross join with a tiny holiday dim
    + min-abs-datediff — replaces the reference's row-wise python date scan
    (/root/reference/src/features/business_features_engine.py:388-410).
    Scale: |distinct dates| × |holidays| is tiny regardless of fact size."""
    t = Catalog(spark, sf_dir)
    holidays = spark.createDataFrame([(d,) for d in HOLIDAYS], ["h_str"]).select(
        F.to_timestamp("h_str").alias("h")
    )
    d = t.orders.select("o_orderdate").distinct()
    gap = F.abs(F.datediff(F.col("h"), F.col("o_orderdate")))
    return (
        d.crossJoin(F.broadcast(holidays))
        .groupBy("o_orderdate")
        .agg(F.min(gap).alias("days_to_holiday"))
        .select(
            "o_orderdate",
            "days_to_holiday",
            F.when(F.col("days_to_holiday") <= 3, 1).otherwise(0).alias("is_holiday_window"),
        )
    )


@register(
    "business_calendar_flags",
    oracle="""
SELECT o_orderkey,
       CASE WHEN isodow(o_orderdate) = 7 THEN 1 ELSE 0 END AS is_sunday,
       CASE WHEN month(o_orderdate) = 9 THEN 1 ELSE 0 END AS is_september,
       CASE WHEN day(o_orderdate) <= 5 OR day(o_orderdate) >= 25 THEN 1 ELSE 0 END AS is_payday_window,
       CASE WHEN month(o_orderdate) IN (2,3,4,5,6,8,9,10,11) THEN 1 ELSE 0 END AS is_school_period,
       CASE WHEN month(o_orderdate) IN (11,12) THEN 1 ELSE 0 END AS is_retail_event_season
FROM orders
""",
)
def business_calendar_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retail-calendar business flags: sunday/september/payday/school/
    retail-event-season
    (/root/reference/src/features/business_features_engine.py:55-453,
    temporal_features_engine.py:85-95)."""
    t = Catalog(spark, sf_dir)
    d = F.col("o_orderdate")
    mo = F.month(d)
    dom = F.dayofmonth(d)
    return t.orders.select(
        "o_orderkey",
        F.when(iso_dow(d) == 7, 1).otherwise(0).alias("is_sunday"),
        F.when(mo == 9, 1).otherwise(0).alias("is_september"),
        F.when((dom <= 5) | (dom >= 25), 1).otherwise(0).alias("is_payday_window"),
        F.when(mo.isin(2, 3, 4, 5, 6, 8, 9, 10, 11), 1).otherwise(0).alias("is_school_period"),
        F.when(mo.isin(11, 12), 1).otherwise(0).alias("is_retail_event_season"),
    )


@register(
    "clip_and_rewrite",
    oracle="""
WITH stats AS (
  SELECT floor(avg(l_extendedprice) * 10000 + 0.5) / 10000 AS mu,
         floor(stddev_samp(l_extendedprice) * 10000 + 0.5) / 10000 AS sigma
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_extendedprice,
       round(least(greatest(l_extendedprice, mu - 3 * sigma), mu + 3 * sigma), 4)
         AS price_clipped,
       round(l_extendedprice / nullif(l_quantity, 0), 4) AS unit_price,
       round(CASE WHEN l_extendedprice / nullif(l_quantity, 0) > 2000
                  THEN 2000.0 ELSE l_extendedprice / nullif(l_quantity, 0) END, 4)
         AS unit_price_capped
FROM lineitem, stats
""",
)
def clip_and_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value clipping to mean±3σ + conditional unit-price rewrite/cap
    (/root/reference/src/data/preprocessors.py:130-153,
    clean_data.py:124-138,204-219) — least/greatest + when chains with
    in-plan scalar stats."""
    t = Catalog(spark, sf_dir)
    stats = t.lineitem.agg(
        r4(F.avg("l_extendedprice")).alias("mu"),
        r4(F.stddev("l_extendedprice")).alias("sigma"),
    )
    unit = F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0.0))
    return (
        t.lineitem.crossJoin(F.broadcast(stats))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            r4(
                F.least(
                    F.greatest(F.col("l_extendedprice"), F.col("mu") - 3 * F.col("sigma")),
                    F.col("mu") + 3 * F.col("sigma"),
                )
            ).alias("price_clipped"),
            r4(unit).alias("unit_price"),
            r4(F.when(unit > 2000, F.lit(2000.0)).otherwise(unit)).alias("unit_price_capped"),
        )
    )


@register(
    "encode_target_oof",
    oracle="""
WITH base AS (
  SELECT coalesce(p_brand, 'Unknown') AS brand,
         l_orderkey % 5 AS fold,
         l_quantity AS target
  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
), bf AS (
  SELECT brand, fold,
         CAST(sum(target) AS DOUBLE) AS s, CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY 1, 2
), btot AS (
  SELECT brand, sum(s) AS s_all, CAST(sum(n) AS BIGINT) AS n_all
  FROM bf GROUP BY 1
), gtot AS (
  SELECT sum(s) AS gs, CAST(sum(n) AS BIGINT) AS gn FROM bf
)
SELECT bf.brand, CAST(bf.fold AS BIGINT) AS fold, bf.n AS n_fold_rows,
       round((btot.s_all - bf.s) / nullif(btot.n_all - bf.n, 0), 4) AS oof_mean,
       round(((btot.s_all - bf.s) + 20.0 * ((gtot.gs - bf.s) / (gtot.gn - bf.n)))
             / ((btot.n_all - bf.n) + 20.0), 4) AS oof_mean_smoothed
FROM bf JOIN btot ON bf.brand = btot.brand CROSS JOIN gtot
""",
)
def encode_target_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target (mean) encoding — the leakage-safe companion to
    ``frequency_encoding``/``label_encode_other``: each (brand, fold) cell
    is encoded with the target mean computed from every OTHER fold, plus an
    m=20 smoothed variant shrunk toward the fold-excluded global mean (the
    standard high-cardinality regularization).  The reference encodes
    categoricals with plain global means inside its feature pipeline
    (/root/reference/src/data/preprocessors.py:210-248,
    /root/reference/src/features/feature_pipeline.py:283-360); OOF encoding
    is what makes that feature legal to train on — the engine's CV
    splitters (``cv_walkforward_splits``) define the folds the same
    modular way.

    Exactness: quantities are integer-valued, so fold sums are exact
    doubles and (all − fold) differences are exact; every division divides
    identical doubles in both engines.

    Scale: two keyed aggregates (brand×fold, then brand) plus a broadcast
    scalar — the leave-one-fold-out encode needs NO per-row join because
    (all − own fold) is computed at the cell grain, then joins back to
    rows at scoring time on the (brand, fold) key."""
    t = Catalog(spark, sf_dir)
    base = t.lineitem.join(
        F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"), "left"
    ).select(
        F.coalesce(F.col("p_brand"), F.lit("Unknown")).alias("brand"),
        (F.col("l_orderkey") % 5).alias("fold"),
        F.col("l_quantity").alias("target"),
    )
    bf = base.groupBy("brand", "fold").agg(
        F.sum("target").cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    btot = bf.groupBy("brand").agg(
        F.sum("s").alias("s_all"), F.sum("n").cast("long").alias("n_all")
    )
    gtot = bf.agg(
        F.sum("s").alias("gs"), F.sum("n").cast("long").alias("gn")
    )
    j = bf.join(btot, "brand").crossJoin(F.broadcast(gtot))
    prior = (F.col("gs") - F.col("s")) / (F.col("gn") - F.col("n"))
    return j.select(
        "brand",
        F.col("fold").cast("long").alias("fold"),
        F.col("n").alias("n_fold_rows"),
        # nullif guard: a brand present in only one fold has no
        # out-of-fold rows — emit NULL (not inf/NaN) in BOTH engines
        r4(
            (F.col("s_all") - F.col("s"))
            / F.nullif(F.col("n_all") - F.col("n"), F.lit(0))
        ).alias("oof_mean"),
        r4(
            ((F.col("s_all") - F.col("s")) + F.lit(20.0) * prior)
            / ((F.col("n_all") - F.col("n")) + F.lit(20.0))
        ).alias("oof_mean_smoothed"),
    )


_QN_K = 20  # vigintile grid


def _qnorm_oracle() -> str:
    edges = ",\n         ".join(
        f"floor(quantile_cont(l_quantity, {k / _QN_K}) * 10000 + 0.5) / 10000"
        f" AS e{k}"
        for k in range(_QN_K + 1)
    )
    case = " ".join(
        f"WHEN idx = {k} THEN e{k}" for k in range(_QN_K + 1)
    )
    return f"""
WITH e AS (
  SELECT {edges}
  FROM lineitem
), r AS (
  SELECT l_suppkey, l_quantity,
         percent_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity) AS pr
  FROM lineitem
), idxed AS (
  SELECT l_suppkey, l_quantity,
         CAST(floor(pr * {_QN_K} + 0.5) AS INTEGER) AS idx
  FROM r
), mapped AS (
  SELECT l_suppkey, l_quantity,
         CAST(floor((CASE {case} END) * 10000 + 0.5) AS BIGINT) AS nq4
  FROM idxed CROSS JOIN e
)
SELECT l_suppkey,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l_quantity) / count(*), 4) AS raw_mean,
       round(sum(nq4) / (count(*) * 10000.0), 4) AS qnorm_mean
FROM mapped GROUP BY 1
"""


@register("quantile_normalize_store", oracle=_qnorm_oracle())
def quantile_normalize_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-store quantile normalization onto the global distribution: each
    row's within-store percent-rank is mapped to the global vigintile with
    that cumulative probability — the batch-effect remover that puts
    stores with wildly different volume scales on one comparable axis
    (the genomics-standard transform, applied to the same cross-store
    comparability problem the reference solves with per-store min-max
    scaling, /root/reference/src/models/cold_start_solutions.py:281-360).

    Exactness: percent_rank is a ratio of integers (identical doubles both
    engines), the grid index is a floor of that, global edges are
    r4-quantized and broadcast, and mapped values are integer-quantized
    before the per-store mean — fully order-free.

    Scale: one keyed rank window + one broadcast 21-edge row + one keyed
    aggregate; the CASE lookup stays whole-stage-codegen (no join against
    an edges table needed at this grid size)."""
    t = Catalog(spark, sf_dir)
    e = t.lineitem.agg(
        *[
            r4(F.percentile("l_quantity", F.lit(k / _QN_K))).alias(f"e{k}")
            for k in range(_QN_K + 1)
        ]
    )
    wr = W.partitionBy("l_suppkey").orderBy("l_quantity")
    r = t.lineitem.select(
        "l_suppkey", "l_quantity", F.percent_rank().over(wr).alias("pr")
    )
    idx = F.floor(F.col("pr") * _QN_K + F.lit(0.5)).cast("int")
    mapped_col = F.lit(None).cast("double")
    for k in range(_QN_K, -1, -1):
        mapped_col = F.when(idx == k, F.col(f"e{k}")).otherwise(mapped_col)
    mapped = r.crossJoin(F.broadcast(e)).select(
        "l_suppkey",
        "l_quantity",
        F.floor(mapped_col * 10000 + F.lit(0.5)).cast("long").alias("nq4"),
    )
    return mapped.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        r4(F.sum("l_quantity") / F.count(F.lit(1))).alias("raw_mean"),
        r4(F.sum("nq4") / (F.count(F.lit(1)) * F.lit(10000.0))).alias("qnorm_mean"),
    )
