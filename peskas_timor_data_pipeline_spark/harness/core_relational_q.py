"""Core relational operators (SURVEY.md §2.2 P1-P12, §2.3 J1-J9, §2.6 O1-O5,
§2.7 scalars) exercised on the driver's star schema, each with a DuckDB
oracle twin.

Plan-shape notes are inline: dims broadcast, facts shuffle at most once on
their natural key, filters/projections reach the parquet scan via Catalyst
pushdown (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.functions.hashing import anonymized_id
from peskas_timor_data_pipeline_spark.harness.tables import (
    exact_avg, exact_avg_sql, exact_sum, exact_sum_sql, load,
)
from peskas_timor_data_pipeline_spark.operators.joins import (
    complete,
    one_to_one_day_match,
    reduce_join,
    suffix_regex_join,
)
from peskas_timor_data_pipeline_spark.operators.restructure import (
    coalesce_columns,
    deterministic_sample_n,
    distinct_except,
    replicate_rows,
    unite,
)


# --- P2: filter predicates + projection + derived columns -------------------

def p2_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & F.col("l_returnflag").isin("A", "R")
            & F.col("l_discount").between(0.02, 0.08)
            & F.col("l_quantity").isNotNull()
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


P2_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity AS qty,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_returnflag IN ('A', 'R')
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_quantity IS NOT NULL
"""


# --- P3/P4: semi / anti joins ------------------------------------------------

def p3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


P3_ORACLE = """
SELECT l_partkey, count(*) AS n_items
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_partkey
"""


def p4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


P4_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
"""


# --- P6: coalesce across column sets (coalist) -------------------------------

def p6_coalesce_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Synthesize the reference's cross-survey-version sparsity: the same
    # logical field lives in v3/v2/v1 columns, each populated for a slice.
    part = load(spark, sf_dir, "part")
    staged = part.select(
        "p_partkey",
        F.when(F.col("p_size") < 15, F.col("p_brand")).alias("v3_brand"),
        F.when(F.col("p_size").between(15, 35), F.lower(F.col("p_brand"))).alias("v2_brand"),
        F.upper(F.col("p_brand")).alias("v1_brand"),
    )
    return coalesce_columns(staged, {"brand": ["v3_brand", "v2_brand", "v1_brand"]})


P6_ORACLE = """
SELECT p_partkey,
       coalesce(CASE WHEN p_size < 15 THEN p_brand END,
                CASE WHEN p_size BETWEEN 15 AND 35 THEN lower(p_brand) END,
                upper(p_brand)) AS brand
FROM part
"""


# --- P7: case_when recode (+ broadcast mapping-table variant) ----------------

def p7_case_when_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pri_rank = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED"), 3)
        .otherwise(9)
    )
    status_name = (
        F.when(F.col("o_orderstatus") == "F", "fulfilled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
    )
    return (
        orders.withColumn("pri_rank", pri_rank)
        .withColumn("status_name", status_name)
        .groupBy("pri_rank", "status_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


P7_ORACLE = """
SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1
            WHEN o_orderpriority = '2-HIGH' THEN 2
            WHEN o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED') THEN 3
            ELSE 9 END AS pri_rank,
       CASE WHEN o_orderstatus = 'F' THEN 'fulfilled'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'partial' END AS status_name,
       count(*) AS n
FROM orders GROUP BY 1, 2
"""


# --- P7b: the FULL taxa -> fish-group recode table ----------------------------

def p7b_fish_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete ~50-taxon fish-group recode of R/export.R:287-352 AND
    its ingest-side variant (R/ingest-pds-data.R:622-690) through the
    production broadcast-dim path (pipeline/export.py::attach_fish_groups).
    Every taxon in the dim is exercised (parts cycle through the full code
    list plus two unmapped codes), so a missing/renamed branch, a wrong
    first-match resolution (SUR), or a silent Other-fallback for unmapped
    taxa (reference keeps NULL) all flip the hash."""
    from peskas_timor_data_pipeline_spark.pipeline.export import (
        FISH_GROUPS,
        attach_fish_groups,
    )

    taxa = [t for t, _ in FISH_GROUPS] + ["XXX", "YYY"]
    part = load(spark, sf_dir, "part")
    arr = F.array(*[F.lit(t) for t in taxa])
    coded = part.select(
        "p_partkey",
        arr[(F.col("p_partkey") % len(taxa)).cast("int")].alias("catch_taxon"),
    )
    outs = []
    for variant in ("export", "ingest"):
        outs.append(
            attach_fish_groups(coded, spark, variant)
            .groupBy("fish_group")
            .agg(
                F.count(F.lit(1)).alias("n_parts"),
                F.countDistinct("catch_taxon").alias("n_taxa"),
            )
            .select(F.lit(variant).alias("variant"), "*")
        )
    return outs[0].unionByName(outs[1])


def _p7b_sql() -> str:
    from peskas_timor_data_pipeline_spark.pipeline.export import (
        FISH_GROUPS,
        FISH_GROUPS_INGEST,
    )

    taxa = [t for t, _ in FISH_GROUPS] + ["XXX", "YYY"]
    idx_rows = ", ".join(f"({i}, '{t}')" for i, t in enumerate(taxa))

    def map_rows(pairs):
        return ", ".join(f"('{t}', '{g}')" for t, g in pairs)

    def leg(variant, pairs):
        return f"""
SELECT '{variant}' AS variant, m.fish_group,
       count(*) AS n_parts,
       count(DISTINCT c.catch_taxon) AS n_taxa
FROM coded c
LEFT JOIN (VALUES {map_rows(pairs)}) m(catch_taxon, fish_group)
       ON m.catch_taxon = c.catch_taxon
GROUP BY m.fish_group"""

    return f"""
WITH taxa(idx, catch_taxon) AS (VALUES {idx_rows}),
coded AS (
  SELECT p.p_partkey, t.catch_taxon
  FROM part p JOIN taxa t ON t.idx = p.p_partkey % {len(taxa)}
)
{leg('export', FISH_GROUPS)}
UNION ALL
{leg('ingest', FISH_GROUPS_INGEST)}
"""


# (registered after the QUERIES dict is created, see bottom of module)


# --- P9: late type casts ------------------------------------------------------

def p9_type_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference reads everything as string and casts late (S3); model
    # that: stringify, then cast back with validation.
    orders = load(spark, sf_dir, "orders")
    raw = orders.select(
        F.col("o_orderkey").cast("string").alias("id_str"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.col("o_totalprice").cast("string").alias("price_str"),
    )
    return raw.select(
        F.col("id_str").cast("long").alias("o_orderkey"),
        F.to_date("date_str").alias("order_date"),
        F.round(F.col("price_str").cast("double"), 2).alias("price"),
    )


P9_ORACLE = """
SELECT CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS o_orderkey,
       CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS order_date,
       round(CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE), 2) AS price
FROM orders
"""


# --- P10: row replication -----------------------------------------------------

def p10_replicate_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    return (
        replicate_rows(nation, 5)
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


P10_ORACLE = """
SELECT n_regionkey, count(*) AS n_rows
FROM nation, range(5)
GROUP BY n_regionkey
"""


# --- P11: deterministic per-group sampling ------------------------------------

def p11_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return deterministic_sample_n(orders, ["o_orderpriority"], n=1)


P11_ORACLE = """
SELECT o_orderkey, o_orderpriority
FROM (
  SELECT o_orderkey, o_orderpriority,
         row_number() OVER (
            PARTITION BY o_orderpriority
            ORDER BY md5(concat_ws(chr(31), '0', CAST(o_orderkey AS VARCHAR), o_orderpriority))
         ) AS rn
  FROM orders
) WHERE rn = 1
"""


# --- P12: distinct ignoring a column -------------------------------------------

def p12_distinct_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    )
    return distinct_except(li, ["l_linenumber"])


P12_ORACLE = """
SELECT l_orderkey, l_partkey, l_suppkey,
       CAST(min(l_linenumber) AS INTEGER) AS l_linenumber
FROM lineitem
GROUP BY l_orderkey, l_partkey, l_suppkey
"""


# --- J1: left join through broadcast dim chain ---------------------------------

def j1_left_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    out = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_avg("c_acctbal", 100).alias("avg_acctbal"),
        )
    )
    return out


J1_ORACLE = f"""
SELECT r_name, count(*) AS n_customers, {exact_avg_sql('c_acctbal', 100)} AS avg_acctbal
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- J3: right join against a dimension spine ----------------------------------

def j3_right_join_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey, "right")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )


J3_ORACLE = """
SELECT c_custkey, c_mktsegment, coalesce(n_orders, 0) AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) t
  ON o_custkey = c_custkey
"""


# --- J4: full outer join + coalesce ---------------------------------------------

def j4_full_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    by_order_day = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    by_ship_day = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_ships")
    )
    return (
        by_order_day.join(by_ship_day, "d", "full")
        .select(
            "d",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
        )
    )


J4_ORACLE = """
SELECT coalesce(a.d, b.d) AS d,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(n_ships, 0) AS n_ships
FROM (SELECT CAST(o_orderdate AS DATE) d, count(*) n_orders FROM orders GROUP BY 1) a
FULL JOIN (SELECT CAST(l_shipdate AS DATE) d, count(*) n_ships FROM lineitem GROUP BY 1) b
  USING (d)
"""


# --- J5: constrained 1:1-per-day match (merge_trips) -----------------------------

def j5_one_to_one_day_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Landings/tracker analogue: split lineitem into two "sources" and match
    # per (ship day, supplier) only where each side has exactly one row.
    li = load(spark, sf_dir, "lineitem")
    left = li.filter(F.col("l_linenumber") == 1).select(
        F.to_date("l_shipdate").alias("d"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_orderkey").alias("landing_id"),
        F.col("l_quantity").alias("landing_qty"),
    )
    right = li.filter(F.col("l_linenumber") == 2).select(
        F.to_date("l_shipdate").alias("d"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_orderkey").alias("tracker_id"),
        F.col("l_extendedprice").alias("tracker_price"),
    )
    matched = one_to_one_day_match(left, right, ["d", "sk"])
    return matched.groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("landing_id").alias("n_landings"),
        F.count("tracker_id").alias("n_tracks"),
        F.sum(
            F.when(F.col("landing_id").isNotNull() & F.col("tracker_id").isNotNull(), 1).otherwise(0)
        ).alias("n_matched"),
        F.round(F.sum("landing_qty"), 2).alias("sum_qty"),
    )


J5_ORACLE = """
WITH l AS (
  SELECT CAST(l_shipdate AS DATE) d, l_suppkey sk, l_orderkey landing_id, l_quantity landing_qty,
         count(*) OVER (PARTITION BY CAST(l_shipdate AS DATE), l_suppkey) AS n
  FROM lineitem WHERE l_linenumber = 1
), r AS (
  SELECT CAST(l_shipdate AS DATE) d, l_suppkey sk, l_orderkey tracker_id, l_extendedprice tracker_price,
         count(*) OVER (PARTITION BY CAST(l_shipdate AS DATE), l_suppkey) AS n
  FROM lineitem WHERE l_linenumber = 2
), matched AS (
  SELECT coalesce(a.d, b.d) d, coalesce(a.sk, b.sk) sk,
         a.landing_id, a.landing_qty, b.tracker_id, b.tracker_price
  FROM (SELECT * FROM l WHERE n = 1) a
  FULL JOIN (SELECT * FROM r WHERE n = 1) b USING (d, sk)
  UNION ALL BY NAME
  SELECT d, sk, landing_id, landing_qty, NULL tracker_id, NULL tracker_price FROM l WHERE n <> 1
  UNION ALL BY NAME
  SELECT d, sk, NULL landing_id, NULL landing_qty, tracker_id, tracker_price FROM r WHERE n <> 1
)
SELECT count(*) AS n_rows,
       count(landing_id) AS n_landings,
       count(tracker_id) AS n_tracks,
       CAST(sum(CASE WHEN landing_id IS NOT NULL AND tracker_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       round(sum(landing_qty), 2) AS sum_qty
FROM matched
"""


# --- J6 + O5: reduce-join of validator-style outputs + unite --------------------

def j6_reduce_join_unite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    base = orders.select("o_orderkey")
    v1 = orders.select(
        "o_orderkey", F.when(F.col("o_totalprice") > 400000, 6).alias("alert_price")
    )
    v2 = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 2).alias("alert_priority"),
    )
    v3 = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.when(F.sum("l_quantity") > 250, 11).alias("alert_qty")
    )
    joined = reduce_join([base, v1, v2, v3], on="o_orderkey", how="left")
    return unite(joined, "alert", ["alert_price", "alert_priority", "alert_qty"])


J6_ORACLE = """
WITH v1 AS (SELECT o_orderkey, CASE WHEN o_totalprice > 400000 THEN 6 END AS alert_price FROM orders),
v2 AS (SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT' THEN 2 END AS alert_priority FROM orders),
v3 AS (SELECT l_orderkey AS o_orderkey, CASE WHEN sum(l_quantity) > 250 THEN 11 END AS alert_qty
       FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderkey,
       nullif(concat_ws('-', v1.alert_price, v2.alert_priority, v3.alert_qty), '') AS alert
FROM (SELECT o_orderkey FROM orders) o
LEFT JOIN v1 USING (o_orderkey)
LEFT JOIN v2 USING (o_orderkey)
LEFT JOIN v3 USING (o_orderkey)
"""


# --- J8: complete (cross of dims, zero-filled) ----------------------------------

def j8_complete_crossfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n")
    )
    return complete(counts, ["l_suppkey", "l_returnflag"], fill={"n": 0})


J8_ORACLE = """
SELECT s.l_suppkey, f.l_returnflag, coalesce(c.n, 0) AS n
FROM (SELECT DISTINCT l_suppkey FROM lineitem) s
CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) f
LEFT JOIN (SELECT l_suppkey, l_returnflag, count(*) n FROM lineitem GROUP BY 1, 2) c
  USING (l_suppkey, l_returnflag)
"""


# --- J9: suffix regex match join (IMEI validation shape) -------------------------

def j9_suffix_match_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_custkey").cast("string").alias("digits")
    )
    dim = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("full_code")
    )
    out = suffix_regex_join(cust, dim, "digits", "full_code", min_len=1)
    return out.select("c_custkey", "__matches__", "matched_value").withColumnRenamed(
        "__matches__", "n_matches"
    )


J9_ORACLE = """
SELECT c_custkey,
       count(full_code) AS n_matches,
       CASE WHEN count(full_code) = 1 THEN min(full_code) END AS matched_value
FROM (SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS digits FROM customer) c
LEFT JOIN (SELECT CAST(p_partkey AS VARCHAR) AS full_code FROM part) p
  ON ends_with(p.full_code, c.digits) AND length(c.digits) >= 1
GROUP BY c_custkey
"""


# --- O1: multi-key sort + top-n with explicit rank --------------------------------

def o1_sort_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("rank", "o_orderkey", "o_totalprice")
    )


O1_ORACLE = """
SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank,
       o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# --- O2: union by name with missing columns ----------------------------------------

def o2_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", F.lit("v1").alias("survey_version")
    )
    v2 = orders.filter(F.col("o_orderstatus") != "F").select(
        "o_orderkey",
        "o_orderpriority",
        F.lit("v2").alias("survey_version"),
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return merged.groupBy("survey_version").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderpriority").alias("n_priority"),
    )


O2_ORACLE = """
WITH merged AS (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, 'v1' AS survey_version
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL BY NAME
  SELECT o_orderkey, NULL AS o_totalprice, o_orderpriority, 'v2' AS survey_version
  FROM orders WHERE o_orderstatus <> 'F'
)
SELECT survey_version, count(*) AS n,
       count(o_totalprice) AS n_price, count(o_orderpriority) AS n_priority
FROM merged GROUP BY survey_version
"""


# --- O4: set ops on key columns ------------------------------------------------------

def o4_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    sold = li.select(F.col("l_partkey").alias("p_partkey")).distinct()
    big = part.filter(F.col("p_size") > 40).select("p_partkey")
    never_sold_big = big.exceptAll(sold)
    sold_big = big.intersect(sold)
    return never_sold_big.withColumn("status", F.lit("never_sold")).unionByName(
        sold_big.withColumn("status", F.lit("sold"))
    )


O4_ORACLE = """
SELECT p_partkey, 'never_sold' AS status
FROM (SELECT p_partkey FROM part WHERE p_size > 40
      EXCEPT ALL
      SELECT DISTINCT l_partkey FROM lineitem)
UNION ALL
SELECT p_partkey, 'sold' AS status
FROM (SELECT p_partkey FROM part WHERE p_size > 40
      INTERSECT
      SELECT DISTINCT l_partkey FROM lineitem)
"""


# --- F: scalar string / date / math / hash / json batteries ---------------------------

def f_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "").alias("no_digits"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


F_STRING_ORACLE = """
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       regexp_replace(c_name, '[0-9]', '', 'g') AS no_digits,
       substring(c_name, 1, 8) AS prefix,
       upper(c_mktsegment) AS seg_upper,
       CAST(length(c_name) AS INTEGER) AS name_len,
       concat_ws('|', c_name, c_mktsegment) AS joined,
       trim('  x  ') AS trimmed
FROM customer
"""


def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from peskas_timor_data_pipeline_spark.functions.datetime_fns import (
        week_start_sunday,
    )

    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("d"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.trunc(F.to_date("o_orderdate"), "month").alias("month_start"),
        week_start_sunday(F.col("o_orderdate")).alias("week_sunday"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_horizon"
        ),
        F.date_format("o_orderdate", "MMMM yyyy").alias("period_label"),
    )


F_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_trunc('week', CAST(o_orderdate AS DATE) + 1) - 1 AS DATE) AS week_sunday,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_horizon,
       strftime(o_orderdate, '%B %Y') AS period_label
FROM orders
"""


def f_math_hash_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(F.log1p(F.abs("value")), 6).alias("log1p_value"),
        F.round(F.pow("value", F.lit(0.5)), 6).alias("sqrt_value"),
        F.round(F.exp(F.lit(1.0) * F.col("value") / 1000.0), 6).alias("exp_scaled"),
        F.floor(F.col("value") / 25.0).cast("long").alias("bucket"),
        anonymized_id(F.col("event_id"), F.col("user_id")).alias("anon_id"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


F_MATH_ORACLE = """
SELECT event_id,
       round(ln(1 + abs(value)), 6) AS log1p_value,
       round(pow(value, 0.5), 6) AS sqrt_value,
       round(exp(value / 1000.0), 6) AS exp_scaled,
       CAST(floor(value / 25.0) AS BIGINT) AS bucket,
       md5(concat_ws(' ', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR))) AS anon_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
"""


QUERIES = {
    "p2_filter_project": (p2_filter_project, P2_ORACLE),
    "p3_semi_join": (p3_semi_join, P3_ORACLE),
    "p4_anti_join": (p4_anti_join, P4_ORACLE),
    "p6_coalesce_columns": (p6_coalesce_columns, P6_ORACLE),
    "p7_case_when_recode": (p7_case_when_recode, P7_ORACLE),
    "p9_type_casts": (p9_type_casts, P9_ORACLE),
    "p10_replicate_rows": (p10_replicate_rows, P10_ORACLE),
    "p11_sample_deterministic": (p11_sample_deterministic, P11_ORACLE),
    "p12_distinct_except": (p12_distinct_except, P12_ORACLE),
    "j1_left_join_dims": (j1_left_join_dims, J1_ORACLE),
    "j3_right_join_spine": (j3_right_join_spine, J3_ORACLE),
    "j4_full_outer_coalesce": (j4_full_outer_coalesce, J4_ORACLE),
    "j5_one_to_one_day_match": (j5_one_to_one_day_match, J5_ORACLE),
    "j6_reduce_join_unite": (j6_reduce_join_unite, J6_ORACLE),
    "j8_complete_crossfill": (j8_complete_crossfill, J8_ORACLE),
    "j9_suffix_match_join": (j9_suffix_match_join, J9_ORACLE),
    "o1_sort_topn": (o1_sort_topn, O1_ORACLE),
    "o2_union_by_name": (o2_union_by_name, O2_ORACLE),
    "o4_set_ops": (o4_set_ops, O4_ORACLE),
    "f_string_functions": (f_string_functions, F_STRING_ORACLE),
    "f_date_functions": (f_date_functions, F_DATE_ORACLE),
    "f_math_hash_json": (f_math_hash_json, F_MATH_ORACLE),
}


# --- P1: pattern-based projection + rename (tidyselect) -------------------------

def p1_pattern_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # starts_with("l_") ∩ numeric measure columns, renamed without prefix
    # (the engine-side equivalent of tidyselect + regex renaming P8)
    measures = [c for c in li.columns if c.startswith("l_") and c.endswith(("price", "quantity", "discount", "tax"))]
    renamed = li.select(
        "l_orderkey", *[F.col(c).alias(c.removeprefix("l_")) for c in measures]
    )
    return renamed.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        *[exact_avg(c.removeprefix("l_"), 100).alias(f"avg_{c.removeprefix('l_')}") for c in measures],
    )


P1_ORACLE = f"""
SELECT count(*) AS n,
       {exact_avg_sql('l_quantity', 100)} AS avg_quantity,
       {exact_avg_sql('l_extendedprice', 100)} AS avg_extendedprice,
       {exact_avg_sql('l_discount', 100)} AS avg_discount,
       {exact_avg_sql('l_tax', 100)} AS avg_tax
FROM lineitem
"""


# --- P5: bulk mutate across columns ----------------------------------------------

def p5_mutate_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    # across(everything(), standardize): trim/uppercase all string cols,
    # log1p all measures — the reference's across() idiom (P5/P8)
    part = load(spark, sf_dir, "part")
    strings = ["p_name", "p_brand", "p_type"]
    out = part.select(
        "p_partkey",
        *[F.upper(F.trim(F.col(c))).alias(c) for c in strings],
        F.round(F.log1p("p_retailprice"), 6).alias("log_price"),
        F.round(F.log1p("p_size"), 6).alias("log_size"),
    )
    return out


P5_ORACLE = """
SELECT p_partkey,
       upper(trim(p_name)) AS p_name,
       upper(trim(p_brand)) AS p_brand,
       upper(trim(p_type)) AS p_type,
       round(ln(1 + p_retailprice), 6) AS log_price,
       round(ln(1 + p_size), 6) AS log_size
FROM part
"""


# --- J2: inner join with aggregation ----------------------------------------------

def j2_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey, "inner")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


J2_ORACLE = """
SELECT s_suppkey, s_name, n_name, r_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


# --- J7: join a dimension into a nested column (explode-join-renest) ---------------

def j7_join_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from peskas_timor_data_pipeline_spark.operators.joins import join_nested
    from peskas_timor_data_pipeline_spark.operators.restructure import nest, unnest

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand", "p_retailprice"
    )
    nested = nest(
        li, ["l_orderkey"], "items", ["l_partkey", "l_quantity"]
    )
    joined = join_nested(
        nested, "items", part, on="l_partkey", keys=["l_orderkey"],
        carry_scalars=True,  # one shuffle: no scalar re-attach join
    )
    flat = unnest(joined, "items")
    return flat.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        exact_avg("p_retailprice", 100).alias("avg_price"),
    )


J7_ORACLE = f"""
SELECT p_brand, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty,
       {exact_avg_sql('p_retailprice', 100)} AS avg_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

QUERIES.update({
    "p1_pattern_projection": (p1_pattern_projection, P1_ORACLE),
    "p5_mutate_across": (p5_mutate_across, P5_ORACLE),
    "j2_inner_join": (j2_inner_join, J2_ORACLE),
    "j7_join_nested": (j7_join_nested, J7_ORACLE),
})


# --- J10: as-of join (backward, union+window rewrite) --------------------------------

def j10_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach to each purchase the user's most recent prior-or-same-time
    view (backward as-of). The oracle is DuckDB's NATIVE ASOF JOIN, so the
    one-shuffle union+window rewrite is value-checked against a reference
    implementation of the real operator semantics."""
    from peskas_timor_data_pipeline_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases, views, keys=["user_id"], ts_col="ts",
        payload_cols=["view_id", "view_value"], right_ts_out="view_ts",
    )
    return out.select(
        "user_id", "purchase_id", "view_ts", "view_id",
        F.round("view_value", 6).alias("view_value"),
    )


J10_ORACLE = """
WITH p AS (
  SELECT user_id, ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, event_id AS view_id, value AS view_value
  FROM events WHERE event_type = 'view'
)
SELECT p.user_id, p.purchase_id, v.ts AS view_ts, v.view_id,
       round(v.view_value, 6) AS view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
"""

QUERIES["j10_asof_join"] = (j10_asof_join, J10_ORACLE)


def j10b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase attaches the user's EARLIEST
    same-or-later view — same one-shuffle union+window plan, following
    window instead of preceding."""
    from peskas_timor_data_pipeline_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = asof_join(
        purchases, views, keys=["user_id"], ts_col="ts",
        payload_cols=["view_id"], right_ts_out="view_ts",
        direction="forward",
    )
    return out.select("user_id", "purchase_id", "view_ts", "view_id")


J10B_ORACLE = """
WITH p AS (
  SELECT user_id, ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, event_id AS view_id FROM events WHERE event_type = 'view'
)
SELECT p.user_id, p.purchase_id, v.ts AS view_ts, v.view_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
"""

QUERIES["j10b_asof_forward"] = (j10b_asof_forward, J10B_ORACLE)


def j10c_asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of with a 1-hour tolerance (pandas merge_asof
    semantics): both fills come from ONE sorted window pass; ties at equal
    distance resolve backward; out-of-tolerance sides never block the
    other."""
    from peskas_timor_data_pipeline_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = asof_join(
        purchases, views, keys=["user_id"], ts_col="ts",
        payload_cols=["view_id"], right_ts_out="view_ts",
        direction="nearest", tolerance=3600.0,
    )
    return out.select("user_id", "purchase_id", "view_ts", "view_id")


J10C_ORACLE = """
WITH p AS (
  SELECT user_id, ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, event_id AS view_id FROM events WHERE event_type = 'view'
), b AS (
  SELECT p.user_id, p.purchase_id, p.ts, v.ts AS b_ts, v.view_id AS b_id
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
), bf AS (
  SELECT b.*, v.ts AS f_ts, v.view_id AS f_id
  FROM b ASOF LEFT JOIN v ON b.user_id = v.user_id AND v.ts >= b.ts
), scored AS (
  SELECT *,
    (epoch_us(ts) - epoch_us(b_ts)) / 1e6 AS db,
    (epoch_us(f_ts) - epoch_us(ts)) / 1e6 AS df,
    b_ts IS NOT NULL AND (epoch_us(ts) - epoch_us(b_ts)) / 1e6 <= 3600 AS b_ok,
    f_ts IS NOT NULL AND (epoch_us(f_ts) - epoch_us(ts)) / 1e6 <= 3600 AS f_ok
  FROM bf
)
SELECT user_id, purchase_id,
  CASE WHEN b_ok AND (NOT f_ok OR db <= df) THEN b_ts WHEN f_ok THEN f_ts END AS view_ts,
  CASE WHEN b_ok AND (NOT f_ok OR db <= df) THEN b_id WHEN f_ok THEN f_id END AS view_id
FROM scored
"""

QUERIES["j10c_asof_nearest_tolerance"] = (j10c_asof_nearest_tolerance, J10C_ORACLE)


# --- J11: interval containment join (binned equi-join rewrite) ------------------------

def j11_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks landing inside the hour before each purchase, as a binned
    equi-join (no range-join explosion). Oracle = the plain inequality
    join, so the rewrite's exactness is value-checked."""
    from peskas_timor_data_pipeline_spark.operators.joins import interval_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
        F.col("event_id").alias("purchase_id"),
    )
    out = interval_join(
        clicks, windows, keys=["user_id"], ts_col="ts",
        start_col="w_start", end_col="w_end", bin_seconds=3600,
    )
    return out.select("user_id", "click_id", "purchase_id")


J11_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click'
), w AS (
  SELECT user_id, ts - INTERVAL 1 HOUR AS w_start, ts AS w_end,
         event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_id, w.purchase_id
FROM c JOIN w ON c.user_id = w.user_id AND c.ts >= w.w_start AND c.ts <= w.w_end
"""

QUERIES["j11_interval_join"] = (j11_interval_join, J11_ORACLE)


# --- J12: SCD2 dimension build + point-in-time fact lookup ----------------------------

def j12_scd2_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases as a per-user change log -> SCD2 validity intervals;
    click/view facts resolved to the version valid at their timestamp via
    the as-of union+window rewrite (no range join), then counted per
    version. Oracle = the plain interval-containment LEFT JOIN, so both
    the interval bounds and the as-of lookup are value-checked."""
    from peskas_timor_data_pipeline_spark.operators.joins import (
        asof_join,
        scd2_intervals,
    )

    ev = load(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.round("value", 6).alias("status_value")
    )
    facts = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts"
    )
    dim = scd2_intervals(changes, ["user_id"], "ts", "event_id").drop("event_id")
    matched = asof_join(
        facts, changes.select("user_id", "ts"), ["user_id"], "ts", [],
        right_ts_out="valid_from",
    )
    counts = (
        matched.filter(F.col("valid_from").isNotNull())
        .groupBy("user_id", "valid_from")
        .agg(F.count(F.lit(1)).alias("n_facts"))
    )
    return dim.join(counts, ["user_id", "valid_from"], "left").select(
        "user_id", "valid_from", "valid_to", "is_current", "status_value",
        F.coalesce("n_facts", F.lit(0)).alias("n_facts"),
    )


J12_ORACLE = """
WITH chg AS (
  SELECT user_id, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         round(value, 6) AS status_value
  FROM events WHERE event_type = 'purchase'
), facts AS (
  SELECT user_id, ts FROM events WHERE event_type IN ('click', 'view')
)
SELECT c.user_id, c.valid_from, c.valid_to,
       c.valid_to IS NULL AS is_current, c.status_value,
       count(f.ts) AS n_facts
FROM chg c LEFT JOIN facts f
  ON f.user_id = c.user_id AND f.ts >= c.valid_from
 AND (c.valid_to IS NULL OR f.ts < c.valid_to)
GROUP BY c.user_id, c.valid_from, c.valid_to, c.status_value
"""

QUERIES["j12_scd2_temporal"] = (j12_scd2_temporal, J12_ORACLE)


# --- P13: dataset-version snapshot diff -------------------------------------------------

def p13_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release audit between two synthetic snapshots of orders (v1 drops
    every 13th key, v2 drops every 11th, bumps totalprice on multiples of
    7 and rewrites status on multiples of 17): classify every key
    added/removed/changed/unchanged with the differing columns named,
    aggregated per class with a key checksum so each row's classification
    is pinned."""
    from peskas_timor_data_pipeline_spark.operators.restructure import snapshot_diff

    orders = load(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 13 != 5).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 11 != 3).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 17 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 100)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    diff = snapshot_diff(v1, v2, ["o_orderkey"])
    return diff.groupBy("change", "changed_cols").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_checksum"),
    )


P13_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 5
), v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 17 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 11 <> 3
), j AS (
  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
         a.o_orderkey AS ak, b.o_orderkey AS bk,
         a.o_orderstatus AS os1, b.o_orderstatus AS os2,
         a.o_totalprice AS tp1, b.o_totalprice AS tp2
  FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
), cls AS (
  SELECT k,
         CASE WHEN ak IS NULL THEN 'added'
              WHEN bk IS NULL THEN 'removed'
              WHEN (os1 IS DISTINCT FROM os2) OR (tp1 IS DISTINCT FROM tp2)
                THEN 'changed'
              ELSE 'unchanged' END AS change,
         CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
                   AND ((os1 IS DISTINCT FROM os2) OR (tp1 IS DISTINCT FROM tp2))
              THEN array_to_string(list_sort(list_filter([
                     CASE WHEN os1 IS DISTINCT FROM os2 THEN 'o_orderstatus' END,
                     CASE WHEN tp1 IS DISTINCT FROM tp2 THEN 'o_totalprice' END
                   ], x -> x IS NOT NULL)), ',')
              ELSE '' END AS changed_cols
  FROM j
)
SELECT change, changed_cols, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS key_checksum
FROM cls GROUP BY change, changed_cols
"""

QUERIES["p13_snapshot_diff"] = (p13_snapshot_diff, P13_ORACLE)


# --- P14: one-pass column profile -------------------------------------------------------

_P14_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"]


def p14_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-QA dataset profile of the orders table: per column, rows /
    nulls / exact distincts, min-max for numerics. Counts are integers and
    min/max are untouched stored values, so the whole profile is
    engine-exact."""
    from peskas_timor_data_pipeline_spark.operators.restructure import (
        profile_columns,
    )

    orders = load(spark, sf_dir, "orders")
    return profile_columns(orders, _P14_COLS)


def _p14_sql() -> str:
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    parts = []
    for c in _P14_COLS:
        mn = f"CAST(min({c}) AS DOUBLE)" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(max({c}) AS DOUBLE)" if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(f"""
SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {mn} AS min_value, {mx} AS max_value
FROM orders""")
    return "\nUNION ALL\n".join(parts)


QUERIES["p14_profile_columns"] = (p14_profile_columns, _p14_sql())


# --- J13: grid-blocked radius self-join -------------------------------------------------

def j13_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor pairs within euclidean radius 5 over points derived from
    events (x = value, y = event_id mod 97): 3x3 grid-cell blocking plus
    exact-distance verify. The oracle computes the all-pairs truth, so any
    blocking miss (or dup) breaks row count and hash."""
    from peskas_timor_data_pipeline_spark.operators.joins import (
        grid_neighbor_join,
    )

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    pts = ev.select(
        "event_id",
        F.col("value").alias("x"),
        (F.col("event_id") % 97).cast("double").alias("y"),
    )
    return grid_neighbor_join(pts, "event_id", "x", "y", radius=5.0)


J13_ORACLE = """
WITH pts AS (
  SELECT event_id, value AS x, CAST(event_id % 97 AS DOUBLE) AS y
  FROM events WHERE event_id % 20 = 0
)
SELECT a.event_id AS id_a, b.event_id AS id_b,
       round(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6)
         AS dist
FROM pts a JOIN pts b ON a.event_id < b.event_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 25.0
"""

QUERIES["j13_grid_neighbor_join"] = (j13_grid_neighbor_join, J13_ORACLE)


# --- P15: k-anonymity audit -------------------------------------------------------------

def p15_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance audit before publishing: equivalence classes over
    the quasi-identifier pair (nation, market segment); classes smaller
    than k=5 are re-identification risks. One partial-aggregated groupBy
    plus a one-row rollup — all integer."""
    k = 5
    cust = load(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("n").alias("min_class_size"),
        F.sum(F.when(F.col("n") < k, 1).otherwise(0)).cast("long").alias(
            "n_risky_classes"
        ),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)).cast("long").alias(
            "n_risky_rows"
        ),
    )


P15_ORACLE = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       min(n) AS min_class_size,
       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes,
       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows
FROM classes
"""

QUERIES["p15_k_anonymity"] = (p15_k_anonymity, P15_ORACLE)


# --- P16: referential-integrity audit ---------------------------------------------------

def p16_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gate FK audit: orphan counts for the three core foreign
    keys (lineitem->orders, orders->customer, customer->nation), each an
    anti-join count — one row per relationship, all integer."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    def audit(name, child, fk, parent, pk):
        orphans = child.join(
            parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
        )
        return child.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).cast("long").alias("n_child"),
        ).crossJoin(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        )
    out = audit("lineitem.l_orderkey -> orders", li, "l_orderkey", orders, "o_orderkey")
    out = out.unionByName(
        audit("orders.o_custkey -> customer", orders, "o_custkey", cust, "c_custkey")
    )
    return out.unionByName(
        audit("customer.c_nationkey -> nation", cust, "c_nationkey", nation, "n_nationkey")
    )


P16_ORACLE = """
SELECT 'lineitem.l_orderkey -> orders' AS relationship,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'orders.o_custkey -> customer',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'customer.c_nationkey -> nation',
       CAST((SELECT count(*) FROM customer) AS BIGINT),
       CAST((SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
"""

QUERIES["p16_fk_audit"] = (p16_fk_audit, P16_ORACLE)


# --- J14: fuzzy join (edit distance <= 1, deletion-neighborhood blocked) ----------------

def j14_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: supplier names vs a deterministically mutated
    copy (one char dropped at s_suppkey mod length) matched at edit
    distance <= 1 through deletion-neighborhood blocking. Numeric-suffix
    names also match their substitution neighbors, so the result
    exercises all three edit kinds; the oracle is the all-pairs
    levenshtein truth."""
    from peskas_timor_data_pipeline_spark.operators.joins import fuzzy_join_1edit

    sup = load(spark, sf_dir, "supplier")
    clean = sup.select("s_name")
    dirty = sup.select(
        F.expr(
            "concat(substr(s_name, 1, CAST(s_suppkey % length(s_name) AS INT)), "
            "substr(s_name, CAST(s_suppkey % length(s_name) AS INT) + 2))"
        ).alias("dirty_name")
    )
    out = fuzzy_join_1edit(dirty, clean, "dirty_name", "s_name")
    return out.select(
        F.col("left_value").alias("dirty_name"),
        F.col("right_value").alias("s_name"),
    )


J14_ORACLE = """
WITH clean AS (SELECT DISTINCT s_name FROM supplier),
dirty AS (
  SELECT DISTINCT
         substr(s_name, 1, CAST(s_suppkey % length(s_name) AS INTEGER))
         || substr(s_name, CAST(s_suppkey % length(s_name) AS INTEGER) + 2)
           AS dirty_name
  FROM supplier
)
SELECT d.dirty_name, c.s_name
FROM dirty d JOIN clean c ON levenshtein(d.dirty_name, c.s_name) <= 1
"""

QUERIES["j14_fuzzy_join"] = (j14_fuzzy_join, J14_ORACLE)


# --- P17: order-insensitive dataset fingerprint -----------------------------------------

def p17_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint of five orders columns
    (operators/restructure.py::dataset_fingerprint): per column the xor
    and split-sum of 48-bit md5 value hashes — the sort-free way to verify
    a table rewrite/migration byte-for-byte at any scale. Doubles are
    integer-scaled (cents) BEFORE hashing: the fingerprint contract hashes
    the cast-to-string form, and float-to-string formatting is the one
    cast the engines don't share."""
    from peskas_timor_data_pipeline_spark.operators.restructure import (
        dataset_fingerprint,
    )

    orders = load(spark, sf_dir, "orders")
    sel = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        F.expr("cast(round(o_totalprice * 100) as long)").alias("price_cents"),
    )
    return dataset_fingerprint(sel)


def _p17_col_sql(col: str, expr: str) -> str:
    h = f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 12))::BIGINT"
    return f"""
SELECT '{col}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({expr}) AS BIGINT) AS n_null,
       CAST(bit_xor({h}) AS BIGINT) AS xor48,
       CAST(sum({h} // {1 << 24}) AS BIGINT) AS sum_hi,
       CAST(sum({h} % {1 << 24}) AS BIGINT) AS sum_lo
FROM orders"""


P17_ORACLE = " UNION ALL ".join(
    _p17_col_sql(c, e)
    for c, e in [
        ("o_orderkey", "o_orderkey"),
        ("o_custkey", "o_custkey"),
        ("o_orderpriority", "o_orderpriority"),
        ("o_orderdate", "CAST(o_orderdate AS VARCHAR)"),
        ("price_cents", "CAST(round(o_totalprice * 100) AS BIGINT)"),
    ]
)

QUERIES["p17_dataset_fingerprint"] = (p17_dataset_fingerprint, P17_ORACLE)


# --- P18: functional-dependency audit ---------------------------------------------------

def p18_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit of candidate functional dependencies: for each
    declared FD lhs -> rhs, the share of lhs values mapping to MORE than
    one rhs value (0 ppm = the FD holds; the partner check to p16's
    referential audit). One distinct + one two-level partial-aggregated
    groupBy per FD — the countDistinct compiles to the expand/partial
    shape, never a row collect. Checked here: p_brand -> p_mfgr (holds by
    TPC-H construction), c_nationkey -> n_name via the nation join
    (holds), and o_custkey -> o_orderpriority (expected to be violated —
    customers order under many priorities)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    def audit(df: DataFrame, lhs: str, rhs: str, fd_name: str) -> DataFrame:
        per_lhs = df.groupBy(lhs).agg(
            F.countDistinct(rhs).alias("__n_rhs__")
        )
        return per_lhs.agg(
            F.lit(fd_name).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs"),
            F.sum(F.when(F.col("__n_rhs__") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.expr(
                "sum(CASE WHEN __n_rhs__ > 1 THEN 1 ELSE 0 END) * 1000000L"
                " div count(*)"
            ).alias("violation_ppm"),
        )

    cust_nation = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_nationkey", "n_name")
    return (
        audit(
            customer.select("c_custkey", "c_nationkey"),
            "c_custkey", "c_nationkey", "c_custkey->c_nationkey",
        )
        .unionByName(
            audit(cust_nation, "c_nationkey", "n_name", "c_nationkey->n_name")
        )
        .unionByName(
            audit(
                orders.select("o_custkey", "o_orderpriority"),
                "o_custkey", "o_orderpriority", "o_custkey->o_orderpriority",
            )
        )
    )


def _p18_fd_sql(table_expr: str, lhs: str, rhs: str, fd_name: str) -> str:
    return f"""
SELECT '{fd_name}' AS fd,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS violation_ppm
FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS n_rhs FROM {table_expr} GROUP BY {lhs})
"""


P18_ORACLE = " UNION ALL ".join([
    _p18_fd_sql("customer", "c_custkey", "c_nationkey", "c_custkey->c_nationkey"),
    _p18_fd_sql(
        "(SELECT c_nationkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey)",
        "c_nationkey", "n_name", "c_nationkey->n_name",
    ),
    _p18_fd_sql("orders", "o_custkey", "o_orderpriority", "o_custkey->o_orderpriority"),
])

QUERIES["p18_fd_audit"] = (p18_fd_audit, P18_ORACLE)
QUERIES["p7b_fish_groups"] = (p7b_fish_groups, _p7b_sql())
