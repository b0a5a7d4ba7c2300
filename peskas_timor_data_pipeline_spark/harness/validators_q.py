"""Validation-library queries (SURVEY.md §2.9) on the star-schema analogues:
orders ~ landings submissions, lineitem ~ catch rows, dims ~ metadata tables.
Alert numbering follows the reference (4/10 dates, 5 duration, 6 price,
14 categorical, 20 unit conversion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.harness.tables import load
from peskas_timor_data_pipeline_spark.operators.validation import (
    combine_validators,
    validate_bounds,
    validate_categorical,
    validate_date_order,
    validate_unit_conversion,
)


def _joined_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_shipdate"))
    return orders.join(first_ship, orders.o_orderkey == first_ship.l_orderkey, "left")


# --- alerts 4/10: date order + submission delay --------------------------------

def v_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _joined_orders(spark, sf_dir)
    out = validate_date_order(
        df, "o_orderkey", "o_orderdate", "first_shipdate", max_delay_days=60
    )
    return out.withColumnRenamed("alert_4_10", "alert_number")


V_DATES_ORACLE = """
WITH df AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ev, CAST(first_shipdate AS DATE) AS sub
  FROM orders LEFT JOIN (
    SELECT l_orderkey, min(l_shipdate) AS first_shipdate FROM lineitem GROUP BY l_orderkey
  ) ON o_orderkey = l_orderkey
), flagged AS (
  SELECT o_orderkey, ev,
         CASE WHEN ev > sub THEN 4
              WHEN date_diff('day', ev, sub) > 60 THEN 10 END AS alert_number
  FROM df
)
SELECT o_orderkey,
       CASE WHEN alert_number IS NULL THEN ev END AS o_orderdate,
       alert_number
FROM flagged
"""


# --- alert 5: duration bounds ----------------------------------------------------

def v_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _joined_orders(spark, sf_dir).withColumn(
        "trip_days", F.datediff(F.to_date("first_shipdate"), F.to_date("o_orderdate"))
    )
    out = validate_bounds(df, "o_orderkey", "trip_days", 0, 90, 5)
    return out.withColumnRenamed("alert_5", "alert_number")


V_DURATION_ORACLE = """
WITH df AS (
  SELECT o_orderkey,
         date_diff('day', CAST(o_orderdate AS DATE), CAST(first_shipdate AS DATE)) AS trip_days
  FROM orders LEFT JOIN (
    SELECT l_orderkey, min(l_shipdate) AS first_shipdate FROM lineitem GROUP BY l_orderkey
  ) ON o_orderkey = l_orderkey
)
SELECT o_orderkey,
       CASE WHEN trip_days IS NOT NULL AND (trip_days < 0 OR trip_days > 90)
            THEN NULL ELSE trip_days END AS trip_days,
       CASE WHEN trip_days IS NOT NULL AND (trip_days < 0 OR trip_days > 90)
            THEN 5 END AS alert_number
FROM df
"""


# --- alert 6: price ceiling --------------------------------------------------------

def v_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    out = validate_bounds(orders, "o_orderkey", "o_totalprice", None, 400000.0, 6)
    return out.withColumnRenamed("alert_6", "alert_number")


V_PRICE_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 400000.0 THEN NULL ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_totalprice > 400000.0 THEN 6 END AS alert_number
FROM orders
"""


# --- alert 14: categorical FK check --------------------------------------------------

def v_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    # inject invalid codes deterministically (synthetic bad survey entries)
    facts = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_nationkey") + 100)
        .otherwise(F.col("c_nationkey"))
        .alias("nation_code"),
    )
    out = validate_categorical(facts, "c_custkey", "nation_code", nation, "n_nationkey", 14)
    return out.withColumnRenamed("alert_14", "alert_number")


V_CATEGORICAL_ORACLE = """
WITH facts AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 100 ELSE c_nationkey END AS nation_code
  FROM customer
)
SELECT c_custkey,
       CASE WHEN nation_code IN (SELECT n_nationkey FROM nation) THEN nation_code END AS nation_code,
       CASE WHEN nation_code NOT IN (SELECT n_nationkey FROM nation) THEN 14 END AS alert_number
FROM facts
"""


# --- alert 20: unit conversion + ceiling ----------------------------------------------

def v_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    facts = li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("item_id"),
        F.col("l_quantity").alias("mesh"),
        F.when(F.col("l_returnflag") == "A", "inches").otherwise("mm").alias("unit"),
    )
    out = validate_unit_conversion(
        facts, "item_id", "mesh", "unit", "inches", 25.4, 800.0, 20
    )
    return out.withColumnRenamed("alert_20", "alert_number")


V_UNIT_ORACLE = """
WITH facts AS (
  SELECT concat_ws('-', l_orderkey, l_linenumber) AS item_id,
         CASE WHEN l_returnflag = 'A' THEN l_quantity * 25.4 ELSE l_quantity END AS mesh_std
  FROM lineitem
)
SELECT item_id,
       CASE WHEN mesh_std > 800.0 THEN NULL ELSE mesh_std END AS mesh_std,
       CASE WHEN mesh_std > 800.0 THEN 20 END AS alert_number
FROM facts
"""


# --- full orchestration: reduce-join + unite alert codes --------------------------------

def v_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    base = orders.select("o_orderkey")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_shipdate"))
    joined = orders.join(first_ship, orders.o_orderkey == first_ship.l_orderkey, "left")

    v_price_df = validate_bounds(orders, "o_orderkey", "o_totalprice", None, 400000.0, 6)
    v_dates_df = validate_date_order(
        joined, "o_orderkey", "o_orderdate", "first_shipdate", max_delay_days=60
    ).select("o_orderkey", "alert_4_10")
    v_qty_df = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .select("o_orderkey", F.when(F.col("total_qty") > 250, 11).alias("alert_11"))
    )
    out = combine_validators(base, [v_price_df, v_dates_df, v_qty_df], "o_orderkey")
    return out.select("o_orderkey", "o_totalprice", "alert")


V_COMBINED_ORACLE = """
WITH first_ship AS (
  SELECT l_orderkey, min(l_shipdate) AS first_shipdate FROM lineitem GROUP BY l_orderkey
), v_price AS (
  SELECT o_orderkey,
         CASE WHEN o_totalprice > 400000.0 THEN NULL ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_totalprice > 400000.0 THEN 6 END AS a6
  FROM orders
), v_dates AS (
  SELECT o_orderkey,
         CASE WHEN CAST(o_orderdate AS DATE) > CAST(first_shipdate AS DATE) THEN 4
              WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(first_shipdate AS DATE)) > 60 THEN 10
         END AS a410
  FROM orders LEFT JOIN first_ship ON o_orderkey = l_orderkey
), v_qty AS (
  SELECT l_orderkey AS o_orderkey,
         CASE WHEN sum(l_quantity) > 250 THEN 11 END AS a11
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey, v_price.o_totalprice,
       nullif(concat_ws('-', a6, a410, a11), '') AS alert
FROM (SELECT o_orderkey FROM orders) o
LEFT JOIN v_price USING (o_orderkey)
LEFT JOIN v_dates USING (o_orderkey)
LEFT JOIN v_qty USING (o_orderkey)
"""


QUERIES = {
    "v_dates": (v_dates, V_DATES_ORACLE),
    "v_duration": (v_duration, V_DURATION_ORACLE),
    "v_price": (v_price, V_PRICE_ORACLE),
    "v_categorical": (v_categorical, V_CATEGORICAL_ORACLE),
    "v_unit_conversion": (v_unit_conversion, V_UNIT_ORACLE),
    "v_combined": (v_combined, V_COMBINED_ORACLE),
}


# --- alerts 18/21/23: grouped MAD outlier validators (n_fishers/gleaners/fuel) ---

def v_outlier_fishers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD outlier validator per gear-type group (alert 18 n_fishers shape,
    R/validation-functions.R:579-594): per-group robust bounds, k=2.5."""
    from peskas_timor_data_pipeline_spark.operators.outliers import mad_alert

    li = load(spark, sf_dir, "lineitem")
    facts = li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("item_id"),
        "l_returnflag",
        F.col("l_quantity").alias("n_fishers"),
    )
    alerted = mad_alert(
        facts, "n_fishers", keys=["l_returnflag"], k=2.5, logt=True, alert_number=18
    )
    return alerted.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("alert_number") == 18, 1).otherwise(0)).alias("n_alerts"),
    )


V_OUTLIER_FISHERS_ORACLE = """
WITH facts AS (
  SELECT l_returnflag AS g, l_quantity AS x FROM lineitem
), med AS (
  SELECT g, median(ln(1 + x)) AS m,
         sum(CASE WHEN x <> 0 THEN 1 ELSE 0 END) AS nz
  FROM facts GROUP BY g
), mad AS (
  SELECT facts.g, median(abs(ln(1 + x) - m)) AS md
  FROM facts JOIN med USING (g) GROUP BY facts.g
), bounds AS (
  SELECT g,
         CASE WHEN nz > 0 AND md > 0 THEN exp(m - 2.5 * 1.4826 * md) - 1 END AS lo,
         CASE WHEN nz > 0 AND md > 0 THEN exp(m + 2.5 * 1.4826 * md) - 1 END AS hi
  FROM med JOIN mad USING (g)
)
SELECT g AS l_returnflag, count(*) AS n,
       CAST(sum(CASE WHEN x < lo OR x > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts
FROM facts JOIN bounds USING (g)
GROUP BY g
"""


# --- alert 17: price-per-kg thresholds (M3's live path) ---------------------------

def v_price_per_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-per-unit band check (alert 17, R/validation-functions.R:405-506:
    the production alert uses the 0.25-30 USD/kg band, not Cook's distance)."""
    li = load(spark, sf_dir, "lineitem")
    ppu = li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("item_id"),
        (F.col("l_extendedprice") / (F.col("l_quantity") * 1000.0)).alias("price_per_kg"),
    )
    alert = F.when(
        (F.col("price_per_kg") < 0.25) | (F.col("price_per_kg") > 30.0), 17
    )
    cleaned = F.when(alert.isNull(), F.col("price_per_kg"))
    return ppu.withColumn("alert_number", alert).withColumn(
        "price_per_kg", F.floor(cleaned * 1e6 + 0.5) / 1e6
    )


V_PRICE_PER_KG_ORACLE = """
WITH ppu AS (
  SELECT concat_ws('-', l_orderkey, l_linenumber) AS item_id,
         l_extendedprice / (l_quantity * 1000.0) AS price_per_kg
  FROM lineitem
)
SELECT item_id,
       floor((CASE WHEN price_per_kg < 0.25 OR price_per_kg > 30.0 THEN NULL
                  ELSE price_per_kg END) * 1e6 + 0.5) / 1e6 AS price_per_kg,
       CASE WHEN price_per_kg < 0.25 OR price_per_kg > 30.0 THEN 17 END AS alert_number
FROM ppu
"""

QUERIES.update({
    "v_outlier_fishers": (v_outlier_fishers, V_OUTLIER_FISHERS_ORACLE),
    "v_price_per_kg": (v_price_per_kg, V_PRICE_PER_KG_ORACLE),
})


# --- alerts 1-3: IMEI suffix validation ---------------------------------------------

def v_imei(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMEI validator (R/validation-functions.R:12-48): survey-entered
    trailing digits matched as a suffix against the device dimension.
    0 matches -> alert 3; exactly 1 -> replace with the full IMEI;
    >1 -> alert 2 (ambiguous); too-short entry -> alert 1."""
    from peskas_timor_data_pipeline_spark.operators.joins import suffix_regex_join

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_custkey").cast("string").alias("digits")
    )
    dim = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("full_code")
    )
    matched = suffix_regex_join(cust, dim, "digits", "full_code", min_len=2)
    return matched.select(
        "c_custkey",
        F.when(F.length("digits") < 2, 1)
        .when(F.col("__matches__") == 0, 3)
        .when(F.col("__matches__") > 1, 2)
        .alias("alert_number"),
        F.col("matched_value").alias("imei"),
    )


V_IMEI_ORACLE = """
WITH facts AS (
  SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS digits FROM customer
), matched AS (
  SELECT c_custkey, digits,
         count(full_code) AS n_matches,
         CASE WHEN count(full_code) = 1 THEN min(full_code) END AS imei
  FROM facts
  LEFT JOIN (SELECT CAST(p_partkey AS VARCHAR) AS full_code FROM part) p
    ON ends_with(p.full_code, facts.digits) AND length(facts.digits) >= 2
  GROUP BY c_custkey, digits
)
SELECT c_custkey,
       CASE WHEN length(digits) < 2 THEN 1
            WHEN n_matches = 0 THEN 3
            WHEN n_matches > 1 THEN 2 END AS alert_number,
       imei
FROM matched
"""

QUERIES["v_imei"] = (v_imei, V_IMEI_ORACLE)


# --- alert 22: catch-regularity consistency ------------------------------------------

def v_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catch-regularity validator (alert 22, R/validation-functions.R:115-184)
    on the star analogue: orders ~ submissions (no-catch marker + total
    value), lineitem ~ unnested catch rows (individual counts). The left
    join leaves order 'catch rows' null for lineitem-less orders,
    exercising the R ``sum(na.rm=TRUE) == 0`` branch."""
    from peskas_timor_data_pipeline_spark.operators.validation import (
        validate_regularity,
    )

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    facts = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left"
    ).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, "0")
        .otherwise(F.col("o_orderstatus"))
        .alias("species"),
        F.when(F.col("o_orderkey") % 13 == 0, 0.0)
        .otherwise(F.col("o_totalprice"))
        .alias("total_value"),
        F.col("l_quantity").alias("n_units"),
    )
    out = validate_regularity(
        facts, "o_orderkey", "species", "total_value", "n_units"
    )
    return out.withColumnRenamed("alert_22", "alert_number")


V_REGULARITY_ORACLE = """
WITH facts AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN '0' ELSE o_orderstatus END AS species,
         CASE WHEN o_orderkey % 13 = 0 THEN 0.0 ELSE o_totalprice END AS total_value,
         l_quantity AS n_units
  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
), agg AS (
  SELECT o_orderkey,
         min(species) AS species,
         min(abs(CAST(total_value AS DOUBLE))) AS total_value,
         coalesce(sum(abs(CAST(n_units AS DOUBLE))), 0.0) AS n_units
  FROM facts GROUP BY o_orderkey
), flagged AS (
  SELECT *,
         CASE WHEN (species = '0' AND n_units > 0)
                OR (species = '0' AND total_value > 0)
                OR (species <> '0' AND n_units <= 0)
                OR (species <> '0' AND total_value <= 0)
                OR (total_value <= 0 AND n_units > 0)
                OR (total_value > 0 AND n_units <= 0)
              THEN 22 END AS alert_number
  FROM agg
)
SELECT o_orderkey, species,
       CASE WHEN alert_number IS NULL THEN total_value END AS total_value,
       CASE WHEN alert_number IS NULL THEN n_units END AS n_units,
       alert_number
FROM flagged
"""

QUERIES["v_regularity"] = (v_regularity, V_REGULARITY_ORACLE)


# --- metadata cleaning specs (pt_validate_*, R/preprocess-metadata-tables.R:100-357) ----

def v_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metadata cleaning specs exercised as signal frames on synthetic
    dims built from the star schema: the reg-boats Dili/fallback case_when,
    the vms damage-after-install check + per-imei boat counts, the
    vessels-stats pipe-split, and the boat-length sanity gate
    (pipeline/metadata.py). Violations surface as rows rather than raises
    so the oracle can hash them."""
    from peskas_timor_data_pipeline_spark.pipeline.metadata import (
        boat_length_violations,
        validate_reg_boats,
        validate_vessels_stats,
        vms_boat_counts,
        vms_install_violations,
    )

    nation = load(spark, sf_dir, "nation")
    events = load(spark, sf_dir, "events")
    supplier = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part")

    reg = nation.select(
        F.when(F.col("n_nationkey") == 0, "Dili")
        .otherwise(F.col("n_name"))
        .alias("Municipality"),
        ((F.col("n_nationkey") * 37) % 200).alias("registered_boats_2016"),
        F.when(
            F.col("n_nationkey") % 5 != 0, (F.col("n_nationkey") * 53) % 200
        ).alias("registered_boats_2022"),
    )
    reg_out = validate_reg_boats(reg).select(
        F.lit("reg_boats").alias("rule"),
        F.col("reporting_region").alias("key"),
        F.col("n_boats").cast("long").alias("val"),
    )

    inst = events.filter(F.col("event_type").isin("signup", "error")).select(
        (F.col("user_id") % 300).cast("string").alias("device_imei"),
        F.when(F.col("event_type") == "signup", "installation")
        .otherwise("damage recorded")
        .alias("device_event_type"),
        (F.col("user_id") % 70).alias("boat_id"),
        F.to_date("ts").alias("device_event_date"),
    )
    viol = vms_install_violations(inst).select(
        F.lit("vms_damage_violation").alias("rule"),
        F.col("device_imei").alias("key"),
        F.lit(1).cast("long").alias("val"),
    )
    counts = vms_boat_counts(inst).select(
        F.lit("vms_boats").alias("rule"),
        F.col("device_imei").alias("key"),
        F.col("n_boats").cast("long").alias("val"),
    )

    vs = supplier.select(
        F.concat(
            F.lit(" "), F.col("s_name"), F.lit(" | T"),
            (F.col("s_suppkey") % 3).cast("string"), F.lit(" | junk"),
        ).alias("boat_numbers"),
        (F.col("s_suppkey") % 40).alias("n_boats"),
        F.lit("2024-01-01").alias("info_date"),
    )
    vs_out = validate_vessels_stats(vs).select(
        F.lit("vessels_stats").alias("rule"),
        F.concat(F.col("reporting_region"), F.lit("#"), F.col("type")).alias("key"),
        F.col("n_boats").cast("long").alias("val"),
    )

    boats = part.select(
        "p_partkey", (F.col("p_size") % 40).cast("double").alias("boat_length")
    )
    bl = boat_length_violations(boats).select(
        F.lit("boat_length_violation").alias("rule"),
        F.col("p_partkey").cast("string").alias("key"),
        F.col("boat_length").cast("long").alias("val"),
    )

    return reg_out.unionByName(viol).unionByName(counts).unionByName(vs_out).unionByName(bl)


V_METADATA_ORACLE = """
WITH reg AS (
  SELECT CASE WHEN n_nationkey = 0 THEN 'Dili' ELSE n_name END AS m,
         (n_nationkey * 37) % 200 AS b16,
         CASE WHEN n_nationkey % 5 <> 0 THEN (n_nationkey * 53) % 200 END AS b22
  FROM nation
), reg_out AS (
  SELECT 'reg_boats' AS rule, m AS key,
         CAST(CASE WHEN m = 'Dili' THEN b22
                   WHEN b22 IS NULL OR b22 < b16 THEN b16
                   ELSE b22 END AS BIGINT) AS val
  FROM reg
), inst AS (
  SELECT CAST(user_id % 300 AS VARCHAR) AS imei,
         CASE WHEN event_type = 'signup' THEN 'installation'
              ELSE 'damage recorded' END AS et,
         user_id % 70 AS boat_id,
         CAST(ts AS DATE) AS d
  FROM events WHERE event_type IN ('signup', 'error')
), per_imei AS (
  SELECT imei,
         min(CASE WHEN et = 'damage recorded' THEN d END) AS first_damage,
         max(CASE WHEN et = 'installation' THEN d END) AS last_install,
         count(DISTINCT boat_id) AS nb
  FROM inst GROUP BY imei
), viol AS (
  SELECT 'vms_damage_violation' AS rule, imei AS key, CAST(1 AS BIGINT) AS val
  FROM per_imei
  WHERE first_damage IS NOT NULL AND last_install IS NOT NULL
        AND first_damage <= last_install
), counts AS (
  SELECT 'vms_boats' AS rule, imei AS key, CAST(nb AS BIGINT) AS val FROM per_imei
), vs AS (
  SELECT trim(parts[1]) AS region, trim(parts[2]) AS typ, s_suppkey % 40 AS nb
  FROM (SELECT string_split(concat(' ', s_name, ' | T',
                 CAST(s_suppkey % 3 AS VARCHAR), ' | junk'), '|') AS parts,
               s_suppkey
        FROM supplier)
), vs_out AS (
  SELECT 'vessels_stats' AS rule, region || '#' || typ AS key,
         CAST(nb AS BIGINT) AS val
  FROM vs
), bl AS (
  SELECT 'boat_length_violation' AS rule, CAST(p_partkey AS VARCHAR) AS key,
         CAST(p_size % 40 AS BIGINT) AS val
  FROM part
  WHERE NOT (p_size % 40 > 0 AND p_size % 40 < 30)
)
SELECT * FROM reg_out
UNION ALL SELECT * FROM viol
UNION ALL SELECT * FROM counts
UNION ALL SELECT * FROM vs_out
UNION ALL SELECT * FROM bl
"""

QUERIES["v_metadata"] = (v_metadata, V_METADATA_ORACLE)


# --- report-feeding summaries (inst/report/*.Rmd, r09) ---------------------------------

def rp1_enumerator_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly survey-activity table (pipeline/report.py::
    enumerator_activity; enumerators_summary.Rmd:195-218): events stand
    in for survey submissions, event_type for the landing site — per
    (site, month) submissions, active days over a completed day spine,
    and the site's mean active days per month."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        enumerator_activity,
    )

    e = load(spark, sf_dir, "events")
    return enumerator_activity(e, "event_type", "ts", "event_id")


RP1_ORACLE = """
WITH per_day AS MATERIALIZED (
  SELECT event_type AS site, CAST(ts AS DATE) AS d,
         CAST(count(event_id) AS BIGINT) AS n_sub
  FROM events GROUP BY site, d
), spine AS (
  SELECT s.site, dd.d
  FROM (SELECT DISTINCT site FROM per_day) s
  CROSS JOIN (SELECT DISTINCT d FROM per_day) dd
), completed AS (
  SELECT sp.site, date_trunc('month', sp.d) AS month,
         COALESCE(p.n_sub, 0) AS n_sub
  FROM spine sp LEFT JOIN per_day p ON p.site = sp.site AND p.d = sp.d
), monthly AS MATERIALIZED (
  SELECT site, month,
         CAST(sum(n_sub) AS BIGINT) AS submissions,
         CAST(sum(CASE WHEN n_sub > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS active_days
  FROM completed GROUP BY site, month
), site_tot AS (
  SELECT site, CAST(sum(active_days) AS BIGINT) AS ad,
         CAST(count(*) AS BIGINT) AS nm
  FROM monthly GROUP BY site
)
SELECT m.site, m.month, m.submissions, m.active_days,
       round(CAST(t.ad AS DOUBLE) / t.nm, 6) AS mean_active_days
FROM monthly m JOIN site_tot t ON t.site = m.site
"""

QUERIES["rp1_enumerator_activity"] = (rp1_enumerator_activity, RP1_ORACLE)


def rp2_form_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(site, column) unanswered-question accounting
    (pipeline/report.py::completeness_by_group;
    unanswered_summary.Rmd:74-84). The fixture tables are null-free, so
    the query plants deterministic missingness first (value unanswered
    when event_id % 7 = 0, user_id when % 11 = 0 — both replayed by the
    oracle) and the operator does the actual counting."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        completeness_by_group,
    )

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("event_id") % 7 != 0, F.col("value")).alias("value"),
        F.when(F.col("event_id") % 11 != 0, F.col("user_id")).alias(
            "user_id"
        ),
        "ts",
    )
    return completeness_by_group(e, "event_type", ["value", "user_id", "ts"])


RP2_ORACLE = """
WITH masked AS (
  SELECT event_type AS grp,
         CASE WHEN event_id % 7 != 0 THEN value END AS value,
         CASE WHEN event_id % 11 != 0 THEN user_id END AS user_id,
         ts
  FROM events
), wide AS MATERIALIZED (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS m_value,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS m_user,
         CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS m_ts
  FROM masked GROUP BY grp
)
SELECT grp AS "group", column_name, n_rows, n_missing,
       n_missing * 1000000 // n_rows AS missing_ppm
FROM (
  SELECT grp, 'value' AS column_name, n_rows, m_value AS n_missing FROM wide
  UNION ALL
  SELECT grp, 'user_id', n_rows, m_user FROM wide
  UNION ALL
  SELECT grp, 'ts', n_rows, m_ts FROM wide
)
"""

QUERIES["rp2_form_completeness"] = (rp2_form_completeness, RP2_ORACLE)


def rp3_catch_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional catch-composition shares (pipeline/report.py::
    catch_composition; data_report.Rmd:1067-1078): lineitem rows stand
    in for catch records, the supplier's nation for the reporting
    region, the part-type's first word for the grouped taxa — per
    (region, taxa) catch completed over the full grid with per-region
    percent shares. Dims broadcast onto the fact scan."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        catch_composition,
    )

    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    prt = load(spark, sf_dir, "part")
    fact = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(prt), li.l_partkey == prt.p_partkey)
        .select(
            F.col("n_name").alias("region"),
            F.split(F.col("p_type"), " ").getItem(0).alias("taxa"),
            F.col("l_quantity").alias("catch_kg"),
        )
    )
    return catch_composition(fact, "region", "taxa", "catch_kg")


RP3_ORACLE = """
WITH fact AS (
  SELECT n.n_name AS region,
         string_split(p.p_type, ' ')[1] AS taxa,
         l.l_quantity AS c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
), agg AS MATERIALIZED (
  SELECT region, taxa, sum(c) AS catch FROM fact GROUP BY region, taxa
), grid AS (
  SELECT r.region, t.taxa
  FROM (SELECT DISTINCT region FROM agg) r
  CROSS JOIN (SELECT DISTINCT taxa FROM agg) t
), completed AS MATERIALIZED (
  SELECT g.region, g.taxa, COALESCE(a.catch, 0) AS catch
  FROM grid g LEFT JOIN agg a ON a.region = g.region AND a.taxa = g.taxa
), totals AS (
  SELECT region, sum(catch) AS total_catch FROM completed GROUP BY region
)
SELECT c.region, c.taxa, c.catch, t.total_catch,
       round(c.catch / t.total_catch * 100.0, 6) AS percent_catch
FROM completed c JOIN totals t ON t.region = c.region
"""

QUERIES["rp3_catch_composition"] = (rp3_catch_composition, RP3_ORACLE)


def rp4_period_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue/CPUE dispersion frame (pipeline/report.py::
    period_dispersion; data_report.Rmd:343-368): orders stand in for
    landings — landing-level catch is the per-order quantity total
    (integer-scaled, so the exact-sum sd is deterministic), then per
    month: median, sd, n, se and the qt(0.975, n-1) confidence
    interval via the Cornish-Fisher expansion both engines evaluate
    identically."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        period_dispersion,
    )

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    landing = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
        )
        .agg(F.sum("l_quantity").alias("catch"))
    )
    return period_dispersion(landing, "period", "catch")


def _rp4_oracle() -> str:
    from peskas_timor_data_pipeline_spark.pipeline.report import QT975_SMALL_DOF

    z = 1.959963984540054
    g1 = (z**3 + z) / 4.0
    g2 = (5 * z**5 + 16 * z**3 + 3 * z) / 96.0
    g3 = (3 * z**7 + 19 * z**5 + 17 * z**3 - 15 * z) / 384.0
    # exact small-dof qt values (ADVICE r10): same literal table as the
    # Spark side, so the engines can never diverge
    small = " ".join(
        f"WHEN {d} THEN CAST({v!r} AS DOUBLE)" for d, v in QT975_SMALL_DOF.items()
    )
    return f"""
WITH landing AS MATERIALIZED (
  SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS period,
         sum(l.l_quantity) AS v
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, period
), g AS MATERIALIZED (
  SELECT period, median(v) AS med_raw, sum(v) AS s, sum(v * v) AS ss,
         CAST(count(v) AS BIGINT) AS n
  FROM landing GROUP BY period
), stats AS (
  SELECT period, med_raw, n,
         CAST(n AS DOUBLE) AS nn,
         sqrt(greatest((ss - s * s / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1), 0.0)) AS sd_raw
  FROM g
)
SELECT period,
  round(med_raw, 6) AS med,
  CASE WHEN n >= 2 THEN round(sd_raw, 6) END AS sd,
  n,
  CASE WHEN n >= 2 THEN round(sd_raw / sqrt(nn), 6) END AS se,
  CASE WHEN n >= 2 THEN round(
    (sd_raw / sqrt(nn)) * (CASE CAST(n - 1 AS INTEGER) {small}
      ELSE {z!r} + {g1!r} / (nn - 1)
      + {g2!r} / ((nn - 1) * (nn - 1))
      + {g3!r} / ((nn - 1) * (nn - 1) * (nn - 1)) END), 6) END AS ic
FROM stats
"""


QUERIES["rp4_period_dispersion"] = (rp4_period_dispersion, _rp4_oracle())


def rp5_category_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category-share treemap frame (pipeline/report.py::category_share;
    data_report.Rmd:1281-1299): orders stand in for landings, the
    landing's gear is the deterministic first (modeled as min, the
    explicit ordering SURVEY §7.4 requires) of its line flags, and the
    fisher-composition category derives from the customer key — per
    (gear, category) landing counts with per-category percent shares."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        category_share,
    )

    from peskas_timor_data_pipeline_spark.pipeline.report import (
        string_rank_dict,
    )

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # min over a string never hash-aggregates (VERDICT r10 #1 class):
    # dictionary-encode the flag, min the long id, decode on the
    # order-cardinality frame — values identical to min(l_returnflag)
    fdict = string_rank_dict(li, "l_returnflag")
    gear = (
        li.join(F.broadcast(fdict), "l_returnflag")
        .groupBy("l_orderkey")
        .agg(F.min("__rank_id__").alias("__fid__"))
        .join(
            F.broadcast(
                fdict.select(
                    F.col("__rank_id__").alias("__fid__"),
                    F.col("l_returnflag").alias("gear"),
                )
            ),
            "__fid__",
        )
        .select("l_orderkey", "gear")
    )
    landing = gear.join(o, gear.l_orderkey == o.o_orderkey).select(
        "gear",
        F.when(F.col("o_custkey") % 4 == 0, F.lit("Women and childs"))
        .otherwise(F.lit("Only men"))
        .alias("category"),
    )
    return category_share(landing, "gear", "category")


RP5_ORACLE = """
WITH gear AS MATERIALIZED (
  SELECT l_orderkey AS k, min(l_returnflag) AS dim
  FROM lineitem GROUP BY l_orderkey
), cat AS (
  SELECT g.dim,
         CASE WHEN o.o_custkey % 4 = 0 THEN 'Women and childs'
              ELSE 'Only men' END AS category
  FROM gear g JOIN orders o ON o.o_orderkey = g.k
), counts AS MATERIALIZED (
  SELECT dim, category, CAST(count(*) AS BIGINT) AS n
  FROM cat GROUP BY dim, category
), totals AS (
  SELECT category, CAST(sum(n) AS BIGINT) AS n_tot FROM counts GROUP BY category
)
SELECT c.dim, c.category, c.n, t.n_tot,
       round(c.n / t.n_tot * 100.0, 2) AS pct
FROM counts c JOIN totals t ON t.category = c.category
"""

QUERIES["rp5_category_share"] = (rp5_category_share, RP5_ORACLE)


def rp6_nutrient_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Habitat x nutrient median density (pipeline/report.py::
    habitat_nutrient_density; data_report.Rmd:1440-1449): lineitem rows
    stand in for landing catch rows — habitat from the return flag,
    catch mass from quantity, three measure columns as the nutrient
    masses with RDI conversion factors; per (habitat, nutrient) the
    median individuals-per-kg, /10 then x100 exactly as the Rmd."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        habitat_nutrient_density,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("habitat"),
        F.col("l_quantity").alias("catch"),
        F.col("l_extendedprice").alias("protein"),
        F.col("l_tax").alias("zinc"),
        F.col("l_discount").alias("calcium"),
    )
    return habitat_nutrient_density(
        li,
        "habitat",
        "catch",
        ["protein", "zinc", "calcium"],
        {"protein": 50.0, "zinc": 11.0, "calcium": 1000.0},
    )


RP6_ORACLE = """
WITH long AS MATERIALIZED (
  SELECT l_returnflag AS habitat, 'protein' AS nutrient,
         (l_extendedprice / l_quantity) * 1000.0 / 50.0 AS v
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity <> 0
  UNION ALL
  SELECT l_returnflag, 'zinc', (l_tax / l_quantity) * 1000.0 / 11.0
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity <> 0
  UNION ALL
  SELECT l_returnflag, 'calcium', (l_discount / l_quantity) * 1000.0 / 1000.0
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity <> 0
)
SELECT habitat, nutrient, round(median(v) / 10.0 * 100.0, 6) AS inds_kg
FROM long GROUP BY habitat, nutrient
"""

QUERIES["rp6_nutrient_density"] = (rp6_nutrient_density, RP6_ORACLE)


def rp7_catch_use_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catch-usage proportions per taxon (pipeline/report.py::
    catch_use_share; data_report.Rmd:650-670 — the per-municipality
    variant at :706-726 is the same frame with a different key):
    lineitem rows stand in for landing-catch rows — the order is the
    landing, the part-type's first word the taxon, the return flag the
    catch-use — per (landing, taxon) the deterministic first use, drop
    the 'STANDARD' placeholder taxa (exercising the Rmd's
    `!catch_taxon %in% ("0")` filter), count per (taxon, use), share
    per taxon's total."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        catch_use_share,
    )

    li = load(spark, sf_dir, "lineitem")
    prt = load(spark, sf_dir, "part")
    fact = li.join(F.broadcast(prt), li.l_partkey == prt.p_partkey).select(
        F.col("l_orderkey").alias("landing"),
        F.split(F.col("p_type"), " ").getItem(0).alias("taxon"),
        F.col("l_returnflag").alias("catch_use"),
        F.col("l_quantity").alias("catch"),
    )
    return catch_use_share(
        fact, "landing", "taxon", "taxon", "catch_use", "catch",
        drop_taxa=("STANDARD",),
    )


RP7_ORACLE = """
WITH fact AS MATERIALIZED (
  SELECT l.l_orderkey AS landing,
         string_split(p.p_type, ' ')[1] AS taxon,
         l.l_returnflag AS u
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_quantity IS NOT NULL
), units AS MATERIALIZED (
  SELECT landing, taxon, min(u) AS catch_use
  FROM fact GROUP BY landing, taxon
), counts AS MATERIALIZED (
  SELECT taxon AS key, catch_use, CAST(count(*) AS BIGINT) AS obs
  FROM units WHERE taxon <> 'STANDARD'
  GROUP BY taxon, catch_use
), totals AS (
  SELECT key, CAST(sum(obs) AS BIGINT) AS tot_obs FROM counts GROUP BY key
)
SELECT c.key, c.catch_use, c.obs, t.tot_obs,
       round(c.obs / CAST(t.tot_obs AS DOUBLE), 6) AS prop_obs
FROM counts c JOIN totals t ON t.key = c.key
"""

QUERIES["rp7_catch_use_share"] = (rp7_catch_use_share, RP7_ORACLE)


def rp8_regional_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stacked-100% regional mix (pipeline/report.py::regional_mix;
    data_report.Rmd:235-252 gear bars, :269-278 propulsion): orders
    stand in for landings, the customer's nation for the municipality,
    the order priority for the gear — per (nation, priority) counts
    with nation totals, completed over the full grid (created rows get
    n = 0 and a NULL total, exactly the tidyr::complete +
    replace_na(list(n = 0)) behavior)."""
    from peskas_timor_data_pipeline_spark.pipeline.report import regional_mix

    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    fact = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("region"),
            F.col("o_orderpriority").alias("dim"),
        )
    )
    return regional_mix(fact, "region", "dim")


RP8_ORACLE = """
WITH fact AS MATERIALIZED (
  SELECT n.n_name AS key, o.o_orderpriority AS dim
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE n.n_name IS NOT NULL AND o.o_orderpriority IS NOT NULL
), counts AS MATERIALIZED (
  SELECT key, dim, CAST(count(*) AS BIGINT) AS n FROM fact GROUP BY key, dim
), totals AS (
  SELECT key, CAST(sum(n) AS BIGINT) AS tot_obs FROM counts GROUP BY key
), grid AS (
  SELECT k.key, d.dim
  FROM (SELECT DISTINCT key FROM counts) k
  CROSS JOIN (SELECT DISTINCT dim FROM counts) d
)
SELECT g.key, g.dim,
       CASE WHEN c.n IS NULL THEN NULL ELSE t.tot_obs END AS tot_obs,
       COALESCE(c.n, 0) AS n
FROM grid g
LEFT JOIN counts c ON c.key = g.key AND c.dim = g.dim
LEFT JOIN totals t ON t.key = g.key
"""

QUERIES["rp8_regional_mix"] = (rp8_regional_mix, RP8_ORACLE)


def rp9_survey_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey-activity heatmap frame (pipeline/report.py::
    survey_activity; data_report.Rmd:145-152): orders stand in for
    landing surveys — per (customer-nation, order month) counts over
    the completed nation x month grid, 0-filled where a region went
    silent for a month."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        survey_activity,
    )

    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    fact = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("region"),
            F.to_date("o_orderdate").alias("d"),
        )
    )
    return survey_activity(fact, "region", "d")


RP9_ORACLE = """
WITH fact AS MATERIALIZED (
  SELECT n.n_name AS region,
         CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), counts AS MATERIALIZED (
  SELECT region, month, CAST(count(*) AS BIGINT) AS obs
  FROM fact WHERE region IS NOT NULL GROUP BY region, month
), grid AS (
  SELECT r.region, m.month
  FROM (SELECT DISTINCT region FROM counts) r
  CROSS JOIN (SELECT DISTINCT month FROM fact WHERE month IS NOT NULL) m
)
SELECT g.region, g.month, COALESCE(c.obs, 0) AS obs
FROM grid g LEFT JOIN counts c ON c.region = g.region AND c.month = g.month
"""

QUERIES["rp9_survey_activity"] = (rp9_survey_activity, RP9_ORACLE)


def rp10_fisher_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-composition parallel frame (pipeline/report.py::
    fisher_mix; data_report.Rmd:1110-1160): lineitem rows stand in for
    landing-catch rows — the order is the landing, return flag the
    habitat, line status the gear, and three per-row integer columns
    the fisher counts — rolled up to landing-level deterministic
    firsts, unpivoted, and totaled per (habitat, gear, fisher type)."""
    from peskas_timor_data_pipeline_spark.pipeline.report import fisher_mix

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("landing"),
        F.col("l_returnflag").alias("habitat"),
        F.col("l_linestatus").alias("gear"),
        (F.col("l_linenumber") % 4).cast("long").alias("n_child"),
        (F.col("l_suppkey") % 5).cast("long").alias("n_man"),
        (F.col("l_partkey") % 3).cast("long").alias("n_woman"),
    )
    return fisher_mix(
        li, "landing", "habitat", "gear", ["n_child", "n_man", "n_woman"]
    )


RP10_ORACLE = """
WITH landing AS MATERIALIZED (
  SELECT l_orderkey AS landing,
         min(l_returnflag) AS habitat,
         min(l_linestatus) AS gear,
         min(l_linenumber % 4) AS n_child,
         min(l_suppkey % 5) AS n_man,
         min(l_partkey % 3) AS n_woman
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
  GROUP BY l_orderkey
), long AS (
  SELECT habitat, gear, 'n_child' AS name, n_child AS v FROM landing
  UNION ALL
  SELECT habitat, gear, 'n_man', n_man FROM landing
  UNION ALL
  SELECT habitat, gear, 'n_woman', n_woman FROM landing
)
SELECT habitat, gear, name, CAST(sum(v) AS BIGINT) AS value
FROM long GROUP BY habitat, gear, name
"""

QUERIES["rp10_fisher_mix"] = (rp10_fisher_mix, RP10_ORACLE)
