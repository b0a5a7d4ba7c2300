"""Metadata-table cleaning specs — the 15 ``pt_validate_*`` rules
(R/preprocess-metadata-tables.R:100-357) as declarative Spark transforms.

Each validator is a pure DataFrame -> DataFrame transform (casts, renames,
case_when recodes) plus, where the reference enforces one, a *violations*
frame the caller can inspect or raise on.  The reference stops the whole
pipeline on a violation (``stop(...)``); here the same semantics come from
:func:`enforce` — metadata tables are dimension-sized by contract (the
reference reads them from one spreadsheet), so the eager ``limit(1)``
existence probe is a driver round-trip over a few KB, while the cleaning
transforms themselves stay lazy and broadcast-joinable downstream.

Validator inventory (reference line numbers):
  devices            :154-158   imei -> string
  vms_installs       :111-143   event-date cast; damage-after-install check;
                                per-imei boat-count signal (check disabled
                                in the reference — kept as a signal)
  flags              :170-186   drop null messages; flag_id string; null/dup
                                flag_id checks
  boats              :197-217   last_modified ymd_hm cast; 0 < length < 30
  catch_types        :226-228   passthrough
  fao_catch          :237-239   passthrough
  morphometric_table :246-258   numeric casts (a, b, LengthMin..bL)
  centro_pescas      :267-269   passthrough
  gear_types         :271-273   passthrough
  vessel_types       :275-278   boat_code -> int
  stations           :280-282   passthrough
  reporting_unit     :284-286   passthrough
  habitat            :288-290   passthrough
  vessels_stats      :292-311   split 'a|b|c' -> (reporting_region, type),
                                trim, n_boats -> int
  registered_boats   :313-337   Dili-2022 / fallback-2016 case_when
  conservation       :339-345   select + code -> string
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MetadataValidationError(ValueError):
    """A metadata check the reference treats as fatal failed."""


def enforce(violations: DataFrame, message: str) -> None:
    """Raise iff the violations frame is non-empty (reference ``stop()``
    analogue). Dimension-sized input by contract — the probe reads at most
    one row."""
    if violations.limit(1).count() > 0:
        raise MetadataValidationError(message)


# --- individual table specs -----------------------------------------------------------

def validate_devices(devices: DataFrame) -> DataFrame:
    """pt_validate_devices (:154-158): imei stored as character."""
    return devices.withColumn("device_imei", F.col("device_imei").cast("string"))


def vms_install_violations(installs: DataFrame) -> DataFrame:
    """Damage-recorded-before-installation rows (:118-131): per imei with
    any 'damage recorded' event, every damage date must postdate every
    installation date. One partial-aggregated groupBy — no window, no
    self-join."""
    per_imei = (
        installs.groupBy("device_imei")
        .agg(
            F.min(
                F.when(
                    F.col("device_event_type") == "damage recorded",
                    F.col("device_event_date"),
                )
            ).alias("first_damage"),
            F.max(
                F.when(
                    F.col("device_event_type") == "installation",
                    F.col("device_event_date"),
                )
            ).alias("last_install"),
        )
    )
    return per_imei.filter(
        F.col("first_damage").isNotNull()
        & F.col("last_install").isNotNull()
        & (F.col("first_damage") <= F.col("last_install"))
    )


def vms_boat_counts(installs: DataFrame) -> DataFrame:
    """Per-imei distinct-boat count (:133-140). The reference computes it
    but leaves the >1 stop commented out; kept as a signal frame."""
    return installs.groupBy("device_imei").agg(
        F.countDistinct("boat_id").alias("n_boats")
    )


def validate_vms_installs(installs: DataFrame, strict: bool = False) -> DataFrame:
    """pt_validate_vms_installs (:111-143): date cast + damage-date check.

    ``strict`` defaults to False to match OBSERVED reference behavior: the
    reference's stop-guard is dormant (``any(isFALSE(flags))`` over a
    logical vector is always FALSE in R — ``isFALSE`` requires a length-1
    value — so its ``stop()`` is unreachable and data with
    damage-before-install rows flows through). ``strict=True`` upgrades
    the dormant check into a real gate; the violation frame is always
    computable via :func:`vms_install_violations` either way."""
    v = installs.withColumn(
        "device_event_date", F.to_date("device_event_date")
    )
    if strict:
        enforce(
            vms_install_violations(v),
            "detected damage recorded in vms prior to vms installation",
        )
    return v


def validate_flags(flags: DataFrame, strict: bool = True) -> DataFrame:
    """pt_validate_flags (:170-186): drop rows without a message, id as
    string; every flag needs an id and ids must be unique."""
    f = flags.filter(F.col("flag_message").isNotNull()).withColumn(
        "flag_id", F.col("flag_id").cast("string")
    )
    if strict:
        enforce(
            f.filter(F.col("flag_id").isNull()),
            "not all flags have a flag_id",
        )
        dupes = (
            f.groupBy("flag_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
        enforce(dupes, "flag_id are not unique")
    return f


def boat_length_violations(boats: DataFrame) -> DataFrame:
    """Out-of-range boat lengths (:205-215): non-null lengths must lie in
    (0, 30)."""
    return boats.filter(
        F.col("boat_length").isNotNull()
        & ~((F.col("boat_length") > 0) & (F.col("boat_length") < 30))
    )


def validate_boats(boats: DataFrame, strict: bool = False) -> DataFrame:
    """pt_validate_boats (:197-217): 'yyyy-MM-dd HH:mm' timestamp cast +
    length sanity check.

    ``strict`` defaults to False to match OBSERVED reference behavior: as
    with :func:`validate_vms_installs`, the reference's length check is an
    inert ``any(isFALSE(...))`` guard whose ``stop()`` never fires, so
    out-of-range boats are accepted in production. ``strict=True`` makes
    the check a real gate; :func:`boat_length_violations` exposes the
    offending rows either way."""
    b = boats.withColumn(
        "last_modified_time",
        F.to_timestamp("last_modified_time", "yyyy-MM-dd HH:mm"),
    )
    if strict:
        enforce(boat_length_violations(b), "detected boats with unvalid lengths")
    return b


_MORPHO_NUMERIC = (
    "a", "b", "LengthMin", "LengthMax", "CoeffDetermination", "aL", "bL",
)


def validate_morphometric_table(morpho: DataFrame) -> DataFrame:
    """pt_validate_morphometric_table (:246-258): coerce the coefficient
    columns to double (the reference's across(..., as.double)); columns
    absent from the frame are skipped, matching the tidyselect range."""
    out = morpho
    for c in _MORPHO_NUMERIC:
        if c in out.columns:
            out = out.withColumn(c, F.col(c).cast("double"))
    return out


def validate_vessel_types(vessel_types: DataFrame) -> DataFrame:
    """pt_validate_vessel_types (:275-278): boat_code -> int."""
    return vessel_types.withColumn("boat_code", F.col("boat_code").cast("int"))


def validate_vessels_stats(stats: DataFrame) -> DataFrame:
    """pt_validate_vessels_stats (:292-311): split 'region|type|rest' on
    the literal pipe, keep the first two parts, trim every string, and
    cast n_boats to int."""
    parts = F.split(F.col("boat_numbers"), "\\|")
    return stats.select(
        F.trim(parts.getItem(0)).alias("reporting_region"),
        F.trim(parts.getItem(1)).alias("type"),
        F.col("n_boats").cast("int").alias("n_boats"),
        F.col("info_date"),
    )


def validate_reg_boats(registered: DataFrame) -> DataFrame:
    """pt_validate_reg_boats (:313-337): Dili always uses the 2022 count;
    elsewhere fall back to 2016 when 2022 is missing or went DOWN (a
    decrease is treated as an unreliable recount)."""
    b16 = F.col("registered_boats_2016").cast("int")
    b22 = F.col("registered_boats_2022").cast("int")
    return registered.select(
        F.col("Municipality").alias("reporting_region"),
        F.when(F.col("Municipality") == "Dili", b22)
        .when(b22.isNull() | (b22 < b16), b16)
        .otherwise(b22)
        .alias("n_boats"),
    )


def validate_conservation(conservation: DataFrame) -> DataFrame:
    """pt_validate_conservation (:339-345)."""
    return conservation.select(
        F.col("conservation_code").cast("string").alias("conservation_code"),
        "conservation_place",
    )


def _passthrough(df: DataFrame) -> DataFrame:
    return df


# catch_types/fao_catch/centro_pescas/gear_types/stations/reporting_unit/
# habitat are explicit placeholders in the reference (:226-290)
VALIDATORS = {
    "devices": validate_devices,
    "vms_installs": validate_vms_installs,
    "flags": validate_flags,
    "boats": validate_boats,
    "catch_types": _passthrough,
    "fao_catch": _passthrough,
    "morphometric_table": validate_morphometric_table,
    "centro_pescas": _passthrough,
    "gear_types": _passthrough,
    "vessel_types": validate_vessel_types,
    "stations": _passthrough,
    "reporting_unit": _passthrough,
    "habitat": _passthrough,
    "vessels_stats": validate_vessels_stats,
    "registered_boats": validate_reg_boats,
    "conservation": validate_conservation,
}


def clean_metadata(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """preprocess_metadata_tables' validation stage (:59-80): apply each
    table's spec; unknown tables pass through untouched so callers can
    carry extra dims."""
    return {
        name: VALIDATORS.get(name, _passthrough)(df)
        for name, df in tables.items()
    }
