"""Landings preprocessing: wide Kobo exports -> the two-level nested model.

Re-implements the reference's signature operators:
- ``nest_species``      <- pt_nest_species (R/pt_nest_species.R:36-119)
- ``nest_attachments``  <- pt_nest_attachments (R/pt_nest_attachments.R:40-72)
- ``merge_landings``    <- merge_landings + merge_versions
                           (R/merge-landings.R:36-163)

The reference pivots wide->long->renests eagerly in memory; here the nested
column is built DIRECTLY as an array<struct> expression over the wide
columns — zero shuffles, pure projection, streams at scan speed at any
scale. Column-name convention: ``species_group.{N}.species_group/<field>``
and length classes ``.../no_individuals_{a}_{b}`` / ``over60``
(naming documented at R/pt_nest_species.R:42-52).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPECIES_RE = re.compile(r"^species_group\.(\d+)\.species_group/")
_LENGTH_RE = re.compile(r"no_fish_by_length_group/no_individuals_(\d+)_(\d+)$")
_ATTACH_RE = re.compile(r"^_attachments\.(\d+)\.")


def _c(name: str) -> Column:
    return F.col(f"`{name}`")


def _species_indices(df: DataFrame) -> list[int]:
    return sorted({int(m.group(1)) for c in df.columns if (m := _SPECIES_RE.match(c))})


def _length_individuals_expr(df: DataFrame, n: int) -> Column:
    """array<struct<mean_length, n_individuals>> for repeat-group n.

    Class ``a_b`` -> mean_length (a+b)/2; the ``over60`` class takes the
    surveyed actual length from ``fish_length_over60``
    (R/pt_nest_species.R:57-91; unit-test value check: class 5_10 -> 7.5)."""
    prefix = f"species_group.{n}.species_group/no_fish_by_length_group/"
    entries = []
    for col in df.columns:
        if not col.startswith(prefix):
            continue
        m = _LENGTH_RE.search(col)
        if m:
            a, b = int(m.group(1)), int(m.group(2))
            entries.append(
                ((a + b) / 2.0, F.lit((a + b) / 2.0), _c(col).cast("double"))
            )
    over60 = f"{prefix}no_individuals_over60"
    over60_len = f"{prefix}fish_length_over60"
    if over60 in df.columns:
        length = (
            _c(over60_len).cast("double")
            if over60_len in df.columns
            else F.lit(62.5)
        )
        entries.append((999.0, length, _c(over60).cast("double")))
    if not entries:
        return F.lit(None).cast("array<struct<mean_length:double,n_individuals:double>>")
    structs = [
        F.struct(mean.alias("mean_length"), cnt.alias("n_individuals"))
        for (_k, mean, cnt) in sorted(entries, key=lambda e: e[0])
    ]
    arr = F.array(*structs)
    return F.filter(arr, lambda x: x["n_individuals"].isNotNull())


def nest_species(df: DataFrame, id_col: str = "_id") -> DataFrame:
    """Collapse every ``species_group.{N}.*`` wide column into one
    ``species_group`` array<struct> column with nested
    ``length_individuals`` (two levels, §1.1). Pure projection."""
    groups = []
    for n in _species_indices(df):
        base = f"species_group.{n}.species_group/"

        def maybe(field: str) -> Column:
            col = f"{base}{field}"
            return _c(col) if col in df.columns else F.lit(None).cast("string")

        groups.append(
            F.struct(
                F.lit(str(n)).alias("n"),
                maybe("species").alias("species"),
                maybe("food_or_sale").alias("food_or_sale"),
                _length_individuals_expr(df, n).alias("length_individuals"),
            )
        )
    wide_cols = [c for c in df.columns if _SPECIES_RE.match(c)]
    if not groups:
        return df
    nested = F.filter(F.array(*groups), lambda x: x["species"].isNotNull())
    return df.withColumn("species_group", nested).drop(*wide_cols)


def nest_attachments(df: DataFrame) -> DataFrame:
    """Collapse ``_attachments.{M}.*`` into an array<struct<download_url,id>>
    (pt_nest_attachments, R/pt_nest_attachments.R:40-72)."""
    indices = sorted({int(m.group(1)) for c in df.columns if (m := _ATTACH_RE.match(c))})
    if not indices:
        return df
    structs = []
    for m in indices:
        url, aid = f"_attachments.{m}.download_url", f"_attachments.{m}.id"
        structs.append(
            F.struct(
                (_c(url) if url in df.columns else F.lit(None).cast("string")).alias("download_url"),
                (_c(aid) if aid in df.columns else F.lit(None).cast("string")).alias("id"),
            )
        )
    wide = [c for c in df.columns if _ATTACH_RE.match(c)]
    arr = F.filter(
        F.array(*structs),
        lambda x: x["download_url"].isNotNull() | x["id"].isNotNull(),
    )
    return df.withColumn("_attachments", arr).drop(*wide)


def merge_landings(versions: dict[str, DataFrame], coalesce_spec: dict | None = None) -> DataFrame:
    """Union the per-survey-version frames by name (missing columns null,
    like bind_rows), tag ``survey_version``, then apply the declarative
    cross-version coalesce spec (merge_versions, R/merge-landings.R:89-163)."""
    from peskas_timor_data_pipeline_spark.operators.restructure import coalesce_columns
    from peskas_timor_data_pipeline_spark.schemas import MERGE_VERSIONS_SPEC

    tagged = [
        df.withColumn("survey_version", F.lit(version))
        for version, df in versions.items()
    ]
    merged = tagged[0]
    for t in tagged[1:]:
        merged = merged.unionByName(t, allowMissingColumns=True)
    return coalesce_columns(merged, coalesce_spec or MERGE_VERSIONS_SPEC)


def unnest_catches(df: DataFrame, id_cols: list[str]) -> DataFrame:
    """Fully flatten the two-level nested model back to one row per
    (submission, species, length class) — the shape weights/nutrients
    computations run on (R/calculate-weights.R:317-318)."""
    sp = df.select(*id_cols, F.explode_outer("species_group").alias("sp"))
    sp_fields = [f.name for f in sp.schema["sp"].dataType.fields]
    scalar = [f for f in sp_fields if f != "length_individuals"]
    li = sp.select(
        *id_cols,
        *[F.col(f"sp.{f}").alias("species_n" if f == "n" else f) for f in scalar],
        F.explode_outer("sp.length_individuals").alias("li"),
    )
    li_fields = [f.name for f in li.schema["li"].dataType.fields]
    return li.select(
        *[c for c in li.columns if c != "li"],
        *[F.col(f"li.{f}").alias(f) for f in li_fields],
    )
