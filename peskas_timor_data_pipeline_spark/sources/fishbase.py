"""FishBase/taxize snapshot lookups (S17/M8).

The reference resolves each catch-type taxon to a FishBase species list at
runtime, one rfishbase API call per taxon rank (``get_fish_length``,
R/calculate-weights.R:158-211: common_to_sci / species-by-Class/Order/
Family/Genus/Species, then a country filter with an all-species fallback
when the country has no museum records), loops codes in R
(``retrieve_lengths``, :212-262) and row-binds.

Spark-first redesign: the snapshot is pre-flattened OFFLINE into one long
dimension table ``(rank, name, species, c_code)`` — one row per (taxonomic
handle, species, country record) — so the whole per-taxon dispatch becomes
a single broadcast equi-join on ``(rank, name)``; the country filter with
fallback is a second join pass, not a per-code branch. No API in the hot
path, no driver loop, and the lookup scales with the catch-type table, not
with rfishbase latency.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_species(
    snapshot: DataFrame,
    taxa: DataFrame,
    country_codes: Sequence[int] | None = None,
    code_col: str = "interagency_code",
) -> DataFrame:
    """Species list per catch-type code from a flattened snapshot.

    ``snapshot``: (rank, name, species, c_code) — the offline-flattened
    FishBase dimension. ``taxa``: (code_col, name, taxa_rank) — one row per
    taxonomic handle of a catch type (``get_catch_types`` shape).

    Matching = equi-join on (rank, name). Country semantics mirror the
    reference exactly: keep species with a record in ``country_codes``; for
    codes where NO matched species has such a record, fall back to every
    matched species (:186-195 — "likely present, no museum records").
    Returns distinct (code_col, species).
    """
    cands = (
        taxa.join(
            F.broadcast(snapshot),
            (taxa["name"] == snapshot["name"]) & (taxa["taxa_rank"] == snapshot["rank"]),
        )
        .select(code_col, "species", "c_code")
    )
    if not country_codes:
        return cands.select(code_col, "species").distinct()
    in_country = cands.filter(F.col("c_code").isin(list(country_codes)))
    codes_with_records = in_country.select(code_col).distinct()
    fallback = cands.join(codes_with_records, code_col, "left_anti")
    return (
        in_country.select(code_col, "species")
        .unionByName(fallback.select(code_col, "species"))
        .distinct()
    )


def retrieve_lengths(
    snapshot: DataFrame,
    taxa: DataFrame,
    lw_params: DataFrame,
    country_codes: Sequence[int] | None = None,
    code_col: str = "interagency_code",
) -> DataFrame:
    """``retrieve_lengths`` (R/calculate-weights.R:212-262): species
    resolution -> per-species length-weight parameter rows, re-keyed by
    catch-type code, with one null row per code that resolved to NO species
    (the reference's ``add_row(miss_groups)``) so downstream joins see every
    code. ``lw_params``: (species, ...) parameter columns."""
    resolved = resolve_species(snapshot, taxa, country_codes, code_col)
    with_params = resolved.join(F.broadcast(lw_params), "species", "inner")
    missing = (
        taxa.select(code_col)
        .distinct()
        .join(with_params.select(code_col).distinct(), code_col, "left_anti")
    )
    return with_params.unionByName(missing, allowMissingColumns=True)
