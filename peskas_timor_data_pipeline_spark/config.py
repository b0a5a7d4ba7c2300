"""Layered configuration (inst/conf.yml equivalent).

The reference resolves layered YAML by env var R_CONFIG_ACTIVE
(R/utils.R:62-74); here: dataclass defaults + dict overlays selected by
``PESKAS_CONFIG_ACTIVE``. Validation thresholds are the reference's
(inst/conf.yml:98-128)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class ValidationThresholds:
    trip_duration_max_h: float = 96.0
    submission_delay_max_d: int = 28
    price_max: float = 1500.0
    price_per_kg_min: float = 0.25
    price_per_kg_max: float = 30.0
    mesh_max_mm: float = 200.0
    trip_distance_max_km: float = 200.0
    start_end_max_km: float = 3.0
    consecutive_gap_max_h: float = 3.0
    consecutive_dist_max_km: float = 2.0
    speed_outlier_ms: float = 30.0
    mad_k_default: float = 3.0
    mad_k_individuals: float = 2.5
    mad_k_gleaners: float = 1.5


@dataclass(frozen=True)
class EngineConfig:
    timezone: str = "Asia/Dili"
    data_horizon: str = "2018-01-01"
    track_fetch_workers: int = 32
    track_resync_threshold: int = 1000
    validation: ValidationThresholds = field(default_factory=ValidationThresholds)


_PROFILES: dict[str, dict] = {
    "default": {},
    "local": {"track_fetch_workers": 4},
    "production": {},
}


def get_config(profile: str | None = None, **overrides) -> EngineConfig:
    """Resolve the active profile (PESKAS_CONFIG_ACTIVE, like
    R_CONFIG_ACTIVE) and apply explicit overrides on top."""
    profile = profile or os.environ.get("PESKAS_CONFIG_ACTIVE", "default")
    layered = {**_PROFILES.get(profile, {}), **overrides}
    val_over = layered.pop("validation", {})
    cfg = replace(EngineConfig(), **layered)
    if val_over:
        cfg = replace(cfg, validation=replace(cfg.validation, **val_over))
    return cfg
