from peskas_timor_data_pipeline_spark.config import get_config


def test_layered_config():
    cfg = get_config()
    assert cfg.validation.trip_duration_max_h == 96.0
    assert cfg.validation.mad_k_gleaners == 1.5
    local = get_config("local")
    assert local.track_fetch_workers == 4
    over = get_config("default", validation={"price_max": 2000.0})
    assert over.validation.price_max == 2000.0
    assert over.validation.mesh_max_mm == 200.0
