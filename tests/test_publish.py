"""Publishing sinks (S20 Dataverse / S21 email / S22 map payload) —
deterministic halves pinned; network halves injected or dry-run."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from peskas_timor_data_pipeline_spark.pipeline.publish import (
    TIMOR_BBOX,
    compose_sites_report_email,
    dataverse_dataset_payload,
    feature_collection,
    publish_dataverse,
    send_email,
    stage_dataverse_release,
    strip_version_tag,
    tracks_geojson_features,
)
from peskas_timor_data_pipeline_spark.sources.io import add_version


def test_dataverse_payload_matches_reference_nesting():
    p = dataverse_dataset_payload(
        title="Peskas - National Fisheries Monitoring System of Timor-Leste",
        description="Fisheries monitoring data",
        authors=[("WorldFish", "WorldFish")],
        keywords=["Fish", "Fisheries"],
        contact=("Peskas", "peskas@example.org"),
        time_range=("2018-01-01", "2023-12-31"),
    )
    cit = p["datasetVersion"]["metadataBlocks"]["citation"]
    fields = {f["typeName"]: f for f in cit["fields"]}
    # the inst/export/dataset-fields.json shape: primitive title, compound
    # multiple keyword/author blocks, controlled subject vocabulary
    assert fields["title"]["typeClass"] == "primitive"
    assert fields["title"]["multiple"] is False
    kw = fields["keyword"]
    assert kw["typeClass"] == "compound" and kw["multiple"] is True
    assert kw["value"][0]["keywordValue"]["value"] == "Fish"
    assert fields["subject"]["typeClass"] == "controlledVocabulary"
    tpc = fields["timePeriodCovered"]["value"][0]
    assert tpc["timePeriodCoveredStart"]["value"] == "2018-01-01"
    json.dumps(p)  # payload is valid JSON end to end


def test_release_staging_strips_versions_and_writes_payload(tmp_path):
    art = tmp_path / "artifacts"
    art.mkdir()
    for prefix in ("trips", "catch", "aggregated-month"):
        name = add_version(prefix, "tsv")
        (art / name).write_text(f"{prefix}\tdata\n")
        assert strip_version_tag(name) == f"{prefix}.tsv"
    out = tmp_path / "release"
    payload = dataverse_dataset_payload(
        "t", "d", [("a", "aff")], ["k"]
    )
    manifest = stage_dataverse_release(str(art), str(out), payload)
    assert manifest == {
        "trips": "trips.tsv",
        "catch": "catch.tsv",
        "aggregated-month": "aggregated-month.tsv",
    }
    assert (out / "trips.tsv").read_text().startswith("trips")
    staged = json.loads((out / "dataset-fields.json").read_text())
    assert "datasetVersion" in staged
    # missing artifact is an error, not a silent skip
    with pytest.raises(FileNotFoundError):
        stage_dataverse_release(str(art), str(out), payload,
                                prefixes=("nope",))


def test_publish_dataverse_injected_transport(tmp_path):
    art = tmp_path / "a"; art.mkdir()
    (art / add_version("trips", "tsv")).write_text("x\n")
    out = tmp_path / "r"
    stage_dataverse_release(
        str(art), str(out),
        dataverse_dataset_payload("t", "d", [("a", "f")], ["k"]),
        prefixes=("trips",),
    )
    calls = []

    def recorder(url, **kw):
        calls.append((url, kw))
        if url.endswith("/datasets"):  # realistic create payload with DOI
            return {"status": "OK",
                    "data": {"id": 42, "persistentId": "doi:10.5072/FK2/X"}}
        return {"status": "OK"}

    res = publish_dataverse(str(out), "https://dv.example", "peskas",
                            "KEY", http_post=recorder)
    assert len(res) == 2  # create dataset + one file
    assert calls[0][0].endswith("/api/dataverses/peskas/datasets")
    add_url, add_kw = calls[1]
    assert add_url.endswith("/api/datasets/:persistentId/add")
    # the DOI from the create response is threaded onto every add call
    assert add_kw["params"] == {"persistentId": "doi:10.5072/FK2/X"}
    # the transport receives the staged file's CONTENT, not its name
    fname, fbody = add_kw["files"]["file"]
    assert fname == "trips.tsv" and fbody == b"x\n"
    with pytest.raises(NotImplementedError):
        publish_dataverse(str(out), "s", "d", "k")  # no transport, no net
    # a create response without a DOI aborts before any add call fires
    with pytest.raises(ValueError, match="persistentId"):
        publish_dataverse(str(out), "s", "d", "k",
                          http_post=lambda url, **kw: {"status": "OK"})


def test_sites_report_email_compose_and_dry_run(tmp_path):
    pdf = tmp_path / "summary_report.pdf"
    pdf.write_bytes(b"%PDF-1.4 fake")
    msg = compose_sites_report_email(
        [str(pdf)], sent_at=dt.datetime(2023, 5, 2, 9, 30)
    )
    assert msg["subject"] == "Landing sites report - May 2023"
    assert "summary of the overall performance" in msg["body_markdown"]
    assert "The peskAAS Team" in msg["body_markdown"]
    assert msg["attachments"][0]["content_type"] == "application/pdf"
    assert msg["attachments"][0]["disposition"] == "attachment"

    sent = []
    out = send_email(msg, "peskas@example.org", ["sites@example.org"],
                     transport=lambda f, t, m: sent.append((f, t, m)))
    assert out == "sent" and sent[0][1] == ["sites@example.org"]
    assert "summary_report.pdf" in sent[0][2]

    path = send_email(msg, "a@b", ["c@d"], dry_run_dir=str(tmp_path / "eml"))
    assert path.endswith(".eml") and os.path.exists(path)
    with pytest.raises(NotImplementedError):
        send_email(msg, "a@b", ["c@d"])


def test_tracks_geojson_bbox_and_shape(spark):
    rows = [
        (125.5, -8.5, "t1", 12.0),   # inside Timor bbox
        (120.0, -8.5, "t2", 1.0),    # west of border -> excluded
        (125.5, -12.0, "t3", 2.0),   # south -> excluded
    ]
    df = spark.createDataFrame(rows, "lng double, lat double, trip string, v double")
    feats = tracks_geojson_features(df, "lat", "lng", ["trip", "v"])
    lines = [json.loads(r.feature) for r in feats.collect()]
    assert len(lines) == 1
    f = lines[0]
    assert f["type"] == "Feature"
    assert f["geometry"] == {"type": "Point", "coordinates": [125.5, -8.5]}
    assert f["properties"] == {"trip": "t1", "v": 12.0}
    fc = json.loads(feature_collection(feats))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 1
    with pytest.raises(ValueError):
        feature_collection(feats, limit=0)
    assert TIMOR_BBOX["lng_min"] == 124.03  # the reference's border filter
