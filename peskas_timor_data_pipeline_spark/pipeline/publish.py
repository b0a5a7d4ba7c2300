"""Publishing sinks: Dataverse release staging, the sites email report,
and the map GeoJSON payload.

These close the three reference surfaces SURVEY §2.1 declared out of
engine scope (S20 Dataverse, S21 email, S22 map renders) with thin,
fully-testable driver-side modules: every network/SMTP touchpoint is
injected or dry-run (this container has no network), while everything
deterministic — payload construction, artifact-version stripping, the
release manifest, email composition, GeoJSON serialization — is real and
pinned by tests.

Reference parity:
- upload_dataverse (R/export-dataverse.R:12-92): resolve latest public
  TSVs for the trips/catch/aggregated-month prefixes, strip the
  ``__<ts>_<sha>__`` version tag from the released names
  (``gsub("__[^>]+__", "")``), build the dataset metadata payload in the
  Dataverse datasetVersion/metadataBlocks/citation shape
  (inst/export/dataset-fields.json), create the dataset and upload files.
- send_sites_report (R/send-email.R:13-185): compose the fixed-body
  sites-report email with the summary PDF attached, send via SMTP creds.
- ingest_pds_map (R/ingest-pds-data.R:307-587): tracks filtered to the
  Timor bounding box rendered as a map — here the data payload (GeoJSON),
  since raster/kepler rendering is a UI concern, not an engine one.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.sources.io import resolve_latest

# Timor-Leste track bounding box (R/ingest-pds-data.R:314-319)
TIMOR_BBOX = {"lng_min": 124.03, "lng_max": 127.29,
              "lat_min": -9.74, "lat_max": -7.98}

RELEASE_PREFIXES = ("trips", "catch", "aggregated-month")


def _citation_field(type_name: str, value, type_class: str = "primitive",
                    multiple: bool = False) -> dict:
    return {"typeName": type_name, "multiple": multiple,
            "typeClass": type_class, "value": value}


def dataverse_dataset_payload(
    title: str,
    description: str,
    authors: Sequence[tuple[str, str]],
    keywords: Sequence[str],
    subject: str = "Agricultural Sciences",
    contact: tuple[str, str] | None = None,
    time_range: tuple[str, str] | None = None,
) -> dict:
    """The Dataverse native-API dataset body, in the exact
    datasetVersion/metadataBlocks/citation nesting of the reference's
    inst/export/dataset-fields.json: primitive title/dsDescription,
    compound multiple author/keyword/datasetContact blocks, controlled
    subject vocabulary, and (when given) the timePeriodCovered block the
    reference derives from the data's date range."""
    fields = [
        _citation_field("title", title),
        _citation_field(
            "author",
            [
                {
                    "authorName": _citation_field("authorName", name),
                    "authorAffiliation": _citation_field(
                        "authorAffiliation", affiliation
                    ),
                }
                for name, affiliation in authors
            ],
            type_class="compound", multiple=True,
        ),
        _citation_field(
            "dsDescription",
            [{"dsDescriptionValue": _citation_field("dsDescriptionValue",
                                                    description)}],
            type_class="compound", multiple=True,
        ),
        _citation_field(
            "keyword",
            [{"keywordValue": _citation_field("keywordValue", kw)}
             for kw in keywords],
            type_class="compound", multiple=True,
        ),
        _citation_field("subject", [subject],
                        type_class="controlledVocabulary", multiple=True),
    ]
    if contact is not None:
        fields.append(_citation_field(
            "datasetContact",
            [{
                "datasetContactName": _citation_field(
                    "datasetContactName", contact[0]),
                "datasetContactEmail": _citation_field(
                    "datasetContactEmail", contact[1]),
            }],
            type_class="compound", multiple=True,
        ))
    if time_range is not None:
        fields.append(_citation_field(
            "timePeriodCovered",
            [{
                "timePeriodCoveredStart": _citation_field(
                    "timePeriodCoveredStart", time_range[0]),
                "timePeriodCoveredEnd": _citation_field(
                    "timePeriodCoveredEnd", time_range[1]),
            }],
            type_class="compound", multiple=True,
        ))
    return {"datasetVersion": {"metadataBlocks": {"citation": {
        "displayName": "Citation Metadata", "fields": fields}}}}


def strip_version_tag(name: str) -> str:
    """``prefix__<ts>_<sha>__.ext -> prefix.ext`` — the release renaming
    (R/export-dataverse.R:51 ``gsub("__[^>]+__", "")``)."""
    import re

    return re.sub(r"__[^_]+_[^_]+__", "", name)


def stage_dataverse_release(
    artifact_dir: str,
    out_dir: str,
    payload: dict,
    prefixes: Sequence[str] = RELEASE_PREFIXES,
    extension: str = "tsv",
) -> dict:
    """Assemble a release directory: resolve each prefix's LATEST
    versioned artifact (cloud_object_name version='latest' semantics),
    copy it under its version-stripped public name, and write the dataset
    payload as ``dataset-fields.json``. Returns the manifest
    {prefix: released-filename}. Everything here is the deterministic
    half of upload_dataverse; the network half is :func:`publish_dataverse`."""
    os.makedirs(out_dir, exist_ok=True)
    manifest: dict[str, str] = {}
    for prefix in prefixes:
        latest = resolve_latest(artifact_dir, prefix, extension)
        if latest is None:
            raise FileNotFoundError(
                f"no versioned artifact for prefix {prefix!r} in {artifact_dir}"
            )
        released = strip_version_tag(os.path.basename(latest))
        shutil.copy(latest, os.path.join(out_dir, released))
        manifest[prefix] = released
    with open(os.path.join(out_dir, "dataset-fields.json"), "w") as f:
        json.dump(payload, f, indent=2)
    return manifest


def publish_dataverse(
    release_dir: str,
    server: str,
    dataverse_id: str,
    api_token: str,
    http_post: Callable[..., dict] | None = None,
) -> list[dict]:
    """Create the dataset and upload the staged files via the Dataverse
    native API (POST /api/dataverses/{id}/datasets, then
    /api/datasets/:persistentId/add). The HTTP transport is INJECTED —
    this container has no network; tests pass a recorder, production
    passes a requests/urllib wrapper. Without one this raises instead of
    silently pretending to publish."""
    if http_post is None:
        raise NotImplementedError(
            "publish_dataverse needs an http_post transport "
            "(requests.post-shaped); no network in this environment"
        )
    with open(os.path.join(release_dir, "dataset-fields.json")) as f:
        payload = json.load(f)
    create = http_post(
        f"{server}/api/dataverses/{dataverse_id}/datasets",
        headers={"X-Dataverse-key": api_token},
        json=payload,
    )
    calls = [create]
    # The native API's add-file endpoint is addressed by the DOI the
    # create call minted (?persistentId=doi:...); without it every add
    # would 400. R/export-dataverse.R:70-92 threads the same id.
    doi = ((create or {}).get("data") or {}).get("persistentId")
    if not doi:
        raise ValueError(
            "dataset-create response carried no data.persistentId (DOI); "
            "refusing add-file calls the API would reject"
        )
    for name in sorted(os.listdir(release_dir)):
        if name == "dataset-fields.json":
            continue
        with open(os.path.join(release_dir, name), "rb") as fh:
            calls.append(http_post(
                f"{server}/api/datasets/:persistentId/add",
                params={"persistentId": doi},
                headers={"X-Dataverse-key": api_token},
                files={"file": (name, fh.read())},
            ))
    return calls


SITES_REPORT_BODY = """Hello,

The attached report provides a summary of the overall performance and \
activity in each landing site on an annual and monthly scale.
The report includes information on the number of surveys submitted, the \
working days, and the estimated hours per day in each landing site.

We believe that this report will provide valuable insights into the \
enumerators work and can help to identify any areas for improvement.
We would appreciate it if you could take the time to review the report \
and provide us with your feedback.

Please note that the report is automatically generated.
If you have any questions or concerns, please do not hesitate to contact us.

Thank you,

The peskAAS Team"""


def compose_sites_report_email(
    attachment_paths: Sequence[str],
    sent_at: _dt.datetime,
    subject: str | None = None,
) -> dict:
    """The sites-report email (R/send-email.R:13-185): fixed body, footer
    stamped with the send time, attachments listed with guessed MIME
    types. Returns the composed message as a dict; :func:`send_email`
    turns it into MIME and hands it to a transport."""
    import mimetypes

    # Fixed English table, not strftime('%b') (locale-dependent — and so
    # is calendar.month_abbr, which routes through strftime): the subject
    # must match the reference's English form on any host locale.
    month = ("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
             "Sep", "Oct", "Nov", "Dec")[sent_at.month - 1]
    year = sent_at.year
    atts = []
    for p in attachment_paths:
        ctype = mimetypes.guess_type(p)[0] or "application/octet-stream"
        atts.append({
            "file_path": os.path.abspath(p),
            "content_type": ctype,
            "disposition": "attachment",
            "filename": os.path.basename(p),
        })
    return {
        "subject": subject or f"Landing sites report - {month} {year}",
        "body_markdown": SITES_REPORT_BODY,
        "footer": f"Email sent on {sent_at.isoformat(sep=' ')}",
        "attachments": atts,
    }


def send_email(
    message: dict,
    sender: str,
    recipients: Sequence[str],
    transport: Callable[[str, Sequence[str], str], None] | None = None,
    dry_run_dir: str | None = None,
) -> str:
    """Render the composed message to RFC-822 MIME and deliver it.
    ``transport`` is smtplib-shaped (sendmail(from, to, msg)) and
    INJECTED; with ``dry_run_dir`` instead, the .eml lands on disk — the
    no-network default this environment requires."""
    from email.message import EmailMessage

    em = EmailMessage()
    em["Subject"] = message["subject"]
    em["From"] = sender
    em["To"] = ", ".join(recipients)
    em.set_content(message["body_markdown"] + "\n\n--\n" + message["footer"])
    for att in message["attachments"]:
        with open(att["file_path"], "rb") as f:
            data = f.read()
        maintype, _, subtype = att["content_type"].partition("/")
        em.add_attachment(data, maintype=maintype, subtype=subtype,
                          filename=att["filename"])
    raw = em.as_string()
    if transport is not None:
        transport(sender, list(recipients), raw)
        return "sent"
    if dry_run_dir is not None:
        os.makedirs(dry_run_dir, exist_ok=True)
        path = os.path.join(dry_run_dir, "sites_report.eml")
        with open(path, "w") as f:
            f.write(raw)
        return path
    raise NotImplementedError(
        "send_email needs a transport or dry_run_dir; no SMTP here"
    )


def tracks_geojson_features(
    df: DataFrame,
    lat_col: str,
    lng_col: str,
    prop_cols: Sequence[str],
    bbox: dict | None = None,
) -> DataFrame:
    """Map payload (the data half of ingest_pds_map): filter track points
    to the bounding box (Timor by default — the reference excludes
    out-of-border fixes) and serialize each as one GeoJSON Feature line
    via to_json — distributed end to end, writable as newline-delimited
    GeoJSON-seq (RFC 8142) of any size. :func:`feature_collection`
    assembles the render-sized FeatureCollection for a map widget."""
    bb = bbox or TIMOR_BBOX
    filtered = df.filter(
        (F.col(lng_col) > bb["lng_min"]) & (F.col(lng_col) < bb["lng_max"])
        & (F.col(lat_col) > bb["lat_min"]) & (F.col(lat_col) < bb["lat_max"])
    )
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col(lng_col), F.col(lat_col)).alias("coordinates"),
        ).alias("geometry"),
        F.struct(*[F.col(c) for c in prop_cols]).alias("properties"),
    )
    return filtered.select(F.to_json(feature).alias("feature"))


def feature_collection(features: DataFrame, limit: int = 100_000) -> str:
    """Assemble a FeatureCollection from the feature lines — the widget
    payload. Collect is bounded by ``limit`` (a MAP is render-sized by
    definition; the unbounded path is the GeoJSON-seq writer above) and
    raises rather than silently truncating past it."""
    rows = features.limit(limit + 1).collect()
    if len(rows) > limit:
        raise ValueError(
            f"feature_collection asked to collect more than {limit} "
            "features; write GeoJSON-seq instead for bulk export"
        )
    inner = ",".join(r.feature for r in rows)
    return '{"type":"FeatureCollection","features":[' + inner + "]}"
