"""Sources & sinks (SURVEY.md §2.1 S1-S22).

Engine-side readers/writers are Spark-native (parquet/CSV/JSON). External
REST services (Kobo, PDS, Airtable, Google Sheets) are driver-side
ingestors landing files for Spark to scan — same architecture as the
reference, which fetches into GCS before any dataframe work.
"""
