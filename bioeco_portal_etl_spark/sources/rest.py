"""REST API scan (SURVEY.md §2.1 S7).

Reference parity: notebooks/index.Rmd:695 and eov_to_keywords.Rmd:53 —
``fromJSON(url)`` over GeoNode's /api/v2/layers and /api/tkeywords endpoints
(page_size=10000), flattened into a table.

Strategy: payloads are dimension-scale metadata, so fetching happens
driver-side (requests, gated) and parsing happens IN SPARK via
``spark.read.json`` over a parallelized payload — so nested-JSON flattening,
schema, and downstream joins stay in the engine. For fact-scale HTTP sources
the same parse path accepts a pre-fetched file glob.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def json_payload_to_df(spark: SparkSession, payload: str | dict, array_field: str | None = None) -> DataFrame:
    """Parse a JSON payload string/dict into a DataFrame; if ``array_field``
    names a top-level array (e.g. ``layers``), explode it to rows."""
    text = json.dumps(payload) if isinstance(payload, dict) else payload
    df = spark.read.json(spark.sparkContext.parallelize([text]))
    if array_field:
        df = df.select(F.explode(F.col(array_field)).alias("__row")).select("__row.*")
    return df


def fetch_json(url: str, timeout: int = 30):
    """Driver-side HTTP GET -> parsed JSON. Gated on requests availability;
    network access is an external contract like the reference's API calls."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("REST scan requires the requests library") from e
    resp = requests.get(url, timeout=timeout)
    resp.raise_for_status()
    return resp.json()


def read_rest(spark: SparkSession, url: str, array_field: str | None = None) -> DataFrame:
    return json_payload_to_df(spark, fetch_json(url), array_field)
