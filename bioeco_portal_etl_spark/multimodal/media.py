"""Opaque-binary media columns with typed metadata + Arrow-batched decode.

Images/audio/video travel through the pipeline as ``BinaryType`` payload
columns plus a typed metadata struct; decode / feature-extract runs as
``mapInPandas`` (Arrow batches, one Python process per task — the ONLY
sanctioned Python hot path in the engine). The actual codec work is stubbed
(no PIL/ffmpeg in this environment): ``decode_media_metadata`` derives
deterministic fake dimensions from the byte stream so the Spark-side contract
— schema, batch shape, partitioning — is real and oracle-checkable, while
``decode_image`` raises NotImplementedError at the exact point a codec would
plug in.

Scale notes: binary payloads make rows wide -> keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so tasks stay
memory-bounded, and NEVER collect payload columns; metadata extraction
projects the payload away immediately after the mapInPandas stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "media_id long, n_bytes long, width long, height long, media_format string"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test-harness payload: utf-8 bytes of a text column as the opaque blob
    (stands in for image bytes; deterministic so oracles can re-derive it)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _fake_dims(n_bytes: int) -> tuple[int, int]:
    # Deterministic stand-in for a real header parse; mirrored in oracle SQL.
    return n_bytes % 640 + 16, (n_bytes // 7) % 480 + 16


def decode_media_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas decode stub: (media_id, payload) -> typed metadata rows.

    Batch shape: pandas DataFrames with a bytes column in, metadata-only out —
    the payload never crosses back to the JVM."""
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n,
                    "width": n % 640 + 16,
                    "height": n // 7 % 480 + 16,
                    "media_format": "fake-rgb",
                }
            )

    return df.mapInPandas(decode, schema=MEDIA_META_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - explicit stub
    """Real codec plug-point. STUB: no image library in this environment."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire the codec here and keep the "
        "mapInPandas batch contract of decode_media_metadata"
    )
