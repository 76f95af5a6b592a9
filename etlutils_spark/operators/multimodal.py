"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises NotImplementedError unless a
deterministic fake decoder is requested. Everything around the stub —
schema, binary payload handling, mapInPandas batch shape, partition
strategy — is real and tested, so dropping in PIL/librosa later is a
one-function change.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; feature
extraction is embarrassingly parallel (mapInPandas, no shuffle);
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
when payloads are large (set it so batch_rows x payload_size fits the
Python worker). Partition by a content-derived key, never by source
file, to keep big objects spread evenly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16  # byte-histogram buckets for the deterministic fake


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + typed metadata
    (the shape a real image/audio table would have)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumns(
        {
            "payload": payload,
            "payload_len": F.octet_length(payload).cast("bigint"),
            "content_md5": F.md5(F.col(text_col)),
            "media_type": F.lit("application/octet-stream"),
        }
    )


def decode_image(data: bytes) -> "np.ndarray":
    """Real decoder slot. Requires an imaging library not present in
    this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not available in this "
            "environment; use fake_features for the deterministic stub"
        ) from exc
    raise NotImplementedError("wire PIL decode here when the library lands")


def fake_features(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: a normalized
    byte histogram. Real computation (not a constant), so tests
    exercise actual batch plumbing and numeric output."""
    arr = np.frombuffer(data, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    total = hist.sum()
    return (hist / total if total else hist).astype("float64")


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Output: (id, features array<double>, payload_len bigint). The
    iterator contract streams Arrow batches — a 100 TB corpus never
    materializes more than one batch per task in Python.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(b, dim).tolist() for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": feats,
                    "payload_len": pdf[payload_col].map(len).astype("int64"),
                }
            )

    from etlutils_spark.sources.files import spread

    narrowed = spread(df.select(id_col, payload_col))
    return narrowed.mapInPandas(
        run, schema=f"{id_col} bigint, features array<double>, payload_len bigint"
    )
