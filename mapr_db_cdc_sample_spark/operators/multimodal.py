"""Multimodal column plumbing: image/audio/video as opaque BinaryType
payloads with typed metadata, processed in Arrow batches via mapInPandas.

The Spark-side contract (schema, partitioning, UDF signature, batch
shape) is real and tested; the actual media DECODE is stubbed — the
image/audio libraries are not in this container. decode_image() raises
NotImplementedError and extract_features() falls back to a deterministic
fake decoder so the pipeline is end-to-end testable.

Scale notes: payloads stay columnar Binary through Arrow (no base64, no
Python row objects); batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so executor memory is
payload-size × batch, not partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor (typed metadata contract).
FEATURE_SCHEMA = (
    "doc_id bigint, format string, n_bytes int, checksum string, "
    "width int, height int, n_channels int"
)


def synth_media(documents: DataFrame) -> DataFrame:
    """Derive a media table from `documents`: payload = UTF-8 bytes of the
    text standing in for encoded media; format round-robins png/jpg/wav."""
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpg"), F.lit("wav")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        fmt.alias("format"),
    )


def decode_image(payload: bytes) -> "object":
    """Real media decode — NOT IMPLEMENTED in this container (no PIL/
    ffmpeg). The deterministic fake in _fake_decode keeps the pipeline
    testable; swap this in when the decoder libs exist."""
    raise NotImplementedError("media decoding requires PIL/ffmpeg; see _fake_decode")


def _fake_decode(payload: bytes, fmt: str) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: fake (width, height, channels)
    derived from the payload hash."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 if fmt == "wav" else 3


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches: n_bytes,
    checksum, decoded dimensions. One pass, no shuffle; output is a
    normal columnar DataFrame ready for relational ops."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            fmts = pdf["format"]
            dims = [
                _fake_decode(p, f)
                for p, f in zip((bytes(p) for p in payloads), fmts)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmts,
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "checksum": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(features, FEATURE_SCHEMA)
