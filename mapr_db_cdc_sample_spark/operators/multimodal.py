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


#: Frame-sampling contract: fixed-size byte frames, every Nth kept.
FRAME_BYTES = 64
FRAME_EVERY = 4

RESIZE_SCHEMA = (
    "doc_id bigint, format string, new_width int, new_height int, thumb_md5 string"
)


def sample_frames(
    media: DataFrame, frame_bytes: int = FRAME_BYTES, every: int = FRAME_EVERY
) -> DataFrame:
    """Video-style frame sampling over a BinaryType payload: split into
    fixed-size byte frames, keep every Nth (frame 0 always kept). Pure
    JVM expressions — substring works on binary, and the generator
    explodes frame INDICES (tiny ints), never duplicating the payload
    per frame before slicing. Real decoders replace the fixed-size split
    with container parsing; the sampling/stride/explode plumbing is the
    part that scales and is exercised here."""
    n_frames = F.ceil(F.length("payload") / F.lit(frame_bytes)).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: i % every == 0,
    )
    frame = F.col("payload").substr(
        F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes)
    )
    return (
        media.where(F.length("payload") > 0)
        .select("doc_id", "payload", F.explode(idx).alias("frame_idx"))
        .select(
            "doc_id",
            "frame_idx",
            F.length(frame).alias("n_frame_bytes"),
            F.md5(frame).alias("frame_md5"),
        )
    )


def resize_media(media: DataFrame) -> DataFrame:
    """Thumbnail/resize pass via mapInPandas over Arrow batches: halve
    the (fake-)decoded dimensions and emit an md5 of the "thumbnail"
    (deterministically the first 256 payload bytes — a real resizer
    re-encodes; the batch plumbing, binary handling, and output contract
    are what this exercises). decode_image() documents the real-decoder
    swap-in point."""
    import hashlib as _h

    def resize(batches):
        for pdf in batches:
            outs = {"doc_id": [], "format": [], "new_width": [], "new_height": [], "thumb_md5": []}
            for doc_id, fmt, payload in zip(pdf["doc_id"], pdf["format"], pdf["payload"]):
                raw = bytes(payload)
                w, h, _c = _fake_decode(raw, fmt)
                outs["doc_id"].append(doc_id)
                outs["format"].append(fmt)
                outs["new_width"].append(max(w // 2, 1))
                outs["new_height"].append(max(h // 2, 1))
                outs["thumb_md5"].append(_h.md5(raw[:256]).hexdigest())
            yield pd.DataFrame(outs)

    return media.mapInPandas(resize, RESIZE_SCHEMA)
