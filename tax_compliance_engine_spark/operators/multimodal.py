"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/resize/frame-sample are Arrow-batched pandas UDFs
over ``mapInPandas``.  The decode itself is STUBBED (no imaging libs in this
container — clearly marked below); the Spark-side plumbing — schema,
partition-preserving batch iteration, UDF signatures, batch shapes — is real
and tested, so a real decoder drops in without touching the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("payload_size", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload_size", IntegerType(), True),
        StructField("feature", ArrayType(IntegerType()), True),
        StructField("decoder", StringType(), True),
    ]
)


def to_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as a media table: payload = utf-8 bytes, typed
    metadata columns.  The same shape a real image/audio ingest produces
    (payload from file bytes, format from magic numbers)."""
    return docs.select(
        "doc_id",
        F.lit("text").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.col(text_col)).alias("payload_size"),
        F.lit("txt").alias("format"),
    )


def _extract_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction.

    STUB: a real implementation decodes the payload (PIL/librosa/ffmpeg —
    not available in this container) and emits model-ready features.  The
    deterministic fake below (first 8 payload bytes as ints) keeps the
    pipeline shape — batch in, batch out, columnar — fully exercised."""
    for pdf in batches:
        feats = [
            list(p[:8]) if p is not None else None for p in pdf["payload"]
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload_size": pdf["payload_size"],
                "feature": feats,
                "decoder": "stub-first8bytes",
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the media table — partition-
    parallel, Arrow-batched, no shuffle."""
    return media.mapInPandas(_extract_features_batches, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode entry point — intentionally unimplemented here.

    Raises NotImplementedError: image libraries (PIL/opencv) are not in this
    container.  ``extract_features`` demonstrates the identical plumbing
    with a deterministic stand-in."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv which are not available in this "
        "environment; use extract_features() for the plumbing-equivalent stub"
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("target_w", IntegerType(), False),
        StructField("target_h", IntegerType(), False),
        StructField("thumb", BinaryType(), True),
        StructField("thumb_size", IntegerType(), True),
        StructField("decoder", StringType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("frame_size", IntegerType(), True),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Thumbnail/resize plumbing over the media table (1 row in → 1 row
    out, Arrow-batched, partition-parallel, no shuffle).

    STUB decode: a real implementation decodes the payload and resamples to
    (width, height); the deterministic stand-in emits the payload truncated
    to a thumbnail budget so batch shapes, schema, and null handling are
    fully exercised and a real resizer drops in behind the same schema."""
    budget = max(64, (width * height) // 64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = [
                bytes(p[:budget]) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "target_w": width,
                    "target_h": height,
                    "thumb": thumbs,
                    "thumb_size": [
                        len(t) if t is not None else None for t in thumbs
                    ],
                    "decoder": "stub-truncate",
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 32, every_n: int = 2
) -> DataFrame:
    """Frame-sampling plumbing (1 row in → N rows out — the UDTF-shaped
    multimodal op): chop each payload into fixed-size pseudo-frames and
    keep every ``every_n``-th.

    STUB decode: a real implementation demuxes the container (ffmpeg) and
    decodes every_n-th frame; the deterministic byte-chunk stand-in keeps
    the row-explosion shape, Arrow batching, and per-frame indexing real.
    Rows with NULL payloads produce no frames (same as undecodable media)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_payload": [],
                "frame_size": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_bytes
                for i in range(0, n_frames, every_n):
                    chunk = bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(chunk)
                    out["frame_size"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
