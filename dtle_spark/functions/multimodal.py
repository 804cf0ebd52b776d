"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` over bounded
batches. The actual codec calls are STUBBED (no image/audio libs in
this container) behind ``NotImplementedError`` — the deterministic
text-payload path exercises the real Spark plumbing: schema contract,
batch iteration, partition sizing.

Scale notes: payloads dominate row size, so (a) never shuffle the
payload column — extract features first, then join features back by id
if needed; (b) cap ``spark.sql.files.maxPartitionBytes`` /
``maxRecordsPerBatch`` so an Arrow batch of payloads fits executor
memory; (c) push payload-free predicates before the decode stage so
column pruning keeps the scan light.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtle_spark.util import spread

MEDIA_COLUMNS = "payload binary, mime string"
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, width int, height int"
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Demo media table: utf-8 text bytes as the opaque payload."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def _decode_stub(payload: bytes, mime: str) -> dict:
    """Deterministic fake 'decode': real decoders (PIL/ffmpeg) plug in
    here per mime type. Raises for media types whose codec is absent —
    clearly-marked stub, not silent wrong output."""
    if mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            f"codec for {mime} not available in this environment; "
            "plug PIL/ffmpeg decode here"
        )
    digest = hashlib.md5(payload).hexdigest()
    hexpos = "0123456789abcdef"
    return {
        "n_bytes": len(payload),
        "checksum": digest,
        # fake dimensions derived from the digest (stands in for the
        # decoded image's width/height)
        "width": hexpos.index(digest[0]) * 16 + hexpos.index(digest[1]),
        "height": hexpos.index(digest[2]) * 16 + hexpos.index(digest[3]),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the payload column —
    Arrow-batched, schema-declared, partition-parallel."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    # NOTE: real codec decode is CPU-bound -> spread(media) first; the
    # deterministic stub is cheap enough that worker startup would dominate
    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, payload binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_payload binary"


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stage: schema/batching plumbing is real, the pixel
    work is the stubbed codec (PIL.thumbnail here in production)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                feats = _decode_stub(bytes(payload), mime)
                scale = min(1.0, max_side / max(feats["width"], feats["height"], 1))
                out.append(
                    {
                        "doc_id": doc_id,
                        "width": int(feats["width"] * scale),
                        "height": int(feats["height"] * scale),
                        "payload": bytes(payload),  # real impl: re-encoded pixels
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame sampling stage: one output row per sampled frame
    (explode shape). The deterministic fake 'frame' is a payload slice;
    production plugs ffmpeg keyframe extraction into the same contract."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                if mime.startswith("video/"):
                    raise NotImplementedError("ffmpeg frame extraction not available here")
                data = bytes(payload)
                for i in range(0, max(len(data), 1), every_n_bytes):
                    rows.append(
                        {"doc_id": doc_id, "frame_idx": i // every_n_bytes,
                         "frame_payload": data[i : i + every_n_bytes]}
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=FRAMES_SCHEMA)
