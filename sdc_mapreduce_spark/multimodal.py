"""Multimodal (image/audio/video) column plumbing.

Media rides through the engine as opaque ``binary`` columns plus a typed
metadata struct — the lakehouse-standard layout: petabytes of payload stay
columnar/compressed in parquet, metadata stays predicate-pushdown-friendly,
and decode happens late, batched, on executors (``mapInPandas``: one Arrow
batch in, one out, no per-row Python overhead).

The container has no image/audio codecs, so the decode kernels are
**deterministic stubs** (clearly marked below): they synthesize plausible
metadata from the payload bytes. Every piece of Spark-side plumbing —
schemas, batching, UDF signatures, partition behavior — is real and tested;
swapping a stub for Pillow/ffmpeg changes only the kernel body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("source", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("checksum", StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_channels int, n_bytes long"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = "media_id long, frame_index int, frame_bytes binary"


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text corpus: payload = utf-8 bytes of the
    text (a deterministic fake), kind round-robins image/audio/video, and the
    metadata struct is computed JVM-side (octet length, md5 checksum)."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        content.alias("content"),
        F.struct(
            F.lit("synthetic").alias("source"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("checksum"),
        ).alias("meta"),
    )


def _stub_dims(payload: bytes) -> tuple[int, int, int]:
    # STUB decode: derive stable pseudo-dimensions from a digest of the
    # payload. A real kernel would call PIL.Image.open / soundfile / ffmpeg
    # here; the container ships no codecs (see module docstring).
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    channels = 1 + digest[2] % 3
    return width, height, channels


def decode_media(df: DataFrame) -> DataFrame:
    """Batched 'decode': binary payload → dimension metadata via
    ``mapInPandas``. The iterator-of-batches shape means constant memory per
    task regardless of partition size — the pattern that survives 100 TB."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_stub_dims(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(
        kernel, schema=DECODED_SCHEMA
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Batched feature extraction: payload → fixed-dim float vector.

    STUB kernel: a digest-seeded pseudo-embedding (deterministic per
    payload). A real kernel would run an ONNX/torch encoder over the batch —
    the Arrow-batched shape (and the downstream simsearch compatibility of
    the output) is the contract being exercised.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                seed = int.from_bytes(
                    hashlib.blake2b(bytes(b), digest_size=4).digest(), "big"
                )
                rng = np.random.RandomState(seed)
                feats.append(rng.standard_normal(FEATURE_DIM).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.select("media_id", "content").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Frame sampling' for video payloads: emit n evenly-spaced byte slices
    per row — a row-expanding mapInPandas (1 → N rows per input), the exact
    shape of real frame extraction."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(b)
                stride = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * stride : (i + 1) * stride])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_bytes": frames}
            )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(kernel, schema=FRAME_SCHEMA)
    )


def resize_stub(df: DataFrame, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """'Resize' kernel placeholder: a real implementation needs an image
    codec, which this container lacks — the operator raises to make that
    explicit while keeping the API surface importable/testable."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "resize requires an image codec (PIL/cv2), not present in this "
            "container; plug the kernel body here"
        )
        yield  # pragma: no cover

    return df.select("media_id", "content").mapInPandas(
        kernel, schema="media_id long, content binary"
    )
