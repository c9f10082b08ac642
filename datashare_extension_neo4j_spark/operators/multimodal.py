"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched operators.

The container has no image/audio codecs, so the *decode* kernels are
stubbed behind a deterministic fake (or raise NotImplementedError when
``require_real=True``); the Spark-side plumbing — schemas,
partitioning, UDF signatures, batch shapes — is real and tested. Swap
``fake_image_decode`` for a PIL/ffmpeg kernel on a real cluster and
nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def fake_image_decode(content: bytes | None) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real image decoder: dimensions are
    derived from the content hash, so tests are stable and the batch
    plumbing is exercised end to end."""
    if not content:
        return (0, 0, 0, "")
    h = hashlib.sha256(content).digest()
    w = 64 + struct.unpack(">H", h[0:2])[0] % 1984  # 64..2047
    ht = 64 + struct.unpack(">H", h[2:4])[0] % 1984
    return (w, ht, 3, h.hex()[:16])


def decode_images(
    media: DataFrame, require_real: bool = False
) -> DataFrame:
    """binary → (width, height, channels, content_hash), one
    mapInPandas pass over image assets."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if require_real:
            try:
                import PIL.Image
            except ImportError as e:  # pragma: no cover - env dependent
                raise NotImplementedError(
                    "real image decode requires pillow; install it on the "
                    "cluster or use the deterministic fake decoder"
                ) from e

            def decode(content):  # pragma: no cover - env dependent
                # REAL decode when pillow exists — require_real must
                # never silently return the fake dimensions
                if not content:
                    return (0, 0, 0, "")
                import hashlib
                import io

                img = PIL.Image.open(io.BytesIO(bytes(content)))
                return (
                    img.width,
                    img.height,
                    len(img.getbands()),
                    hashlib.sha256(bytes(content)).hexdigest()[:16],
                )
        else:
            decode = fake_image_decode
        for pdf in batches:
            rows = []
            for aid, did, content in zip(
                pdf["asset_id"], pdf["doc_id"], pdf["content"]
            ):
                w, h, c, hx = decode(content)
                rows.append(
                    {
                        "asset_id": aid,
                        "doc_id": did,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "content_hash": hx,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_IMAGE_SCHEMA])

    imgs = media.where(F.col("kind") == "image").select(
        "asset_id", "doc_id", "content"
    )
    return imgs.mapInPandas(run, DECODED_IMAGE_SCHEMA)


_EMBED_DIM = 16

EMBED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def media_embeddings(media: DataFrame) -> DataFrame:
    """Deterministic binary → float[16] feature vector (hash-derived
    projection): the real model slots into the same mapInPandas
    signature; downstream ANN (operators/similarity.py) is agnostic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    vec = [0.0] * _EMBED_DIM
                else:
                    h = hashlib.sha256(content).digest()
                    vec = [
                        struct.unpack(">h", h[2 * i : 2 * i + 2])[0] / 32768.0
                        for i in range(_EMBED_DIM)
                    ]
                rows.append({"asset_id": aid, "embedding": vec})
            yield pd.DataFrame(rows, columns=["asset_id", "embedding"])

    return media.select("asset_id", "content").mapInPandas(run, EMBED_SCHEMA)


def frame_sample(media: DataFrame, every_n_seconds: int = 10) -> DataFrame:
    """Video frame sampling plumbing: emits (asset_id, frame_ts,
    frame_ref) rows; the decode kernel is the deterministic fake
    (duration inferred from the content hash)."""
    schema = "asset_id string, frame_ts int, frame_ref string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    continue
                h = hashlib.sha256(content).digest()
                duration = 1 + h[0] % 120  # fake duration in seconds
                for ts in range(0, duration, every_n_seconds):
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_ts": ts,
                            "frame_ref": f"{aid}@{ts}",
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_ts", "frame_ref"])

    vids = media.where(F.col("kind") == "video").select("asset_id", "content")
    return vids.mapInPandas(run, schema)
