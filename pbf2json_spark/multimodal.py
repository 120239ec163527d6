"""Multimodal columns: image/audio/video as opaque `binary` with typed
metadata; decode / feature-extract / resize / frame-sample as Arrow-batched
UDFs over mapInPandas.

The container has no image/audio libraries, so the *codec* is a
deterministic fake (documented): media blobs follow a tiny self-describing
layout `b"FAKE" + kind(1B) + width(u16) + height(u16) + payload`, and
"decoding" parses it with numpy. The Spark-side plumbing — schema,
partitioning, UDF signatures, Arrow batch shapes — is real and tested;
swapping in Pillow/librosa later only replaces the numpy kernel bodies.
Real codec paths raise NotImplementedError behind an import-try."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKE"
KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (driver-free: pure Column byte
    assembly would be awkward, so blobs are built in an Arrow UDF from the
    row id — still deterministic and distributed)."""
    base = spark.range(n).withColumn("_seed", F.lit(seed))

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            sd = int(pdf["_seed"].iloc[0]) if len(pdf) else 0
            rows = []
            for i in ids:
                kind = int(i % 3)
                w = 4 + int((i * 7 + sd) % 13)
                h = 4 + int((i * 11 + sd) % 9)
                rng = np.random.default_rng(sd + int(i))
                payload = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
                blob = MAGIC + struct.pack("<BHH", kind, w, h) + payload
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": KINDS[kind],
                        "blob": blob,
                        "meta": {"w": str(w), "h": str(h), "codec": "fake"},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "blob", "meta"])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _parse(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    if blob[:4] != MAGIC:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "only the deterministic FAKE container is decodable"
        )
    kind, w, h = struct.unpack("<BHH", blob[4:9])
    payload = np.frombuffer(blob[9:], dtype=np.uint8)
    return kind, w, h, payload


def decode_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract in one Arrow pass: dimensions and a mean
    'pixel' value per blob (the stand-in for a real embedding/feature)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
                _, w, h, payload = _parse(bytes(blob))
                out.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "mean_value": float(payload.mean()) if payload.size else 0.0,
                        "n_bytes": int(len(blob)),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in _DECODED_SCHEMA.fields]
            )

    return media.mapInPandas(run, _DECODED_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor 'resize' of fake images (real plumbing: binary in →
    binary out, per-batch numpy)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                kind, w, h, payload = _parse(bytes(blob))
                img = payload[: w * h].reshape(h, w)
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = img[np.ix_(yi, xi)].astype(np.uint8)
                nb = MAGIC + struct.pack("<BHH", kind, out_w, out_h) + resized.tobytes()
                out.append({"media_id": int(mid), "blob": nb})
            yield pd.DataFrame(out, columns=["media_id", "blob"])

    return media.filter(F.col("kind") == "image").mapInPandas(run, _RESIZE_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sample fake 'video' blobs: treat the payload as h frames of w
    bytes, emit every `every`-th frame (one row per frame — the fan-out
    shape a real video pipeline has)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                _, w, h, payload = _parse(bytes(blob))
                frames = payload[: w * h].reshape(h, w)
                for fi in range(0, h, every):
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_no": fi,
                            "frame": frames[fi].tobytes(),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "frame"])

    return media.filter(F.col("kind") == "video").mapInPandas(run, _FRAMES_SCHEMA)
