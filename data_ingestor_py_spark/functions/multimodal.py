"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Design for a 100 TB training-data lake: media bytes live in a ``binary``
column (or object-store pointers) beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip row-at-a-time.

This container has no image/audio libraries, so the actual codec step is
STUBBED (clearly marked): real-codec decode raises ``NotImplementedError``
unless PIL/soundfile exist, and tests use the deterministic synthetic media
format below. Everything Spark-side — schemas, batch iteration, partition
sizing, UDF signatures, output shapes — is real and tested.

Synthetic media format (deterministic, generated in-engine):
  header  = b"SYNM" | modality:1B (0=img,1=aud,2=vid) | w:2B | h:2B | n:2B
  payload = w*h*n pseudo-random bytes derived from sha256(doc_id)
For images n=channels, audio n=seconds (w=sample_rate/100, h=1), video
n=frames.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"SYNM"

MEDIA_SCHEMA = (
    "doc_id long, modality string, data binary, width int, height int, n_units int"
)


def synth_media(spark: SparkSession, n_rows: int, modality: str = "image", seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (driver-free: generated per-row
    inside an Arrow batch UDF from the row id)."""
    mod_code = {"image": 0, "audio": 1, "video": 2}[modality]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                h = hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()
                w = 8 + h[0] % 8
                ht = 8 + h[1] % 8 if mod_code == 0 else (1 if mod_code == 1 else 8 + h[1] % 8)
                n = (3 if mod_code == 0 else 2 + h[2] % 4)
                need = w * ht * n
                payload = (h * (need // len(h) + 1))[:need]
                data = MAGIC + struct.pack(">BHHH", mod_code, w, ht, n) + payload
                rows.append((int(doc_id), modality, bytearray(data), w, ht, n))
            yield pd.DataFrame(
                rows, columns=["doc_id", "modality", "data", "width", "height", "n_units"]
            )

    return spark.range(n_rows).mapInPandas(gen, MEDIA_SCHEMA)


def _parse_header(data: bytes) -> tuple[int, int, int, int]:
    if bytes(data[:4]) != MAGIC:
        raise NotImplementedError(
            "real-codec decode (JPEG/PNG/WAV/MP4) requires PIL/soundfile/av, "
            "not installed in this container — STUB accepts only SYNM bytes"
        )
    mod, w, h, n = struct.unpack(">BHHH", bytes(data[4:11]))
    return mod, w, h, n


def decode_features(df: DataFrame, dims: int = 16) -> DataFrame:
    """Decode + feature-extract: binary -> fixed-dim float vector + stats.

    Arrow-batched ``mapInPandas``; the 'decoder' is the deterministic stub
    (header parse + byte-histogram features). Output schema is the real one
    a CLIP-style extractor would produce: (doc_id, embedding, mean_value).
    Kernels are numpy-vectorized (``frombuffer`` + ``bincount``): the media
    bytes are touched as whole arrays, never per-byte Python — histogram
    values and the float64 divisions are bit-identical to the scalar form.
    """
    out_schema = "doc_id long, embedding array<float>, mean_value double, width int, height int"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, embs, means, ws, hs = [], [], [], [], []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                b = bytes(data)
                _, w, h, n = _parse_header(b)
                payload = np.frombuffer(b, dtype=np.uint8, offset=11)
                # byte-histogram folded to `dims` buckets, L1-normalized
                hist = np.bincount(payload % dims, minlength=dims)
                total = max(int(hist.sum()), 1)
                embs.append((hist / float(total)).tolist())
                means.append(int(payload.sum(dtype=np.int64)) / max(len(payload), 1))
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"doc_id": ids, "embedding": embs, "mean_value": means, "width": ws, "height": hs}
            )

    return df.select("doc_id", "data").mapInPandas(extract, out_schema)


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage: nearest-neighbor downsample on the synthetic raster
    (real PIL path would slot in here; identical plumbing).

    The gather is a numpy strided fancy-index over the (n, h, w) raster —
    one vectorized kernel per image instead of a triple-nested Python byte
    loop. Source indices use integer floor division, which equals the
    scalar ``int(y * h / target_h)`` for all header-expressible sizes
    (y*h < 2^32, so the float64 quotient cannot cross an integer)."""
    out_schema = "doc_id long, data binary, width int, height int"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                b = bytes(data)
                mod, w, h, n = _parse_header(b)
                raster = np.frombuffer(b, dtype=np.uint8, offset=11).reshape(n, h, w)
                sy = np.minimum(np.arange(target_h, dtype=np.int64) * h // target_h, h - 1)
                sx = np.minimum(np.arange(target_w, dtype=np.int64) * w // target_w, w - 1)
                out = raster[:, sy[:, None], sx[None, :]]  # (n, target_h, target_w), C-order
                data2 = MAGIC + struct.pack(">BHHH", mod, target_w, target_h, n) + out.tobytes()
                rows.append((doc_id, bytearray(data2), target_w, target_h))
            yield pd.DataFrame(rows, columns=["doc_id", "data", "width", "height"])

    return df.select("doc_id", "data").mapInPandas(resize, out_schema)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling: one output row per kept frame — a mapInPandas
    that EXPANDS rows (1 video -> n/k frames), the shape a real ffmpeg
    sampler produces."""
    out_schema = "doc_id long, frame_idx int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                b = bytes(data)
                _, w, h, n = _parse_header(b)
                payload = b[11:]
                for i in range(0, n, every_k):
                    rows.append((doc_id, i, bytearray(payload[i * w * h:(i + 1) * w * h])))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.select("doc_id", "data").mapInPandas(sample, out_schema)


def with_media_sha256(df: DataFrame) -> DataFrame:
    """Binary-content invariant: sha2 works on binary directly (JVM-side)."""
    return df.withColumn("_media_sha256", F.sha2(F.col("data"), 256))
