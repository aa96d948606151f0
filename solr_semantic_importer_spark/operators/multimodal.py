"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's analog surface is the `binary` field type in the chunk schema
(/root/reference/src/main/resources/default-chunk-config/managed-schema.xml:12)
and the external gRPC enrichment hop (embedder,
ChunkDocumentCreator.java:56-59): payloads the engine stores opaquely and
enriches via batched vectorized kernels. Here the enrichment kernels are the
training-data-pipeline set: decode, feature-extract, resize, frame-sample.

Design for 100 TB:
- payload stays an opaque ``BinaryType`` column with a typed ``media_meta``
  struct (media_type, width, height, n_frames, sample_rate, codec) -- schema
  is fixed, so Catalyst prunes it like any other column and parquet stores it
  columnar (payload chunks in their own column chunk).
- every kernel is ``mapInPandas`` over Arrow batches: bytes enter Python once
  per batch, never per row; output schemas are fixed StructTypes so the plan
  stays declarative around the kernel.
- the actual codecs (PIL/libav/soundfile) are NOT in this container: each
  kernel takes ``backend="fake"`` (default -- deterministic, fully tested) or
  ``backend="real"`` which raises NotImplementedError at the clearly-marked
  integration point. The Spark-side plumbing (schema, partitioning, UDF
  signature, Arrow batch shape) is identical for both and is what the tests
  pin down.

The deterministic fake treats the payload bytes themselves as the "signal":
pixels = bytes reshaped to (height, width), audio samples = bytes as int8,
frames = equal byte slices. That makes every downstream stat reproducible
and oracle-checkable (octet_length / md5 are computable in DuckDB too).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), False),
        T.StructField("histogram", T.ArrayType(T.LongType()), False),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministically synthesize (payload: binary, media_meta: struct).

    Pure JVM expressions: payload = utf-8 bytes of the text (the opaque blob
    stand-in), media metadata derived arithmetically from the id. At real
    scale the payload column is simply read from storage; nothing downstream
    depends on this synthesis.
    """
    i = F.col(id_col)
    mt = F.element_at(F.array(*[F.lit(m) for m in MEDIA_TYPES]), (i % 3 + 1).cast("int"))
    meta = F.struct(
        mt.alias("media_type"),
        F.when(mt != "audio", (i % 16 + 1).cast("int") * 8).alias("width"),
        F.when(mt != "audio", (i % 9 + 1).cast("int") * 8).alias("height"),
        F.when(mt == "video", (i % 7 + 2).cast("int")).alias("n_frames"),
        F.when(mt == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
        F.element_at(
            F.array(F.lit("png"), F.lit("pcm_s8"), F.lit("rawvideo")), (i % 3 + 1).cast("int")
        ).alias("codec"),
    )
    return df.withColumn(
        "payload", F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    ).withColumn("media_meta", meta)


def _require_real_backend(what: str) -> None:
    raise NotImplementedError(
        f"real {what} backend requires PIL/av/soundfile which are not installed "
        "in this environment; plug the decoder in here. The 'fake' backend "
        "exercises the identical Spark plumbing."
    )


def extract_features(
    media: DataFrame, backend: str = "fake", n_bins: int = 16
) -> DataFrame:
    """payload -> per-doc feature row (byte stats + histogram), mapInPandas.

    The Arrow batch is the unit of Python work: one numpy pass per batch over
    the concatenated payloads, no per-row Python loops for the math.
    """
    if backend == "real":
        _require_real_backend("decode/feature")

    src = media.select("doc_id", F.col("media_meta.media_type").alias("media_type"), "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            lens = np.array([len(p) for p in payloads], dtype=np.int64)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            ends = np.cumsum(lens)
            starts = ends - lens
            mean = np.zeros(len(lens), dtype=np.float64)
            hists = []
            for i, (s, e) in enumerate(zip(starts, ends)):
                seg = flat[s:e]
                if len(seg):
                    mean[i] = seg.sum() / len(seg)
                h, _ = np.histogram(seg, bins=n_bins, range=(0, 256))
                hists.append(h.astype(np.int64).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "media_type": pdf["media_type"],
                    "n_bytes": lens,
                    "mean_byte": np.round(mean, 6),
                    "histogram": hists,
                }
            )

    return src.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, out_w: int, out_h: int, backend: str = "fake"
) -> DataFrame:
    """Image resize kernel: nearest-neighbor over the fake byte 'pixels'.

    Only rows with media_type = 'image' are touched -- the filter happens in
    the plan (partition/row-group pruning), not inside Python.
    """
    if backend == "real":
        _require_real_backend("image resize")

    src = media.filter(F.col("media_meta.media_type") == "image").select(
        "doc_id",
        F.col("media_meta.width").alias("w"),
        F.col("media_meta.height").alias("h"),
        "payload",
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = int(r.w), int(r.h)
                buf = np.frombuffer(bytes(r.payload or b""), dtype=np.uint8)
                img = np.resize(buf, (h, w))  # fake decode: bytes as pixels
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = img[np.ix_(yi, xi)]
                rows.append(
                    {
                        "doc_id": int(r.doc_id),
                        "out_w": out_w,
                        "out_h": out_h,
                        "pixels": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "out_w", "out_h", "pixels"])

    return src.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, every_nth: int = 2, backend: str = "fake"
) -> DataFrame:
    """Video frame sampling: 1 row per kept frame (UDTF-shaped kernel).

    Fake decode: the payload is split into n_frames equal byte slices; frames
    at indices 0, every_nth, 2*every_nth, ... are emitted.
    """
    if backend == "real":
        _require_real_backend("video frame sampling")

    src = media.filter(F.col("media_meta.media_type") == "video").select(
        "doc_id", F.col("media_meta.n_frames").alias("n_frames"), "payload"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for r in pdf.itertuples(index=False):
                buf = bytes(r.payload or b"")
                n = max(int(r.n_frames or 1), 1)
                step = max(len(buf) // n, 1)
                for fi in range(0, n, every_nth):
                    out["doc_id"].append(int(r.doc_id))
                    out["frame_idx"].append(fi)
                    out["frame_bytes"].append(buf[fi * step : (fi + 1) * step])
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema=FRAME_SCHEMA)


def payload_digest(df: DataFrame) -> DataFrame:
    """Oracle-checkable projection of the opaque column: (doc_id, media_type,
    n_bytes, md5) -- all JVM-side, identical semantics in DuckDB."""
    return df.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def fake_feature_oracle(payload: bytes, n_bins: int = 16) -> tuple[int, float, list[int]]:
    """Pure-Python twin of extract_features' fake kernel (for pytest)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = len(arr)
    mean = round(float(arr.sum()) / n, 6) if n else 0.0
    h, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
    return n, mean, h.astype(int).tolist()


def md5_hex(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()
