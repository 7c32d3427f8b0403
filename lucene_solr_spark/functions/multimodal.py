"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns beside a metadata struct
(the same pattern as the corpus ``html:binary`` column). The Spark-side
plumbing — schema, Arrow batch shape, partition sizing, UDF signatures —
is real and tested; the actual decoders are STUBBED (this container ships
no image/audio libraries): ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder derives
pixel statistics from the payload bytes so the pipeline is testable
end-to-end.

Scale notes baked into the shapes:
  - payloads stay in the leaf columns; metadata-only plans never touch them
    (Parquet column pruning), so "select width, height" reads no bytes
  - feature extraction is mapInPandas over Arrow record batches, with
    maxRecordsPerBatch bounding batch memory for fat rows
  - frame sampling emits (asset_id, frame_no, feature) — a posexplode-like
    fan-out kept scan-side; downstream groupBys shuffle only features
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_assets(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake binary assets for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8)
        rows.append(
            (
                i,
                bytearray(payload.tobytes()),
                ("image/fake", int(rng.integers(16, 256)), int(rng.integers(16, 256))),
            )
        )
    return spark.createDataFrame(rows, IMAGE_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in decoder: sha256-seeded pseudo-features."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    return _fake_feature(payload, 64)


def extract_features(assets: DataFrame, dim: int = 64, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches (real plumbing,
    stub decoder)."""

    def run(it):
        for pdf in it:
            feats = [
                _fake_feature(bytes(p), dim) if fake else decode_image(bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].to_numpy(), "feature": feats}
            )

    return assets.select("asset_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024, dim: int = 16) -> DataFrame:
    """Frame-sampling shape: one row per sampled 'frame' of each payload."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(it):
        for pdf in it:
            out_a, out_f, out_feat = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(p)
                for fi, off in enumerate(range(0, len(b), every_n_bytes)):
                    out_a.append(aid)
                    out_f.append(fi)
                    out_feat.append(_fake_feature(b[off : off + every_n_bytes], dim))
            yield pd.DataFrame(
                {"asset_id": out_a, "frame_no": out_f, "feature": out_feat}
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema)


def metadata_only_projection(assets: DataFrame) -> DataFrame:
    """Column-pruned metadata scan: never reads payload bytes."""
    return assets.select("asset_id", "meta.width", "meta.height").where(
        F.col("meta.width") >= 32
    )
