"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata.

The decode step runs a REAL image decode when Pillow is importable on
the executors (optional dependency — width/height/luminance/histogram
features); without it, ``deterministic_fake=True`` swaps in a seeded,
content-derived fake so the *Spark-side plumbing* — schema, Arrow batch
shape, ``mapInPandas`` partition flow — stays real and testable in
minimal containers, and anything else raises ``NotImplementedError``.

Scale posture: Arrow-batched ``mapInPandas`` (one Python worker per
partition, vectorized transfer), metadata pushdown happens before decode
(filter on width/height/duration BEFORE touching bytes), and binary
payloads never shuffle — all derived features are narrow projections.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType([
    T.StructField("content", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_image_metadata(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Cheap header sniffing without full decode: format magic bytes +
    payload size. Pure JVM functions — runs in codegen, no Python."""
    b = F.col(binary_col)
    magic = F.hex(F.substring(b, 1, 4))
    fmt = (
        F.when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("FFD8FF"), "jpeg")
        .when(magic.startswith("47494638"), "gif")
        .otherwise("unknown")
    )
    return df.withColumn("format", fmt).withColumn("n_bytes", F.length(b))


def _pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_image_features(
    df: DataFrame, id_col: str = "id", binary_col: str = "content",
    feature_dim: int = 8, deterministic_fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    With Pillow installed the real decode runs on each executor:
    width/height from the decoded image, mean luminance, and a
    ``feature_dim``-bin grayscale histogram as the feature vector (a
    stand-in for a model embedding; swap the per-image function for a
    batched model call in production). Without Pillow ->
    NotImplementedError unless ``deterministic_fake`` (features derived
    from a stable hash of the bytes; same plumbing, fake math).

    Decode failures (truncated/corrupt payloads) yield NULL metadata
    rather than failing the partition — at 100 TB some corrupt blobs
    are a certainty."""

    def decode(batches: Iterator["pandas.DataFrame"]):  # noqa: F821
        import hashlib
        import io

        import numpy as np
        import pandas as pd

        use_pil = not deterministic_fake and _pil_available()
        if not deterministic_fake and not use_pil:
            raise NotImplementedError(
                "image decode requires Pillow (pip install Pillow); "
                "pass deterministic_fake=True to exercise the pipeline "
                "without it"
            )
        if use_pil:
            from PIL import Image

        for pdf in batches:
            out = {
                "id": pdf[id_col].astype("int64"),
                "width": [], "height": [], "mean_luma": [], "feature": [],
            }
            for payload in pdf[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if use_pil:
                    try:
                        img = Image.open(io.BytesIO(raw)).convert("L")
                        arr = np.asarray(img, dtype="float32")
                        hist, _ = np.histogram(
                            arr, bins=feature_dim, range=(0.0, 255.0)
                        )
                        out["width"].append(img.width)
                        out["height"].append(img.height)
                        out["mean_luma"].append(float(arr.mean()) / 255.0)
                        out["feature"].append(
                            (hist / max(arr.size, 1)).astype("float32")
                        )
                    except Exception:
                        out["width"].append(None)
                        out["height"].append(None)
                        out["mean_luma"].append(None)
                        out["feature"].append(None)
                else:
                    digest = hashlib.sha256(raw).digest()
                    out["width"].append(
                        int.from_bytes(digest[0:2], "big") % 4096)
                    out["height"].append(
                        int.from_bytes(digest[2:4], "big") % 4096)
                    out["mean_luma"].append(digest[4] / 255.0)
                    out["feature"].append(
                        np.frombuffer(digest[8:8 + 4 * feature_dim],
                                      dtype=np.uint8)[:feature_dim]
                        .astype("float32") / 255.0
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(
        decode, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame, id_col: str = "id", duration_col: str = "duration_s",
    fps: float = 0.5,
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (video, timestamp) to
    decode, derived entirely JVM-side with sequence/explode. The actual
    frame extraction consumes this plan via decode_image_features-style
    mapInPandas downstream."""
    n_frames = F.greatest(
        (F.col(duration_col) * F.lit(fps)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.round(i / F.lit(fps), 3),
            )
        ).alias("sample_ts"),
    )
