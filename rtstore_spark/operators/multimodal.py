"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct; all
heavy per-item work (decode, resize, feature-extract, frame-sample) runs in
Arrow-batched ``mapInPandas`` so bytes stream through Python in columnar
batches, never row-at-a-time.

The actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_stub=True`` produces deterministic fake features so the
Spark-side contract — schemas, batch shapes, partitioning — is real and
tested; swapping in PIL/librosa later only changes the closure body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha16", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_media(df: DataFrame, id_col: str, bytes_col: str, kind: str) -> DataFrame:
    """Wrap an existing binary column into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(bytes_col).cast("binary").alias("content"),
        F.struct(
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, feature_dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Per-item feature extraction over Arrow batches.

    With ``decode_stub`` the "feature" is a deterministic fold of the bytes
    (so tests can assert exact values); a real implementation replaces the
    closure body with an actual decoder + model. The mapInPandas contract —
    iterator of pandas batches in, iterator out, schema fixed — is identical
    either way. Partitioning note: media rows are large; keep
    ``maxPartitionBytes`` low enough that a batch of blobs fits in executor
    memory, and repartition by media_id before GPU stages.
    """
    dim = feature_dim
    stub = decode_stub

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not stub:
                raise NotImplementedError(
                    "real decode requires imaging/audio libraries; "
                    "run with decode_stub=True"
                )
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "sha16": pdf["content"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()[:16]
                ),
                "feature": pdf["content"].map(
                    lambda b: _stub_feature(b or b"", dim)
                ),
            }
            yield pd.DataFrame(out)

    def _stub_feature(b: bytes, d: int):
        # deterministic: mean byte value per d-th stripe, scaled to [0, 1]
        if not b:
            return [0.0] * d
        stripes = [b[i::d] for i in range(d)]
        return [
            float(sum(s) / len(s) / 255.0) if s else 0.0 for s in stripes
        ]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Image resize over Arrow batches: same MEDIA_SCHEMA out, with
    ``meta.width/height`` set to the target and ``content`` replaced by the
    re-encoded bytes.

    Stub codec: deterministic byte fold to width*height bytes (tests can
    assert exact sizes/values); a real build swaps the closure body for
    PIL ``Image.open(...).resize(...)``. Output rows shrink to roughly
    width×height, so downstream partitions stay balanced without a
    repartition — the narrow mapInPandas preserves partitioning.
    """
    w, h, stub = width, height, decode_stub

    def run(batches):
        import pandas as pd

        def fake_resize(b: bytes | None) -> bytes:
            if not stub:
                raise NotImplementedError(
                    "real resize requires an imaging library; "
                    "run with decode_stub=True"
                )
            if not b:
                return bytes(w * h)
            # deterministic fold: cycle the source bytes into the target size
            reps = (w * h + len(b) - 1) // len(b)
            return (bytes(b) * reps)[: w * h]

        for pdf in batches:
            out = pdf.copy()
            out["content"] = pdf["content"].map(fake_resize)
            meta = pd.DataFrame(
                {
                    "mime": pdf["meta"].map(lambda m: (m or {}).get("mime")),
                    "width": w,
                    "height": h,
                    "duration_ms": pdf["meta"].map(
                        lambda m: (m or {}).get("duration_ms")
                    ),
                }
            )
            out["meta"] = meta.to_dict("records")
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.

    Offsets are computed JVM-side from metadata (duration), so the expensive
    decode fan-out is sized before any Python runs; actual frame decode is
    the stubbed step.
    """
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("offset_ms"),
        "content",
    )
    return frames
