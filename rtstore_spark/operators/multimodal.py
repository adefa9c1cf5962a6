"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct; all
heavy per-item work (decode, resize, feature-extract, frame-sample) runs in
Arrow-batched ``mapInPandas`` so bytes stream through Python in columnar
batches, never row-at-a-time.

The codec step defaults to a STUB (no image/audio libraries ship in this
container): ``decode_stub=True`` produces deterministic fake features so the
Spark-side contract — schemas, batch shapes, partitioning — is real and
tested. With ``decode_stub=False`` the image operators import Pillow
LAZILY inside the executor closure: where Pillow is installed they decode
and resize real images; where it isn't they raise a clear
``NotImplementedError`` instead of silently faking. Audio/video decode
remains stub-only (librosa/ffmpeg equally absent).
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

    With ``decode_stub`` the "feature" is a deterministic fold of the raw
    bytes (so tests can assert exact values). With ``decode_stub=False``
    image rows are DECODED first — Pillow imported lazily inside the
    closure — and the same stripe-mean fold runs over the decoded
    grayscale pixels (a real embedding model would slot in at that point);
    audio rows decode through ``soundfile`` when importable, else the
    stdlib ``wave`` PCM fallback — real waveform stats with zero extra
    installs; video rows decode through ``PyAV`` or ``imageio`` when one
    is importable (up to 4 sampled frames, grayscale fold), else the
    honest ``NotImplementedError`` gate (no codecs in this container).
    The mapInPandas contract — iterator of pandas batches in, iterator
    out, schema fixed — is identical either way. Partitioning note: media
    rows are large; keep ``maxPartitionBytes`` low enough that a batch of
    blobs fits in executor memory, and repartition by media_id before GPU
    stages.
    """
    dim = feature_dim
    stub = decode_stub

    def run(batches):
        import hashlib

        import pandas as pd

        pil_cache = []  # memoized per-task lazy import, probed per image row

        def _pil():
            if not pil_cache:
                try:
                    from PIL import Image  # noqa: N813 — lazy

                    pil_cache.append(Image)
                except ImportError as e:
                    raise NotImplementedError(
                        "decode_stub=False on image rows requires Pillow on "
                        "the executors; install it or run with "
                        "decode_stub=True"
                    ) from e
            return pil_cache[0]

        def _audio_pcm_bytes(b: bytes) -> bytes:
            """Decode audio bytes to a uint8 waveform rendering.

            Probe order: ``soundfile`` (libsndfile — FLAC/OGG/WAV/...)
            when importable, else stdlib ``wave`` (PCM WAV, always
            available) — so unlike images, the real-audio path needs no
            third-party install for the common training-data case.
            Samples are mapped to [0, 255] so the shared stripe-mean fold
            sees the actual waveform, not the container framing.
            """
            import io

            try:
                import numpy as np
                import soundfile as sf

                data, _rate = sf.read(io.BytesIO(b), dtype="float64")
                if data.ndim > 1:
                    data = data.mean(axis=1)  # downmix to mono
                return ((np.clip(data, -1, 1) + 1.0) * 127.5).astype("uint8").tobytes()
            except ImportError:
                pass
            import wave

            import numpy as np

            with wave.open(io.BytesIO(b)) as wf:
                raw = wf.readframes(wf.getnframes())
                width, nch = wf.getsampwidth(), wf.getnchannels()
            if width == 1:  # 8-bit WAV is already unsigned
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
            elif width == 2:
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                x = (x / 32768.0 + 1.0) * 127.5
            elif width == 4:
                x = np.frombuffer(raw, dtype="<i4").astype(np.float64)
                x = (x / 2147483648.0 + 1.0) * 127.5
            else:
                raise NotImplementedError(
                    f"PCM WAV sample width {width} not supported by the "
                    "stdlib fallback; install soundfile"
                )
            if nch > 1:
                x = x.reshape(-1, nch).mean(axis=1)
            return np.clip(x, 0, 255).astype("uint8").tobytes()

        vid_cache = []  # memoized per-task probe: ("av"|"imageio", module)

        def _video_gray_bytes(b: bytes) -> bytes:
            """Decode video bytes to grayscale pixels of a few sampled
            frames (up to 4) — the same lazy-probe pattern as Pillow /
            soundfile: PyAV when importable (full ffmpeg codecs), else
            imageio v3 (whose pyav/ffmpeg plugins carry the codecs), else
            the honest environment gate. Neither library ships in this
            container, so here the gate raises — but the plumbing (probe
            order, frame sampling, gray fold into the shared stripe
            feature) is the real path a codec-equipped cluster runs."""
            if not vid_cache:
                try:
                    import av  # noqa: F401 — lazy probe

                    vid_cache.append(("av", av))
                except ImportError:
                    try:
                        import imageio.v3 as iio  # noqa: F401 — lazy probe

                        vid_cache.append(("imageio", iio))
                    except ImportError as e:
                        raise NotImplementedError(
                            "decode_stub=False on video rows requires "
                            "PyAV ('av') or imageio on the executors; "
                            "install one or run with decode_stub=True"
                        ) from e
            backend, mod = vid_cache[0]
            import io

            import numpy as np

            frames = []
            if backend == "av":
                with mod.open(io.BytesIO(b)) as container:
                    for frame in container.decode(
                        container.streams.video[0]
                    ):
                        frames.append(frame.to_ndarray(format="gray"))
                        if len(frames) >= 4:
                            break
            else:
                try:
                    for arr in mod.imiter(b):
                        a = np.asarray(arr)
                        if a.ndim == 3:  # RGB(A) → gray
                            a = a[..., :3].mean(axis=2)
                        frames.append(a)
                        if len(frames) >= 4:
                            break
                except Exception as e:  # noqa: BLE001 — imageio's video
                    # support itself rides a plugin (pyav / imageio-ffmpeg);
                    # a bare imageio install raises an obscure "no backend"
                    # error here. Blame the environment ONLY when no video
                    # plugin is actually importable — with plugins present
                    # this is a data error (corrupt/truncated clip) and
                    # must keep its own type, not masquerade as a gate
                    import importlib.util as ilu

                    if ilu.find_spec("av") or ilu.find_spec("imageio_ffmpeg"):
                        raise
                    raise NotImplementedError(
                        "imageio is installed but could not decode video "
                        f"(its video plugins need 'av' or 'imageio-ffmpeg'):"
                        f" {e}; install one or run with decode_stub=True"
                    ) from e
            if not frames:
                raise ValueError("video stream decoded to zero frames")
            return b"".join(
                np.clip(f, 0, 255).astype("uint8").tobytes() for f in frames
            )

        def feature_of(b, kind):
            if stub:
                return _stub_feature(b or b"", dim)
            import io

            if kind == "image":
                px = _pil().open(io.BytesIO(b)).convert("L").tobytes()
                return _stub_feature(px, dim)
            if kind == "audio":
                # same lazy-probe gate as Pillow: soundfile when present
                # (any libsndfile format), stdlib wave as the always-there
                # fallback for PCM WAV — real waveform, same stripe fold
                return _stub_feature(_audio_pcm_bytes(b), dim)
            if kind == "video":
                return _stub_feature(_video_gray_bytes(b), dim)
            raise NotImplementedError(
                f"real decode for kind={kind!r} is not supported; run "
                "with decode_stub=True"
            )

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "sha16": pdf["content"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()[:16]
                ),
                "feature": [
                    feature_of(b, k)
                    for b, k in zip(pdf["content"], pdf["kind"])
                ],
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
    assert exact sizes/values). With ``decode_stub=False`` Pillow is
    imported lazily in the closure and the bytes go through a real
    ``Image.open(...).resize(...)`` + PNG re-encode (``meta.mime`` becomes
    image/png); without Pillow installed that raises a clear
    ``NotImplementedError``. Output rows shrink to roughly width×height,
    so downstream partitions stay balanced without a repartition — the
    narrow mapInPandas preserves partitioning.
    """
    w, h, stub = width, height, decode_stub

    def run(batches):
        import pandas as pd

        pil_image = None
        if not stub:
            try:
                from PIL import Image as pil_image  # noqa: N813 — lazy
            except ImportError as e:
                raise NotImplementedError(
                    "decode_stub=False requires Pillow on the executors; "
                    "install it or run with decode_stub=True"
                ) from e

        def fake_resize(b: bytes | None) -> bytes:
            if not b:
                return bytes(w * h)
            # deterministic fold: cycle the source bytes into the target size
            reps = (w * h + len(b) - 1) // len(b)
            return (bytes(b) * reps)[: w * h]

        def real_resize(b: bytes | None) -> bytes:
            import io

            if not b:
                return b""
            im = pil_image.open(io.BytesIO(b)).resize((w, h))
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            return buf.getvalue()

        resize = fake_resize if stub else real_resize
        for pdf in batches:
            out = pdf.copy()
            out["content"] = pdf["content"].map(resize)
            meta = pd.DataFrame(
                {
                    "mime": (
                        pdf["meta"].map(lambda m: (m or {}).get("mime"))
                        if stub
                        else "image/png"
                    ),
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


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup: one row per distinct byte content —
    (content_hash, keep_id, n_copies, kind), lowest media_id wins.

    The binary-column twin of ``dedup.exact_dedup``: the groupBy key is
    the 128-bit md5 computed JVM-side over the blob, so the media bytes
    themselves never cross a shuffle — the exchange moves (16-byte hash,
    id, kind) rows regardless of blob size. At crawl scale this is the
    first image/audio pass (byte-identical copies dominate: same asset
    served by thousands of pages); feature-space near-dup
    (``media_neardup``) runs on the survivors.
    """
    return (
        media.select(
            F.md5(F.col("content")).alias("content_hash"),
            F.col("media_id").alias("keep_id"),
            "kind",
        )
        .groupBy("content_hash")
        .agg(
            F.min("keep_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("kind").alias("kind"),
        )
    )


def media_neardup(
    media: DataFrame,
    threshold: float = 0.98,
    feature_dim: int = 8,
    decode_stub: bool = True,
    band_planes: int = 8,
) -> DataFrame:
    """Perceptual near-duplicate media pairs: (id_a, id_b, cosine).

    Composition, not new machinery: ``extract_features`` (Arrow-batched
    decode → stripe-mean feature; a real embedding model slots in there)
    feeds ``dedup.embedding_neardup_pairs`` (hyperplane-LSH buckets +
    exact cosine verify) — so the only corpus-wide operation is the
    bucket equi-join over ``feature_dim``-float vectors, never the blobs.
    """
    from rtstore_spark.operators.dedup import embedding_neardup_pairs

    feats = extract_features(media, feature_dim, decode_stub).select(
        "media_id", "feature"
    )
    return embedding_neardup_pairs(
        feats, "feature", "media_id", threshold=threshold, band_planes=band_planes
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
