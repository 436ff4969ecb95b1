"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's decode layer (DecodeImage, /root/reference/ppocr/data/imaug/
operators.py:30-68; PDF page render, ppocr/utils/utility.py:119-152) applied
to a Spark table: media is an opaque ``binary`` column with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` stages,
resize planning and frame sampling are pure SQL.

Decode dispatch (round 5): PIL if importable → the vendored pure-stdlib
PNG decoder (``functions/pngcodec.py`` — signature/chunk walk, zlib
inflate, all five row filters; DecodeImage's None-on-bad-bytes contract) →
the clearly-marked deterministic fake (md5-derived features) for non-PNG /
undecodable payloads. ``synth_media`` emits REAL PNG payloads for image
rows (solid md5-derived color behind cycling row filters), so the real
decode branch executes in this container's CI and its features are exactly
mirrorable in the DuckDB oracle. Audio/video codecs remain stubbed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("fmt", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("decoder", T.StringType()),  # 'real' | 'fake'
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _png_payload(i: int) -> bytes:
    """Image row i → a real PNG: solid color from md5("media:i:rgb")[:3],
    small dims (4+(i*5)%12 × 3+(i*7)%9), row filters cycling 0-4 so decode
    must actually unfilter to recover the color (see pngcodec.encode_png).
    The META width/height stay the CLAIMED values — realistic metadata the
    decoder does not trust; features come from the decoded pixels."""
    from ..functions.pngcodec import encode_png

    h = hashlib.md5(f"media:{i}:rgb".encode()).digest()
    return encode_png(4 + (i * 5) % 12, 3 + (i * 7) % 9, (h[0], h[1], h[2]))


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table: image rows carry REAL PNG payloads
    (``_png_payload``), audio/video payload bytes are md5 chains."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = (
            _png_payload(i)
            if kind == "image"
            else b"".join(
                hashlib.md5(f"media:{i}:{j}".encode()).digest()
                for j in range(8)
            )
        )
        meta = {
            "width": 64 + (i * 13) % 960 if kind != "audio" else None,
            "height": 48 + (i * 7) % 540 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 1 + (i * 11) % 240 if kind == "video" else None,
            "fmt": {"image": "png", "audio": "wav", "video": "mkv"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _try_real_decoder():
    """Whether the optional real image codec (PIL) is importable."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


_MODE_IDS = {"1": 1, "L": 2, "P": 3, "RGB": 4, "RGBA": 5, "CMYK": 6, "YCbCr": 7}


def _real_image_features(payload: bytes) -> list[float]:
    """Real decode (DecodeImage analog, /root/reference/ppocr/data/imaug/
    operators.py:30-68: bytes → image, EXIF-orientation aware): dims + EXIF
    orientation tag (274) + color mode folded into the FEATURE_DIM vector —
    the same schema as the stub so downstream plans are decoder-agnostic.
    Raises on undecodable bytes; the caller falls back per row."""
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(payload)) as im:
        w, h = im.size
        try:
            orientation = int(im.getexif().get(274, 1))
        except Exception:
            orientation = 1
        mode_id = _MODE_IDS.get(im.mode, 0)
        return [
            w / 1000.0,
            h / 1000.0,
            orientation / 8.0,
            mode_id / 8.0,
            min(w, h) / 1000.0,
            max(w, h) / 1000.0,
            (w * h) / 1e6,
            len(payload) / 1e6,
        ]


def _png_image_features(payload: bytes) -> list[float] | None:
    """Vendored-decoder branch: real pixel-level decode via
    functions/pngcodec.decode_png (the DecodeImage analog this container
    can actually run). Features: decoded dims + per-channel means — values
    only a correct unfilter+inflate can produce — in the same FEATURE_DIM
    shape as every other branch. None on any undecodable payload."""
    from ..functions.pngcodec import channel_means, decode_png

    dec = decode_png(payload)
    if dec is None:
        return None
    w, h, color_type, _rows = dec
    means = channel_means(dec)
    if color_type == 2:
        mr, mg, mb = means
    elif color_type == 6:
        mr, mg, mb = means[0], means[1], means[2]
    else:  # gray / gray+alpha: replicate the luma mean
        mr = mg = mb = means[0]
    return [
        w / 1000.0,
        h / 1000.0,
        mr / 255.0,
        mg / 255.0,
        mb / 255.0,
        min(w, h) / 1000.0,
        max(w, h) / 1000.0,
        len(payload) / 1e6,
    ]


def _fake_features(payload: bytes) -> list[float] | None:
    """STUB decode (clearly marked): deterministic features from the payload
    hash (md5 over the lowercase hex encoding — hex so the DuckDB oracle,
    whose md5 is VARCHAR-only, can mirror it exactly). Real deployment
    replaces this with codec + CNN/fbank features."""
    if not payload:
        return None
    h = hashlib.md5(payload.hex().encode()).digest()
    return [h[k] / 255.0 for k in range(FEATURE_DIM)]


def extract_features(df: DataFrame) -> DataFrame:
    """media table → (media_id, kind, decoder, features) via mapInPandas.

    One Arrow crossing; batches iterate so a 100 MB video payload doesn't
    force the whole partition into memory at once."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        real = _try_real_decoder()  # probed once per partition, not per row

        def one(kind: str, payload) -> tuple[str, list[float] | None]:
            if real and kind == "image" and payload:
                try:
                    return "pil", _real_image_features(bytes(payload))
                except Exception:
                    # undecodable bytes → DecodeImage's None contract
                    # (operators.py:56-57): fall back, never raise
                    pass
            if kind == "image" and payload:
                feats = _png_image_features(bytes(payload))
                if feats is not None:
                    return "png", feats
            return "fake", _fake_features(payload)

        for pdf in batches:
            decoded = [one(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "decoder": [d for d, _f in decoded],
                    "features": [f for _d, f in decoded],
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 736) -> DataFrame:
    """Aspect-preserving resize planning, pure SQL (the DetResizeForTest
    limit-side math, /root/reference/ppocr/data/imaug/operators.py:268-305:
    scale so the long side ≤ max_side, round to a multiple of 32)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    long_side = F.greatest(w, h)
    ratio = F.when(long_side > max_side, max_side / long_side).otherwise(F.lit(1.0))
    r32 = lambda c: (F.round(c * ratio / 32) * 32).cast("int")
    return df.withColumn("resize_w", r32(w)).withColumn("resize_h", r32(h))


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """video rows → one row per sampled frame index, pure SQL (the PDF
    page-explode shape, check_and_read)."""
    frames = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )
