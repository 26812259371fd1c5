"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` payload column plus a typed
metadata struct — the schema/partitioning/UDF-batching side is real and
tested; the actual codec step is stubbed (decode libraries are not in
this container) behind ``DecodeNotAvailable`` or a deterministic fake,
clearly marked.

Scale shape: payloads are large, so operators here are
``mapInPandas`` (Arrow-batched, streaming per-partition iterator —
never materializes a whole partition), and metadata-only analyses
project the payload column away so the parquet scan can skip it
entirely (column pruning — verified in tests via ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)


class DecodeNotAvailable(NotImplementedError):
    """Raised by real decode paths: image/audio codecs are not installed
    in this environment. The deterministic fake keeps the Spark-side
    plumbing testable."""


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from ``documents``: payload =
    UTF-8 bytes of the text (stands in for an encoded image/audio blob),
    typed metadata computed natively (JVM-side, no UDF)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, "image/png")
            .otherwise("audio/wav")
            .alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — payload column pruned from the scan."""
    return media.select(
        "media_id",
        "kind",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decode: derives (h, w, c)
    from payload length. A real deployment swaps this for PIL/ffmpeg —
    the Spark-side batching contract is identical."""
    n = len(payload)
    return (32 + n % 97, 32 + n % 89, 3)


EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    ``mapInPandas``: per-partition iterator of pandas batches — the
    shape a real decoder needs (batch in, batch out, bounded memory).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise DecodeNotAvailable(
                    "image/audio codecs are not installed in this environment"
                )
            dims = pdf["payload"].map(_fake_decode_image)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "height": dims.map(lambda d: d[0]).astype("int32"),
                    "width": dims.map(lambda d: d[1]).astype("int32"),
                    "channels": dims.map(lambda d: d[2]).astype("int32"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    cols = media.select("media_id", "kind", "payload")
    return cols.mapInPandas(op, EXTRACT_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing demo: explode each payload into
    fixed-stride chunk offsets (what a video frame sampler produces),
    natively via sequence() — one row per sampled offset."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(F.octet_length("payload") - 1, F.lit(0)).cast("long"),
                F.lit(every_n_bytes).cast("long"),
            )
        ).alias("frame_offset"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)


def resize_media(
    media: DataFrame,
    target_h: int = 64,
    target_w: int = 64,
    real_decode: bool = False,
) -> DataFrame:
    """Arrow-batched 'resize': shrink each payload to the byte budget
    implied by the target dimensions (deterministic fake — a real
    deployment decodes, resamples, re-encodes inside the same batch
    iterator; the Spark-side contract is identical: binary in, binary-
    derived columns out, bounded memory per batch).

    The fake keeps ``len * min(target_area / decoded_area, 1)`` leading
    bytes (int-truncated) and reports the new dims + content hash, so
    downstream dedup/integrity checks exercise real plumbing."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise DecodeNotAvailable(
                    "image/audio codecs are not installed in this environment"
                )
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                h, w, _c = _fake_decode_image(payload)
                ratio = min((target_h * target_w) / (h * w), 1.0)
                n_keep = max(1, int(len(payload) * ratio))
                resized = payload[:n_keep]
                rows.append(
                    (
                        mid, kind, target_h, target_w, n_keep,
                        hashlib.sha256(resized).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "height", "width",
                    "resized_bytes", "resized_sha",
                ],
            ).astype(
                {"height": "int32", "width": "int32", "resized_bytes": "int64"}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        op, RESIZE_SCHEMA
    )
