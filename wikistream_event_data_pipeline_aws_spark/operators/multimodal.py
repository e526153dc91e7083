"""Multimodal column plumbing (north-star scope).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-preserving
``mapInPandas``, Arrow batch shapes, UDF signatures — is real and
tested; the actual codec work is STUBBED (the image/audio libraries are
not in this container): ``decode_image_batch`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives metadata from the bytes so pipelines
are testable end-to-end.

At 100 TB: binary payloads stay columnar (parquet keeps them dictionary-
free), ``mapInPandas`` streams Arrow batches without collecting, and
the decode stage is embarrassingly parallel — partition by storage
locality, never shuffle the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("declared_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, byte_len long, content_sha string, "
    "width int, height int, n_frames int"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real codec: dimensions derived from
    content bytes."""
    if not payload:
        return 0, 0, 0
    width = 16 + payload[0] % 64
    height = 16 + payload[1 % len(payload)] % 64
    n_frames = 1 + payload[2 % len(payload)] % 8
    return width, height, n_frames


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched; no
    per-row Python). Real decode is NotImplemented in this container."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode needs PIL/av/librosa — not in this "
                    "container; pass fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            dims = payloads.map(lambda b: _fake_decode(bytes(b) if b is not None else b""))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                    # hash the HEX encoding of the blob (not raw bytes) so
                    # a SQL oracle lacking sha256(BLOB) reproduces it
                    "content_sha": payloads.map(
                        lambda b: hashlib.sha256(bytes(b or b"").hex().encode()).hexdigest()[:16]
                    ),
                    "width": dims.map(lambda t: t[0]),
                    "height": dims.map(lambda t: t[1]),
                    "n_frames": dims.map(lambda t: t[2]),
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plan shape: explode virtual frame indexes, keep
    every nth — pure column ops downstream of the decode stub."""
    # guard n_frames = 0: sequence(0, -1) defaults to step -1 and yields
    # [0, -1], so a zero-frame asset would emit a phantom frame_idx=0;
    # explode over an empty array yields the correct zero rows instead
    frames = decoded.withColumn(
        "frame_idx",
        F.explode(
            F.when(
                F.col("n_frames") > 0,
                F.sequence(F.lit(0), F.col("n_frames") - 1),
            ).otherwise(F.array().cast("array<int>"))
        ),
    )
    return frames.filter(F.col("frame_idx") % every_nth == 0).select(
        "media_id", "frame_idx", "width", "height"
    )


def synthetic_media(docs: DataFrame) -> DataFrame:
    """Manufacture a binary corpus from the documents table (testdata has
    no real media): payload = md5 bytes of the text."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.md5("text")).alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.struct(
            F.col("source").alias("source"), F.col("n_chars").alias("declared_bytes")
        ).alias("meta"),
    )


AUDIO_ENERGY_SCHEMA = "media_id long, window_idx int, rms double, peak int"


def audio_window_energy(df: DataFrame, window: int = 4) -> DataFrame:
    """Windowed audio feature extraction via mapInPandas: treat the
    payload bytes as PCM-ish samples, emit per-window RMS energy and
    peak amplitude — the feature-grain an audio training pipeline
    extracts before filtering/captioning. Arrow-batched like
    ``decode_media`` (never per-row Python); the fake waveform (payload
    bytes) keeps every emitted float reproducible byte-for-byte from
    the payload hex, so even this Python-side path is value-checked by
    a SQL oracle. RMS is ``sqrt(mean(b²))`` with the sum folded in
    sample order — the identical IEEE op sequence the oracle runs."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, widx, rms, peak = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                for w in range(len(b) // window):
                    seg = b[w * window : (w + 1) * window]
                    acc = 0.0
                    for x in seg:
                        acc += float(x * x)
                    ids.append(media_id)
                    widx.append(w)
                    rms.append(math.sqrt(acc / float(window)))
                    peak.append(max(seg))
            yield pd.DataFrame(
                {"media_id": ids, "window_idx": widx, "rms": rms, "peak": peak}
            )

    return df.mapInPandas(batches, AUDIO_ENERGY_SCHEMA)


# Worker-context independence: the mapInPandas closures above reference
# module-level helpers (``_fake_decode``), which cloudpickle serializes
# by module reference unless this leaf module ships by value — see
# wikistream_event_data_pipeline_aws_spark.ship_by_value.
def _register_shipping() -> None:
    import sys

    from .. import ship_by_value

    ship_by_value(sys.modules[__name__])


_register_shipping()
