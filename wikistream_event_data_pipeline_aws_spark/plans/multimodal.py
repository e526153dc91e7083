"""Multimodal-column queries (north-star scope): opaque binary payloads
with typed metadata, Arrow-batched decode via ``mapInPandas``, and
frame sampling.

The testdata has no real media, so ``synthetic_media`` manufactures a
binary corpus from the documents table (payload = md5 bytes of the
text). Because the payload is derived from ``md5(text)``, every decoded
metric — byte length, content hash, fake-decoded dimensions — is
reproducible in the DuckDB oracle from the hex string alone, making the
whole mapInPandas path value-checked, not just rows-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import decode_media, sample_frames, synthetic_media


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthetic_media(load_table(spark, sf_dir, "documents"))


_MEDIA_SQL = """
  SELECT doc_id AS media_id,
         unhex(md5(text)) AS payload,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         source, n_chars AS declared_bytes
  FROM documents
"""

# byte k (0-based) of the payload, as an integer, straight from the hex
_BYTE = "CAST(concat('0x', substr(md5(text), {pos}, 2)) AS INTEGER)"


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column round-trip: typed metadata + payload length + hex."""
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        "media_type",
        F.length("payload").cast("long").alias("byte_len"),
        F.hex("payload").alias("payload_hex"),
        F.col("meta.source").alias("source"),
        F.col("meta.declared_bytes").alias("declared_bytes"),
    )


MULTIMODAL_METADATA_SQL = f"""
WITH media AS ({_MEDIA_SQL})
SELECT media_id, media_type,
       octet_length(payload) AS byte_len,
       upper(hex(payload)) AS payload_hex,
       source, declared_bytes
FROM media
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract (deterministic fake codec —
    real codecs are NotImplemented in this container; the Spark plumbing
    is the product)."""
    return decode_media(_media(spark, sf_dir), fake=True)


MULTIMODAL_DECODE_SQL = f"""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(16 AS BIGINT) AS byte_len,
       substr(sha256(md5(text)), 1, 16) AS content_sha,
       16 + {_BYTE.format(pos=1)} % 64 AS width,
       16 + {_BYTE.format(pos=3)} % 64 AS height,
       1 + {_BYTE.format(pos=5)} % 8 AS n_frames
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling downstream of the decode stub: keep every 2nd
    virtual frame."""
    return sample_frames(multimodal_decode(spark, sf_dir), every_nth=2)


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH decoded AS (
  SELECT doc_id AS media_id,
         16 + {_BYTE.format(pos=1)} % 64 AS width,
         16 + {_BYTE.format(pos=3)} % 64 AS height,
         1 + {_BYTE.format(pos=5)} % 8 AS n_frames
  FROM documents
)
SELECT media_id, frame_idx, width, height
FROM (
  SELECT media_id, CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx,
         width, height
  FROM decoded
)
WHERE frame_idx % 2 = 0
"""


_AUDIO_WINDOW = 4  # bytes (samples) per analysis window


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS/peak features over the audio slice of the media
    corpus (``operators.multimodal.audio_window_energy`` — Arrow-batched
    mapInPandas over the deterministic fake waveform). The oracle
    reconstructs every float from the payload hex with the identical
    IEEE op order, so the Python feature extractor is value-checked."""
    from ..operators.multimodal import audio_window_energy

    audio = _media(spark, sf_dir).filter(F.col("media_type") == "audio")
    return audio_window_energy(audio, window=_AUDIO_WINDOW)


def _audio_energy_sql() -> str:
    selects = []
    n_windows = 16 // _AUDIO_WINDOW  # md5 payload = 16 bytes
    for w in range(n_windows):
        bs = [_BYTE.format(pos=2 * (w * _AUDIO_WINDOW + i) + 1) for i in range(_AUDIO_WINDOW)]
        sq = " + ".join(f"CAST({b} AS DOUBLE) * CAST({b} AS DOUBLE)" for b in bs)
        peak = f"GREATEST({', '.join(bs)})"
        selects.append(f"""
SELECT doc_id AS media_id, {w} AS window_idx,
       sqrt(({sq}) / {float(_AUDIO_WINDOW)!r}) AS rms,
       {peak} AS peak
FROM documents WHERE doc_id % 3 = 1""")
    return "\nUNION ALL\n".join(selects)


MULTIMODAL_AUDIO_ENERGY_SQL = _audio_energy_sql()


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_decode": multimodal_decode,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_audio_energy": multimodal_audio_energy,
}

ORACLES = {
    "multimodal_metadata": MULTIMODAL_METADATA_SQL,
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_SQL,
    "multimodal_audio_energy": MULTIMODAL_AUDIO_ENERGY_SQL,
}
