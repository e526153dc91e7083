"""Multimodal-column queries (north-star scope): opaque binary payloads
with typed metadata, REAL pure-stdlib container codecs (PNG / WAV /
Y4M) behind Arrow-batched ``mapInPandas``, and frame sampling.

The testdata has no real media, so ``synthetic_media`` manufactures a
raw byte corpus from the documents table (payload = md5 bytes of the
text) and ``encode_containers`` wraps each payload in a genuine
container — a PNG with CRC-checked chunks, a RIFF/WAVE with PCM u8
samples, a YUV4MPEG2 stream with FRAME sections. Because the decoded
values are exactly the md5 bytes, every decoded fact (dimensions,
sample rate, frame count, pixel/sample min/max/sum) is reproducible in
the DuckDB oracle from the hex string alone: the whole
encode→decode→aggregate path is value-checked, and an encoder bug OR a
decoder bug breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    PNG_H,
    PNG_W,
    WAV_SAMPLE_RATE,
    Y4M_H,
    Y4M_MAX_FRAMES,
    Y4M_W,
    decode_media,
    encode_containers,
    sample_frames,
    synthetic_media,
)


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

# byte k (0-based) of the raw payload, as an integer, straight from hex
_BYTE = "CAST(concat('0x', substr(md5(text), {pos}, 2)) AS INTEGER)"
_B = [_BYTE.format(pos=2 * i + 1) for i in range(16)]


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column round-trip on the RAW corpus: typed metadata +
    payload length + hex (the PNG container's zlib stream makes the
    container hex oracle-opaque, so byte-exact payload checks live
    here, and decoded-value checks live in ``multimodal_decode``)."""
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
    """REAL container decode end-to-end: the corpus is wrapped in
    genuine PNG/WAV/Y4M containers (``encode_containers``), then
    ``decode_media`` parses them back by MAGIC BYTES — CRC-checked PNG
    chunk walk + inflate + defilter, RIFF chunk walk, Y4M header/FRAME
    split — and emits typed facts plus min/max/sum over the decoded
    pixels/samples. The oracle predicts every value from ``md5(text)``
    hex, so a bug in either codec direction breaks parity."""
    return decode_media(encode_containers(_media(spark, sf_dir)))


def _stats_over(bs: list[str]) -> tuple[str, str, str]:
    return (
        f"LEAST({', '.join(bs)})",
        f"GREATEST({', '.join(bs)})",
        " + ".join(bs),
    )


def _decode_oracle_sql() -> str:
    mn16, mx16, sm16 = _stats_over(_B)
    img = f"""
SELECT doc_id AS media_id, 'image' AS media_type, 'png' AS container,
       {PNG_W} AS width, {PNG_H} AS height, 1 AS n_frames,
       CAST(NULL AS INTEGER) AS n_samples,
       CAST(NULL AS INTEGER) AS sample_rate,
       {mn16} AS val_min, {mx16} AS val_max,
       CAST({sm16} AS BIGINT) AS val_sum
FROM documents WHERE doc_id % 3 = 0"""
    aud = f"""
SELECT doc_id, 'audio', 'wav',
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       16, {WAV_SAMPLE_RATE},
       {mn16}, {mx16}, CAST({sm16} AS BIGINT)
FROM documents WHERE doc_id % 3 = 1"""
    nf = f"1 + {_B[0]} % {Y4M_MAX_FRAMES}"
    mins, maxs, sums = [], [], []
    for k in range(1, Y4M_MAX_FRAMES + 1):
        mn, mx, sm = _stats_over(_B[: 4 * k])
        mins.append(f"WHEN {k} THEN {mn}")
        maxs.append(f"WHEN {k} THEN {mx}")
        sums.append(f"WHEN {k} THEN ({sm})")
    vid = f"""
SELECT doc_id, 'video', 'y4m',
       {Y4M_W}, {Y4M_H}, {nf},
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CASE {nf} {' '.join(mins)} END,
       CASE {nf} {' '.join(maxs)} END,
       CAST(CASE {nf} {' '.join(sums)} END AS BIGINT)
FROM documents WHERE doc_id % 3 = 2"""
    return f"{img}\nUNION ALL\n{aud}\nUNION ALL\n{vid}"


MULTIMODAL_DECODE_SQL = _decode_oracle_sql()


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling downstream of the REAL decode: keep every 2nd
    frame of each framed container (PNG = 1 frame, Y4M = 1..4 frames;
    WAV has no frame dimension and yields none)."""
    return sample_frames(multimodal_decode(spark, sf_dir), every_nth=2)


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH decoded AS ({MULTIMODAL_DECODE_SQL})
SELECT media_id, frame_idx, width, height
FROM (
  SELECT media_id, CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx,
         width, height
  FROM decoded WHERE n_frames IS NOT NULL
)
WHERE frame_idx % 2 = 0
"""


_AUDIO_WINDOW = 4  # samples per analysis window


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS/peak features over the audio slice of the media
    corpus: ``encode_containers`` wraps the samples in a real WAV,
    ``audio_window_energy`` parses the RIFF chunks back and windows
    the PCM samples (Arrow-batched mapInPandas). The oracle
    reconstructs every float from the payload hex with the identical
    IEEE op order, so the Python feature extractor is value-checked."""
    from ..operators.multimodal import audio_window_energy

    audio = encode_containers(
        _media(spark, sf_dir).filter(F.col("media_type") == "audio")
    )
    return audio_window_energy(audio, window=_AUDIO_WINDOW)


def _audio_energy_sql() -> str:
    selects = []
    n_windows = 16 // _AUDIO_WINDOW  # payload = 16 samples
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
