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
    audio_fingerprint,
    decode_media,
    encode_containers,
    image_dhash,
    sample_frames,
    synthetic_media,
    video_frame_ids,
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


PHASH_CLONE_MAX_ID = 30  # images with doc_id < 30 get a perturbed clone
PHASH_CLONE_OFFSET = 100_000
_PHASH_PERT_DELTA = 64  # pixel[0] += 64 (clamped) — a visible gradient change


def _payload_hex(n_bytes: int):
    """Column expr: ``n_bytes`` deterministic payload bytes as hex,
    chained from md5 blocks — block 0 is ``md5(text)``, block m is
    ``md5(text || '#m')`` — so any payload size stays predictable from
    the document text by both engines (the DuckDB oracles rebuild the
    identical chain)."""
    n_blocks = (n_bytes + 15) // 16
    parts = [F.md5("text")] + [
        F.md5(F.concat(F.col("text"), F.lit(f"#{m}")))
        for m in range(1, n_blocks)
    ]
    return F.substring(F.concat(*parts), 1, 2 * n_bytes)


def _media_corpus_augmented(
    spark: SparkSession,
    sf_dir: str,
    residue: int,
    delta: int,
    byte_idx: int = 0,
    n_bytes: int = 16,
) -> DataFrame:
    """One media_type slice of the corpus (``doc_id % 3 == residue``)
    plus planted NEAR-IDENTICAL clones: for each member with doc_id <
    {max_id}, a copy at media_id + {off} whose byte ``byte_idx`` is
    raised by ``delta`` (clamped to 255) — a one-value perturbation
    that flips only the fingerprint bits whose comparison involves it.
    The video path perturbs byte 15 (the LAST frame's last pixel)
    because byte 0 doubles as the frame-count selector there. Payloads
    are ``n_bytes`` RAW md5-chain bytes (:func:`_payload_hex`): 16 for
    the video fixture, 64 for the production-grain image/audio
    fingerprint corpora; callers wrap them in real containers
    downstream."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == residue)
        .select("doc_id", "text")
    )
    hexp = _payload_hex(n_bytes)
    base = d.select(
        F.col("doc_id").alias("media_id"), F.unhex(hexp).alias("payload")
    )
    b = F.conv(F.substring(hexp, 2 * byte_idx + 1, 2), 16, 10).cast("int")
    pert_hex = F.concat(
        F.substring(hexp, 1, 2 * byte_idx),
        F.lpad(F.hex(F.least(F.lit(255), b + delta)), 2, "0"),
        F.substring(hexp, 2 * byte_idx + 3, 2 * n_bytes - 2 * byte_idx - 2),
    )
    clones = d.filter(F.col("doc_id") < PHASH_CLONE_MAX_ID).select(
        (F.col("doc_id") + PHASH_CLONE_OFFSET).alias("media_id"),
        F.unhex(pert_hex).alias("payload"),
    )
    return base.unionByName(clones)


_media_corpus_augmented.__doc__ = _media_corpus_augmented.__doc__.format(
    max_id=PHASH_CLONE_MAX_ID, off=PHASH_CLONE_OFFSET
)


# Sparse-regime envelopes for the FIXED 60-bit / 4x15-band
# configuration (production-grain since round 9: 64-pixel images /
# 64-sample clips give 60 near-independent sign bits, so each band's
# effective value space is the true ~2^15 — measured by
# tools/scale_curve.py, phash/afp families, exponent ~1 under the
# band-width knob). Bounds sit where EXPECTED random band candidates
# (4 * N^2 / 2^16) reach ~50M — 100x the retired fixture envelopes.
# Past them the knob is band width ~ log2(N): larger assets carry more
# gradient bits (a longer clip / bigger image widens the fingerprint
# for free), exactly what the scale-curve families demonstrate.
PHASH_MAX_ASSETS = 30_000_000
AFP_MAX_ASSETS = 20_000_000


def _check_fixture_envelope(n: int, max_n: int, noun: str, family: str) -> None:
    if n > max_n:
        raise ValueError(
            f"multimodal {family} near-dup runs a FIXED 60-bit / 4x15 "
            f"band configuration: {n:,} {noun} exceed its {max_n:,}-asset "
            "sparse-regime envelope (~50M expected random band "
            "candidates at 2^15 values per band). Widen the fingerprint "
            "with asset size (band width ~ log2 N — see "
            "tools/scale_curve.py's phash/afp families) instead of "
            "raising the bound"
        )


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup (VERDICT r7 item 3; graduated to
    production grain in round 9 per VERDICT r8 item 3) — the
    multimodal codecs composed with the banded Hamming join into ONE
    first-class LLM-pipeline operator: raw 64-pixel image corpus
    (+ planted one-pixel-perturbed clones) -> REAL 16x4 grayscale PNG
    containers (``encode_containers``) -> container parse + 60-bit
    dHash over the DECODED pixels (``image_dhash``: CRC-checked chunk
    walk, inflate, defilter, then one bit per horizontal
    neighbor-pixel gradient — 4 rows x 15 comparisons) -> the same
    4x15-bit banded Hamming join the 60-bit simhash path uses
    (pigeonhole-complete at Hamming<=3; each band is one pixel ROW's
    gradient vector, so the 2^15 band values are near-uniform and
    buckets stay sparse at 100x corpus growth — never a cartesian).
    Output: (id_a, id_b, hamming) candidate pairs within Hamming<=3;
    a planted clone's perturbed pixel 0 touches only the (0,1)
    gradient bit, so every clone surfaces while unrelated images do
    not.

    The oracle reproduces every fingerprint bit from the md5 hex chain
    alone — so a bug in the PNG encoder, the decoder, OR the hash
    breaks value parity. Scale shape: fingerprinting is map-only over
    the blobs (which never shuffle — only 8-byte hashes do); the pair
    join is band-bucketed exactly like ``dedup_simhash_band60``, and
    tools/scale_curve.py's gated ``phash`` family measures the
    candidate exponent ~linear under the production band-width knob
    (band width ~ log2 N, i.e. bigger images -> more gradient bits).
    This FIXED 4x15 configuration fail-fasts past ``PHASH_MAX_ASSETS``
    (~50M expected random band candidates) rather than silently
    decaying — at that corpus size you widen the fingerprint, not the
    bound."""
    from .dedup import _simhash60_pairs_from_sig, _spread

    # spread the corpus BEFORE the Arrow stages: the scan yields 1-2
    # splits at test SFs and the encode/decode/fingerprint Python work
    # would otherwise serialize on them (same lesson as the simhash
    # signature builds); at 100 TB the scan already has thousands of
    # splits and this is a near-no-op
    corpus = _spread(
        _media_corpus_augmented(
            spark, sf_dir, residue=0, delta=_PHASH_PERT_DELTA, n_bytes=64
        ).withColumn("media_type", F.lit("image"))
    )
    sig = image_dhash(encode_containers(corpus))
    fenced = sig.select(
        F.col("media_id").alias("doc_id"), F.col("phash").alias("simhash60")
    ).localCheckpoint(eager=True)
    _check_fixture_envelope(fenced.count(), PHASH_MAX_ASSETS, "images", "phash")
    return _simhash60_pairs_from_sig(fenced)


def _oracle_bytes(n_bytes: int) -> list[str]:
    """DuckDB exprs for payload bytes 0..n_bytes-1 of the md5-chain
    corpus (:func:`_payload_hex`'s twin): byte i lives in hex chars
    ``2*(i%16)`` of block ``i//16``."""
    out = []
    for i in range(n_bytes):
        blk = i // 16
        h = "md5(text)" if blk == 0 else f"md5(text || '#{blk}')"
        out.append(
            f"CAST(concat('0x', substr({h}, {2 * (i % 16) + 1}, 2)) AS INTEGER)"
        )
    return out


def _phash_oracle_sql() -> str:
    from ..operators.multimodal import PHASH_N_PIXELS, PHASH_PAIRS

    from .dedup import SIMHASH60_BANDS, SIMHASH60_HAM_MAX

    byte_cols = ", ".join(
        f"{b} AS b{i}" for i, b in enumerate(_oracle_bytes(PHASH_N_PIXELS))
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} < b{j} THEN (1::BIGINT << {k}) ELSE 0::BIGINT END)"
        for k, (i, j) in enumerate(PHASH_PAIRS)
    )
    return f"""
WITH base AS (
  SELECT doc_id, {byte_cols} FROM documents WHERE doc_id % 3 = 0
),
imgs AS (
  SELECT doc_id AS media_id, * EXCLUDE (doc_id, b0), b0 FROM base
  UNION ALL
  SELECT doc_id + {PHASH_CLONE_OFFSET} AS media_id, * EXCLUDE (doc_id, b0),
         LEAST(255, b0 + {_PHASH_PERT_DELTA}) AS b0
  FROM base WHERE doc_id < {PHASH_CLONE_MAX_ID}
),
sigs AS (
  SELECT media_id AS doc_id, {fp} AS sh FROM imgs
),
banded AS (
  SELECT doc_id, sh, t.j AS bi, (sh >> (15 * CAST(t.j AS INTEGER))) & 32767 AS bv
  FROM sigs, range({SIMHASH60_BANDS}) t(j)
),
cands AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.sh AS sim_a, r.sh AS sim_b
  FROM banded l JOIN banded r
    ON l.bi = r.bi AND l.bv = r.bv AND l.doc_id < r.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cands
WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH60_HAM_MAX}
"""


MULTIMODAL_PHASH_NEARDUP_SQL = _phash_oracle_sql()


_AFP_PERT_DELTA = 8  # sample[0] += 8 — audible click, tiny energy shift


def multimodal_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic-fingerprint audio near-dup — the audio twin of
    ``multimodal_phash_neardup``, completing near-dup coverage of the
    media corpus's decodable modalities (graduated to production grain
    in round 9 per VERDICT r8 item 3): the 64-sample audio slice plus
    planted one-sample-perturbed clones (sample 0 raised by {d},
    clamped) is wrapped in REAL RIFF/WAVE containers,
    ``audio_fingerprint`` parses them back and emits a 60-bit
    Haitsma-Kalker fingerprint — the sign of the energy difference
    between consecutive short-time windows, 31 overlapping 4-sample
    windows x even/odd sub-bands = 30 gradient bits per sub-band
    chain, pure gradient structure with no filler — and candidate
    pairs come from the same 4x15-bit pigeonhole band join as
    simhash60/phash (Hamming<=3, never a cartesian). Sample 0 lives
    only in window 0's even sub-band, so the perturbation moves ONE of
    the 62 energies (one fingerprint bit) and the planted clones stay
    inside the Hamming radius while unrelated clips do not. Energies
    are integer sums of squared u8 samples — exact on both engines —
    so the oracle reproduces every bit from the md5 hex chain and a
    container/codec/hash bug on either side breaks value parity.
    Map-only fingerprinting; blobs never shuffle; the gated ``afp``
    scale-curve family measures the candidate exponent ~linear under
    the band-width knob. This FIXED 4x15 configuration fail-fasts past
    ``AFP_MAX_ASSETS`` clips (~50M expected random band candidates) —
    at that corpus size a longer clip widens the fingerprint instead
    of the bound."""
    from .dedup import _simhash60_pairs_from_sig, _spread

    corpus = _spread(  # spread before the Arrow stages (see phash note)
        _media_corpus_augmented(
            spark, sf_dir, residue=1, delta=_AFP_PERT_DELTA, n_bytes=64
        ).withColumn("media_type", F.lit("audio"))
    )
    sig = audio_fingerprint(encode_containers(corpus))
    fenced = sig.select(
        F.col("media_id").alias("doc_id"), F.col("afp").alias("simhash60")
    ).localCheckpoint(eager=True)
    _check_fixture_envelope(fenced.count(), AFP_MAX_ASSETS, "clips", "afp")
    return _simhash60_pairs_from_sig(fenced)


multimodal_audio_fp_neardup.__doc__ = multimodal_audio_fp_neardup.__doc__.format(
    d=_AFP_PERT_DELTA
)


def _audio_fp_oracle_sql() -> str:
    from ..operators.multimodal import AFP_N_SAMPLES, AFP_N_WIN, AFP_PAIRS

    from .dedup import SIMHASH60_BANDS, SIMHASH60_HAM_MAX

    byte_cols = ", ".join(
        f"{b} AS b{i}" for i, b in enumerate(_oracle_bytes(AFP_N_SAMPLES))
    )
    energy_cols = []
    for i in range(AFP_N_WIN):
        energy_cols.append(f"(b{2*i} * b{2*i} + b{2*i+2} * b{2*i+2}) AS e{2*i}")
        energy_cols.append(
            f"(b{2*i+1} * b{2*i+1} + b{2*i+3} * b{2*i+3}) AS e{2*i+1}"
        )
    fp = " + ".join(
        f"(CASE WHEN e{i} < e{j} THEN (1::BIGINT << {k}) ELSE 0::BIGINT END)"
        for k, (i, j) in enumerate(AFP_PAIRS)
    )
    return f"""
WITH base AS (
  SELECT doc_id, {byte_cols} FROM documents WHERE doc_id % 3 = 1
),
clips AS (
  SELECT doc_id AS media_id, * EXCLUDE (doc_id, b0), b0 FROM base
  UNION ALL
  SELECT doc_id + {PHASH_CLONE_OFFSET} AS media_id, * EXCLUDE (doc_id, b0),
         LEAST(255, b0 + {_AFP_PERT_DELTA}) AS b0
  FROM base WHERE doc_id < {PHASH_CLONE_MAX_ID}
),
en AS (
  SELECT media_id, {", ".join(energy_cols)} FROM clips
),
sigs AS (
  SELECT media_id AS doc_id, {fp} AS sh FROM en
),
banded AS (
  SELECT doc_id, sh, t.j AS bi, (sh >> (15 * CAST(t.j AS INTEGER))) & 32767 AS bv
  FROM sigs, range({SIMHASH60_BANDS}) t(j)
),
cands AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.sh AS sim_a, r.sh AS sim_b
  FROM banded l JOIN banded r
    ON l.bi = r.bi AND l.bv = r.bv AND l.doc_id < r.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cands
WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH60_HAM_MAX}
"""


MULTIMODAL_AUDIO_FP_NEARDUP_SQL = _audio_fp_oracle_sql()


_VFRAME_PERT_DELTA = 8
_VFRAME_PERT_BYTE = 15  # last pixel of the LAST frame (byte 0 picks n_frames)
_VFRAME_JACCARD = 0.5


def multimodal_video_frame_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe-overlap video near-dup — the third modality, and a
    deliberately DIFFERENT matching shape from the image/audio paths:
    instead of one banded-Hamming fingerprint per asset, each clip
    decomposes into exact frame identities (``video_frame_ids``: real
    Y4M parse, luma bytes packed into a key — at production frame
    sizes the key is a frame digest, same algebra) and two clips are
    near-dups when the JACCARD OVERLAP of their distinct frame-key
    sets clears {thr} — the coarse content-defined dedup video
    pipelines run before any expensive perceptual alignment. The pair
    join is a frame-key equi-join (candidates = clips sharing >= 1
    exact frame; 2^32-value key space stays sparse at 100x), never a
    cartesian; set sizes and intersections are exact counts.

    Planted clones perturb byte {pb} (the last frame's last pixel,
    +{d} clamped): a 4-frame clip's clone shares 3 of its 4 frames
    (Jaccard 0.6); clips with fewer frames never touch byte {pb}, so
    their clones are exact duplicates (Jaccard 1.0) — every planted
    pair clears the threshold and the fixture test pins all 10. The
    oracle rebuilds frame keys and the frame-count arithmetic
    (n = 1 + byte0 % 4) from ``md5(text)`` hex, so an encoder, parser
    or keying bug on either side breaks value parity."""
    from .dedup import _spread

    corpus = _spread(  # spread before the Arrow stages (see phash note)
        _media_corpus_augmented(
            spark, sf_dir, residue=2, delta=_VFRAME_PERT_DELTA,
            byte_idx=_VFRAME_PERT_BYTE,
        ).withColumn("media_type", F.lit("video"))
    )
    frames = (
        video_frame_ids(encode_containers(corpus))
        .select("media_id", "frame_key")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return _video_jaccard_pairs(frames)


def _video_jaccard_pairs(frames: DataFrame) -> DataFrame:
    """Frame-key equi-join + exact set Jaccard over a DISTINCT
    (media_id, frame_key) frame — the caller owns the fence. Shared by
    the video near-dup query and the multimodal curation flagship."""
    sizes = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    a = frames.alias("a")
    b = frames.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.frame_key") == F.col("b.frame_key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"), F.col("b.media_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("media_id").alias("id_a"), F.col("n_frames").alias("n_a"))
    sb = sizes.select(F.col("media_id").alias("id_b"), F.col("n_frames").alias("n_b"))
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", "n_shared", "n_a", "n_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _VFRAME_JACCARD)
    )


multimodal_video_frame_neardup.__doc__ = multimodal_video_frame_neardup.__doc__.format(
    thr=_VFRAME_JACCARD, pb=_VFRAME_PERT_BYTE, d=_VFRAME_PERT_DELTA
)


def _video_frame_oracle_sql() -> str:
    byte_cols = ", ".join(f"{b} AS b{i}" for i, b in enumerate(_B))
    key = [
        f"(b{4*f}::BIGINT << 24) + (b{4*f+1} << 16) + (b{4*f+2} << 8) + b{4*f+3}"
        for f in range(4)
    ]
    frame_selects = "\n  UNION ALL\n".join(
        f"  SELECT media_id, {key[f]} AS frame_key FROM clips WHERE nf >= {f + 1}"
        for f in range(4)
    )
    return f"""
WITH base AS (
  SELECT doc_id, {byte_cols} FROM documents WHERE doc_id % 3 = 2
),
clips AS (
  SELECT doc_id AS media_id, * EXCLUDE (doc_id, b{_VFRAME_PERT_BYTE}),
         b{_VFRAME_PERT_BYTE}, 1 + b0 % 4 AS nf
  FROM base
  UNION ALL
  SELECT doc_id + {PHASH_CLONE_OFFSET} AS media_id,
         * EXCLUDE (doc_id, b{_VFRAME_PERT_BYTE}),
         LEAST(255, b{_VFRAME_PERT_BYTE} + {_VFRAME_PERT_DELTA})
           AS b{_VFRAME_PERT_BYTE},
         1 + b0 % 4 AS nf
  FROM base WHERE doc_id < {PHASH_CLONE_MAX_ID}
),
frames AS (
  SELECT DISTINCT media_id, frame_key FROM (
{frame_selects}
  )
),
sizes AS (SELECT media_id, COUNT(*) AS n_frames FROM frames GROUP BY media_id),
shared AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b, COUNT(*) AS n_shared
  FROM frames a JOIN frames b
    ON a.frame_key = b.frame_key AND a.media_id < b.media_id
  GROUP BY a.media_id, b.media_id
)
SELECT id_a, id_b,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST(sa.n_frames AS BIGINT) AS n_a,
       CAST(sb.n_frames AS BIGINT) AS n_b,
       n_shared / CAST(sa.n_frames + sb.n_frames - n_shared AS DOUBLE) AS jaccard
FROM shared
JOIN sizes sa ON id_a = sa.media_id
JOIN sizes sb ON id_b = sb.media_id
WHERE n_shared / CAST(sa.n_frames + sb.n_frames - n_shared AS DOUBLE)
      >= CAST({_VFRAME_JACCARD} AS DOUBLE)
"""


MULTIMODAL_VIDEO_FRAME_NEARDUP_SQL = _video_frame_oracle_sql()


# -- multimodal curation flagship (VERDICT r8 item 6) -------------------------

MMCUR_SEED = "mmcur"
MMCUR_RATES = {"image": 800, "audio": 900, "video": 850}  # per-mille keeps
MMCUR_RANGE_MIN = 64  # image/audio quality gate: min decoded dynamic range
MMCUR_MIN_FRAMES = 2  # video quality gate: single-frame clips don't train


def curate_corpus_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MULTIMODAL curation — the media twin of the
    ``curate_corpus`` flagship (VERDICT r8 item 6): one disposition row
    per asset across all three modalities, folding the media near-dup
    operators into the same keep/drop precedence a text curator runs:

    1. quality gate   (decoded facts: single-frame videos; image/audio
                       dynamic range < {rng} — blank/near-silent media)
    2. near-dup dedup (phash band join for images, Haitsma-Kalker band
                       join for audio, frame-key Jaccard for video ->
                       union of pair sets -> connected components ->
                       keep cluster minimum)
    3. stratified sample (deterministic md5-uniform per media_type:
                       image {ri}‰ / audio {ra}‰ / video {rv}‰)

    Output: (media_id, media_type, disposition) with ``disposition`` ∈
    {{quality, duplicate, sampled_out, kept}} decided with exactly that
    precedence.

    Scale shape — the blobs move ONCE: the clone-augmented corpus is
    wrapped in real containers and ``media_signals`` extracts every
    curation signal (decoded facts, both 60-bit fingerprints, frame
    keys) in a single Arrow pass; the fenced signal rows are a few
    dozen bytes per asset, and every downstream stage (band joins,
    frame-key join, components, sampling) shuffles only those. The
    DuckDB oracle replays the whole composition — all three pair
    algebras, the recursive-CTE transitive closure, the decoded-fact
    gates — from the md5 hex chain, so the composition is
    value-checked, not just its pieces."""
    from ..operators.clusters import connected_components
    from ..operators.multimodal import media_signals
    from ..operators.textops import hex_hash
    from .dedup import _simhash60_pairs_from_sig, _spread

    corpus = (
        _media_corpus_augmented(
            spark, sf_dir, residue=0, delta=_PHASH_PERT_DELTA, n_bytes=64
        )
        .withColumn("media_type", F.lit("image"))
        .unionByName(
            _media_corpus_augmented(
                spark, sf_dir, residue=1, delta=_AFP_PERT_DELTA, n_bytes=64
            ).withColumn("media_type", F.lit("audio"))
        )
        .unionByName(
            _media_corpus_augmented(
                spark, sf_dir, residue=2, delta=_VFRAME_PERT_DELTA,
                byte_idx=_VFRAME_PERT_BYTE,
            ).withColumn("media_type", F.lit("video"))
        )
    )
    sig = media_signals(encode_containers(_spread(corpus))).localCheckpoint(
        eager=True
    )
    _check_fixture_envelope(sig.count(), PHASH_MAX_ASSETS, "assets", "phash")
    imgp = _simhash60_pairs_from_sig(
        sig.filter(F.col("media_type") == "image").select(
            F.col("media_id").alias("doc_id"),
            F.col("fingerprint").alias("simhash60"),
        )
    )
    audp = _simhash60_pairs_from_sig(
        sig.filter(F.col("media_type") == "audio").select(
            F.col("media_id").alias("doc_id"),
            F.col("fingerprint").alias("simhash60"),
        )
    )
    frames = (
        sig.filter(F.col("media_type") == "video")
        .select("media_id", F.explode("frame_keys").alias("frame_key"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    vidp = _video_jaccard_pairs(frames)
    pairs = (
        imgp.select("id_a", "id_b")
        .unionByName(audp.select("id_a", "id_b"))
        .unionByName(vidp.select("id_a", "id_b"))
    )
    dups = (
        connected_components(pairs, "id_a", "id_b")
        .filter(F.col("node") != F.col("label"))
        .select(F.col("node").alias("media_id"), F.lit(True).alias("is_dup"))
    )
    bad_quality = F.when(
        F.col("media_type") == "video", F.col("n_frames") < MMCUR_MIN_FRAMES
    ).otherwise(F.col("value_range") < MMCUR_RANGE_MIN)
    u = hex_hash(F.col("media_id").cast("string"), seed=MMCUR_SEED) % 1000
    rate = F.lit(0)
    for mt, r in MMCUR_RATES.items():
        rate = F.when(F.col("media_type") == mt, F.lit(r)).otherwise(rate)
    disposition = (
        F.when(bad_quality, "quality")
        .when(F.coalesce(F.col("is_dup"), F.lit(False)), "duplicate")
        .when(u >= rate, "sampled_out")
        .otherwise("kept")
    )
    return sig.join(dups, "media_id", "left").select(
        "media_id", "media_type", disposition.alias("disposition")
    )


curate_corpus_multimodal.__doc__ = curate_corpus_multimodal.__doc__.format(
    rng=MMCUR_RANGE_MIN,
    ri=MMCUR_RATES["image"],
    ra=MMCUR_RATES["audio"],
    rv=MMCUR_RATES["video"],
)


def _mmcur_oracle_sql() -> str:
    from ..operators.multimodal import AFP_N_SAMPLES, PHASH_N_PIXELS

    def facts(residue, mtype, n_bytes, delta, byte_idx):
        bs = _oracle_bytes(n_bytes)
        byte_cols = ", ".join(f"{b} AS b{i}" for i, b in enumerate(bs))
        names = [f"b{i}" for i in range(n_bytes)]
        rng = f"GREATEST({', '.join(names)}) - LEAST({', '.join(names)})"
        nf = "NULL"
        if mtype == "video":
            # media_signals decodes the Y4M container and ranges over
            # the DECODED frames' luma bytes — the first 4*n_frames of
            # the 16 payload bytes — so the oracle must CASE on
            # n_frames like the decode oracle does, not range over all
            # 16 (byte 0 picks n_frames; the clone perturbation is on
            # byte 15, so nf is identical for original and clone).
            nf = f"1 + b0 % {Y4M_MAX_FRAMES}"
            arms = " ".join(
                f"WHEN {k} THEN GREATEST({', '.join(names[: 4 * k])})"
                f" - LEAST({', '.join(names[: 4 * k])})"
                for k in range(1, Y4M_MAX_FRAMES + 1)
            )
            rng = f"CASE {nf} {arms} END"
        return f"""
  SELECT media_id, '{mtype}' AS media_type,
         CAST({nf} AS INTEGER) AS n_frames,
         CAST({rng} AS INTEGER) AS value_range
  FROM (
    SELECT doc_id AS media_id, * EXCLUDE (doc_id, b{byte_idx}), b{byte_idx}
    FROM (SELECT doc_id, {byte_cols} FROM documents WHERE doc_id % 3 = {residue})
    UNION ALL
    SELECT doc_id + {PHASH_CLONE_OFFSET}, * EXCLUDE (doc_id, b{byte_idx}),
           LEAST(255, b{byte_idx} + {delta})
    FROM (SELECT doc_id, {byte_cols} FROM documents WHERE doc_id % 3 = {residue})
    WHERE doc_id < {PHASH_CLONE_MAX_ID}
  )"""

    rate = (
        f"CASE media_type WHEN 'image' THEN {MMCUR_RATES['image']} "
        f"WHEN 'audio' THEN {MMCUR_RATES['audio']} "
        f"ELSE {MMCUR_RATES['video']} END"
    )
    u = (
        f"CAST(concat('0x', substr(md5(concat('{MMCUR_SEED}', "
        "CAST(media_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000"
    )
    return f"""
WITH RECURSIVE
imgp AS ({MULTIMODAL_PHASH_NEARDUP_SQL}),
audp AS ({MULTIMODAL_AUDIO_FP_NEARDUP_SQL}),
vidp AS ({MULTIMODAL_VIDEO_FRAME_NEARDUP_SQL}),
pairs AS (
  SELECT id_a, id_b FROM imgp
  UNION ALL SELECT id_a, id_b FROM audp
  UNION ALL SELECT id_a, id_b FROM vidp
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, label) AS (
  SELECT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, r.label FROM reach r JOIN edges e ON e.src = r.node
),
dups AS (
  SELECT node AS media_id FROM reach GROUP BY node HAVING node != MIN(label)
),
facts AS (
{facts(0, "image", PHASH_N_PIXELS, _PHASH_PERT_DELTA, 0)}
  UNION ALL
{facts(1, "audio", AFP_N_SAMPLES, _AFP_PERT_DELTA, 0)}
  UNION ALL
{facts(2, "video", 16, _VFRAME_PERT_DELTA, _VFRAME_PERT_BYTE)}
)
SELECT media_id, media_type,
       CASE WHEN (media_type = 'video' AND n_frames < {MMCUR_MIN_FRAMES})
              OR (media_type != 'video' AND value_range < {MMCUR_RANGE_MIN})
            THEN 'quality'
            WHEN media_id IN (SELECT media_id FROM dups) THEN 'duplicate'
            WHEN {u} >= {rate} THEN 'sampled_out'
            ELSE 'kept' END AS disposition
FROM facts
"""


CURATE_CORPUS_MULTIMODAL_SQL = _mmcur_oracle_sql()


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_decode": multimodal_decode,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_audio_energy": multimodal_audio_energy,
    "multimodal_phash_neardup": multimodal_phash_neardup,
    "multimodal_audio_fp_neardup": multimodal_audio_fp_neardup,
    "multimodal_video_frame_neardup": multimodal_video_frame_neardup,
    "curate_corpus_multimodal": curate_corpus_multimodal,
}

ORACLES = {
    "multimodal_phash_neardup": MULTIMODAL_PHASH_NEARDUP_SQL,
    "multimodal_audio_fp_neardup": MULTIMODAL_AUDIO_FP_NEARDUP_SQL,
    "multimodal_video_frame_neardup": MULTIMODAL_VIDEO_FRAME_NEARDUP_SQL,
    "multimodal_metadata": MULTIMODAL_METADATA_SQL,
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_SQL,
    "multimodal_audio_energy": MULTIMODAL_AUDIO_ENERGY_SQL,
    "curate_corpus_multimodal": CURATE_CORPUS_MULTIMODAL_SQL,
}
