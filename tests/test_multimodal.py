"""Multimodal codec + plumbing tests: real PNG/WAV/Y4M round-trips,
defilter generality, corruption detection, Arrow batch shape, frame
sampling arithmetic (reference has no media path — north-star scope)."""

from __future__ import annotations

import struct
import zlib

import pytest

from wikistream_event_data_pipeline_aws_spark.catalog import load_table
from wikistream_event_data_pipeline_aws_spark.operators.multimodal import (
    _PNG_SIG,
    _png_chunk,
    decode_media,
    decode_png_gray8,
    decode_wav_u8,
    decode_y4m_mono,
    encode_containers,
    encode_png_gray8,
    encode_wav_u8,
    encode_y4m_mono,
    sample_frames,
    synthetic_media,
)

PAYLOAD = bytes(range(16))


def test_png_roundtrip_and_crc():
    png = encode_png_gray8(PAYLOAD, 4, 4)
    assert png.startswith(_PNG_SIG)
    assert decode_png_gray8(png) == (4, 4, PAYLOAD)
    corrupt = bytearray(png)
    corrupt[41] ^= 0xFF  # inside IDAT data -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray8(bytes(corrupt))
    # a chunk length overrunning the buffer must surface the documented
    # 'truncated' diagnostic, not an opaque struct.error from a short
    # CRC slice (worker-side debuggability)
    overrun = bytearray(png)
    overrun[8:12] = struct.pack(">I", 0xFFFF)  # IHDR declares 64k bytes
    with pytest.raises(ValueError, match="truncated"):
        decode_png_gray8(bytes(overrun))
    with pytest.raises(ValueError, match="truncated"):
        decode_png_gray8(png[: len(png) - 6])  # IEND sliced mid-chunk


def test_png_defilter_all_filter_types():
    """The decoder must reverse every standard scanline filter, not just
    the type-0 rows our encoder emits: hand-filter four rows with
    Sub/Up/Average/Paeth and check the inflate+defilter recovers them."""
    import random

    random.seed(7)
    w, h = 5, 4
    pixels = bytes(random.randrange(256) for _ in range(w * h))
    rows = [pixels[y * w : (y + 1) * w] for y in range(h)]
    raw = bytearray()
    prev = bytes(w)
    for y, row in enumerate(rows):
        ft = y + 1  # 1=Sub 2=Up 3=Average 4=Paeth
        line = bytearray(row)
        if ft == 1:
            for x in range(w - 1, 0, -1):
                line[x] = (line[x] - row[x - 1]) & 0xFF
        elif ft == 2:
            for x in range(w):
                line[x] = (line[x] - prev[x]) & 0xFF
        elif ft == 3:
            for x in range(w):
                left = row[x - 1] if x else 0
                line[x] = (line[x] - (left + prev[x]) // 2) & 0xFF
        else:
            for x in range(w):
                a = row[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] - pred) & 0xFF
        raw += bytes([ft]) + bytes(line)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_gray8(png) == (w, h, pixels)


def test_wav_roundtrip_skips_unknown_chunks():
    wav = encode_wav_u8(PAYLOAD)
    assert decode_wav_u8(wav) == (8000, PAYLOAD)
    # splice a LIST chunk (odd size + pad byte) between fmt and data:
    # the walker must skip it, word-aligned
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        + b"data" + struct.pack("<I", 16) + PAYLOAD
    )
    wav2 = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert decode_wav_u8(wav2) == (8000, PAYLOAD)
    # a 16-bit stereo fmt chunk must be rejected, not misread as u8
    fmt16 = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body16 = (
        b"fmt " + struct.pack("<I", len(fmt16)) + fmt16
        + b"data" + struct.pack("<I", 16) + PAYLOAD
    )
    wav16 = b"RIFF" + struct.pack("<I", 4 + len(body16)) + b"WAVE" + body16
    with pytest.raises(ValueError, match="PCM u8 mono"):
        decode_wav_u8(wav16)
    # declared chunk sizes overrunning the buffer -> 'truncated', not
    # struct.error (data chunk sliced short / fmt body under 16 bytes)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav_u8(wav[: len(wav) - 4])
    short_fmt = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 8) + struct.pack("<HHI", 1, 1, 8000)
    )
    with pytest.raises(ValueError, match="truncated"):
        decode_wav_u8(short_fmt)


def test_y4m_roundtrip_and_colorspace_gate():
    frames = [PAYLOAD[i * 4 : (i + 1) * 4] for i in range(4)]
    y4m = encode_y4m_mono(frames, 2, 2)
    assert decode_y4m_mono(y4m) == (2, 2, frames)
    with pytest.raises(ValueError, match="Cmono"):
        decode_y4m_mono(y4m.replace(b"Cmono", b"C420j"))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m_mono(y4m[:-2])


def test_decode_media_dispatches_on_magic_and_matches_payload(spark, sf_dir):
    media = encode_containers(
        synthetic_media(load_table(spark, sf_dir, "documents").limit(30))
    )
    decoded = decode_media(media)
    assert decoded.columns == [
        "media_id", "media_type", "container", "width", "height",
        "n_frames", "n_samples", "sample_rate", "val_min", "val_max", "val_sum",
    ]
    rows = {r["media_id"]: r for r in decoded.collect()}
    again = {r["media_id"]: r for r in decode_media(media).collect()}
    assert rows == again  # deterministic
    for r in rows.values():
        expected = {"image": "png", "audio": "wav", "video": "y4m"}[r["media_type"]]
        assert r["container"] == expected  # magic agrees with metadata
        if r["container"] == "png":
            assert (r["width"], r["height"], r["n_frames"]) == (4, 4, 1)
            assert r["n_samples"] is None
        elif r["container"] == "wav":
            assert (r["n_samples"], r["sample_rate"]) == (16, 8000)
            assert r["width"] is None and r["n_frames"] is None
        else:
            assert (r["width"], r["height"]) == (2, 2)
            assert 1 <= r["n_frames"] <= 4
        assert 0 <= r["val_min"] <= r["val_max"] <= 255
        n_vals = {
            "png": r["width"] * r["height"] if r["width"] else 0,
            "wav": r["n_samples"] or 0,
            "y4m": (r["width"] or 0) * (r["height"] or 0) * (r["n_frames"] or 0),
        }[r["container"]]
        assert n_vals > 0
        assert r["val_min"] <= r["val_sum"] / n_vals <= r["val_max"]


def test_encode_containers_explicit_image_dims(spark, sf_dir):
    """Payload lengths outside the two internal corpora (16/64 bytes)
    encode via an explicit image_dims=(w, h) instead of raising."""
    from pyspark.sql import functions as F

    media = synthetic_media(
        load_table(spark, sf_dir, "documents").limit(9)
    ).filter("media_type = 'image'").withColumn(
        # 32-byte payload: not in _PNG_DIMS_BY_LEN
        "payload", F.expr("substring(concat(payload, payload), 1, 32)")
    )
    with pytest.raises(Exception, match="no PNG grid"):
        encode_containers(media).collect()
    decoded = decode_media(encode_containers(media, image_dims=(8, 4)))
    for r in decoded.collect():
        assert (r["width"], r["height"], r["container"]) == (8, 4, "png")


def test_decode_media_rejects_unknown_magic(spark, sf_dir):
    raw = synthetic_media(load_table(spark, sf_dir, "documents").limit(2))
    with pytest.raises(Exception, match="unknown container magic"):
        decode_media(raw).collect()  # raw md5 bytes are not a container


def test_frame_sample_keeps_even_frames(spark, sf_dir):
    media = encode_containers(
        synthetic_media(load_table(spark, sf_dir, "documents").limit(30))
    )
    decoded = decode_media(media)
    n_frames = {
        r["media_id"]: r["n_frames"]
        for r in decoded.collect()
        if r["n_frames"] is not None
    }
    sampled = sample_frames(decoded, every_nth=2).collect()
    by_media: dict[int, list[int]] = {}
    for r in sampled:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(by_media) == {m for m, n in n_frames.items() if n > 0}
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(0, n_frames[mid], 2))


def test_worker_facing_modules_ship_by_value():
    """Worker-context independence (round 5): the two leaf modules whose
    code executes inside Python workers must be registered for by-VALUE
    cloudpickle serialization, so a driver launched outside the repo
    (or a cluster without --py-files) can still unpickle the DataSource
    class and the codec helpers. A refactor that drops the registration
    reintroduces a cwd-dependent ModuleNotFoundError that no in-repo
    pytest run can see (pytest always runs with the repo on sys.path)."""
    import wikistream_event_data_pipeline_aws_spark.operators.multimodal  # noqa: F401
    import wikistream_event_data_pipeline_aws_spark.sources.sse  # noqa: F401
    from pyspark.cloudpickle.cloudpickle import list_registry_pickle_by_value

    registered = list_registry_pickle_by_value()
    names = {getattr(m, "__name__", str(m)) for m in registered}
    assert "wikistream_event_data_pipeline_aws_spark.sources.sse" in names
    assert "wikistream_event_data_pipeline_aws_spark.operators.multimodal" in names


def test_phash_neardup_surfaces_planted_clones(spark, sf_dir):
    """The perceptual-hash pipeline (real PNG encode -> decode ->
    60-bit comparison fingerprint -> banded Hamming join) must surface
    every planted one-pixel-perturbed clone as an (original, clone)
    pair within the Hamming<=3 radius. Brightening pixel 0 by 64 flips
    only the handful of comparison bits whose pair touches pixel 0, so
    all 10 planted pairs stay inside the pigeonhole-complete radius on
    this fixture."""
    from wikistream_event_data_pipeline_aws_spark.plans.multimodal import (
        PHASH_CLONE_MAX_ID,
        PHASH_CLONE_OFFSET,
        multimodal_phash_neardup,
    )

    rows = multimodal_phash_neardup(spark, sf_dir).collect()
    planted = {
        (r.id_a, r.id_b) for r in rows if r.id_b == r.id_a + PHASH_CLONE_OFFSET
    }
    expected = {
        (i, i + PHASH_CLONE_OFFSET) for i in range(0, PHASH_CLONE_MAX_ID, 3)
    }
    assert planted == expected
    assert all(0 <= r.hamming <= 3 for r in rows)


def test_phash_pairs_structure():
    """The comparison-pair list is the fingerprint's definition:
    classic dHash over the 16x4 grid — 60 pairs, every one a
    horizontal neighbor gradient, 15 per pixel row, rows disjoint (so
    the 4 Hamming-join bands, one per row, are independent)."""
    from wikistream_event_data_pipeline_aws_spark.operators.multimodal import (
        DHASH_GRID_H,
        DHASH_GRID_W,
        PHASH_BITS,
        PHASH_N_PIXELS,
        PHASH_PAIRS,
    )

    assert len(PHASH_PAIRS) == PHASH_BITS == 60
    assert PHASH_N_PIXELS == DHASH_GRID_W * DHASH_GRID_H == 64
    for k, (i, j) in enumerate(PHASH_PAIRS):
        assert j == i + 1  # horizontal neighbor
        assert i // DHASH_GRID_W == j // DHASH_GRID_W  # same pixel row
        assert i // DHASH_GRID_W == k // 15  # band k//15 == row
    # bands touch disjoint pixel rows -> independent band values
    rows_per_band = [
        {i // DHASH_GRID_W for i, _ in PHASH_PAIRS[15 * b : 15 * (b + 1)]}
        for b in range(4)
    ]
    assert rows_per_band == [{0}, {1}, {2}, {3}]


def test_audio_fp_neardup_surfaces_planted_clones(spark, sf_dir):
    """The acoustic-fingerprint pipeline (real WAV encode -> RIFF parse
    -> 60-bit energy-comparison fingerprint -> banded Hamming join)
    must surface every planted one-sample-perturbed clone. Raising
    sample 0 by 8 moves only window 0's even sub-band energy, so all
    10 planted pairs stay inside the Hamming<=3 radius."""
    from wikistream_event_data_pipeline_aws_spark.plans.multimodal import (
        PHASH_CLONE_MAX_ID,
        PHASH_CLONE_OFFSET,
        multimodal_audio_fp_neardup,
    )

    rows = multimodal_audio_fp_neardup(spark, sf_dir).collect()
    planted = {
        (r.id_a, r.id_b) for r in rows if r.id_b == r.id_a + PHASH_CLONE_OFFSET
    }
    expected = {
        (i, i + PHASH_CLONE_OFFSET) for i in range(1, PHASH_CLONE_MAX_ID, 3)
    }
    assert planted == expected
    assert all(0 <= r.hamming <= 3 for r in rows)


def test_afp_pairs_structure():
    """60 comparison pairs over the 62 short-time sub-band energies of
    a 64-sample clip: every bit is a Haitsma-Kalker consecutive-window
    energy gradient — 30 per sub-band chain, no filler pairs."""
    from wikistream_event_data_pipeline_aws_spark.operators.multimodal import (
        AFP_BITS,
        AFP_N_ENERGY,
        AFP_N_SAMPLES,
        AFP_N_WIN,
        AFP_PAIRS,
    )

    assert len(AFP_PAIRS) == AFP_BITS == 60
    assert (AFP_N_SAMPLES, AFP_N_WIN, AFP_N_ENERGY) == (64, 31, 62)
    for k, (i, j) in enumerate(AFP_PAIRS):
        assert 0 <= i < AFP_N_ENERGY and 0 <= j < AFP_N_ENERGY
        assert j == i + 2  # consecutive window, same sub-band
        assert i % 2 == k // 30  # bits 0-29 even chain, 30-59 odd chain
    assert AFP_PAIRS[0] == (0, 2)  # first even-chain gradient
    assert AFP_PAIRS[30] == (1, 3)  # first odd-chain gradient


def test_video_frame_neardup_surfaces_planted_clones(spark, sf_dir):
    """The keyframe-overlap pipeline (real Y4M encode -> parse -> exact
    frame-key set Jaccard) must surface every planted clone: 4-frame
    clips' clones share 3 of 4 frames (Jaccard 0.6); shorter clips
    never touch the perturbed byte 15, so their clones are exact
    duplicates (Jaccard 1.0)."""
    from wikistream_event_data_pipeline_aws_spark.plans.multimodal import (
        PHASH_CLONE_MAX_ID,
        PHASH_CLONE_OFFSET,
        multimodal_video_frame_neardup,
    )

    rows = multimodal_video_frame_neardup(spark, sf_dir).collect()
    planted = {
        (r.id_a, r.id_b) for r in rows if r.id_b == r.id_a + PHASH_CLONE_OFFSET
    }
    expected = {
        (i, i + PHASH_CLONE_OFFSET) for i in range(2, PHASH_CLONE_MAX_ID, 3)
    }
    assert planted == expected
    for r in rows:
        assert r.jaccard >= 0.5
        if r.id_b == r.id_a + PHASH_CLONE_OFFSET and r.n_a == 4:
            assert (r.n_shared, r.jaccard) == (3, 0.6)


def test_fixture_envelope_guard_raises_past_bound():
    """The sparse-regime envelopes (raised 100x when the fingerprints
    graduated to production grain) must fail fast with a diagnostic
    naming the band-width knob, not silently run a saturated join."""
    import pytest as _pytest

    from wikistream_event_data_pipeline_aws_spark.plans.multimodal import (
        AFP_MAX_ASSETS,
        PHASH_MAX_ASSETS,
        _check_fixture_envelope,
    )

    assert PHASH_MAX_ASSETS >= 30_000_000 and AFP_MAX_ASSETS >= 20_000_000
    _check_fixture_envelope(PHASH_MAX_ASSETS, PHASH_MAX_ASSETS, "images", "phash")
    with _pytest.raises(ValueError, match="sparse-regime envelope"):
        _check_fixture_envelope(
            PHASH_MAX_ASSETS + 1, PHASH_MAX_ASSETS, "images", "phash"
        )
    with _pytest.raises(ValueError, match="band width ~ log2 N"):
        _check_fixture_envelope(AFP_MAX_ASSETS + 1, AFP_MAX_ASSETS, "clips", "afp")


def test_curate_corpus_multimodal_precedence_classes(spark, sf_dir):
    """The multimodal curation flagship: one row per asset, every
    precedence class exercised, and the planted clones disposed by the
    precedence — a clone whose original survives the quality gate is a
    'duplicate' (its original, the cluster minimum, is not); a
    single-frame video pair lands in 'quality' for BOTH members."""
    from wikistream_event_data_pipeline_aws_spark.plans.multimodal import (
        PHASH_CLONE_MAX_ID,
        PHASH_CLONE_OFFSET,
        curate_corpus_multimodal,
    )

    rows = curate_corpus_multimodal(spark, sf_dir).collect()
    by_id = {r.media_id: r for r in rows}
    assert len(by_id) == len(rows)  # exactly one row per asset
    classes = {r.disposition for r in rows}
    assert classes == {"quality", "duplicate", "sampled_out", "kept"}
    # planted clones: duplicates unless the quality gate fired first
    for i in range(PHASH_CLONE_MAX_ID):
        clone = by_id[i + PHASH_CLONE_OFFSET]
        orig = by_id[i]
        if clone.disposition == "quality":
            # only the single-frame video path gates clones on quality,
            # and then the original gates identically
            assert clone.media_type == "video"
            assert orig.disposition == "quality"
        else:
            assert clone.disposition == "duplicate", (i, clone)
            assert orig.disposition != "duplicate", (i, orig)
    # every media_type contributes duplicates (the planted evidence)
    dup_types = {r.media_type for r in rows if r.disposition == "duplicate"}
    assert dup_types == {"image", "audio", "video"}
