"""Multimodal plumbing tests: Arrow batch shape, stub gating, frame
sampling arithmetic (reference has no media path — north-star scope)."""

from __future__ import annotations

import pytest

from wikistream_event_data_pipeline_aws_spark.catalog import load_table
from wikistream_event_data_pipeline_aws_spark.operators.multimodal import (
    decode_media,
    sample_frames,
    synthetic_media,
)


def test_real_decode_is_gated(spark, sf_dir):
    media = synthetic_media(load_table(spark, sf_dir, "documents").limit(4))
    with pytest.raises(Exception) as exc:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_fake_decode_schema_and_determinism(spark, sf_dir):
    media = synthetic_media(load_table(spark, sf_dir, "documents").limit(16))
    decoded = decode_media(media, fake=True)
    assert decoded.columns == [
        "media_id",
        "media_type",
        "byte_len",
        "content_sha",
        "width",
        "height",
        "n_frames",
    ]
    rows = {r["media_id"]: r for r in decoded.collect()}
    again = {r["media_id"]: r for r in decode_media(media, fake=True).collect()}
    assert rows == again
    for r in rows.values():
        assert r["byte_len"] == 16  # md5 payload
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert 1 <= r["n_frames"] <= 8


def test_frame_sample_keeps_even_frames(spark, sf_dir):
    media = synthetic_media(load_table(spark, sf_dir, "documents").limit(16))
    decoded = decode_media(media, fake=True)
    n_frames = {r["media_id"]: r["n_frames"] for r in decoded.collect()}
    sampled = sample_frames(decoded, every_nth=2).collect()
    by_media: dict[int, list[int]] = {}
    for r in sampled:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(0, n_frames[mid], 2))
