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


def test_worker_facing_modules_ship_by_value():
    """Worker-context independence (round 5): the two leaf modules whose
    code executes inside Python workers must be registered for by-VALUE
    cloudpickle serialization, so a driver launched outside the repo
    (or a cluster without --py-files) can still unpickle the DataSource
    class and the decode helpers. A refactor that drops the
    registration reintroduces a cwd-dependent ModuleNotFoundError that
    no in-repo pytest run can see (pytest always runs with the repo on
    sys.path)."""
    import wikistream_event_data_pipeline_aws_spark.operators.multimodal  # noqa: F401
    import wikistream_event_data_pipeline_aws_spark.sources.sse  # noqa: F401
    from pyspark.cloudpickle.cloudpickle import list_registry_pickle_by_value

    registered = list_registry_pickle_by_value()
    names = {getattr(m, "__name__", str(m)) for m in registered}
    assert "wikistream_event_data_pipeline_aws_spark.sources.sse" in names
    assert "wikistream_event_data_pipeline_aws_spark.operators.multimodal" in names
