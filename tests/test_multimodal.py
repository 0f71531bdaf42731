"""Multimodal plumbing: binary payloads through an actor-pool stage."""

from __future__ import annotations


def test_media_feature_extraction(ray_session):
    import ray.data

    from import_ray.stages.multimodal import extract_media_features, synthesize_media

    ds = ray.data.from_arrow(synthesize_media(n=32))
    out = extract_media_features(ds, concurrency=2, batch_size=8).take_all()
    assert len(out) == 32
    assert all(len(r["features"]) == 16 for r in out)
    # deterministic across runs
    out2 = extract_media_features(
        ray.data.from_arrow(synthesize_media(n=32)), concurrency=2, batch_size=8
    ).take_all()
    f1 = {r["media_id"]: list(r["features"]) for r in out}
    f2 = {r["media_id"]: list(r["features"]) for r in out2}
    assert f1 == f2


def test_unavailable_decoder_raises():
    import pytest

    from import_ray.stages.multimodal import MediaFeatureExtractor

    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decoder="pil")
