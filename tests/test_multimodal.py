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


def test_resize_media(ray_session):
    import ray.data

    from import_ray.stages.multimodal import resize_media, synthesize_media

    ds = ray.data.from_arrow(synthesize_media(n=24))
    out = resize_media(ds, target_w=32, target_h=16).take_all()
    assert len(out) == 24
    for r in out:
        assert r["width"] == 32 and r["height"] == 16
        assert len(r["payload"]) == 32 * 16
    # deterministic
    out2 = resize_media(ray.data.from_arrow(synthesize_media(n=24)), 32, 16).take_all()
    assert [r["payload"] for r in sorted(out, key=lambda x: x["media_id"])] == [
        r["payload"] for r in sorted(out2, key=lambda x: x["media_id"])
    ]


def test_sample_frames(ray_session):
    import ray.data

    from import_ray.stages.multimodal import sample_frames, synthesize_media

    tbl = synthesize_media(n=24)
    ds = ray.data.from_arrow(tbl)
    rows = sample_frames(ds, every_ms=5000, max_frames=8).take_all()
    assert rows and all(r["media_type"] == "video" for r in rows)
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    durations = dict(zip(tbl["media_id"].to_pylist(), tbl["duration_ms"].to_pylist()))
    for mid, frames in by_id.items():
        expect = min(8, max(1, durations[mid] // 5000))
        assert len(frames) == expect
        assert sorted(f["frame_idx"] for f in frames) == list(range(expect))
        assert all(f["ts_ms"] == f["frame_idx"] * 5000 for f in frames)


def test_phash_neardup_pairs_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from import_ray.stages.multimodal import (
        media_phash,
        phash_neardup_pairs,
        synthesize_media,
    )
    from import_ray.stages.neardup import _POP8

    base = synthesize_media(n=40, seed=11)
    # plant near-duplicates: copies of rows 0..4 with 3 bytes flipped
    payloads = base["payload"].to_pylist()
    ids = list(range(40))
    for i in range(5):
        p = bytearray(payloads[i])
        p[0] = p[len(p) // 2] = p[-1] = 255
        payloads.append(bytes(p))
        ids.append(100 + i)
    media = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array([8] * len(ids), pa.int32()),
            "height": pa.array([8] * len(ids), pa.int32()),
            "duration_ms": pa.array([0] * len(ids), pa.int32()),
        }
    )
    ds = ray.data.from_arrow(media)

    got = (
        phash_neardup_pairs(ds, max_hamming=7, bands=8)
        .to_pandas()
        .sort_values(["lo", "hi"])
        .reset_index(drop=True)
    )

    hdf = media_phash(ds).to_pandas()
    h = hdf["phash"].to_numpy(np.int64).view(np.uint64)
    mids = hdf["media_id"].to_numpy(np.int64)
    rows = []
    for a in range(len(h)):
        for b in range(a + 1, len(h)):
            x = np.uint64(h[a] ^ h[b])
            d = int(_POP8[np.array([x]).view(np.uint8)].sum())
            if d <= 7:
                lo, hi = sorted((int(mids[a]), int(mids[b])))
                rows.append((lo, hi, d))
    want = (
        pd.DataFrame(rows, columns=["lo", "hi", "hamming"])
        .sort_values(["lo", "hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # the planted copies must be found
    found = set(zip(want["lo"], want["hi"]))
    assert all((i, 100 + i) in found for i in range(5))


def test_phash_neardup_guard(ray_session):
    import pytest
    import ray.data

    from import_ray.stages.multimodal import phash_neardup_pairs, synthesize_media

    ds = ray.data.from_arrow(synthesize_media(n=4))
    with pytest.raises(ValueError):
        phash_neardup_pairs(ds, max_hamming=16, bands=8)


def test_fake_decode_batch_parity():
    """Vectorized whole-batch fake decode == scalar reference decode."""
    import numpy as np
    import pyarrow as pa

    from import_ray.stages.multimodal import MediaFeatureExtractor, synthesize_media

    tbl = synthesize_media(n=40, seed=11)
    ex = MediaFeatureExtractor(feature_dim=16)
    batch_feats = ex._decode_all(tbl["payload"])
    for i, p in enumerate(tbl["payload"].to_pylist()):
        np.testing.assert_allclose(batch_feats[i], ex._decode(p), rtol=1e-12)
    # sliced column (non-zero array offset) must decode identically
    sl = tbl.slice(7, 20)["payload"]
    np.testing.assert_allclose(
        ex._decode_all(sl), batch_feats[7:27], rtol=1e-12
    )
