"""Pure-numpy BMP/WAV codecs + real-pixel media pipelines."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_bmp_roundtrip_rgb():
    from import_ray.stages.codecs import bmp_decode, bmp_encode

    rng = np.random.default_rng(3)
    for w, h in [(5, 7), (8, 8), (33, 17), (1, 1)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = bmp_decode(bmp_encode(img))
        np.testing.assert_array_equal(out, img)


def test_bmp_decode_8bit_palette():
    """Hand-built 8-bit palettized BMP (grayscale palette) decodes to
    replicated-channel RGB."""
    import struct

    w, h = 6, 3
    row = w + ((-w) % 4)
    pix = np.arange(w * h, dtype=np.uint8).reshape(h, w) * 10
    rows = np.zeros((h, row), np.uint8)
    rows[:, :w] = pix[::-1]  # bottom-up
    pal = bytes(b for i in range(256) for b in (i, i, i, 0))  # BGRA gray
    data_offset = 14 + 40 + len(pal)
    body = rows.tobytes()
    fh = struct.pack("<2sIHHI", b"BM", data_offset + len(body), 0, 0, data_offset)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 256, 0)
    from import_ray.stages.codecs import bmp_decode

    out = bmp_decode(fh + ih + pal + body)
    np.testing.assert_array_equal(out[:, :, 0], pix)
    np.testing.assert_array_equal(out[:, :, 1], pix)


def test_bmp_rejects_garbage():
    import pytest

    from import_ray.stages.codecs import bmp_decode

    with pytest.raises(ValueError):
        bmp_decode(b"not a bmp at all, definitely not 54 bytes of header")


def test_wav_roundtrip():
    from import_ray.stages.codecs import wav_decode, wav_encode

    rng = np.random.default_rng(4)
    mono = rng.integers(-30000, 30000, 500, dtype=np.int16)
    x, rate = wav_decode(wav_encode(mono, sample_rate=8000))
    assert rate == 8000 and x.shape == (500, 1)
    np.testing.assert_allclose(x[:, 0], mono / 32768.0)
    stereo = rng.integers(-30000, 30000, (300, 2), dtype=np.int16)
    x2, _ = wav_decode(wav_encode(stereo))
    np.testing.assert_allclose(x2, stereo / 32768.0)


def test_block_mean_grid_exact():
    from import_ray.stages.codecs import block_mean_grid

    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    g = block_mean_grid(img, 2, 2)
    np.testing.assert_allclose(
        g, [[np.mean([0, 1, 4, 5]), np.mean([2, 3, 6, 7])],
            [np.mean([8, 9, 12, 13]), np.mean([10, 11, 14, 15])]]
    )


def test_real_bmp_features_and_phash(ray_session):
    """decoder='bmp' end-to-end: real pixels → features; planted
    near-dup images land at small Hamming, unrelated images don't."""
    import ray.data

    from import_ray.stages.multimodal import (
        extract_media_features,
        phash_neardup_pairs,
        synthesize_real_media,
    )

    tbl = synthesize_real_media(n=48, seed=9)
    images = tbl.filter(
        pa.compute.equal(tbl["media_type"], pa.scalar("image"))
    )
    ds = ray.data.from_arrow(images)
    feats = extract_media_features(ds, decoder="bmp").take_all()
    assert len(feats) == images.num_rows
    assert all(len(r["features"]) == 16 for r in feats)
    assert any(any(v > 0 for v in r["features"]) for r in feats)

    pairs = phash_neardup_pairs(ds, max_hamming=7, bands=8, decoder="bmp").take_all()
    # replicate the generator's planting schedule: every dup_every-th
    # non-audio row perturbs the previous image by a few pixels
    planted = set()
    prev = None
    for i in range(48):
        if i % 3 == 2:
            continue
        if prev is not None and i % 4 == 0:
            planted.add((prev, i))
        prev = i
    found = {(r["lo"], r["hi"]) for r in pairs}
    assert planted, "generator planted nothing?"
    # full recall of the planted perturbation pairs (aHash may also
    # legitimately match other visually-similar random images)
    missing = planted - found
    assert not missing, f"planted near-dup pairs not found: {missing}"


def test_real_wav_features(ray_session):
    import ray.data

    from import_ray.stages.multimodal import (
        extract_media_features,
        synthesize_real_media,
    )

    tbl = synthesize_real_media(n=24, seed=5)
    audio = tbl.filter(pa.compute.equal(tbl["media_type"], pa.scalar("audio")))
    out = extract_media_features(
        ray.data.from_arrow(audio), decoder="wav"
    ).take_all()
    assert len(out) == audio.num_rows
    assert all(len(r["features"]) == 16 for r in out)
    assert all(max(r["features"]) > 0 for r in out)


def test_resize_real_bmp(ray_session):
    import ray.data

    from import_ray.stages.codecs import bmp_decode
    from import_ray.stages.multimodal import resize_media, synthesize_real_media

    tbl = synthesize_real_media(n=12, seed=2)
    images = tbl.filter(pa.compute.equal(tbl["media_type"], pa.scalar("image")))
    out = resize_media(
        ray.data.from_arrow(images), target_w=16, target_h=12, decoder="bmp"
    ).take_all()
    assert len(out) == images.num_rows
    for r in out:
        img = bmp_decode(r["payload"])
        assert img.shape == (12, 16, 3)
