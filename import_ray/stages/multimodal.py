"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with typed metadata;
decode / feature-extraction stages are actor-pool ``map_batches``
kernels. Decoder tiers:

- ``decoder="bmp"`` / ``"png"`` / ``"jpeg"`` / ``"image"`` (sniffing)
  / ``"wav"`` — REAL decode end-to-end via the pure-numpy codecs in
  ``stages/codecs.py`` + ``stages/jpeg.py`` (uncompressed BMP, PNG,
  baseline-DCT JPEG, PCM WAV): real pixels → luma-grid features /
  aHash / resize, real samples → band-energy features.
- ``decoder="fake"`` — deterministic pseudo-features from the payload
  bytes (vectorized whole-batch path) for plumbing tests and formats
  whose codecs (PIL/ffmpeg) aren't in this environment.
- ``decoder="pil"`` etc. raise NotImplementedError until the
  dependency exists; the Ray-side contract (schema, batch sizing,
  actor signature, output layout) is identical across tiers.

Scale notes: large payloads need small ``batch_size`` (payload bytes ×
batch_size × concurrency must fit the worker heap) and
``batch_format="pyarrow"`` end-to-end (binary columns don't round-trip
pandas cleanly).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# module-top import: kernel classes ship to workers pickled by value,
# and lazy in-method imports cannot resolve there (driver cwd != repo)
from import_ray.stages.codecs import (
    block_mean_grid,
    bmp_decode,
    bmp_encode,
    image_decode,
    jpeg_decode,
    jpeg_encode,
    luma,
    png_decode,
    png_encode,
    wav_band_energies,
    wav_decode,
    wav_encode,
)

logger = logging.getLogger(__name__)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, int(rng.integers(256, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array([types[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array([int(rng.integers(16, 512)) for _ in range(n)], pa.int32()),
            "height": pa.array([int(rng.integers(16, 512)) for _ in range(n)], pa.int32()),
            "duration_ms": pa.array(
                [int(rng.integers(0, 60000)) for _ in range(n)], pa.int32()
            ),
        }
    )


def synthesize_real_media(
    n: int = 48,
    seed: int = 9,
    dup_every: int = 4,
    flip_pixels: int = 3,
    image_format: str = "bmp",
) -> pa.Table:
    """Deterministic media table of REAL payloads: images (24-bit BMP
    or baseline JPEG per ``image_format``) and PCM WAVs, with planted
    near-duplicates — every ``dup_every``-th image is the previous
    image with ``flip_pixels`` pixels perturbed (small aHash Hamming
    distance even through JPEG loss: the perturbation moves block
    means, quantization doesn't), so banded Hamming search has ground
    truth to find."""
    img_enc = {
        "bmp": bmp_encode,
        "png": png_encode,
        "jpeg": lambda im: jpeg_encode(im, quality=90),
    }[image_format]
    rng = np.random.default_rng(seed)
    payloads, types = [], []
    prev_img = None
    for i in range(n):
        if i % 3 == 2:
            samples = (
                np.sin(np.arange(2048) * (0.02 + 0.01 * (i % 7))) * 12000
                + rng.normal(0, 300, 2048)
            ).astype(np.int16)
            payloads.append(wav_encode(samples))
            types.append("audio")
            continue
        if prev_img is not None and i % dup_every == 0:
            img = prev_img.copy()
            ys = rng.integers(0, img.shape[0], flip_pixels)
            xs = rng.integers(0, img.shape[1], flip_pixels)
            img[ys, xs] = 255 - img[ys, xs]
        else:
            w, h = int(rng.integers(24, 64)), int(rng.integers(24, 64))
            # per-image random coarse pattern upsampled to full size, so
            # block-mean grids differ strongly BETWEEN images while
            # staying stable under the few-pixel perturbation below
            coarse = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            ys = (np.arange(h) * 8 // h).astype(np.intp)
            xs = (np.arange(w) * 8 // w).astype(np.intp)
            img = coarse[np.ix_(ys, xs)].copy()
        prev_img = img
        payloads.append(img_enc(img))
        types.append("image")
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool kernel: decode payload → fixed-size feature vector.

    ``decoder="bmp"`` / ``"wav"`` decode REAL bytes (pure-numpy codecs,
    ``stages/codecs.py``): BMP → luma block-mean grid, WAV → log band
    energies. ``"fake"`` keeps the deterministic chunked-byte-mean
    pseudo-decode (vectorized whole-batch path) for plumbing tests.
    Real decoding is inherently per-payload; the loop is over payloads,
    with all pixel/sample math vectorized inside the codec.

    ``__init__`` runs once per actor — the place a real deployment
    loads its codec/model.
    """

    _DECODERS = ("fake", "bmp", "png", "jpeg", "image", "wav")

    def __init__(self, decoder: str = "fake", feature_dim: int = 16):
        if decoder not in self._DECODERS:
            raise NotImplementedError(
                f"decoder '{decoder}' requires image/audio libraries not "
                f"present in this environment; use one of {self._DECODERS}"
            )
        self.decoder = decoder
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes) -> np.ndarray:
        # scalar reference implementation (parity-tested against the
        # vectorized batch path): chunked byte means
        arr = np.frombuffer(payload, np.uint8)
        pad = (-len(arr)) % self.feature_dim
        if pad:
            arr = np.pad(arr, (0, pad))
        return arr.reshape(self.feature_dim, -1).mean(axis=1) / 255.0

    def _decode_all(self, payload_col) -> np.ndarray:
        """Whole-batch fake decode on the buffer-sliced binary column:
        one bincount over a per-byte segment id — no per-payload Python
        loop (a REAL codec is inherently per-payload; the fake path
        need not be)."""
        col = pc.cast(payload_col, pa.large_binary())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        fd = self.feature_dim
        if n == 0:
            return np.zeros((0, fd), np.float64)
        bufs = col.buffers()
        off = np.frombuffer(bufs[1], np.int64, n + 1, 8 * col.offset)
        flat = np.frombuffer(bufs[2], np.uint8)[off[0] : off[-1]].astype(np.float64)
        lens = off[1:] - off[:-1]
        chunk = np.maximum(1, -(-lens // fd))
        rel = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1] - off[0], lens)
        seg = np.repeat(np.arange(n, dtype=np.int64) * fd, lens) + rel // np.repeat(
            chunk, lens
        )
        sums = np.bincount(seg, weights=flat, minlength=n * fd)
        return sums.reshape(n, fd) / chunk[:, None] / 255.0

    def _decode_real(self, payload: bytes) -> np.ndarray:
        if self.decoder in ("bmp", "png", "jpeg", "image"):
            dec = {"bmp": bmp_decode, "png": png_decode, "jpeg": jpeg_decode}.get(
                self.decoder, image_decode
            )
            g = int(np.ceil(np.sqrt(self.feature_dim)))
            grid = block_mean_grid(luma(dec(payload)), g, g) / 255.0
            return grid.ravel()[: self.feature_dim]
        x, _rate = wav_decode(payload)
        e = wav_band_energies(x, self.feature_dim)
        m = e.max()
        return e / m if m > 0 else e

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "fake":
            feats = self._decode_all(batch["payload"]).astype(np.float32)
        else:
            feats = np.stack(
                [self._decode_real(p) for p in batch["payload"].to_pylist()]
            ).astype(np.float32) if batch.num_rows else np.zeros(
                (0, self.feature_dim), np.float32
            )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), self.feature_dim
                ).cast(pa.list_(pa.float32())),
                "payload_bytes": pc.cast(
                    pc.binary_length(batch["payload"]), pa.int64()
                ),
            }
        )


def extract_media_features(media_ds, concurrency: int = 2, batch_size: int = 16,
                           decoder: str = "fake"):
    """Actor-pool feature extraction over a media Dataset."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResizeKernel:
    """Actor-pool kernel: image resize plumbing. The stub decoder maps
    payload bytes + (width, height) metadata to a deterministic
    pseudo-pixel array and resizes by vectorized nearest-neighbor
    index sampling — the real version swaps `_decode_image` /
    `_encode_image` for PIL calls, the Ray-side contract (schema in/out,
    actor init, batch sizing) is identical."""

    def __init__(self, target_w: int = 64, target_h: int = 64, decoder: str = "fake"):
        if decoder not in ("fake", "bmp", "png", "jpeg", "image"):
            raise NotImplementedError(
                f"decoder '{decoder}' requires image libraries not present "
                f"in this environment; use 'fake', 'bmp', 'png' or 'image'"
            )
        self.decoder = decoder
        self.tw = int(target_w)
        self.th = int(target_h)

    def _decode_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        arr = np.frombuffer(payload, np.uint8)
        need = max(1, w) * max(1, h)
        reps = -(-need // max(1, len(arr)))
        return np.tile(arr, reps)[:need].reshape(max(1, h), max(1, w))

    def _encode_image(self, img: np.ndarray) -> bytes:
        return img.astype(np.uint8).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        out = []
        # vectorized nearest-neighbor index grids per image
        for p, w, h in zip(payloads, widths, heights):
            if self.decoder in ("bmp", "png", "image"):
                img = (
                    png_decode(p) if self.decoder == "png"
                    else bmp_decode(p) if self.decoder == "bmp"
                    else image_decode(p)
                )
                ys = (np.arange(self.th) * img.shape[0] // self.th).astype(np.intp)
                xs = (np.arange(self.tw) * img.shape[1] // self.tw).astype(np.intp)
                enc = png_encode if self.decoder == "png" else bmp_encode
                out.append(enc(img[np.ix_(ys, xs)]))
                continue
            img = self._decode_image(p, int(w), int(h))
            ys = (np.arange(self.th) * img.shape[0] // self.th).astype(np.intp)
            xs = (np.arange(self.tw) * img.shape[1] // self.tw).astype(np.intp)
            out.append(self._encode_image(img[np.ix_(ys, xs)]))
        n = len(out)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "payload": pa.array(out, pa.large_binary()),
                "width": pa.array([self.tw] * n, pa.int32()),
                "height": pa.array([self.th] * n, pa.int32()),
                "duration_ms": batch["duration_ms"],
            }
        )


def resize_media(media_ds, target_w: int = 64, target_h: int = 64,
                 concurrency: int = 2, batch_size: int = 16,
                 decoder: str = "fake"):
    """Actor-pool image resize over a media Dataset (images only pass
    through the kernel; callers filter by media_type upstream)."""
    return media_ds.map_batches(
        MediaResizeKernel,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h,
                               "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleKernel:
    """Actor-pool kernel: video frame sampling — one output row per
    sampled timestamp (row expansion inside map_batches). The stub
    'frame' is a deterministic payload slice; the real version would
    seek the container with ffmpeg, same contract."""

    def __init__(self, every_ms: int = 1000, max_frames: int = 32, decoder: str = "fake"):
        if decoder not in ("fake",):
            raise NotImplementedError(
                f"decoder '{decoder}' requires video libraries not present "
                f"in this environment; use decoder='fake'"
            )
        self.every_ms = int(every_ms)
        self.max_frames = int(max_frames)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, types_, ts_out, idx_out, frames = [], [], [], [], []
        for mid, mtype, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if mtype != "video" or not dur:
                continue
            n_frames = min(self.max_frames, max(1, int(dur) // self.every_ms))
            chunk = max(1, len(payload) // n_frames)
            for i in range(n_frames):
                ids.append(mid)
                types_.append(mtype)
                idx_out.append(i)
                ts_out.append(i * self.every_ms)
                frames.append(payload[i * chunk : (i + 1) * chunk])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types_, pa.string()),
                "frame_idx": pa.array(idx_out, pa.int32()),
                "ts_ms": pa.array(ts_out, pa.int32()),
                "frame_payload": pa.array(frames, pa.large_binary()),
            }
        )


def sample_frames(media_ds, every_ms: int = 1000, max_frames: int = 32,
                  concurrency: int = 2, batch_size: int = 8):
    """Actor-pool frame sampling over a media Dataset (videos only;
    other rows are dropped by the kernel)."""
    return media_ds.map_batches(
        FrameSampleKernel,
        fn_constructor_kwargs={"every_ms": every_ms, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaPHashKernel:
    """Actor-pool kernel: payload → 64-bit perceptual (average) hash.

    ``decoder="bmp"`` is the REAL aHash: decode the BMP (pure-numpy
    codec, ``stages/codecs.py``), downsample the luma plane to an 8×8
    block-mean grid and threshold at the median. ``decoder="fake"``
    derives the 64-cell grid deterministically from the payload bytes
    (same chunked-mean pseudo-decode as MediaFeatureExtractor), so a
    few flipped payload bytes perturb a few cells — small edits land
    at small Hamming distance exactly like real aHash, and the
    banding/verify plumbing downstream is exercised faithfully.
    """

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "bmp", "png", "jpeg", "image"):
            raise NotImplementedError(
                f"decoder '{decoder}' requires image libraries not present "
                f"in this environment; use 'fake', 'bmp', 'png', 'jpeg' or "
                f"'image'"
            )
        self.decoder = decoder

    def _grid(self, payload: bytes) -> np.ndarray:
        if self.decoder in ("bmp", "png", "jpeg", "image"):
            dec = {"bmp": bmp_decode, "png": png_decode, "jpeg": jpeg_decode}.get(
                self.decoder, image_decode
            )
            return block_mean_grid(luma(dec(payload)), 8, 8).ravel()
        arr = np.frombuffer(payload, np.uint8)
        pad = (-len(arr)) % 64
        if pad:
            arr = np.pad(arr, (0, pad))
        return arr.reshape(64, -1).mean(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        grids = np.stack(
            [self._grid(p) for p in batch["payload"].to_pylist()]
        ) if batch.num_rows else np.zeros((0, 64))
        if len(grids):
            med = np.median(grids, axis=1, keepdims=True)
            bits = (grids > med).astype(np.uint64)
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            phash = (bits * weights).sum(axis=1, dtype=np.uint64).view(np.int64)
        else:
            phash = np.zeros(0, np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "phash": pa.array(phash, pa.int64()),
            }
        )


def media_phash(media_ds, concurrency: int = 2, batch_size: int = 64,
                decoder: str = "fake"):
    """(media_id, phash int64) via the actor-pool aHash kernel."""
    return media_ds.map_batches(
        MediaPHashKernel,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=batch_size,
    )


def phash_neardup_pairs(media_ds, max_hamming: int = 7, bands: int = 8,
                        decoder: str = "fake"):
    """Near-duplicate media pairs by perceptual-hash Hamming distance —
    multi-index (banded) Hamming search: the 64-bit hash splits into
    ``bands`` equal slices; any pair within ``max_hamming ≤ bands-1``
    shares at least one identical band (pigeonhole — the same
    guarantee the MinHash/SimHash banding in stages/neardup.py relies
    on), so candidate generation is ONE keyed exchange on (band_idx,
    band_value) and the exact popcount verify runs within buckets.

    Output: (lo, hi, hamming) — media_id pairs, exact distance.
    """
    from import_ray.core.context import data_nparts, ensure_hash_shuffle
    from import_ray.stages.neardup import _POP8, _dedup_pair_arrays

    if max_hamming > bands - 1:
        raise ValueError(
            f"banded Hamming search guarantees recall only for "
            f"max_hamming <= bands-1 (got {max_hamming} > {bands - 1})"
        )
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    hashes = media_phash(media_ds, decoder=decoder)
    ensure_hash_shuffle(hashes)
    n = data_nparts(hashes)

    def emit_bands(b: pa.Table) -> pa.Table:
        h = b["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = b["media_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(h)
        band_idx = np.repeat(np.arange(bands, dtype=np.int64), m)
        hh = np.tile(h, bands)
        shifts = (band_idx.astype(np.uint64)) * np.uint64(width)
        band_val = ((hh >> shifts) & mask).view(np.int64)
        return pa.table(
            {
                "band_idx": pa.array(band_idx, pa.int64()),
                "band_val": pa.array(band_val, pa.int64()),
                "media_id": pa.array(np.tile(ids, bands), pa.int64()),
                "phash": pa.array(np.tile(h.view(np.int64), bands), pa.int64()),
            }
        )

    from import_ray.stages.neardup import MAX_PAIRS_PER_BUCKET

    def bucket_pairs(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        bi = df["band_idx"].to_numpy(np.int64)
        bv = df["band_val"].to_numpy(np.int64)
        ids = df["media_id"].to_numpy(np.int64)
        ph = df["phash"].to_numpy(np.int64)
        order = np.lexsort((ids, bv, bi))
        bi, bv, ids, ph = bi[order], bv[order], ids[order], ph[order]
        key_change = np.r_[True, (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])]
        starts = np.flatnonzero(key_change)
        ends = np.r_[starts[1:], len(bi)]
        lo_l, hi_l, hl_l, hh_l = [], [], [], []
        capped = 0
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            if g * (g - 1) // 2 > MAX_PAIRS_PER_BUCKET:
                # cap MEMBERS (not pairs) so the triu allocation stays
                # bounded on duplicate-heavy / constant-payload corpora
                # (same skew guard as neardup._bucket_pairs)
                capped += 1
                g = int((2 * MAX_PAIRS_PER_BUCKET) ** 0.5) + 1
            iu, ju = np.triu_indices(int(g), 1)
            lo_l.append(ids[s + iu]); hi_l.append(ids[s + ju])
            hl_l.append(ph[s + iu]); hh_l.append(ph[s + ju])
        if capped:
            logger.warning(
                "phash banding: %d bucket(s) exceeded MAX_PAIRS_PER_BUCKET=%d; "
                "members sampled",
                capped,
                MAX_PAIRS_PER_BUCKET,
            )
        if not lo_l:
            return pa.table(
                {
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        lo = np.concatenate(lo_l); hi = np.concatenate(hi_l)
        ha = np.concatenate(hl_l).view(np.uint64)
        hb = np.concatenate(hh_l).view(np.uint64)
        swap = lo > hi
        lo2 = np.where(swap, hi, lo); hi2 = np.where(swap, lo, hi)
        x = (ha ^ hb).view(np.uint64)
        d = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)
        keep = d <= max_hamming
        lo2, hi2, d = _dedup_pair_arrays(lo2[keep], hi2[keep], d[keep])
        return pa.table(
            {
                "lo": pa.array(lo2, pa.int64()),
                "hi": pa.array(hi2, pa.int64()),
                "hamming": pa.array(d, pa.int64()),
            }
        )

    pairs = (
        hashes.map_batches(emit_bands, batch_format="pyarrow")
        .repartition(n, keys=["band_idx", "band_val"])
        .map_batches(bucket_pairs, batch_format="pyarrow", batch_size=None)
    )
    from import_ray.stages.neardup import dedup_pairs_exchange

    return dedup_pairs_exchange(pairs, "lo", "hi", n)
