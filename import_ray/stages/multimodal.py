"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with typed metadata;
decode / feature-extraction stages are actor-pool ``map_batches``
kernels. The actual codecs (PIL/ffmpeg/etc.) are NOT available in this
environment, so the decode step is STUBBED: ``decoder="fake"`` produces
deterministic pseudo-features from the payload bytes (so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and tested), while ``decoder="pil"`` raises NotImplementedError
until the dependency exists.

Scale notes: large payloads need small ``batch_size`` (payload bytes ×
batch_size × concurrency must fit the worker heap) and
``batch_format="pyarrow"`` end-to-end (binary columns don't round-trip
pandas cleanly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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


class MediaFeatureExtractor:
    """Actor-pool kernel: decode payload → fixed-size feature vector.

    ``__init__`` loads the (stub) decoder once per actor — the real
    version would load a model / initialize a codec here.
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 16):
        if decoder not in ("fake",):
            raise NotImplementedError(
                f"decoder '{decoder}' requires image/audio libraries not "
                f"present in this environment; use decoder='fake'"
            )
        self.decoder = decoder
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-decode: chunked byte means
        arr = np.frombuffer(payload, np.uint8)
        pad = (-len(arr)) % self.feature_dim
        if pad:
            arr = np.pad(arr, (0, pad))
        return arr.reshape(self.feature_dim, -1).mean(axis=1) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.array(
                    [f.astype(np.float32) for f in feats], pa.list_(pa.float32())
                ),
                "payload_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], pa.int64()
                ),
            }
        )


def extract_media_features(media_ds, concurrency: int = 2, batch_size: int = 16):
    """Actor-pool feature extraction over a media Dataset."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
