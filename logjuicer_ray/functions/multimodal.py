"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
sidecar metadata (format, width/height or sample rate).  The decode /
feature-extract kernels are STUBS — the container has no image/audio
libraries — but the Ray-side plumbing is real and tested: actor-pool
``map_batches`` stages with small batch sizes (large rows), stable output
schemas, and a deterministic fake "decode" so pipelines are runnable
end-to-end.

At real scale: ``batch_size`` must be small (payload × batch × concurrency
bounded by worker heap) and blocks should stay Arrow (``binary`` columns do
not survive pandas round-trips intact).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

__all__ = [
    "synth_media_batch",
    "ImageDecodeStage",
    "AudioFeatureStage",
    "decode_images",
    "extract_audio_features",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio"
        ("payload", pa.binary()),
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synth_media_batch(ids: list[int], *, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (binary payloads) for tests/benches."""
    rows = {n: [] for n in MEDIA_SCHEMA.names}
    for i in ids:
        rng = np.random.default_rng((seed, i))
        kind = "image" if i % 2 == 0 else "audio"
        payload = rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload.tobytes())
        rows["format"].append("fake-rgb" if kind == "image" else "fake-pcm")
        rows["width"].append(int(rng.integers(16, 256)) if kind == "image" else 0)
        rows["height"].append(int(rng.integers(16, 256)) if kind == "image" else 0)
        rows["sample_rate"].append(16000 if kind == "audio" else 0)
    return pa.table({n: pa.array(rows[n], MEDIA_SCHEMA.field(n).type) for n in MEDIA_SCHEMA.names})


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: SHA-256-seeded feature
    vector.  Replace with PIL/libsndfile decode when available."""
    digest = hashlib.sha256(payload).digest()
    vals = struct.unpack("<8I", digest[:32])
    rng = np.random.default_rng(vals)
    return rng.standard_normal(out_dim).astype(np.float32)


class ImageDecodeStage:
    """Actor-pool stage: decode + resize + embed images.

    Real decode is stubbed (no image libs in this container): set
    ``strict=True`` to get the honest NotImplementedError; the default
    produces the deterministic fake embedding so downstream plumbing
    (schema, batch sizing, sinks) is exercised for real.
    """

    def __init__(self, out_dim: int = 64, strict: bool = False):
        self.out_dim = out_dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "container; run with strict=False for the deterministic stub"
            )
        feats = [
            _fake_decode(p.as_py(), self.out_dim) for p in batch.column("payload")
        ]
        return batch.drop_columns(["payload"]).append_column(
            "image_embedding",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        )


class AudioFeatureStage:
    """Actor-pool stage: frame-sample + feature-extract audio (stubbed the
    same way)."""

    def __init__(self, out_dim: int = 32, strict: bool = False):
        self.out_dim = out_dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires an audio library not present in this container"
            )
        feats = [
            _fake_decode(p.as_py() + b"#audio", self.out_dim)
            for p in batch.column("payload")
        ]
        return batch.drop_columns(["payload"]).append_column(
            "audio_features",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        )


def decode_images(ds, *, out_dim: int = 64, concurrency=2, batch_size: int = 64):
    """Small batches + an actor pool: payloads are large, so batch ×
    concurrency must fit the worker heap."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"out_dim": out_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_audio_features(ds, *, out_dim: int = 32, concurrency=2, batch_size: int = 64):
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"out_dim": out_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
