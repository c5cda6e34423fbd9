"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are opaque ``binary`` columns with sidecar metadata
columns (mime, width/height or sample rate, …). The decode / feature-extract
kernels themselves are STUBBED (no image/audio libs in this container — each
stub is deterministic or raises ``NotImplementedError``), but the Ray-side
plumbing is real and tested: schema, actor-pool signature, small batch sizes
for large payloads, and output layout.

Pattern: a decode stage is a callable CLASS (model/codec loaded once per actor
in ``__init__``) run with ``map_batches(cls, concurrency=N, batch_size=B)``
where B is small because each row carries megabytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def make_binary_column_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake payload table: (item_id, payload: binary, mime,
    width, height). Stands in for a real image shard in tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array(rng.integers(32, 512, n), pa.int32()),
            "height": pa.array(rng.integers(32, 512, n), pa.int32()),
        }
    )


class ImageDecodeStub:
    """Actor-pool decode stage. Real decoders (PIL/libjpeg) load here ONCE per
    actor; the stub derives a deterministic pseudo-decode from the payload
    bytes so the pipeline shape is testable end-to-end."""

    def __init__(self, strict: bool = False):
        self.strict = strict  # strict=True behaves like the missing-lib case

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decoding requires an image library not present in this "
                "container; wire PIL/torchvision here"
            )
        digests = [
            hashlib.blake2b(p.as_py(), digest_size=8).hexdigest()
            for p in batch.column("payload")
        ]
        sizes = [len(p.as_py()) for p in batch.column("payload")]
        return pa.table(
            {
                "item_id": batch.column("item_id"),
                "decode_digest": pa.array(digests),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )


class FeatureExtractStub:
    """Actor-pool embedding stage: payload -> fixed-dim feature vector.
    Deterministic fake (bytes histogram, L2-normalized) standing in for a
    model forward pass; the model would be loaded in __init__."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch.column("payload"):
            arr = np.frombuffer(p.as_py(), dtype=np.uint8)
            hist = np.bincount(arr % self.dim, minlength=self.dim).astype(np.float64)
            hist /= max(np.linalg.norm(hist), 1e-12)
            feats.append(hist)
        return pa.table(
            {
                "item_id": batch.column("item_id"),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


def decode_images(ds: "ray.data.Dataset", *, concurrency=(1, 4), batch_size: int = 16) -> "ray.data.Dataset":
    """Small batch_size on purpose: batch bytes = batch_size x payload size."""
    return ds.map_batches(
        ImageDecodeStub, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def extract_features(ds: "ray.data.Dataset", *, dim: int = 32, concurrency=(1, 4), batch_size: int = 16) -> "ray.data.Dataset":
    return ds.map_batches(
        FeatureExtractStub, batch_format="pyarrow",
        fn_constructor_kwargs={"dim": dim},
        batch_size=batch_size, concurrency=concurrency,
    )
