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


class ImageResize:
    """Actor-pool resize stage over DECODED pixel arrays. The kernel is real
    (vectorized nearest-neighbor index remap — no image library needed); only
    the upstream decode is stubbed. Input rows: (item_id, pixels:
    list<uint8> row-major, width, height); output adds resized pixels at
    (out_w, out_h)."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w, self.out_h = int(out_w), int(out_h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ow, oh = self.out_w, self.out_h
        out = []
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        for p, w, h in zip(batch.column("pixels"), widths, heights):
            img = np.asarray(p.as_py(), dtype=np.uint8).reshape(int(h), int(w))
            yi = (np.arange(oh) * h) // oh
            xi = (np.arange(ow) * w) // ow
            out.append(img[np.ix_(yi, xi)].ravel().tolist())
        return pa.table({
            "item_id": batch.column("item_id"),
            "pixels": pa.array(out, pa.list_(pa.uint8())),
            "width": pa.array([ow] * len(out), pa.int32()),
            "height": pa.array([oh] * len(out), pa.int32()),
        })


class FrameSample:
    """Actor-pool frame sampler for video-shaped payloads: the payload byte
    stream is treated as n_frames fixed-size frames; emit every ``stride``-th
    frame as its own row (flat_map shape: one input row -> k output rows).
    Real kernel — only the codec that would PRODUCE frames is stubbed."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes, self.stride = int(frame_bytes), int(stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for item, p in zip(batch.column("item_id"), batch.column("payload")):
            buf = np.frombuffer(p.as_py(), dtype=np.uint8)
            n_frames = len(buf) // self.frame_bytes
            for j in range(0, n_frames, self.stride):
                ids.append(item.as_py())
                idxs.append(j)
                frames.append(
                    buf[j * self.frame_bytes:(j + 1) * self.frame_bytes].tolist())
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.list_(pa.uint8())),
        })


def fake_decode_pixels(ds: "ray.data.Dataset", *, concurrency=(1, 4),
                       batch_size: int = 16) -> "ray.data.Dataset":
    """Deterministic stand-in for a real decode: payload bytes tiled to the
    (width x height) pixel grid, so resize has true pixel arrays to chew on."""

    def decode(batch: pa.Table) -> pa.Table:
        pixels = []
        ws = batch.column("width").to_numpy()
        hs = batch.column("height").to_numpy()
        for p, w, h in zip(batch.column("payload"), ws, hs):
            buf = np.frombuffer(p.as_py(), dtype=np.uint8)
            need = int(w) * int(h)
            reps = -(-need // len(buf))
            pixels.append(np.tile(buf, reps)[:need].tolist())
        return pa.table({
            "item_id": batch.column("item_id"),
            "pixels": pa.array(pixels, pa.list_(pa.uint8())),
            "width": batch.column("width"),
            "height": batch.column("height"),
        })

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=batch_size)


def resize_images(ds: "ray.data.Dataset", *, out_w: int = 32, out_h: int = 32,
                  concurrency=(1, 4), batch_size: int = 16) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageResize, batch_format="pyarrow",
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_size=batch_size, concurrency=concurrency,
    )


def sample_frames(ds: "ray.data.Dataset", *, frame_bytes: int = 256,
                  stride: int = 4, concurrency=(1, 4),
                  batch_size: int = 8) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSample, batch_format="pyarrow",
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "stride": stride},
        batch_size=batch_size, concurrency=concurrency,
    )


def payloads_from_text(ds: "ray.data.Dataset", *, id_col: str = "doc_id",
                       text_col: str = "text",
                       batch_size: int = 256) -> "ray.data.Dataset":
    """Opaque-binary adapter: the UTF-8 bytes of a text column become the
    ``payload`` binary column (stands in for image/audio bytes read from a
    real shard — same schema contract the decode/frame stages consume)."""

    def mk(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table({
            "item_id": batch.column(id_col).cast(pa.int64()),
            "payload": pa.array([t.encode() for t in texts], pa.binary()),
        })

    return ds.map_batches(mk, batch_format="pyarrow", batch_size=batch_size)


def frame_digests(frames: "ray.data.Dataset",
                  batch_size: int = 1024) -> "ray.data.Dataset":
    """(item_id, frame_idx, frame) -> (item_id, frame_idx, frame_sha).

    sha256 on purpose (not blake2/xxhash): the per-frame digest is the
    row-content invariant carried through the video path, and sha256 is what
    SQL oracles can recompute (__ray_entry__.oracle_sql()["multimodal_frames"]
    replays ASCII byte slices with substr + sha256)."""

    def dig(batch: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(bytes(f)).hexdigest()
                for f in batch.column("frame").to_pylist()]
        return pa.table({
            "item_id": batch.column("item_id").cast(pa.int64()),
            "frame_idx": batch.column("frame_idx").cast(pa.int64()),
            "frame_sha": pa.array(shas),
        })

    return frames.map_batches(dig, batch_format="pyarrow",
                              batch_size=batch_size)


class AudioFrameEnergy:
    """Audio-shaped actor-pool stage: the payload byte stream is treated as
    unsigned-8-bit PCM samples (the codec that would produce real samples is
    stubbed, like ImageDecodeStub); per non-overlapping window of ``win``
    samples emit the RMS energy around the u8 midpoint (128). Real vectorized
    kernel; one input row -> n_windows output rows (flat-map shape). Full
    windows only — the tail partial window is dropped, mirroring FrameSample."""

    def __init__(self, win: int = 32):
        self.win = int(win)

    def __call__(self, batch: pa.Table) -> pa.Table:
        win = self.win
        ids, idxs, rms = [], [], []
        for item, p in zip(batch.column("item_id"), batch.column("payload")):
            buf = np.frombuffer(p.as_py(), dtype=np.uint8)
            n = len(buf) // win
            if not n:
                continue
            x = buf[:n * win].astype(np.float64).reshape(n, win) - 128.0
            e = np.sqrt(np.mean(x * x, axis=1))
            ids.extend([item.as_py()] * n)
            idxs.extend(range(n))
            rms.extend(np.round(e, 9).tolist())
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "win_idx": pa.array(idxs, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
        })


def audio_frame_energy(ds: "ray.data.Dataset", *, win: int = 32,
                       concurrency=(1, 4),
                       batch_size: int = 64) -> "ray.data.Dataset":
    return ds.map_batches(
        AudioFrameEnergy, batch_format="pyarrow",
        fn_constructor_kwargs={"win": win},
        batch_size=batch_size, concurrency=concurrency,
    )


def resample_decimate(ds: "ray.data.Dataset", *, factor: int = 4,
                      batch_size: int = 64) -> "ray.data.Dataset":
    """Decimation resample of audio-shaped payloads: keep every ``factor``-th
    sample. Emits (item_id, n_samples, sample_sum) — the scalar invariants of
    the resampled stream (SQL-replayable by index arithmetic, like
    pixel_checksums for the image path)."""

    def dec(batch: pa.Table) -> pa.Table:
        ids, counts, sums = [], [], []
        for item, p in zip(batch.column("item_id"), batch.column("payload")):
            buf = np.frombuffer(p.as_py(), dtype=np.uint8)[::factor]
            ids.append(item.as_py())
            counts.append(len(buf))
            sums.append(int(buf.astype(np.int64).sum()))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "n_samples": pa.array(counts, pa.int64()),
            "sample_sum": pa.array(sums, pa.int64()),
        })

    return ds.map_batches(dec, batch_format="pyarrow", batch_size=batch_size)


def pixel_checksums(ds: "ray.data.Dataset",
                    batch_size: int = 64) -> "ray.data.Dataset":
    """(item_id, pixels, ...) -> (item_id, px_sum, n_px): the scalar
    invariants of a pixel grid. Used to value-verify the decode->resize path
    end-to-end (the oracle recomputes each resized pixel by index arithmetic
    on the payload bytes — __ray_entry__.oracle_sql()["multimodal_resize"])."""

    def chk(batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy()
        sums, counts = [], []
        for p in batch.column("pixels").to_pylist():
            a = np.asarray(p, dtype=np.int64)
            sums.append(int(a.sum()))
            counts.append(len(a))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "px_sum": pa.array(sums, pa.int64()),
            "n_px": pa.array(counts, pa.int64()),
        })

    return ds.map_batches(chk, batch_format="pyarrow", batch_size=batch_size)


def feature_rows(ds: "ray.data.Dataset", *, dim: int = 16,
                 concurrency=(1, 4), batch_size: int = 64) -> "ray.data.Dataset":
    """Payloads -> exploded (item_id, bin, weight) rows of the byte-histogram
    feature vector — the dense list<float> unnested so every cell is a
    value-verifiable scalar (list columns don't hash stably across engines)."""
    feats = extract_features(ds, dim=dim, concurrency=concurrency,
                             batch_size=batch_size)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy()
        fl = batch.column("feature").to_pylist()
        n = len(ids)
        w = np.concatenate(fl) if n else np.array([], dtype=np.float64)
        return pa.table({
            "item_id": pa.array(np.repeat(ids, dim), pa.int64()),
            "bin": pa.array(np.tile(np.arange(dim, dtype=np.int64), n)),
            "weight": pa.array(np.round(w, 9), pa.float64()),
        })

    return feats.map_batches(explode, batch_format="pyarrow",
                             batch_size=batch_size)
