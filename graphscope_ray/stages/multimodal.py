"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(media_type, width/height or sample_rate, codec). The decode /
feature-extract kernels are STUBBED — the decoding libraries are not
in this container — but the Ray-side plumbing is real and tested:
actor-pool ``map_batches`` stages with small batch sizes (large binary
rows: a batch × concurrency must fit the worker heap — ray_guide
"Memory-aware"), Arrow-native binary columns end to end (binary does
not survive pandas object dtype round-trips cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from graphscope_ray.context import pool


def attach_media_meta(ds: ray.data.Dataset, payload_col: str = "payload"
                      ) -> ray.data.Dataset:
    """Derive deterministic metadata (byte length, sha256 prefix) for a
    binary column — the real part of the multimodal schema."""

    def f(batch: pa.Table) -> pa.Table:
        payloads = batch.column(payload_col).to_pylist()
        sizes = pa.array([len(p) for p in payloads], pa.int64())
        digests = pa.array(
            [hashlib.sha256(p).hexdigest()[:16] for p in payloads], pa.string()
        )
        return batch.append_column("payload_bytes", sizes).append_column(
            "payload_digest", digests
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=256)


class ImageDecoder:
    """Actor-pool decode stage. ``fake=True`` (default here) produces a
    deterministic pseudo-decode (shape + mean "pixel" from bytes) so the
    pipeline shape, schema and batch sizing are exercised; with a real
    imaging library present, plug the decode into ``_decode``."""

    def __init__(self, fake: bool = True, thumb: int = 8):
        self.fake = fake
        self.thumb = thumb

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires an imaging library not present "
                "in this environment; run with fake=True"
            )
        # deterministic fake: bytes -> 8x8 'thumbnail' of byte values
        arr = np.frombuffer(payload[: self.thumb * self.thumb], dtype=np.uint8)
        out = np.zeros(self.thumb * self.thumb, dtype=np.uint8)
        out[: len(arr)] = arr
        return out.reshape(self.thumb, self.thumb)

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs, means = [], []
        for p in batch.column("payload").to_pylist():
            t = self._decode(p)
            thumbs.append(t.reshape(-1))
            means.append(float(t.mean()))
        return batch.append_column(
            "thumb", pa.array(thumbs, pa.list_(pa.uint8()))
        ).append_column("pixel_mean", pa.array(means, pa.float64()))


def decode_images(
    ds: ray.data.Dataset, concurrency: int = 2, batch_size: int = 64
) -> ray.data.Dataset:
    """Small batches × small pool: binary payloads are heavy rows."""
    return ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool(concurrency),
    )


class ImageResizer:
    """Actor-pool resize stage over decoded ``thumb`` list columns:
    vectorized nearest-neighbor downsample (the decode is the stub —
    the resize math on decoded arrays is real)."""

    def __init__(self, src_side: int = 8, dst_side: int = 4):
        self.src = src_side
        self.dst = dst_side
        step = src_side / dst_side
        idx = (np.arange(dst_side) * step).astype(np.int64)
        self.gather = (idx[:, None] * src_side + idx[None, :]).reshape(-1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("thumb")
        flat = np.asarray(col.combine_chunks().flatten(), dtype=np.uint8)
        mat = flat.reshape(-1, self.src * self.src)
        small = mat[:, self.gather]
        return batch.append_column(
            "thumb_small",
            pa.FixedSizeListArray.from_arrays(
                pa.array(small.reshape(-1), pa.uint8()),
                self.dst * self.dst,
            ),
        )


def resize_images(ds: ray.data.Dataset, src_side: int = 8, dst_side: int = 4,
                  concurrency: int = 2, batch_size: int = 64
                  ) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizer, fn_constructor_kwargs={"src_side": src_side,
                                             "dst_side": dst_side},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool(concurrency),
    )


class FrameSampler:
    """Video frame sampling: pick ``n_frames`` deterministic byte
    offsets per payload and emit per-frame digest rows (one row per
    sampled frame — the flat_map shape a real codec stage would have;
    the codec itself is the stub)."""

    def __init__(self, n_frames: int = 4, frame_bytes: int = 16):
        self.n = n_frames
        self.fb = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, digests = [], [], []
        id_col = batch.column_names[0]
        for rid, p in zip(batch.column(id_col).to_pylist(),
                          batch.column("payload").to_pylist()):
            span = max(len(p) - self.fb, 1)
            for j in range(self.n):
                off = (j * span) // self.n
                chunk = p[off: off + self.fb]
                ids.append(rid)
                frames.append(j)
                digests.append(hashlib.sha256(chunk).hexdigest()[:12])
        return pa.table({
            id_col: pa.array(ids),
            "frame": pa.array(frames, pa.int32()),
            "frame_digest": pa.array(digests, pa.string()),
        })


def sample_frames(ds: ray.data.Dataset, n_frames: int = 4,
                  concurrency: int = 2, batch_size: int = 64
                  ) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool(concurrency),
    )


class AudioFeaturizer:
    """Audio feature extraction: interpret payload bytes as uint8
    samples (the codec stub) and compute real windowed RMS / zero-cross
    features vectorized over the batch."""

    def __init__(self, n_windows: int = 8):
        self.n = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms_rows = []
        zc = []
        for p in batch.column("payload").to_pylist():
            x = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
            if len(x) < self.n:
                x = np.pad(x, (0, self.n - len(x)))
            x = x - x.mean()
            win = len(x) // self.n
            trimmed = x[: win * self.n].reshape(self.n, win)
            rms_rows.append(np.sqrt((trimmed ** 2).mean(axis=1)))
            zc.append(int((np.diff(np.signbit(x)) != 0).sum()))
        return batch.append_column(
            "rms", pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(rms_rows), pa.float64()), self.n)
        ).append_column("zero_crossings", pa.array(zc, pa.int64()))


def extract_audio_features(ds: ray.data.Dataset, n_windows: int = 8,
                           concurrency: int = 2, batch_size: int = 64
                           ) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeaturizer, fn_constructor_kwargs={"n_windows": n_windows},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool(concurrency),
    )
