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
        concurrency=concurrency,
    )
