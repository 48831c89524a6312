"""Deterministic vectorized hashing / partitioning kernels.

Plays the role of the reference's hash partitioner
(``analytical_engine/core/utils/partitioner.h:43-54`` — ``fid =
hash(oid) % fnum``) and the oid→gid vertex map
(``core/vertex_map/global_vertex_map.h:44-68``), but as pure
vectorized numpy/pandas kernels suitable for Arrow batches.

All functions are pure and deterministic across processes and runs:
- integer ids are mixed with splitmix64 (public-domain finalizer from
  Steele et al., "Fast Splittable Pseudorandom Number Generators").
- string ids are hashed with pandas' vectorized siphash
  (``pd.util.hash_array`` with a fixed key), which is deterministic
  for a fixed hash_key across sessions.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_HASH_KEY = "graphscope_ray00"  # fixed 16-byte siphash key (must be len 16)
assert len(_HASH_KEY) == 16

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def hash64_ints(a: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of an int64/uint64 array (uint64 out)."""
    return splitmix64(np.asarray(a).view(np.int64).astype(_U64))


def hash64_strings(a) -> np.ndarray:
    """Deterministic 64-bit hash of a string array-like (uint64 out)."""
    arr = np.asarray(a, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def hash64_any(a) -> np.ndarray:
    """Hash an array of int64s or strings to uint64."""
    arr = np.asarray(a)
    if arr.dtype.kind in "iu":
        return hash64_ints(arr)
    return hash64_strings(arr)


def partition_of(vid: np.ndarray, num_partitions: int) -> np.ndarray:
    """Owner partition of each int64 vertex id: ``mix(vid) % P``.

    Mixing before the modulo protects against adversarial/dense id
    layouts (e.g. sequential keys), mirroring the hash (not range)
    edge-cut contract of ``partitioner.h:43-54``.
    """
    return (hash64_ints(np.asarray(vid)) % _U64(num_partitions)).astype(np.int32)


def string_ids_to_vids(strings) -> np.ndarray:
    """Map string oids to int64 vids via the deterministic 64-bit hash.

    Collisions are possible in principle (birthday bound ~n^2/2^64);
    callers that build a vertex map MUST verify ``n_distinct(vid) ==
    n_distinct(oid)`` and raise (see state/vertex_map.py). Cast to
    int64 for Arrow friendliness (bit pattern preserved).
    """
    return hash64_strings(strings).view(np.int64)


def sha256_hex(texts) -> np.ndarray:
    """Per-row sha256 hexdigest of a string column (north-rule ingest
    invariant, BASELINE.json input_hint). hashlib releases the GIL and
    runs at C speed; this is the only intentionally row-wise kernel.
    """
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        out[i] = hashlib.sha256(t.encode("utf-8")).hexdigest()
    return out


def stable_u64_of_str(s: str) -> int:
    """Single-value deterministic 64-bit hash (python int) for config
    hashing / salts. Uses sha256, not siphash, so it is stable even
    across pandas versions."""
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def walk_ids(vid: np.ndarray, rep: np.ndarray) -> np.ndarray:
    """Collision-resistant int64 walk id per (start vid, replica):
    ``splitmix64(splitmix64(vid) + rep)``. Unlike ``vid * num_walks +
    rep`` this has no structural collisions after int64 wraparound for
    full-range hashed vids — only the ~n²/2⁶⁴ birthday bound. Shared
    by the Dataset engine, the shard-pool engine and the sequential
    oracle so walks stay comparable across all three."""
    v = np.asarray(vid, np.int64).astype(_U64)
    r = np.asarray(rep, np.int64).astype(_U64)
    with np.errstate(over="ignore"):
        h = splitmix64(splitmix64(v) + r)
    return h.view(np.int64)


def walk_uniform(walk: np.ndarray, level: int, cand: np.ndarray,
                 seed: int) -> np.ndarray:
    """Deterministic u in (0, 1) per (walk, level, candidate, seed) —
    the random-walk pick kernel shared by the Dataset and shard-pool
    walk engines and the sequential test oracle."""
    with np.errstate(over="ignore"):
        h = (hash64_any(walk.astype(np.int64) * np.int64(1000003)
                        + np.int64(level))
             * np.uint64(1099511628211)
             ) ^ hash64_any(cand.astype(np.int64) + np.int64(seed))
    return (h.astype(np.float64) + 0.5) / 18446744073709551616.0


def walk_race_keys(walk: np.ndarray, level: int, cand: np.ndarray,
                   weight: np.ndarray, seed: int) -> np.ndarray:
    """Exponential race: min of -log(u)/w samples proportionally to
    w (deterministic weighted next-hop sampling). Weights must be
    strictly positive — zero/negative weights would silently force or
    forbid a hop via inf/negative race keys, so they fail loudly."""
    w = np.asarray(weight, np.float64)
    if len(w) and not (w > 0).all():
        raise ValueError(
            "walk edge weights must be > 0 (exponential race); got "
            f"min={w.min()!r}")
    u = walk_uniform(walk, level, cand, seed)
    return -np.log(u) / w
