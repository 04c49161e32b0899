"""Theta sketch (KMV — k minimum values) for distinct counts WITH set
operations: union, intersection, and difference estimates over arbitrary
group pairs, which HLL cannot answer (no intersection algebra).

The sketch keeps the ``k`` smallest distinct 64-bit hash values seen.  With
fewer than ``k`` distinct values it is EXACT.  Past that, theta = (k-th
smallest hash) / 2^64 is the sampled fraction of the hash space, and
``distinct ~= (k - 1) / theta`` with relative error ~ 1 / sqrt(k - 2)
(Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations", SIGMOD 2007; the Apache DataSketches theta family follows the
same construction).

Set ops: trim both samples below ``theta = min(theta_a, theta_b)``; each is
then a uniform hash-space sample of its set, so
``|A op B| ~= |sample_a op sample_b| / theta`` for op in {union,
intersection, difference}.

Merge is "union the samples, keep the k smallest" — commutative,
associative, idempotent, so it drops into the same two-phase Spark
aggregation as poppy's Bloom OR-union (``poppy/src/bloom.rs:327-340``).

Host note: uint64 sorts take a 16x-slow numpy path on this box, so all
order work happens on a sign-flipped int64 view (order-isomorphic).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch, arrow_to_hashes

#: distinct seed so theta bits are independent of the HLL/Bloom pipelines
THETA_SEED = 0x746865746153454C  # b"thetaSEL" BE

_MAGIC = b"PSTHETA\x01"
_SIGN = np.uint64(1) << np.uint64(63)
_FULL = float(1 << 64)


def _k_smallest_distinct(vals: np.ndarray, k: int) -> np.ndarray:
    """k smallest distinct uint64s, ascending — sorted on an int64 view."""
    if vals.size == 0:
        return vals.astype(np.uint64)
    signed = (vals ^ _SIGN).view(np.int64)
    u = np.unique(signed)
    if u.size > k:
        u = u[:k]
    return (u.view(np.uint64) ^ _SIGN).astype(np.uint64)


class ThetaSketch(Sketch):
    kind = "theta"
    #: any single well-mixed 64-bit hash works, so the Spark layer may
    #: pre-hash JVM-side (xxhash64) and ship 8 bytes/row
    prehash_jvm = True

    def __init__(self, k: int = 4096, values: np.ndarray | None = None):
        if k < 16:
            raise ValueError(f"theta k must be >= 16, got {k}")
        self.k = k
        #: ascending distinct uint64 hashes, at most k of them
        self.values = (
            values if values is not None else np.empty(0, dtype=np.uint64)
        )

    @classmethod
    def factory(cls, k: int = 4096):
        def make() -> "ThetaSketch":
            return cls(k)

        return make

    # -- update / merge ----------------------------------------------------

    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        self.values = _k_smallest_distinct(
            np.concatenate([self.values, h.astype(np.uint64)]), self.k
        )

    def update_arrow(self, arr) -> None:
        self.update_hashes(arrow_to_hashes(arr, THETA_SEED))

    def update_keys(self, keys) -> None:
        from poppy_spark.core.hashkern import pack_keys, wyhash_batch

        mat, lens = pack_keys(keys)
        self.update_hashes(wyhash_batch(mat, lens, THETA_SEED))

    def merge(self, other: "ThetaSketch") -> None:
        if self.k != other.k:
            raise ValueError("cannot merge theta sketches with different k")
        self.update_hashes(other.values)

    def memory_bound_bytes(self) -> int:
        """Populated-state bound: up to ``k`` uint64 values once saturated.
        The empty wire form is ~16 B, so the base-class default would
        under-budget grouped flush guards by ~2000x at k=4096."""
        return 64 + 8 * self.k

    # -- estimates ----------------------------------------------------------

    @property
    def theta(self) -> float:
        """Sampled fraction of the hash space (1.0 while exact)."""
        if self.values.size < self.k:
            return 1.0
        return (float(self.values[-1]) + 1.0) / _FULL

    def estimate(self) -> float:
        if self.values.size < self.k:
            return float(self.values.size)
        return (self.k - 1) / self.theta

    def result(self) -> int:
        return int(round(self.estimate()))

    def relative_error(self) -> float:
        return 1.0 / math.sqrt(self.k - 2)

    def _trimmed(self, theta: float) -> np.ndarray:
        cut = min(int(theta * _FULL), (1 << 64) - 1)
        signed_cut = (cut ^ (1 << 63)) - (1 << 64) if (cut ^ (1 << 63)) >= 1 << 63 else cut ^ (1 << 63)
        sv = (self.values ^ _SIGN).view(np.int64)
        n = int(np.searchsorted(sv, np.int64(signed_cut)))
        return self.values[:n]

    def intersection(self, other: "ThetaSketch") -> float:
        """Estimated |A ∩ B|.  Both sketches must hash identically (same
        build pipeline); error grows as the overlap shrinks relative to
        1/theta — the published KMV behavior."""
        th = min(self.theta, other.theta)
        a, b = self._trimmed(th), other._trimmed(th)
        common = np.intersect1d(
            (a ^ _SIGN).view(np.int64), (b ^ _SIGN).view(np.int64)
        ).size
        return common / th

    def union_estimate(self, other: "ThetaSketch") -> float:
        th = min(self.theta, other.theta)
        a, b = self._trimmed(th), other._trimmed(th)
        u = np.union1d((a ^ _SIGN).view(np.int64), (b ^ _SIGN).view(np.int64))
        if u.size > self.k:
            uv = u[: self.k].view(np.uint64) ^ _SIGN
            th = (float(uv[-1]) + 1.0) / _FULL
            return (self.k - 1) / th
        return u.size / th

    def difference(self, other: "ThetaSketch") -> float:
        """Estimated |A \\ B| = |A| sampled below the common theta minus the
        intersection sample, both scaled by 1/theta."""
        th = min(self.theta, other.theta)
        a, b = self._trimmed(th), other._trimmed(th)
        sa = (a ^ _SIGN).view(np.int64)
        sb = (b ^ _SIGN).view(np.int64)
        only = sa.size - np.intersect1d(sa, sb).size
        return only / th

    def jaccard(self, other: "ThetaSketch") -> float:
        th = min(self.theta, other.theta)
        a = (self._trimmed(th) ^ _SIGN).view(np.int64)
        b = (other._trimmed(th) ^ _SIGN).view(np.int64)
        inter = np.intersect1d(a, b).size
        union = a.size + b.size - inter
        return inter / union if union else 0.0

    # -- serialization -------------------------------------------------------

    def dumps(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<II", self.k, self.values.size)
            + self.values.tobytes()
        )

    @classmethod
    def loads(cls, raw: bytes) -> "ThetaSketch":
        if raw[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a poppy_spark theta state")
        k, n = struct.unpack_from("<II", raw, len(_MAGIC))
        vals = np.frombuffer(
            raw, dtype=np.uint64, count=n, offset=len(_MAGIC) + 8
        ).copy()
        return cls(k, vals)
