"""t-digest quantile sketch (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests").

Merging-digest variant with the k1 (arcsine) scale function, vectorized:
sorted points are assigned to clusters by their k-index bucket
``floor(k(q))`` where ``k(q) = delta/(2*pi) * asin(2q - 1)``, which bounds
every centroid's k-width by 1 and keeps tail clusters tiny (the accuracy-at-
extreme-quantiles property).  Merge: concatenate centroids + recompress —
commutative/associative up to compression, with rank error O(1/delta) at the
median and far better at the tails.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch, arrow_to_f64

_MAGIC = b"PSTDG\x01"


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return delta / (2.0 * math.pi) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


class TDigestSketch(Sketch):
    kind = "tdigest"

    def __init__(
        self,
        delta: float = 200.0,
        means: np.ndarray | None = None,
        weights: np.ndarray | None = None,
    ):
        self.delta = float(delta)
        self.means = means if means is not None else np.zeros(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.zeros(0, dtype=np.float64)
        self._buf_m: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_n = 0

    @classmethod
    def factory(cls, delta: float = 200.0):
        def make() -> "TDigestSketch":
            return cls(delta)

        return make

    # --- updates ---------------------------------------------------------------
    def update_arrow(self, arr) -> None:
        self.update_values(arrow_to_f64(arr))

    def update_values(self, vals: np.ndarray) -> None:
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self._buf_m.append(vals)
        self._buf_w.append(np.ones(vals.size, dtype=np.float64))
        self._buf_n += vals.size
        if self._buf_n > 8 * self.delta:
            self._compress()

    def memory_bound_bytes(self) -> int:
        """Populated-state bound: <= 2*delta centroids plus the <= 8*delta
        pre-compression buffer, two float64 arrays each.  The empty wire
        form is a bare header, so the base-class default would under-budget
        grouped flush guards."""
        return 256 + int(16 * (2 * self.delta + 8 * self.delta))

    def _compress(self) -> None:
        if not self._buf_m and self.means.size <= 2 * self.delta:
            return
        m = np.concatenate([self.means] + self._buf_m) if self._buf_m else self.means
        w = np.concatenate([self.weights] + self._buf_w) if self._buf_w else self.weights
        self._buf_m, self._buf_w, self._buf_n = [], [], 0
        if m.size == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # midpoint quantile of each point, then k-index bucket
        q = (np.cumsum(w) - 0.5 * w) / total
        buckets = np.floor(_k1(q, self.delta)).astype(np.int64)
        # group-by consecutive bucket id (sorted, so groups are runs)
        change = np.empty(m.size, dtype=bool)
        change[0] = True
        change[1:] = buckets[1:] != buckets[:-1]
        starts = np.flatnonzero(change)
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(m * w, starts)
        self.means = msum / wsum
        self.weights = wsum

    # --- merge -------------------------------------------------------------------
    def merge(self, other: "TDigestSketch") -> None:
        if self.delta != other.delta:
            raise ValueError("cannot merge t-digests with different delta")
        osm, osw = other._snapshot()
        if osm.size:
            self._buf_m.append(osm)
            self._buf_w.append(osw)
            self._buf_n += osm.size
        self._compress()

    def _snapshot(self) -> tuple[np.ndarray, np.ndarray]:
        self._compress()
        return self.means, self.weights

    # --- queries --------------------------------------------------------------------
    def total_weight(self) -> float:
        self._compress()
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return math.nan
        if self.means.size == 1:
            return float(self.means[0])
        w = self.weights
        cum = np.cumsum(w) - 0.5 * w  # centroid midpoints in rank space
        target = q * w.sum()
        idx = np.searchsorted(cum, target)
        if idx == 0:
            return float(self.means[0])
        if idx >= self.means.size:
            return float(self.means[-1])
        # linear interpolation between neighboring centroid midpoints
        c0, c1 = cum[idx - 1], cum[idx]
        m0, m1 = self.means[idx - 1], self.means[idx]
        frac = (target - c0) / max(c1 - c0, 1e-12)
        return float(m0 + frac * (m1 - m0))

    def rank(self, x: float) -> float:
        self._compress()
        if self.means.size == 0:
            return math.nan
        w = self.weights
        cum = np.cumsum(w) - 0.5 * w
        r = np.interp(x, self.means, cum, left=0.0, right=w.sum())
        return float(r / w.sum())

    def result(self) -> float:
        return self.quantile(0.5)

    # --- serialization ------------------------------------------------------------------
    def dumps(self) -> bytes:
        self._compress()
        return (
            _MAGIC
            + struct.pack("<dI", self.delta, self.means.size)
            + np.ascontiguousarray(self.means, dtype="<f8").tobytes()
            + np.ascontiguousarray(self.weights, dtype="<f8").tobytes()
        )

    @classmethod
    def loads(cls, raw: bytes) -> "TDigestSketch":
        if raw[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a poppy_spark t-digest state")
        off = len(_MAGIC)
        delta, n = struct.unpack_from("<dI", raw, off)
        off += 12
        means = np.frombuffer(raw[off : off + 8 * n], dtype="<f8").copy()
        off += 8 * n
        weights = np.frombuffer(raw[off : off + 8 * n], dtype="<f8").copy()
        return cls(delta, means, weights)
