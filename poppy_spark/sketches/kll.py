"""KLL quantile sketch (Karnin, Lang, Liberty 2016).

State: one compactor (sorted value buffer) per level; items at level i carry
weight 2^i.  Compaction keeps every other element (random offset) and
promotes it one level up.  Merge: concatenate compactors level-wise, then
compact back under capacity — commutative/associative up to the compaction
randomness; rank error is O(1/k) regardless of merge order (the property the
north rule's "published error bound" clause asks for; see also the KLL±
follow-up, PAPERS.md).

Rank-error target: eps ~= 2.3 / k for c = 2/3 (single-sided, with high
probability); we test against 3/k to leave slack for merge noise.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch, arrow_to_f64

_MAGIC = b"PSKLL\x01"
_C = 2.0 / 3.0


class KllSketch(Sketch):
    kind = "kll"

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None, seed: int = 42):
        self.k = k
        self.levels: list[np.ndarray] = levels if levels is not None else [
            np.zeros(0, dtype=np.float64)
        ]
        self.n = sum(int(lv.size) << i for i, lv in enumerate(self.levels))
        self._rng = np.random.default_rng(seed)

    @classmethod
    def factory(cls, k: int = 200):
        def make() -> "KllSketch":
            return cls(k)

        return make

    # --- capacities ------------------------------------------------------------
    def _cap(self, level: int) -> int:
        """Capacity of ``level`` given the current height (top level gets k)."""
        height = len(self.levels)
        return max(int(math.ceil(self.k * _C ** (height - 1 - level))), 2)

    def _total_cap(self) -> int:
        return sum(self._cap(i) for i in range(len(self.levels)))

    # --- updates -----------------------------------------------------------------
    def update_arrow(self, arr) -> None:
        self.update_values(arrow_to_f64(arr))

    def update_values(self, vals: np.ndarray) -> None:
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self.n += int(vals.size)
        self._compress()

    def _compress(self) -> None:
        while sum(lv.size for lv in self.levels) > self._total_cap():
            for i, lv in enumerate(self.levels):
                if lv.size > self._cap(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        lv = np.sort(self.levels[i])
        keep_odd = bool(self._rng.integers(0, 2))
        promoted = lv[1::2] if keep_odd else lv[0::2]
        leftover = lv.size % 2
        if leftover and keep_odd:
            # odd length and we keep odd positions: the last element survives
            # in place to preserve total weight parity
            self.levels[i] = lv[-1:]
            promoted = lv[1::2]
        else:
            self.levels[i] = np.zeros(0, dtype=np.float64)
            if leftover and not keep_odd:
                promoted = lv[0::2][:-1]
                self.levels[i] = lv[-1:]
        if i + 1 == len(self.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    def memory_bound_bytes(self) -> int:
        """Populated-state bound: total level capacity converges to
        ``k / (1 - C)`` float64 items regardless of n (geometric level
        capacities).  The empty wire form is ~26 B, so the base-class
        default would under-budget grouped flush guards ~200x."""
        return 128 + int(math.ceil(8.0 * self.k / (1.0 - _C)))

    # --- merge -------------------------------------------------------------------
    def merge(self, other: "KllSketch") -> None:
        if self.k != other.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()

    # --- queries -----------------------------------------------------------------
    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, 1 << i, dtype=np.int64))
        if not items:
            return np.zeros(0), np.zeros(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float) -> float:
        it, wt = self._items_weights()
        if it.size == 0:
            return math.nan
        cum = np.cumsum(wt)
        target = q * cum[-1]
        pos = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(pos, it.size - 1)])

    def rank(self, x: float) -> float:
        """Estimated fraction of values <= x."""
        it, wt = self._items_weights()
        if it.size == 0:
            return math.nan
        pos = int(np.searchsorted(it, x, side="right"))
        return float(wt[:pos].sum() / wt.sum())

    def eps(self) -> float:
        return 3.0 / self.k

    def result(self) -> float:
        return self.quantile(0.5)

    # --- serialization ------------------------------------------------------------
    def dumps(self) -> bytes:
        parts = [_MAGIC, struct.pack("<IQI", self.k, self.n, len(self.levels))]
        for lv in self.levels:
            parts.append(struct.pack("<I", lv.size))
            parts.append(np.ascontiguousarray(lv, dtype="<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def loads(cls, raw: bytes) -> "KllSketch":
        if raw[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a poppy_spark KLL state")
        off = len(_MAGIC)
        k, n, n_levels = struct.unpack_from("<IQI", raw, off)
        off += 16
        levels = []
        for _ in range(n_levels):
            (sz,) = struct.unpack_from("<I", raw, off)
            off += 4
            levels.append(np.frombuffer(raw[off : off + 8 * sz], dtype="<f8").copy())
            off += 8 * sz
        sk = cls(k, levels)
        sk.n = n
        return sk
