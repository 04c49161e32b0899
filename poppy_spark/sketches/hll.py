"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
linear-counting small-range correction of HLL++).

State: ``2^p`` uint8 registers.  Update: ``reg[j] = max(reg[j], rho(w))``.
Merge: elementwise max — commutative/associative like poppy's bitwise-OR
union (``poppy/src/bloom.rs:327-340``), so it drops into the same two-phase
Spark aggregation.  Standard error ~= 1.04 / sqrt(2^p).

Unlike the Bloom path we hash *every* key (no <=8-byte identity shortcut):
HLL needs uniform bits, and short transcript keys ("user", "tool") are
heavily structured.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from poppy_spark.core.hashkern import wyhash_batch

from .base import Sketch, arrow_to_hashes

#: distinct seed so HLL bits are independent from the Bloom pipeline
HLL_SEED = 0x686C6C5F706F7070  # b"hll_popp" BE

_MAGIC = b"PSHLL\x01"


def _clz_plus_one(w: np.ndarray, width: int) -> np.ndarray:
    """rho(w) = leading zeros of the top ``width`` bits + 1; w==0 -> width+1."""
    hb = np.zeros(w.shape, dtype=np.int64)  # highest set bit position
    cur = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        y = cur >> np.uint64(s)
        m = y != 0
        hb[m] += s
        cur[m] = y[m]
    # w is already top-aligned (built by h << p), so the 64-bit leading-zero
    # count equals the leading-zero count within the width-bit window
    rho = 64 - hb  # = clz(w) + 1 for w > 0
    rho[w == 0] = width + 1
    return rho.astype(np.uint8)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HllSketch(Sketch):
    kind = "hll"
    #: the Spark layer may pre-hash keys JVM-side (xxhash64) and ship only
    #: 8 bytes/row — HLL needs any single well-mixed 64-bit hash
    prehash_jvm = True

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError(f"hll precision must be in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    @classmethod
    def factory(cls, p: int = 14):
        def make() -> "HllSketch":
            return cls(p)

        return make

    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        j = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)
        rho = _clz_plus_one(w, 64 - self.p)
        np.maximum.at(self.registers, j, rho)

    def update_arrow(self, arr) -> None:
        self.update_hashes(arrow_to_hashes(arr, HLL_SEED))

    def update_keys(self, keys) -> None:
        from poppy_spark.core.hashkern import pack_keys

        mat, lens = pack_keys(keys)
        self.update_hashes(wyhash_batch(mat, lens, HLL_SEED))

    def merge(self, other: "HllSketch") -> None:
        if self.p != other.p:
            raise ValueError("cannot merge HLL sketches with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)

    def result(self) -> int:
        return int(round(self.estimate()))

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        m = float(self.m)
        e = _alpha(self.m) * m * m / np.power(2.0, -regs).sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * math.log(m / zeros)
        return float(e)

    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def dumps(self) -> bytes:
        return _MAGIC + struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def loads(cls, raw: bytes) -> "HllSketch":
        if raw[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a poppy_spark HLL state")
        p = raw[len(_MAGIC)]
        regs = np.frombuffer(raw[len(_MAGIC) + 1 :], dtype=np.uint8).copy()
        if regs.size != (1 << p):
            raise ValueError("truncated HLL state")
        return cls(p, regs)
