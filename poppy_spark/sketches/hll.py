"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
linear-counting small-range correction of HLL++).

State: ``2^p`` uint8 registers.  Update: ``reg[j] = max(reg[j], rho(w))``.
Merge: elementwise max — commutative/associative like poppy's bitwise-OR
union (``poppy/src/bloom.rs:327-340``), so it drops into the same two-phase
Spark aggregation.  Standard error ~= 1.04 / sqrt(2^p).

Unlike the Bloom path we hash *every* key (no <=8-byte identity shortcut):
HLL needs uniform bits, and short transcript keys ("user", "tool") are
heavily structured.

Small-cardinality states are SPARSE (sorted (index, rho) pairs, HLL++'s
idea) both in memory and on the wire, densifying past m/8 occupied
registers: a grouped build over many mostly-small groups costs memory and
shuffle proportional to observed cardinality, not 2^p per group.  The
dense wire layout is unchanged, and the sparse/dense choice is a function
of the final occupied-register set — byte-deterministic under any merge
order.
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
        # Sparse-until-dense representation: a fresh sketch holds sorted
        # (register index, rho) pair arrays and only allocates the 2^p-byte
        # dense array past ``m/8`` occupied registers.  A grouped build over
        # 10^5+ mostly-small groups (the transcripts per-(day, tool) shape)
        # then costs memory and shuffle proportional to what each group SAW,
        # not 2^p per group — same idea as HLL++'s sparse mode, without the
        # 25-bit encoding since our wire format is per-state, not per-update.
        self._dense = registers
        self._sj = np.empty(0, dtype=np.uint32)  # sorted occupied indexes
        self._sr = np.empty(0, dtype=np.uint8)  # their rho values

    #: densify once occupied > m/8 (sparse pair = 5 wire bytes / ~5 in-memory)
    @property
    def _sparse_limit(self) -> int:
        return self.m >> 3

    @property
    def is_sparse(self) -> bool:
        return self._dense is None

    def memory_bound_bytes(self) -> int:
        """Dense footprint: a populated group densifies to 2^p register
        bytes regardless of how small its serialized state is."""
        return self.m + 7

    @property
    def registers(self) -> np.ndarray:
        """Dense register view; materializes (and caches) if sparse."""
        if self._dense is None:
            self._densify()
        return self._dense

    def _densify(self) -> None:
        dense = np.zeros(self.m, dtype=np.uint8)
        dense[self._sj] = self._sr
        self._dense = dense
        self._sj = np.empty(0, dtype=np.uint32)
        self._sr = np.empty(0, dtype=np.uint8)

    def _absorb_pairs(self, j: np.ndarray, r: np.ndarray) -> None:
        """Max-combine (index, rho) pairs into the sparse state; densify past
        the limit."""
        jj = np.concatenate([self._sj, j.astype(np.uint32)])
        rr = np.concatenate([self._sr, r])
        uj, inv = np.unique(jj, return_inverse=True)
        ur = np.zeros(uj.size, dtype=np.uint8)
        np.maximum.at(ur, inv, rr)
        self._sj, self._sr = uj, ur
        if uj.size > self._sparse_limit:
            self._densify()

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
        if self._dense is None:
            self._absorb_pairs(j, rho)
        else:
            np.maximum.at(self._dense, j, rho)

    def update_arrow(self, arr) -> None:
        self.update_hashes(arrow_to_hashes(arr, HLL_SEED))

    def update_keys(self, keys) -> None:
        from poppy_spark.core.hashkern import pack_keys

        mat, lens = pack_keys(keys)
        self.update_hashes(wyhash_batch(mat, lens, HLL_SEED))

    def merge(self, other: "HllSketch") -> None:
        if self.p != other.p:
            raise ValueError("cannot merge HLL sketches with different precision")
        if other._dense is None:
            if self._dense is None:
                self._absorb_pairs(other._sj, other._sr)
            else:
                np.maximum.at(self._dense, other._sj.astype(np.int64), other._sr)
        else:
            np.maximum(self.registers, other._dense, out=self._dense)

    def result(self) -> int:
        return int(round(self.estimate()))

    def estimate(self) -> float:
        m = float(self.m)
        if self._dense is None:
            # occupied registers are exactly the sparse pairs; the rest are 0
            zeros = self.m - int(self._sj.size)
            power_sum = np.power(2.0, -self._sr.astype(np.float64)).sum() + zeros
        else:
            regs = self._dense.astype(np.float64)
            power_sum = np.power(2.0, -regs).sum()
            zeros = int((self._dense == 0).sum())
        e = _alpha(self.m) * m * m / power_sum
        if e <= 2.5 * m and zeros:
            return m * math.log(m / zeros)
        return float(e)

    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def dumps(self) -> bytes:
        """Self-describing state.  Dense wire layout (``magic p registers``)
        is unchanged from earlier releases; a sparse state whose pair
        encoding (4-byte count + 4-byte indexes + 1-byte rhos) is smaller
        than the 2^p dense array ships that instead.  The STRICT ``<`` is
        load-bearing for format detection: ``5n + 4 == 2^p`` has integer
        solutions (p=6,10,14,18...), so a sparse body may only ship when
        shorter than the dense one — at equality we ship dense, and
        ``loads`` disambiguates purely by length."""
        head = _MAGIC + struct.pack("<B", self.p)
        if self._dense is None and 5 * self._sj.size + 4 < self.m:
            return (
                head
                + struct.pack("<I", self._sj.size)
                + self._sj.astype("<u4").tobytes()
                + self._sr.tobytes()
            )
        return head + self.registers.tobytes()

    @classmethod
    def loads(cls, raw: bytes) -> "HllSketch":
        if raw[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a poppy_spark HLL state")
        p = raw[len(_MAGIC)]
        body = raw[len(_MAGIC) + 1 :]
        if len(body) == (1 << p):
            return cls(p, np.frombuffer(body, dtype=np.uint8).copy())
        (n,) = struct.unpack_from("<I", body)
        if len(body) != 4 + 5 * n:
            raise ValueError("truncated HLL state")
        sk = cls(p)
        sk._sj = np.frombuffer(body, dtype="<u4", count=n, offset=4).astype(np.uint32)
        sk._sr = np.frombuffer(body, dtype=np.uint8, count=n, offset=4 + 4 * n).copy()
        return sk
