"""Misra-Gries heavy-hitters sketch (top-k frequent keys), mergeable.

Summary of m counters; batch update folds the batch's exact counts in, then
trims to m by subtracting the (m+1)-th largest counter from all and dropping
non-positives (the classic MG decrement, batched).  Merging two summaries =
add counters, same trim — the mergeable-summaries result of Agarwal,
Cormode, Huang, Phillips, Wei, Yi (PODS 2012): after any merge tree the
estimate error stays <= N/(m+1), always an UNDER-estimate:

    true_count - N/(m+1) <= estimate <= true_count

This rounds out the frequency family next to count-min (which overestimates)
— "which tools/roles dominate the last hour" on the transcripts table, with
actual keys in the state, not just hashed counters.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch

_MAGIC = b"PSTOPK\x01"


class TopKSketch(Sketch):
    kind = "topk"

    def __init__(self, m: int = 256, counters: dict[bytes, int] | None = None,
                 n_total: int = 0):
        self.m = m
        self.counters: dict[bytes, int] = counters if counters is not None else {}
        self.n_total = n_total

    @classmethod
    def factory(cls, m: int = 256):
        def make() -> "TopKSketch":
            return cls(m)

        return make

    # --- updates -----------------------------------------------------------------
    def _trim(self) -> None:
        if len(self.counters) <= self.m:
            return
        counts = np.fromiter(self.counters.values(), dtype=np.int64)
        # value of the (m+1)-th largest counter — subtracted from everyone
        kth = np.partition(counts, len(counts) - self.m - 1)[len(counts) - self.m - 1]
        self.counters = {
            k: c - int(kth) for k, c in self.counters.items() if c - int(kth) > 0
        }

    def update_arrow(self, arr) -> None:
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = pc.value_counts(arr)
        keys = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        if pa.types.is_binary(keys.type) or pa.types.is_large_binary(keys.type):
            kb = keys.to_pylist()
        else:
            kb = [s.encode() if s is not None else b"" for s in keys.to_pylist()]
        for k, c in zip(kb, counts):
            self.counters[k] = self.counters.get(k, 0) + int(c)
        self.n_total += int(counts.sum())
        self._trim()

    def update_keys(self, keys) -> None:
        for k in keys:
            kb = k.encode() if isinstance(k, str) else bytes(k)
            self.counters[kb] = self.counters.get(kb, 0) + 1
            self.n_total += 1
        self._trim()

    # --- queries -----------------------------------------------------------------
    def estimate(self, key) -> int:
        kb = key.encode() if isinstance(key, str) else bytes(key)
        return self.counters.get(kb, 0)

    @property
    def max_error(self) -> int:
        """Guaranteed bound on under-estimation: N/(m+1)."""
        return self.n_total // (self.m + 1)

    def top(self, k: int = 10) -> list[tuple[bytes, int]]:
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def result(self) -> list[tuple[bytes, int]]:
        return self.top(10)

    def memory_bound_bytes(self) -> int:
        """Populated-state bound: at most ``m`` live counters after a trim,
        each costing its key bytes plus CPython dict-entry overhead
        (~100 B).  Key size is data-dependent, so the bound tracks the
        largest key seen so far (floor 32 B); grouped builds re-estimate
        from a live sketch every batch to pick up growth."""
        longest = max((len(k) for k in self.counters), default=0)
        return 256 + self.m * (max(longest, 32) + 100)

    # --- algebra -------------------------------------------------------------------
    def merge(self, other: "TopKSketch") -> None:
        if self.m != other.m:
            raise ValueError("cannot merge top-k sketches with different m")
        for k, c in other.counters.items():
            self.counters[k] = self.counters.get(k, 0) + c
        self.n_total += other.n_total
        self._trim()

    # --- serialization ---------------------------------------------------------------
    def dumps(self) -> bytes:
        out = [_MAGIC, struct.pack("<IQI", self.m, self.n_total, len(self.counters))]
        for k, c in sorted(self.counters.items()):
            out.append(struct.pack("<Iq", len(k), c))
            out.append(k)
        return b"".join(out)

    @classmethod
    def loads(cls, raw: bytes) -> "TopKSketch":
        if raw[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a poppy_spark top-k state")
        off = len(_MAGIC)
        m, n_total, n = struct.unpack_from("<IQI", raw, off)
        off += 16
        counters: dict[bytes, int] = {}
        for _ in range(n):
            klen, c = struct.unpack_from("<Iq", raw, off)
            off += 12
            counters[raw[off : off + klen]] = c
            off += klen
        return cls(m, counters, n_total)
