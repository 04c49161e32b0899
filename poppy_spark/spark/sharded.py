"""Bucket-range-sharded poppy v2 Bloom filter — capacity past one worker.

A single poppy v2 filter sized for 10^12 keys is ~2 TB of bucket bytes: it
cannot be a broadcast value, a per-partition clone, or a driver object.  But
poppy v2 is *already bucketed* — fixed 4096-byte buckets addressed by
``xorshift_star(h1) % n_buckets`` (``poppy/src/bloom/v2.rs:125-127,376-382``)
— so the bucket range is a natural distribution seam: shard s owns the
contiguous bucket range ``[s*bps, (s+1)*bps)`` and lives as one row of a
DataFrame, nowhere near the driver.

Shapes (and why they scale):

* **build** — phase 1 maps each key to its ``(shard_id, ibucket, k bit
  indexes)`` with the existing vectorized wyhash kernels (one ``mapInArrow``
  pass, batch-deduped); phase 2 repartitions those index tuples BY SHARD and
  streams them into per-shard bucket arrays (``mapInArrow``, dict of shards
  per task — memory per task = its shards' bytes, never the row group).
  Shuffle volume is ~``4 + 8 + 2k`` bytes per distinct key — when the filter
  is far larger than any partition's data (the 10^12 regime), shipping index
  tuples beats shipping partial filter states by orders of magnitude.
* **probe** — same phase-1 indexing, then a cogrouped ``applyInPandas`` on
  ``shard_id``: each group sees (its probe tuples, its ONE shard state), so
  every shard state crosses the shuffle exactly once — a probe row never
  drags a copy of the state along (a plain join would).  An optional
  ``salt`` replicates each state R ways to bound the per-group probe count.
* **algebra** — union/intersection are per-shard byte OR/AND (a join on
  shard_id); the count estimate is poppy's per-bucket-sum formula
  (``v2.rs:575-588``), which decomposes exactly over contiguous shards.

``to_poppy_bytes()`` reassembles a byte-identical single poppy v2 file (the
equivalence is the correctness gate), guarded by a size budget since it is a
driver-side materialization.  Only ``OptLevel.NONE`` is shardable (SPEED /
BEST add a global index cache that does not decompose; poppy's own parallel
path clones the whole filter per job instead, ``bin/poppy.rs:31-37``).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F

from poppy_spark.core.params import MergeError, cap_from_bit_size, k as k_fn
from poppy_spark.core.statekern import BUCKET_BITS, BUCKET_SIZE

__all__ = ["ShardedBloom", "ShardedBloomStream", "build_sharded_bloom"]

_STATE_SCHEMA = "shard_id int, state binary, n_rows bigint"


@dataclass(frozen=True)
class _Params:
    """Derived exactly as ``BloomV2.make(capacity, fpp, OptLevel.NONE)``
    (``poppy/src/bloom/v2.rs:281-329``) so shard reassembly is byte-equal."""

    capacity: int
    fpp: float
    n_buckets: int
    n_hash_buck: int
    n_shards: int
    bps: int  # buckets per shard (last shard may be short)

    @classmethod
    def make(cls, capacity: int, fpp: float, n_shards: int) -> "_Params":
        bucket_cap = cap_from_bit_size(BUCKET_BITS, fpp)
        n_buckets = math.ceil(capacity / bucket_cap)
        n_hash_buck = k_fn(BUCKET_BITS, bucket_cap)
        n_shards = max(1, min(n_shards, n_buckets))
        bps = math.ceil(n_buckets / n_shards)
        n_shards = math.ceil(n_buckets / bps)
        return cls(capacity, fpp, n_buckets, n_hash_buck, n_shards, bps)

    def shard_buckets(self, shard_id: int) -> int:
        lo = shard_id * self.bps
        return min(self.bps, self.n_buckets - lo)


#: int_keys -> pack_arrow int_mode ("string" raises on integer columns: the
#: key expression already canonicalized to text, so ints reaching the kernel
#: mean a build/probe mode mismatch that must fail loudly)
_INT_MODE = {"string": "raise", "le8": "le8", "typed": "typed"}


def _spread_low_split(sel: DataFrame) -> DataFrame:
    """A small input file count must not serialize the Arrow index phase:
    spread a scan with fewer splits than cores round-robin before the
    hashing mapInArrow (no-op at real scale, where inputs arrive with
    plenty of splits) — the same guard as ``build_sketch_df``."""
    n_parts = sel.rdd.getNumPartitions()
    cores = sel.sparkSession.sparkContext.defaultParallelism
    return sel.repartition(cores) if n_parts < cores else sel


def _route_batch(keys: pa.Array, p: _Params, dedup: bool, int_mode: str = "raise"):
    """(shard_id int32, ibucket int64, idx (n,k) uint16) for one Arrow batch."""
    from poppy_spark.core import hashkern as hk

    mat, lens = hk.pack_arrow(keys, int_mode=int_mode)
    h1 = hk.hash_pop_batch(mat, lens)
    keep = None
    if dedup:
        h1u, keep = np.unique(h1, return_index=True)
        h1 = h1u
    bucket_hash, idx = hk.v2_index_batch(h1, max(p.n_hash_buck, 1))
    idx = idx[:, : p.n_hash_buck].astype("<u2")
    nb = np.uint64(p.n_buckets)
    if p.n_buckets & (p.n_buckets - 1) == 0:
        ib = bucket_hash & (nb - np.uint64(1))
    else:
        ib = bucket_hash % nb
    shard = (ib // np.uint64(p.bps)).astype(np.int32)
    return shard, ib.astype(np.int64), idx, keep


def _idx_to_binary(idx: np.ndarray) -> pa.Array:
    """(n, k) '<u2' matrix -> Arrow binary array of 2k-byte rows, zero-copy."""
    n, k = idx.shape
    values = pa.py_buffer(np.ascontiguousarray(idx).tobytes())
    offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * (2 * k)).tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, offsets, values])


def _binary_to_idx(arr, k: int) -> np.ndarray:
    """Arrow binary column of 2k-byte rows -> (n, k) uint16 matrix."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros((0, k), dtype=np.uint16)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4)
    flat = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    return flat.view("<u2").reshape(n, k)


def _bit_parts(
    ib_local: np.ndarray, idx: np.ndarray, nbytes: int
) -> tuple[np.ndarray, np.ndarray]:
    """(byte_off, bitmask) for a shard-local (ibucket, idx) batch; uint32
    index math when the shard state is < 512 MB (always true at the default
    shard sizing) — half the memory traffic of the u64 formulation."""
    from poppy_spark.core import statekern

    if nbytes < statekern.U32_BYTES_LIMIT:
        flat = (
            (ib_local.astype(np.uint32) * np.uint32(BUCKET_BITS))[:, None]
            + idx.astype(np.uint32)
        ).reshape(-1)
        return flat >> np.uint32(3), np.uint8(1) << (flat & np.uint32(7)).astype(
            np.uint8
        )
    bit_ids = (
        ib_local.astype(np.uint64) * np.uint64(BUCKET_BITS)
    )[:, None] + idx.astype(np.uint64)
    flat = bit_ids.reshape(-1)
    byte_off = (flat >> np.uint64(3)).astype(np.int64)
    return byte_off, (np.uint8(1) << (flat & np.uint64(7)).astype(np.uint8))


def _or_bits_into(buckets: np.ndarray, ib_local: np.ndarray, idx: np.ndarray) -> None:
    # no dedup sort: the bitwise_or.at scatter makes duplicate bit ids
    # harmless — and the sort was the phase-2 scaling bottleneck (this
    # host's memory subsystem saturates on large sorts well before 8-way
    # concurrency)
    byte_off, bitmask = _bit_parts(ib_local, idx, buckets.size)
    np.bitwise_or.at(buckets, byte_off, bitmask)


class ShardedBloom:
    """Handle over ``(shard_id, state, n_rows)`` DataFrame + shared params.

    ``states`` holds one row per *touched* shard (raw shard bucket bytes,
    lz4-wrapped); untouched shards are implicit all-zero.
    """

    def __init__(self, params: _Params, states: DataFrame):
        self.params = params
        self.states = states

    # --- probe -----------------------------------------------------------------
    def contains(
        self,
        df: DataFrame,
        col: str,
        output_col: str = "hit",
        salt: int = 1,
        int_keys: str = "string",
        carry: str = "columns",
        strategy: str = "auto",
        broadcast_budget: int = 128 << 20,
    ) -> DataFrame:
        """Append a boolean membership column.

        ``strategy`` picks the probe's physical shape:

        * ``"auto"`` (default) — broadcast when the whole filter fits
          ``broadcast_budget`` (reassembled once, cached on this handle,
          shipped once per executor; the probe is then a narrow, shuffle-free
          transformation ~2.5x faster at bench scale), shuffle otherwise.
        * ``"broadcast"`` — force the reassembled broadcast probe (raises
          past the budget).
        * ``"shuffle"`` — force the cogrouped shuffle probe: rows shuffle to
          their shard, each shard state crosses the wire exactly once — the
          only shape for filters no single worker can hold.

        ``carry`` (shuffle strategy only) picks how the input row reunites
        with its hit bit:

        * ``"columns"`` (default) — all columns flow through the cogroup as
          Arrow and come back with ``hit`` appended: ONE shuffle, no
          join-back, fully deterministic.
        * ``"join"`` — probe tuples ship only ``(rid, shard_id, ibucket,
          2k idx bytes)`` and join back on a row id; the original (wide)
          rows cross no shuffle — they are pinned once to executor storage
          via ``localCheckpoint`` instead.  The checkpoint is REQUIRED for
          correctness, not an optimization: the row id is
          ``monotonically_increasing_id``, and without materialization the
          id-bearing subtree would be evaluated twice (probe side and
          join-back side) — a shuffled/AQE-replanned input or a task retry
          could reorder rows between evaluations and attach hits to the
          wrong rows.  Costs one executor-storage copy of ``df``; prefer
          the default unless rows are very wide and re-shuffling them is
          worse than storing them.

        Either way each shard state crosses the wire exactly once (``salt``
        times if salted).
        """
        from poppy_spark.spark.agg import _as_key, decompress_blob

        if strategy == "auto":
            strategy = (
                "broadcast" if self.size_in_bytes() <= broadcast_budget else "shuffle"
            )
        if strategy == "broadcast":
            from poppy_spark.spark.probe import bloom_contains

            if self.size_in_bytes() > broadcast_budget:
                raise MemoryError(
                    f"filter is {self.size_in_bytes()} bytes uncompressed, past "
                    f"broadcast_budget={broadcast_budget}; use strategy='shuffle'"
                )
            raw = getattr(self, "_poppy_cache", None)
            if raw is None:
                # shard rows are immutable once built: reassemble once per
                # handle and reuse across probes
                raw = self._poppy_cache = self.to_poppy_bytes(
                    max_bytes=broadcast_budget
                )
            return bloom_contains(df, col, raw, output_col, int_keys)

        if carry == "columns":
            return self._contains_columns(df, col, output_col, salt, int_keys)

        p = self.params
        int_mode = _INT_MODE[int_keys]
        keyed = df.withColumn("__rid", F.monotonically_increasing_id()).localCheckpoint(
            eager=False
        )
        probes = keyed.select("__rid", _as_key(keyed, col, int_keys).alias("__key"))

        def index_fn(batches):
            for b in batches:
                shard, ib, idx, _ = _route_batch(b.column(1), p, dedup=False, int_mode=int_mode)
                yield pa.RecordBatch.from_arrays(
                    [b.column(0), pa.array(shard), pa.array(ib), _idx_to_binary(idx)],
                    ["rid", "shard_id", "ib", "idx"],
                )

        tuples = probes.mapInArrow(
            index_fn, "rid bigint, shard_id int, ib bigint, idx binary"
        )
        if salt > 1:
            tuples = tuples.withColumn(
                "salt", F.pmod(F.xxhash64("rid"), F.lit(salt)).cast("int")
            )
            states = self.states.withColumn(
                "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
            ).withColumn("salt", F.col("salt").cast("int"))
            gkeys = ["shard_id", "salt"]
        else:
            states = self.states
            gkeys = ["shard_id"]

        k, bps = p.n_hash_buck, p.bps

        def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if left.empty:
                return pd.DataFrame({"rid": pd.Series(dtype="int64"),
                                     "hit": pd.Series(dtype="bool")})
            if right.empty:  # untouched shard: all-zero buckets
                return pd.DataFrame({"rid": left["rid"], "hit": False})
            buckets = np.frombuffer(
                decompress_blob(right["state"].iloc[0]), dtype=np.uint8
            )
            shard_id = int(right["shard_id"].iloc[0])
            ib_local = left["ib"].to_numpy() - shard_id * bps
            idx = _binary_to_idx(pa.array(left["idx"]), k)
            byte_off, bitmask = _bit_parts(ib_local, idx, buckets.size)
            hit = ((buckets[byte_off] & bitmask) != 0).reshape(-1, k).all(axis=1)
            return pd.DataFrame({"rid": left["rid"], "hit": hit})

        hits = (
            tuples.groupBy(*gkeys)
            .cogroup(states.groupBy(*gkeys))
            .applyInPandas(check, "rid bigint, hit boolean")
        )
        return (
            keyed.join(hits.withColumnRenamed("rid", "__rid"), "__rid")
            .withColumnRenamed("hit", output_col)
            .drop("__rid")
        )

    def _contains_columns(
        self, df: DataFrame, col: str, output_col: str, salt: int, int_keys: str
    ) -> DataFrame:
        """Single-shuffle probe: rows ride the cogroup as Arrow end-to-end
        (``applyInArrow``), hit appended in place — no join-back.

        Routing is a scalar Arrow UDF over ONLY the key column (guide §4.1:
        pass just what the function needs): the payload columns never cross
        the Python boundary during routing — they stay in the JVM row and
        ride the shard shuffle directly.  The former ``mapInArrow`` route
        serialized every column to Python and back once before the shuffle
        (~1.5x the whole probe on the 11-column bench table)."""
        import pyspark.sql.types as T  # noqa: F401  (schema strings below)

        from poppy_spark.spark.agg import _as_key, decompress_blob

        p = self.params
        int_mode = _INT_MODE[int_keys]
        in_cols = list(df.columns)
        keyed = df.select("*", _as_key(df, col, int_keys).alias("__key"))

        try:
            from pyspark.sql.functions import arrow_udf
        except ImportError:
            arrow_udf = None

        if arrow_udf is not None:

            def route1(keys):
                if isinstance(keys, pa.ChunkedArray):
                    keys = keys.combine_chunks()
                shard, ib, idx, _ = _route_batch(keys, p, dedup=False, int_mode=int_mode)
                return pa.StructArray.from_arrays(
                    [
                        pa.array(shard, type=pa.int32()),
                        pa.array(ib, type=pa.int64()),
                        _idx_to_binary(idx),
                    ],
                    ["s", "ib", "idx"],
                )

            route1.__annotations__ = {"keys": pa.Array, "return": pa.Array}
            udf = arrow_udf(route1, "struct<s:int, ib:bigint, idx:binary>")
            tuples = (
                keyed.withColumn("__r", udf(F.col("__key")))
                .select(
                    *in_cols,
                    F.col("__r.s").alias("__shard_id"),
                    F.col("__r.ib").alias("__ib"),
                    F.col("__r.idx").alias("__idx"),
                )
            )
        else:  # pre-4.1 runtime: whole-row mapInArrow route

            def index_fn(batches):
                for b in batches:
                    shard, ib, idx, _ = _route_batch(
                        b.column(b.num_columns - 1), p, dedup=False, int_mode=int_mode
                    )
                    cols = [b.column(i) for i in range(b.num_columns - 1)]
                    yield pa.RecordBatch.from_arrays(
                        cols + [pa.array(shard), pa.array(ib), _idx_to_binary(idx)],
                        in_cols + ["__shard_id", "__ib", "__idx"],
                    )

            route_schema = T.StructType(
                list(df.schema.fields)
                + [
                    T.StructField("__shard_id", T.IntegerType()),
                    T.StructField("__ib", T.LongType()),
                    T.StructField("__idx", T.BinaryType()),
                ]
            )
            tuples = keyed.mapInArrow(index_fn, route_schema)
        if salt > 1:
            tuples = tuples.withColumn(
                "salt", F.pmod(F.xxhash64("__ib"), F.lit(salt)).cast("int")
            )
            states = self.states.withColumn(
                "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
            ).withColumn("salt", F.col("salt").cast("int"))
            gkeys = ["__shard_id", "salt"]
            states = states.withColumnRenamed("shard_id", "__shard_id")
        else:
            states = self.states.withColumnRenamed("shard_id", "__shard_id")
            gkeys = ["__shard_id"]

        k, bps = p.n_hash_buck, p.bps
        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField(output_col, T.BooleanType())]
        )

        def check(left: pa.Table, right: pa.Table) -> pa.Table:
            keep = left.select(in_cols)
            n = left.num_rows
            if n == 0:
                return keep.append_column(output_col, pa.array([], pa.bool_()))
            if right.num_rows == 0:  # untouched shard: all-zero buckets
                return keep.append_column(
                    output_col, pa.array(np.zeros(n, dtype=bool))
                )
            buckets = np.frombuffer(
                decompress_blob(right.column("state")[0].as_py()), dtype=np.uint8
            )
            shard_id = int(right.column("__shard_id")[0].as_py())
            ib_local = left.column("__ib").to_numpy(zero_copy_only=False) - shard_id * bps
            idx = _binary_to_idx(left.column("__idx"), k)
            byte_off, bitmask = _bit_parts(ib_local, idx, buckets.size)
            hit = ((buckets[byte_off] & bitmask) != 0).reshape(-1, k).all(axis=1)
            return keep.append_column(output_col, pa.array(hit))

        return (
            tuples.groupBy(*gkeys)
            .cogroup(states.groupBy(*gkeys))
            .applyInArrow(check, out_schema)
        )

    def semi_join(self, df: DataFrame, col: str) -> DataFrame:
        return self.contains(df, col, "__hit__").filter(F.col("__hit__")).drop("__hit__")

    def anti_join(self, df: DataFrame, col: str) -> DataFrame:
        return self.contains(df, col, "__hit__").filter(~F.col("__hit__")).drop("__hit__")

    # --- algebra ---------------------------------------------------------------
    def _merge(self, other: "ShardedBloom", op: str) -> "ShardedBloom":
        if self.params != other.params:
            raise MergeError("cannot merge sharded blooms with different parameters")
        from poppy_spark.spark.agg import compress_blob, decompress_blob

        # union-with-side-tag + per-shard vectorized combine — the same
        # kernel shape as _or_merge_states (round-3: replaces the per-row
        # itertuples loop over a two-sided join).  Within a side duplicate
        # shard rows OR first; across sides apply ``op``.  Intersection
        # semantics: a shard present on one side only ANDs with the other
        # side's implicit all-zero shard -> the row is dropped.
        a = self.states.withColumn("__src", F.lit(0))
        b = other.states.withColumn("__src", F.lit(1))
        both = a.unionByName(b)
        inner = op == "and"

        def combine(pdf: pd.DataFrame) -> pd.DataFrame:
            src = pdf["__src"].to_numpy()
            sides = []
            for s in (0, 1):
                blobs = [
                    np.frombuffer(decompress_blob(raw), dtype=np.uint8)
                    for raw in pdf["state"][src == s]
                ]
                if blobs:
                    sides.append(_reduce_blobs(blobs, "or"))
            if inner and len(sides) < 2:
                return pd.DataFrame(
                    {
                        "shard_id": pd.Series(dtype="int32"),
                        "state": pd.Series(dtype=object),
                        "n_rows": pd.Series(dtype="int64"),
                    }
                )
            acc = _reduce_blobs(sides, op)
            return pd.DataFrame(
                {
                    "shard_id": [int(pdf["shard_id"].iloc[0])],
                    "state": [compress_blob(acc.tobytes())],
                    "n_rows": [int(pdf["n_rows"].sum())],
                }
            )

        merged = both.groupBy("shard_id").applyInPandas(combine, _STATE_SCHEMA)
        return ShardedBloom(self.params, merged)

    def union(self, other: "ShardedBloom") -> "ShardedBloom":
        """Per-shard bitwise OR (poppy ``union_merge``, ``v2.rs:476-494``)."""
        return self._merge(other, "or")

    def intersection(self, other: "ShardedBloom") -> "ShardedBloom":
        """Per-shard bitwise AND (poppy ``intersection_merge``)."""
        return self._merge(other, "and")

    # --- estimates ---------------------------------------------------------------
    def count_estimate(self) -> int:
        """Sum of per-bucket truncated estimates (``v2.rs:575-588``) — the
        per-bucket sum decomposes exactly over contiguous shards, so this
        equals ``BloomV2.update_count()`` on the reassembled filter."""
        from poppy_spark.spark.agg import decompress_blob
        from poppy_spark.core.statekern import _sum_bucket_estimates, v2_bucket_ones

        n_hash = self.params.n_hash_buck

        @F.pandas_udf("decimal(38,0)")
        def shard_est(states: pd.Series) -> pd.Series:
            import decimal

            out = []
            for s in states:
                buckets = np.frombuffer(decompress_blob(s), dtype=np.uint8)
                nb = buckets.size // BUCKET_SIZE
                out.append(decimal.Decimal(_sum_bucket_estimates(v2_bucket_ones(buckets, nb), n_hash)))
            return pd.Series(out)

        row = self.states.agg(F.sum(shard_est(F.col("state"))).alias("est")).collect()[0]
        return int(row["est"] or 0)

    def n_rows(self) -> int:
        return int(self.states.agg(F.sum("n_rows")).collect()[0][0] or 0)

    @property
    def capacity(self) -> int:
        return self.params.capacity

    @property
    def fpp(self) -> float:
        return self.params.fpp

    def estimated_p(self) -> float:
        """Current estimated false-positive probability (poppy
        ``estimated_p``: from the count estimate and total bit size)."""
        from poppy_spark.core.params import estimate_p

        return estimate_p(
            max(self.count_estimate(), 1), self.params.n_buckets * BUCKET_BITS
        )

    def is_full(self) -> bool:
        return self.count_estimate() >= self.params.capacity

    def info(self) -> dict:
        """Metadata summary, mirroring ``BloomFilter.info()`` plus shard
        layout — the ``show`` verb for sharded filters."""
        return {
            "version": 2,
            "capacity": self.params.capacity,
            "fpp": self.params.fpp,
            "n_buckets": self.params.n_buckets,
            "n_hash_buck": self.params.n_hash_buck,
            "n_shards": self.params.n_shards,
            "buckets_per_shard": self.params.bps,
            "shard_bytes": self.params.bps * BUCKET_SIZE,
            "size_in_bytes": self.size_in_bytes(),
            "n_touched_shards": self.states.count(),
        }

    # --- export / persistence ------------------------------------------------------
    def size_in_bytes(self) -> int:
        """Uncompressed logical filter size (all shards)."""
        return self.params.n_buckets * BUCKET_SIZE

    def to_poppy_bytes(self, max_bytes: int = 1 << 30) -> bytes:
        """Reassemble the single-file poppy v2 filter — byte-identical to a
        one-node build with the same (capacity, fpp, OptLevel.NONE).

        Driver-side materialization: guarded by ``max_bytes`` because a
        sharded filter exists precisely to exceed single-process memory.
        """
        from poppy_spark.core.v2 import BloomV2
        from poppy_spark.spark.agg import decompress_blob

        p = self.params
        if self.size_in_bytes() > max_bytes:
            raise MemoryError(
                f"sharded filter is {self.size_in_bytes()} bytes uncompressed; "
                f"refusing driver-side reassembly past max_bytes={max_bytes}"
            )
        buckets = np.zeros(p.n_buckets * BUCKET_SIZE, dtype=np.uint8)
        for r in self.states.select("shard_id", "state").collect():
            lo = r["shard_id"] * p.bps * BUCKET_SIZE
            blob = np.frombuffer(decompress_blob(r["state"]), dtype=np.uint8)
            buckets[lo : lo + blob.size] = blob
        filt = BloomV2(
            p.capacity, p.fpp, p.n_hash_buck, p.n_buckets, 0, 0, buckets
        )
        filt.update_count()
        return filt.dumps()

    def save(self, directory: str) -> None:
        """Persist as parquet shard rows + a JSON params sidecar."""
        self.states.write.mode("overwrite").parquet(os.path.join(directory, "shards"))
        meta = {
            "capacity": self.params.capacity,
            "fpp": self.params.fpp,
            "n_buckets": self.params.n_buckets,
            "n_hash_buck": self.params.n_hash_buck,
            "n_shards": self.params.n_shards,
            "bps": self.params.bps,
        }
        spark = self.states.sparkSession
        spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(1).write.mode(
            "overwrite"
        ).json(os.path.join(directory, "meta"))

    @classmethod
    def from_poppy_bytes(
        cls,
        spark: SparkSession,
        raw: bytes,
        n_shards: int | None = None,
        target_shard_bytes: int = 64 << 20,
    ) -> "ShardedBloom":
        """Import an existing single-file poppy v2 filter (e.g. built by the
        Rust CLI) into the sharded representation — the migration path from
        the reference tooling.  Driver-side slicing: the input file must fit
        the driver once (it already does — it arrived as ``bytes``); from
        there on it lives as distributed shard rows.  OptLevel NONE only
        (the index cache does not decompose)."""
        from poppy_spark.core.v2 import BloomV2
        from poppy_spark.core.params import OptLevel
        from poppy_spark.spark.agg import compress_blob

        filt = BloomV2.loads(raw)
        if filt.opt != OptLevel.NONE:
            raise ValueError("only OptLevel NONE filters are shardable")
        total_bytes = filt.n_buckets * BUCKET_SIZE
        if n_shards is None:
            n_shards = max(1, math.ceil(total_bytes / target_shard_bytes))
        p = _Params.make(filt.capacity, filt.fpp, n_shards)
        if (p.n_buckets, p.n_hash_buck) != (filt.n_buckets, filt.n_hash_buck):
            raise ValueError(
                "filter params do not match NONE-level sizing; cannot shard"
            )
        rows = []
        for s in range(p.n_shards):
            lo = s * p.bps * BUCKET_SIZE
            hi = min((s + 1) * p.bps, p.n_buckets) * BUCKET_SIZE
            blob = filt.buckets[lo:hi]
            if blob.any():  # untouched shards stay implicit
                rows.append((s, compress_blob(blob.tobytes()), 0))
        states = spark.createDataFrame(rows or [], _STATE_SCHEMA)
        return cls(p, states)

    @classmethod
    def load(cls, spark: SparkSession, directory: str) -> "ShardedBloom":
        meta_raw = spark.read.json(os.path.join(directory, "meta")).collect()[0]["meta"]
        m = json.loads(meta_raw)
        p = _Params(
            m["capacity"], m["fpp"], m["n_buckets"], m["n_hash_buck"],
            m["n_shards"], m["bps"],
        )
        return cls(p, spark.read.parquet(os.path.join(directory, "shards")))


def _reduce_blobs(blobs: list, op: str) -> np.ndarray:
    """Elementwise OR/AND fold of equal-length uint8 arrays (vectorized)."""
    acc = blobs[0].copy()
    f = np.bitwise_or if op == "or" else np.bitwise_and
    for v in blobs[1:]:
        f(acc, v, out=acc)
    return acc


def _or_merge_states(states: DataFrame) -> DataFrame:
    """Collapse duplicate shard rows (appended deltas) by bitwise OR."""
    from poppy_spark.spark.agg import compress_blob, decompress_blob

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = _reduce_blobs(
            [np.frombuffer(decompress_blob(raw), dtype=np.uint8) for raw in pdf["state"]],
            "or",
        )
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "state": [compress_blob(acc.tobytes())],
                "n_rows": [int(pdf["n_rows"].sum())],
            }
        )

    return states.groupBy("shard_id").applyInPandas(combine, _STATE_SCHEMA)


class ShardedBloomStream:
    """Structured-Streaming sink for a sharded filter: each micro-batch
    appends its shard DELTAS (only touched shards, lz4) to a parquet table;
    readers OR-merge duplicate shard rows on load.  This is the incremental
    shape for a continuously-growing 10^12-key membership filter — no batch
    ever rewrites existing state, and compaction is an idempotent
    read-merge-overwrite.

    Use as ``foreachBatch``::

        sink = ShardedBloomStream("/data/turns_bloom", capacity=10**12)
        q = stream.writeStream.foreachBatch(sink).start()
        ...
        filt = sink.current(spark)   # a ShardedBloom over the merged states
    """

    def __init__(
        self,
        directory: str,
        capacity: int,
        fpp: float = 0.001,
        n_shards: int | None = None,
        target_shard_bytes: int = 64 << 20,
        col: str = "value",
    ):
        total_buckets = math.ceil(capacity / cap_from_bit_size(BUCKET_BITS, fpp))
        if n_shards is None:
            n_shards = max(1, math.ceil(total_buckets * BUCKET_SIZE / target_shard_bytes))
        self.params = _Params.make(capacity, fpp, n_shards)
        self.dir = directory
        self.col = col
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "params.json"), "w") as f:
            json.dump(
                {
                    "capacity": self.params.capacity,
                    "fpp": self.params.fpp,
                    "n_shards": self.params.n_shards,
                },
                f,
            )

    @property
    def _shards_path(self) -> str:
        return os.path.join(self.dir, "shards")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = build_sharded_bloom(
            batch_df,
            self.col,
            self.params.capacity,
            self.params.fpp,
            n_shards=self.params.n_shards,
            persist=False,
        )
        delta.states.write.mode("append").parquet(self._shards_path)

    def current(self, spark: SparkSession) -> ShardedBloom:
        """The merged filter over everything appended so far."""
        states = _or_merge_states(spark.read.parquet(self._shards_path))
        return ShardedBloom(self.params, states)

    def compact(self, spark: SparkSession) -> None:
        """Rewrite appended deltas as one row per shard — safe to run while
        the stream keeps appending.

        The old overwrite-in-place version could silently drop a shard delta
        appended by a concurrent ``foreachBatch`` between its read and its
        overwrite (round-2 advice finding).  This version snapshots the part
        files present NOW, merges exactly those, moves the merged part files
        in alongside, and deletes only the consumed inputs — a concurrent
        append lands as a new file that is never read nor deleted here.
        Readers racing the swap may momentarily see a consumed delta AND its
        merged replacement; the OR-merge on read makes that harmless for the
        filter bits (``n_rows`` can transiently double-count — it is a
        diagnostic, not part of the membership contract).
        """
        import glob
        import shutil
        import uuid

        consumed = sorted(glob.glob(os.path.join(self._shards_path, "*.parquet")))
        if not consumed:
            return
        merged = _or_merge_states(spark.read.parquet(*consumed))
        tmp = os.path.join(self.dir, f".compact-{uuid.uuid4().hex}")
        try:
            merged.write.mode("overwrite").parquet(tmp)
            moved = []
            for i, part in enumerate(sorted(glob.glob(os.path.join(tmp, "*.parquet")))):
                dst = os.path.join(
                    self._shards_path, f"compact-{uuid.uuid4().hex}-{i:04d}.parquet"
                )
                os.replace(part, dst)
                moved.append(dst)
            if not moved:  # nothing written: leave inputs untouched
                return
            for part in consumed:
                if os.path.exists(part):
                    os.remove(part)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def estimate_distinct_keys(
    df: DataFrame, col: str, p: int = 14, int_keys: str = "string"
) -> int:
    """Distinct-key estimate for Bloom sizing: one states-only HLL pass over
    the SAME canonicalized key expression the Bloom build hashes, so the
    estimate counts exactly what the filter will insert.  Relative error is
    ~``1.04 / sqrt(2^p)`` (~0.8% at the default p=14, 16 KB of state)."""
    from poppy_spark.sketches import HllSketch
    from poppy_spark.spark.agg import build_sketch

    return int(build_sketch(df, col, HllSketch.factory(p), int_keys=int_keys).result())


def build_sharded_bloom(
    df: DataFrame,
    col: str,
    capacity: int | str,
    fpp: float = 0.001,
    n_shards: int | None = None,
    target_shard_bytes: int = 64 << 20,
    persist: bool = True,
    int_keys: str = "string",
    auto_headroom: float = 0.05,
) -> ShardedBloom:
    """Distributed build of a bucket-range-sharded poppy v2 filter.

    ``n_shards`` defaults to whatever keeps a shard near
    ``target_shard_bytes`` (64 MB — comfortably inside one task while giving
    a 2 TB filter ~32k-way spread).  ``persist=True`` caches the shard
    states (they are the reusable product; recomputing them re-runs the
    whole build).

    ``capacity="auto"`` sizes the filter from the data itself: one cheap
    states-only HLL pass (:func:`estimate_distinct_keys`) estimates the
    distinct-key count, padded by ``auto_headroom`` plus 3x the HLL's own
    relative error — at 10^12 keys nobody knows the distinct count a
    priori, and undersizing blows the FP bound while 2x oversizing wastes
    half the cluster's filter memory.  Costs one extra scan of the key
    column (shuffles only 16 KB HLL states).
    """
    from poppy_spark.spark.agg import _as_key, compress_blob

    if capacity == "auto":
        est = estimate_distinct_keys(df, col, int_keys=int_keys)
        pad = auto_headroom + 3 * 1.04 / math.sqrt(2**14)
        capacity = max(1024, math.ceil(est * (1.0 + pad)))
    elif not isinstance(capacity, int):
        raise TypeError(f"capacity must be an int or 'auto', got {capacity!r}")

    total_buckets = math.ceil(capacity / cap_from_bit_size(BUCKET_BITS, fpp))
    if n_shards is None:
        n_shards = max(1, math.ceil(total_buckets * BUCKET_SIZE / target_shard_bytes))
    p = _Params.make(capacity, fpp, n_shards)

    keys = _spread_low_split(df.select(_as_key(df, col, int_keys).alias("__key")))
    int_mode = _INT_MODE[int_keys]

    def index_fn(batches):
        for b in batches:
            shard, ib, idx, _ = _route_batch(b.column(0), p, dedup=True, int_mode=int_mode)
            yield pa.RecordBatch.from_arrays(
                [pa.array(shard), pa.array(ib), _idx_to_binary(idx)],
                ["shard_id", "ib", "idx"],
            )

    # n_rows below counts deduped index tuples (diagnostic), not input rows
    tuples = keys.mapInArrow(index_fn, "shard_id int, ib bigint, idx binary")

    k, bps, n_buckets = p.n_hash_buck, p.bps, p.n_buckets

    def build_shards(batches):
        shards: dict[int, np.ndarray] = {}
        rows: dict[int, int] = {}
        for b in batches:
            shard = b.column(0).to_numpy(zero_copy_only=False)
            ib = b.column(1).to_numpy(zero_copy_only=False)
            idx = _binary_to_idx(b.column(2), k)
            for s in np.unique(shard):
                s = int(s)
                arr = shards.get(s)
                if arr is None:
                    nb = min(bps, n_buckets - s * bps)
                    arr = shards[s] = np.zeros(nb * BUCKET_SIZE, dtype=np.uint8)
                    rows[s] = 0
                m = shard == s
                _or_bits_into(arr, ib[m] - s * bps, idx[m])
                rows[s] += int(m.sum())
        for s, arr in shards.items():
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([s], pa.int32()),
                    pa.array([compress_blob(arr.tobytes())], pa.binary()),
                    pa.array([rows[s]], pa.int64()),
                ],
                ["shard_id", "state", "n_rows"],
            )

    states = (
        tuples.repartition(p.n_shards, "shard_id")
        .mapInArrow(build_shards, _STATE_SCHEMA)
    )
    if persist:
        states = states.persist()
    return ShardedBloom(p, states)


class GroupedShardedBloom:
    """Per-GROUP bucket-range-sharded poppy v2 filters: one logical filter
    per group value, each physically split into bucket-range shards, all
    held as rows of one ``(group, shard_id, state, n_rows)`` DataFrame.

    This closes the shape ``build_sketch_grouped``'s memory guard points
    at: a grouped build whose per-group filter is too big for
    groups-seen x state-bytes per task.  Here the build shuffles ~(12+2k)-
    byte index tuples keyed by (group, shard) and each task materializes
    ONE (group, shard) slice at a time (``applyInArrow``), so task memory
    is a single shard regardless of group count or filter size; the probe
    cogroups on (group, shard), so each shard state crosses the wire once
    per batch.

    All groups share one sizing (``capacity`` / ``fpp`` per group) — the
    params ARE the merge-compatibility contract, exactly like
    ``has_same_params`` gates poppy unions (``poppy/src/bloom.rs``).
    """

    def __init__(self, params: _Params, group_col: str, states: DataFrame):
        self.params = params
        self.group_col = group_col
        self.states = states

    def contains(
        self,
        df: DataFrame,
        col: str,
        output_col: str = "hit",
        int_keys: str = "string",
    ) -> DataFrame:
        """Append ``output_col``: is ``col`` a member of ITS OWN row's
        group filter?  Groups never built probe all-False (nothing was
        inserted).  Single shuffle, columns carried through the cogroup —
        no join-back."""
        import pyspark.sql.types as T

        from poppy_spark.spark.agg import _as_key, decompress_blob

        p = self.params
        g = self.group_col
        int_mode = _INT_MODE[int_keys]
        in_cols = list(df.columns)
        keyed = df.select("*", _as_key(df, col, int_keys).alias("__key"))

        def index_fn(batches):
            for b in batches:
                shard, ib, idx, _ = _route_batch(
                    b.column(b.num_columns - 1), p, dedup=False, int_mode=int_mode
                )
                cols = [b.column(i) for i in range(b.num_columns - 1)]
                yield pa.RecordBatch.from_arrays(
                    cols + [pa.array(shard), pa.array(ib), _idx_to_binary(idx)],
                    in_cols + ["__shard_id", "__ib", "__idx"],
                )

        route_schema = T.StructType(
            list(df.schema.fields)
            + [
                T.StructField("__shard_id", T.IntegerType()),
                T.StructField("__ib", T.LongType()),
                T.StructField("__idx", T.BinaryType()),
            ]
        )
        tuples = keyed.mapInArrow(index_fn, route_schema)
        states = self.states.withColumnRenamed("shard_id", "__shard_id")
        k, bps = p.n_hash_buck, p.bps
        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField(output_col, T.BooleanType())]
        )

        def check(left: pa.Table, right: pa.Table) -> pa.Table:
            keep = left.select(in_cols)
            n = left.num_rows
            if n == 0:
                return keep.append_column(output_col, pa.array([], pa.bool_()))
            if right.num_rows == 0:  # group never built or shard untouched
                return keep.append_column(output_col, pa.array(np.zeros(n, dtype=bool)))
            buckets = np.frombuffer(
                decompress_blob(right.column("state")[0].as_py()), dtype=np.uint8
            )
            shard_id = int(right.column("__shard_id")[0].as_py())
            ib_local = left.column("__ib").to_numpy(zero_copy_only=False) - shard_id * bps
            idx = _binary_to_idx(left.column("__idx"), k)
            byte_off, bitmask = _bit_parts(ib_local, idx, buckets.size)
            hit = ((buckets[byte_off] & bitmask) != 0).reshape(-1, k).all(axis=1)
            return keep.append_column(output_col, pa.array(hit))

        return (
            tuples.groupBy(g, "__shard_id")
            .cogroup(states.groupBy(g, "__shard_id"))
            .applyInArrow(check, out_schema)
        )

    def semi_join(self, df: DataFrame, col: str) -> DataFrame:
        return self.contains(df, col, "__hit__").filter(F.col("__hit__")).drop("__hit__")

    def union(self, other: "GroupedShardedBloom") -> "GroupedShardedBloom":
        """Per-(group, shard) bitwise OR — poppy ``union_merge`` semantics
        applied independently to every group's filter; groups present on
        one side only pass through unchanged (OR with all-zero).  Same
        vectorized two-sided combine as ``ShardedBloom._merge``, keyed by
        (group, shard)."""
        if self.params != other.params or self.group_col != other.group_col:
            raise MergeError(
                "cannot merge grouped sharded blooms with different parameters "
                "or group columns"
            )
        import pyspark.sql.types as T

        from poppy_spark.spark.agg import compress_blob, decompress_blob

        g = self.group_col
        a = self.states.withColumn("__src", F.lit(0))
        b = other.states.withColumn("__src", F.lit(1))
        both = a.unionByName(b)
        gfield = [f for f in self.states.schema.fields if f.name == g][0]
        out_schema = T.StructType(
            [
                gfield,
                T.StructField("shard_id", T.IntegerType()),
                T.StructField("state", T.BinaryType()),
                T.StructField("n_rows", T.LongType()),
            ]
        )

        def combine(pdf: pd.DataFrame) -> pd.DataFrame:
            blobs = [
                np.frombuffer(decompress_blob(raw), dtype=np.uint8)
                for raw in pdf["state"]
            ]
            acc = _reduce_blobs(blobs, "or")
            return pd.DataFrame(
                {
                    g: [pdf[g].iloc[0]],
                    "shard_id": [int(pdf["shard_id"].iloc[0])],
                    "state": [compress_blob(acc.tobytes())],
                    "n_rows": [int(pdf["n_rows"].sum())],
                }
            )

        merged = both.groupBy(g, "shard_id").applyInPandas(combine, out_schema)
        return GroupedShardedBloom(self.params, g, merged)

    def intersection(self, other: "GroupedShardedBloom") -> "GroupedShardedBloom":
        """Per-(group, shard) bitwise AND — poppy ``intersection_merge``
        (``v2.rs:628-646``) applied independently to every group's filter.
        A (group, shard) present on one side only ANDs with the implicit
        all-zero shard and is dropped; a GROUP present on one side only
        therefore vanishes entirely — its intersection is the empty
        filter, which probes all-False exactly like a never-built group.
        ``n_rows`` is reset to 0 (insert counts do not survive an AND;
        poppy re-estimates — ``reassemble_group``'s ``update_count`` and
        ``count_estimates`` both recompute from the bits)."""
        if self.params != other.params or self.group_col != other.group_col:
            raise MergeError(
                "cannot intersect grouped sharded blooms with different "
                "parameters or group columns"
            )
        import pyspark.sql.types as T

        from poppy_spark.spark.agg import compress_blob, decompress_blob

        g = self.group_col
        a = self.states.withColumn("__src", F.lit(0))
        b = other.states.withColumn("__src", F.lit(1))
        both = a.unionByName(b)
        gfield = [f for f in self.states.schema.fields if f.name == g][0]
        out_schema = T.StructType(
            [
                gfield,
                T.StructField("shard_id", T.IntegerType()),
                T.StructField("state", T.BinaryType()),
                T.StructField("n_rows", T.LongType()),
            ]
        )

        def combine(pdf: pd.DataFrame) -> pd.DataFrame:
            src = pdf["__src"].to_numpy()
            sides = []
            for s in (0, 1):
                blobs = [
                    np.frombuffer(decompress_blob(raw), dtype=np.uint8)
                    for raw in pdf["state"][src == s]
                ]
                if blobs:
                    sides.append(_reduce_blobs(blobs, "or"))
            if len(sides) < 2:  # one-sided -> AND with zeros -> drop
                return pd.DataFrame(
                    {
                        g: pd.Series(dtype=object),
                        "shard_id": pd.Series(dtype="int32"),
                        "state": pd.Series(dtype=object),
                        "n_rows": pd.Series(dtype="int64"),
                    }
                )
            acc = _reduce_blobs(sides, "and")
            return pd.DataFrame(
                {
                    g: [pdf[g].iloc[0]],
                    "shard_id": [int(pdf["shard_id"].iloc[0])],
                    "state": [compress_blob(acc.tobytes())],
                    "n_rows": [0],
                }
            )

        merged = both.groupBy(g, "shard_id").applyInPandas(combine, out_schema)
        return GroupedShardedBloom(self.params, g, merged)

    def count_common(self, other: "GroupedShardedBloom") -> DataFrame:
        """Per-group common-entry estimates ``(group, estimate)`` — poppy
        ``count_common_entries`` (``bloom.rs:343-356``): the count-estimate
        formula on popcount(AND), decomposed per (group, shard) and summed
        per group.  Equals ``BloomV2.count_common_entries`` on each group's
        two reassembled filters (empty buckets estimate 0, so shards or
        groups touched on one side only contribute nothing; groups with no
        commonly-touched shard are omitted — their estimate is 0).  One
        cogrouped AND+popcount pass, states cross the wire once; no
        intersection filter is materialized."""
        if self.params != other.params or self.group_col != other.group_col:
            raise MergeError(
                "cannot compare grouped sharded blooms with different "
                "parameters or group columns"
            )
        import pyspark.sql.types as T

        from poppy_spark.core.statekern import _sum_bucket_estimates, v2_bucket_ones
        from poppy_spark.spark.agg import decompress_blob

        g = self.group_col
        n_hash = self.params.n_hash_buck
        a = self.states.withColumn("__src", F.lit(0))
        b = other.states.withColumn("__src", F.lit(1))
        both = a.unionByName(b)
        gfield = [f for f in self.states.schema.fields if f.name == g][0]
        part_schema = T.StructType(
            [gfield, T.StructField("partial", T.DecimalType(38, 0))]
        )

        def common(pdf: pd.DataFrame) -> pd.DataFrame:
            import decimal

            src = pdf["__src"].to_numpy()
            sides = []
            for s in (0, 1):
                blobs = [
                    np.frombuffer(decompress_blob(raw), dtype=np.uint8)
                    for raw in pdf["state"][src == s]
                ]
                if blobs:
                    sides.append(_reduce_blobs(blobs, "or"))
            if len(sides) < 2:
                return pd.DataFrame({g: pd.Series(dtype=object), "partial": []})
            acc = _reduce_blobs(sides, "and")
            nb = acc.size // BUCKET_SIZE
            est = _sum_bucket_estimates(v2_bucket_ones(acc, nb), n_hash)
            return pd.DataFrame({g: [pdf[g].iloc[0]], "partial": [decimal.Decimal(est)]})

        partials = both.groupBy(g, "shard_id").applyInPandas(common, part_schema)
        return partials.groupBy(g).agg(
            F.sum("partial").cast("long").alias("estimate")
        )

    def count_estimates(self) -> DataFrame:
        """Per-group cardinality estimates ``(group, estimate)``: the same
        per-bucket truncated sum as ``ShardedBloom.count_estimate``
        (``v2.rs:575-588``), decomposed per (group, shard) and summed per
        group — equal to ``BloomV2.update_count()`` on each group's
        reassembled filter.  Stays distributed: one pandas UDF over state
        rows + one grouped sum."""
        from poppy_spark.core.statekern import _sum_bucket_estimates, v2_bucket_ones
        from poppy_spark.spark.agg import decompress_blob

        n_hash = self.params.n_hash_buck

        @F.pandas_udf("decimal(38,0)")
        def shard_est(states: pd.Series) -> pd.Series:
            import decimal

            out = []
            for raw in states:
                buckets = np.frombuffer(decompress_blob(raw), dtype=np.uint8)
                nb = buckets.size // BUCKET_SIZE
                out.append(
                    decimal.Decimal(
                        _sum_bucket_estimates(v2_bucket_ones(buckets, nb), n_hash)
                    )
                )
            return pd.Series(out)

        return self.states.groupBy(self.group_col).agg(
            F.sum(shard_est(F.col("state"))).cast("long").alias("estimate")
        )

    def save(self, directory: str) -> None:
        """Persist as parquet state rows (partitioned by the group column,
        so single-group reads prune at the scan) + a JSON params sidecar
        carrying the group column name — same layout family as
        ``ShardedBloom.save``."""
        self.states.write.mode("overwrite").partitionBy(self.group_col).parquet(
            os.path.join(directory, "shards")
        )
        meta = {
            "capacity": self.params.capacity,
            "fpp": self.params.fpp,
            "n_buckets": self.params.n_buckets,
            "n_hash_buck": self.params.n_hash_buck,
            "n_shards": self.params.n_shards,
            "bps": self.params.bps,
            "group_col": self.group_col,
            # partition-column values round-trip through directory names;
            # record the true dataType so load() can undo Spark's partition
            # type inference (string groups that look numeric come back int
            # otherwise, breaking union/probe against freshly built states)
            "group_type": self.states.schema[self.group_col].dataType.json(),
        }
        spark = self.states.sparkSession
        spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
            1
        ).write.mode("overwrite").json(os.path.join(directory, "meta"))

    @classmethod
    def load(cls, spark: SparkSession, directory: str) -> "GroupedShardedBloom":
        meta_raw = spark.read.json(os.path.join(directory, "meta")).collect()[0]["meta"]
        m = json.loads(meta_raw)
        p = _Params(
            m["capacity"], m["fpp"], m["n_buckets"], m["n_hash_buck"],
            m["n_shards"], m["bps"],
        )
        # read the partition column as string (inference off), then cast to
        # the saved dataType: "0123"-style string groups keep their exact
        # bytes and numeric groups come back with their original type, so
        # loaded filters union/probe against freshly built states unchanged
        conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        prev = spark.conf.get(conf_key, "true")
        spark.conf.set(conf_key, "false")
        try:
            states = spark.read.parquet(os.path.join(directory, "shards"))
        finally:
            spark.conf.set(conf_key, prev)
        if "group_type" in m and m["group_type"]:
            from pyspark.sql.types import _parse_datatype_json_string

            gt = _parse_datatype_json_string(m["group_type"])
            states = states.withColumn(
                m["group_col"], F.col(m["group_col"]).cast(gt)
            )
        return cls(p, m["group_col"], states)

    def reassemble_group(self, group_value) -> bytes:
        """One group's shards OR'd into a complete poppy v2 file (bytes).
        Collect-based: intended for tests/export of a single group."""
        from poppy_spark.core.v2 import BloomV2
        from poppy_spark.spark.agg import decompress_blob

        p = self.params
        rows = self.states.filter(F.col(self.group_col) == group_value).collect()
        buckets = np.zeros(p.n_buckets * BUCKET_SIZE, dtype=np.uint8)
        for r in rows:
            lo = int(r["shard_id"]) * p.bps * BUCKET_SIZE
            v = np.frombuffer(decompress_blob(bytes(r["state"])), dtype=np.uint8)
            buckets[lo : lo + v.size] = v
        filt = BloomV2(p.capacity, p.fpp, p.n_hash_buck, p.n_buckets, 0, 0, buckets)
        filt.update_count()
        return filt.dumps()


def build_sharded_bloom_grouped(
    df: DataFrame,
    col: str,
    group_col: str,
    capacity: int,
    fpp: float = 0.001,
    n_shards: int | None = None,
    target_shard_bytes: int = 64 << 20,
    persist: bool = True,
    int_keys: str = "string",
) -> GroupedShardedBloom:
    """Distributed build of one bucket-range-sharded v2 filter PER GROUP,
    sized ``capacity``/``fpp`` each.  Shuffle carries index tuples keyed
    by (group, shard); each task materializes one (group, shard) slice at
    a time, so task memory = one shard's bytes regardless of group count."""
    import pyspark.sql.types as T

    from poppy_spark.spark.agg import _as_key, compress_blob

    total_buckets = math.ceil(capacity / cap_from_bit_size(BUCKET_BITS, fpp))
    if n_shards is None:
        n_shards = max(1, math.ceil(total_buckets * BUCKET_SIZE / target_shard_bytes))
    p = _Params.make(capacity, fpp, n_shards)
    int_mode = _INT_MODE[int_keys]

    gfield = df.schema[group_col]
    keyed = _spread_low_split(
        df.select(F.col(group_col), _as_key(df, col, int_keys).alias("__key"))
    )

    def index_fn(batches):
        for b in batches:
            shard, ib, idx, _ = _route_batch(b.column(1), p, dedup=False, int_mode=int_mode)
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pa.array(shard), pa.array(ib), _idx_to_binary(idx)],
                [group_col, "shard_id", "ib", "idx"],
            )

    route_schema = T.StructType(
        [
            gfield,
            T.StructField("shard_id", T.IntegerType()),
            T.StructField("ib", T.LongType()),
            T.StructField("idx", T.BinaryType()),
        ]
    )
    tuples = keyed.mapInArrow(index_fn, route_schema)
    k, bps, n_buckets = p.n_hash_buck, p.bps, p.n_buckets
    state_schema = T.StructType(
        [
            gfield,
            T.StructField("shard_id", T.IntegerType()),
            T.StructField("state", T.BinaryType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )

    def build_fn(tbl: pa.Table) -> pa.Table:
        s = int(tbl.column("shard_id")[0].as_py())
        nb = min(bps, n_buckets - s * bps)
        arr = np.zeros(nb * BUCKET_SIZE, dtype=np.uint8)
        ib = tbl.column("ib").to_numpy(zero_copy_only=False)
        idx = _binary_to_idx(tbl.column("idx"), k)
        _or_bits_into(arr, ib - s * bps, idx)
        return pa.Table.from_arrays(
            [
                tbl.column(group_col).slice(0, 1),
                pa.array([s], pa.int32()),
                pa.array([compress_blob(arr.tobytes())], pa.binary()),
                pa.array([tbl.num_rows], pa.int64()),
            ],
            schema=pa.schema(
                [
                    tbl.schema.field(group_col),
                    pa.field("shard_id", pa.int32()),
                    pa.field("state", pa.binary()),
                    pa.field("n_rows", pa.int64()),
                ]
            ),
        )

    states = tuples.groupBy(group_col, "shard_id").applyInArrow(build_fn, state_schema)
    if persist:
        states = states.persist()
    return GroupedShardedBloom(p, group_col, states)
