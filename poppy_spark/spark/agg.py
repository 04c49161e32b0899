"""Two-phase mergeable-sketch aggregation over Spark DataFrames.

This is the distributed shape of poppy's ``parallel_insert`` (clone filter per
thread, insert, fold union — ``poppy/src/bin/poppy.rs:232-282``), re-expressed
Spark-first:

* **update**: ``df.mapInArrow`` builds ONE sketch state per input partition
  (Arrow batches -> numpy kernels; no per-row Python, no row shuffle);
* **merge**: a bounded-fan-in tree of ``groupBy().applyInPandas`` stages ORs
  the partial states together (shuffle volume = n_partitions x state_size,
  never the data).

Why not a pandas GROUPED_AGG UDF: Spark's grouped-agg pandas UDFs do not
support partial aggregation — they shuffle raw rows.  ``mapInArrow`` +
state-merge keeps the combine map-side, which is the only shape that survives
a 10^12-row table.

Grouped variant: phase 1 emits one state per (partition x group) — shuffling
sketch states instead of rows; phase 2 merges per group.  Skewed group keys
therefore cost one state per partition, not one shuffle partition of rows.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from poppy_spark.sketches.base import Sketch

__all__ = [
    "build_sketch",
    "build_sketch_df",
    "build_sketch_grouped",
    "merge_states_tree",
    "repartition_salted",
    "sketch_value_column",
]


def repartition_salted(
    df: DataFrame, key: str, partitions: int, salt_buckets: int = 16
) -> DataFrame:
    """Repartition by ``hash(key, salt)`` so one hot key (a skewed
    conversation holding a large share of all turns) spreads over
    ``salt_buckets`` partitions instead of melting one task.

    Sketch updates are order- and placement-independent (the merge is
    commutative/associative), so salting is always safe here — unlike joins,
    no de-salting step is needed.
    """
    salt = F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt_buckets))
    return df.repartition(partitions, F.col(key), salt)


#: envelope magics for compressed in-flight states.  A partial state from
#: one partition of a large filter is mostly zero pages (a 9M-key Bloom is a
#: 16 MB state but one partition sets ~1% of its bits), so compression cuts
#: shuffle volume ~10x.  LZ4 (pyarrow codec, GB/s-class) is preferred; zlib
#: is kept for reading older envelopes.  Checkpoint and final states stay
#: raw (poppy-compatible); only shuffle-internal rows wrap.
_Z_MAGIC = b"PSZ1"
_L4_MAGIC = b"PSL4"


def compress_blob(raw: bytes) -> bytes:
    """LZ4-wrap an in-flight state blob (mostly-zero pages compress ~10x)."""
    import struct

    import pyarrow as _pa

    comp = _pa.Codec("lz4").compress(raw).to_pybytes()
    return _L4_MAGIC + struct.pack("<Q", len(raw)) + comp


def decompress_blob(raw: bytes) -> bytes:
    """Inverse of :func:`compress_blob`; passes unwrapped blobs through."""
    raw = bytes(raw)
    if raw[:4] == _L4_MAGIC:
        import struct

        import pyarrow as _pa

        (orig_len,) = struct.unpack_from("<Q", raw, 4)
        return _pa.Codec("lz4").decompress(raw[12:], orig_len).to_pybytes()
    if raw[:4] == _Z_MAGIC:
        import zlib

        return zlib.decompress(raw[4:])
    return raw


def _z_dumps(sk: Sketch) -> bytes:
    return compress_blob(sk.dumps())


def _z_loads(cls: type, raw: bytes) -> Sketch:
    return cls.loads(decompress_blob(raw))


def _update_fn(
    factory: Callable[[], Sketch],
    col_idx: int = 0,
    compress: bool = True,
    int_keys: str = "string",
):
    def update(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        sk = factory()
        sk.int_keys = int_keys
        n = 0
        for batch in batches:
            sk.update_arrow(batch.column(col_idx))
            n += batch.num_rows
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        payload = _z_dumps(sk) if compress else sk.dumps()
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], type=pa.int64()),
                pa.array([payload], type=pa.binary()),
                pa.array([n], type=pa.int64()),
            ],
            ["pid", "state", "n_rows"],
        )

    return update


def _merge_pdf(factory: Callable[[], Sketch], final: bool = False):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        cls = type(factory())
        sk = None
        for raw in pdf["state"]:
            part = _z_loads(cls, raw)
            if sk is None:
                sk = part
            else:
                sk.merge(part)
        if final:
            sk.finalize_merge()
        return pd.DataFrame(
            {
                "pid": [int(pdf["pid"].min())],
                "state": [sk.dumps() if final else _z_dumps(sk)],
                "n_rows": [int(pdf["n_rows"].sum())],
            }
        )

    return merge


_STATES_SCHEMA = "pid bigint, state binary, n_rows bigint"

#: Spark types whose values feed hash-based sketches as utf-8 strings.  Keys
#: are canonicalized with CAST(.. AS STRING) so that build and probe always
#: hash identical bytes; binary/string columns pass through untouched.
_TEXTUAL = ("string", "binary")


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _as_key(df: DataFrame, col: str | Column, int_keys: str = "string") -> Column:
    """Canonicalize a key column for poppy-compatible hashing.

    ``int_keys="string"`` (default): integer columns hash as their decimal
    string — simple, but NOT byte-compatible with a Rust-built filter over
    the same numeric keys.  ``int_keys="le8"``: integers pass through as
    bigint and hash as fixed 8-byte little-endian byte slices, matching Rust
    ``insert_bytes(&k.to_le_bytes())`` (``poppy/src/hash.rs:52-63``).
    ``int_keys="typed"``: integers hash through the full wyhash of their LE
    bytes, matching Rust's typed-key blanket impl ``insert(&k)``
    (``poppy/src/hash.rs:43-50`` + ``v2.rs:77-84``; v2 only).  Build and
    probe must use the same mode or membership breaks.
    """
    c = F.col(col) if isinstance(col, str) else col
    try:
        dt = df.select(c).schema[0].dataType.simpleString()
    except Exception:
        dt = ""
    if dt in _TEXTUAL:
        return c
    if int_keys in ("le8", "typed"):
        if dt in _INTEGRAL:
            return c.cast("bigint")
        raise TypeError(
            f"int_keys='{int_keys}' requires an integral column, got {dt or '?'}"
        )
    return c.cast("string")


def _key_expr(
    df: DataFrame,
    col: str | Column,
    factory: Callable[[], Sketch],
    int_keys: str = "string",
) -> Column:
    """Pick the cheapest sound key representation for the sketch: sketches
    that accept any 64-bit hash get JVM-side xxhash64 (8 bytes/row across the
    JVM->Python boundary instead of the raw text); poppy-compatible sketches
    need the raw bytes."""
    if getattr(factory(), "prehash_jvm", False):
        return F.xxhash64(_as_key(df, col))
    return _as_key(df, col, int_keys)


def _auto_strategy(
    sk0: Sketch, df: DataFrame, repartition: int | None
) -> str:
    """states-vs-sharded cost model (the engine's one non-Catalyst planning
    decision, since Catalyst cannot see inside state blobs): with a big v2
    NONE filter over many partitions, shipping one filter-sized state per
    partition dwarfs shipping ~(12+2k)-byte index tuples per key."""
    filt = getattr(sk0, "filter", None)
    if (
        filt is None
        or getattr(filt, "version", None) != 2
        or int(getattr(filt._inner, "opt", 1)) != 0
    ):
        return "states"
    state_bytes = filt.size_in_bytes
    state_bytes = state_bytes() if callable(state_bytes) else state_bytes
    if state_bytes < (8 << 20):
        # below ~8 MB the byte model is noise: the sharded pipeline's two
        # extra shuffle stages cost more than shipping small states ever can
        return "states"
    n_parts = repartition or max(
        df.rdd.getNumPartitions(),
        df.sparkSession.sparkContext.defaultParallelism,
    )
    k_ = filt._inner.n_hash_buck
    # rows unknown pre-scan; capacity is the sizing proxy (callers size
    # capacity at the expected key count)
    tuple_bytes = filt.capacity * (12 + 2 * k_)
    return "sharded" if state_bytes * n_parts > 4 * tuple_bytes else "states"


def _reassemble_states_df(sb) -> DataFrame:
    """Collapse a ShardedBloom's shard rows into the one-row
    ``(pid, state, n_rows)`` frame the classic build emits — executor-side,
    so the full filter bytes exist in exactly one task and never on the
    driver.  The single task must hold the whole filter: inherent to the
    one-state contract of ``build_sketch_df`` (callers needing filters past
    one worker keep the ShardedBloom itself)."""
    import numpy as np

    from poppy_spark.core.statekern import BUCKET_SIZE

    p = sb.params

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        from poppy_spark.core.v2 import BloomV2

        buckets = np.zeros(p.n_buckets * BUCKET_SIZE, dtype=np.uint8)
        for sid, blob in zip(pdf["shard_id"], pdf["state"]):
            lo = int(sid) * p.bps * BUCKET_SIZE
            v = np.frombuffer(decompress_blob(blob), dtype=np.uint8)
            buckets[lo : lo + v.size] = v
        filt = BloomV2(p.capacity, p.fpp, p.n_hash_buck, p.n_buckets, 0, 0, buckets)
        filt.update_count()
        # a BloomSketch state IS the poppy v2 file, so the assembled filter's
        # bytes are directly loadable by the sketch class downstream
        return pd.DataFrame(
            {
                "pid": [0],
                "state": [filt.dumps()],
                "n_rows": [int(pdf["n_rows"].sum())],
            }
        )

    return sb.states.groupBy(F.lit(0).alias("__g")).applyInPandas(
        assemble, _STATES_SCHEMA
    )


def build_sketch_df(
    df: DataFrame,
    col: str,
    factory: Callable[[], Sketch],
    repartition: int | None = None,
    merge_fanout: int = 8,
    int_keys: str = "string",
    strategy: str = "auto",
) -> DataFrame:
    """Distributed sketch build returning a 1-row DataFrame
    ``(pid, state binary, n_rows)`` — the lazy/composable form.

    ``repartition`` controls update parallelism (and is the salting hook for
    skewed inputs: a round-robin repartition spreads any hot key).  The merge
    tree bounds every task's fan-in at ``merge_fanout`` so the final reduce
    is never a serial OR over all partial states (with big states — a Bloom
    filter for 10^9 keys is ~1.7 GB — the single-task merge would dominate
    the wall-clock; Amdahl measured it at ~60% of a 64-partition build).

    ``strategy`` (``"auto"`` default, hoisted here from ``build_sketch`` in
    round 3): ``"states"`` ships one partial state per partition through the
    merge tree; ``"sharded"`` routes v2/NONE Bloom builds through the
    bucket-range-sharded pipeline (shuffle = index tuples, not states) and
    reassembles the single state in one executor task.  Both yield
    byte-identical results.
    """
    sk0 = factory()
    if strategy == "auto":
        strategy = _auto_strategy(sk0, df, repartition)
    if strategy == "sharded":
        from poppy_spark.spark.sharded import build_sharded_bloom

        filt = sk0.filter
        sb = build_sharded_bloom(
            df, col, filt.capacity, filt.fpp, persist=False, int_keys=int_keys
        )
        return _reassemble_states_df(sb)
    sdf = df.select(_key_expr(df, col, factory, int_keys).alias("__key__"))
    n_parts = sdf.rdd.getNumPartitions()
    if repartition is None:
        # a small file count must not serialize the update phase: spread the
        # scan across the cluster (scale inputs arrive with plenty of splits,
        # so this only fires for toy inputs)
        cores = df.sparkSession.sparkContext.defaultParallelism
        if n_parts < cores:
            repartition = cores
    if repartition and repartition != n_parts:
        sdf = sdf.repartition(repartition)
        n_parts = repartition
    states = sdf.mapInArrow(_update_fn(factory, int_keys=int_keys), _STATES_SCHEMA)
    return merge_states_tree(states, factory, n_parts, merge_fanout)


def merge_states_tree(
    states: DataFrame,
    factory: Callable[[], Sketch],
    n_parts: int,
    merge_fanout: int = 8,
) -> DataFrame:
    """Reduce a ``(pid, state, n_rows)`` DataFrame to one finalized state row
    via a bounded-fan-in merge tree (poppy folds sequentially; we tree-reduce
    so no single task ORs more than ``merge_fanout`` multi-MB states)."""
    merge = _merge_pdf(factory)
    while n_parts > merge_fanout:
        n_parts = (n_parts + merge_fanout - 1) // merge_fanout
        states = states.groupBy(
            (F.col("pid") % F.lit(n_parts)).alias("__g")
        ).applyInPandas(lambda pdf: merge(pdf), _STATES_SCHEMA)
    final_merge = _merge_pdf(factory, final=True)
    return states.groupBy(F.lit(0).alias("__g")).applyInPandas(
        lambda pdf: final_merge(pdf), _STATES_SCHEMA
    )


def build_sketch(
    df: DataFrame,
    col: str,
    factory: Callable[[], Sketch],
    repartition: int | None = None,
    merge_fanout: int = 64,
    int_keys: str = "string",
    strategy: str = "auto",
) -> Sketch:
    """Distributed sketch build, returning the merged sketch on the driver.

    ``strategy`` picks the physical shape (the engine's one non-Catalyst
    planning decision, since Catalyst cannot see inside the state blobs):

    * ``"states"`` — per-partition partial states + merge tree.  Shuffle
      cost ~ ``n_partitions x state_size``.
    * ``"sharded"`` — route through the bucket-range-sharded build and
      reassemble (Bloom v2 / OptLevel NONE only).  Shuffle cost ~
      ``n_rows x (12 + 2k)`` bytes.
    * ``"auto"`` — compare the two cost models and pick: with a big filter
      over few-ish rows per partition (the 10^9-key regime), shipping one
      filter-sized state per partition dwarfs shipping index tuples.
    """
    sk0 = factory()
    if strategy == "auto":
        strategy = _auto_strategy(sk0, df, repartition)
    if strategy == "sharded":
        # driver-destined result: reassemble driver-side from the lz4 shard
        # rows (compressed transfer) rather than collecting one giant raw
        # state row through build_sketch_df's executor-side assembly
        from poppy_spark.spark.sharded import build_sharded_bloom

        filt = sk0.filter
        sb = build_sharded_bloom(
            df, col, filt.capacity, filt.fpp, persist=False, int_keys=int_keys
        )
        merged = type(sk0).loads(sb.to_poppy_bytes(max_bytes=8 << 30))
        return merged
    row = build_sketch_df(
        df, col, factory, repartition, merge_fanout, int_keys, strategy="states"
    ).collect()[0]
    cls = type(factory())
    return cls.loads(bytes(row["state"]))


def _grouped_schema(df: DataFrame, group_cols: Sequence[str]) -> StructType:
    fields = [df.schema[c] for c in group_cols]
    return StructType(
        list(fields)
        + [StructField("state", BinaryType()), StructField("n_rows", LongType())]
    )


def build_sketch_grouped(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    factory: Callable[[], Sketch],
    int_keys: str = "string",
    max_task_state_bytes: int = 512 << 20,
    repartition: int | None = None,
    shuffle: str = "states",
) -> DataFrame:
    """One merged sketch per group: ``(group..., state binary, n_rows)``.

    ``shuffle`` picks the physical shape (the grouped analog of
    ``build_sketch_df``'s strategy knob):

    * ``"states"`` (default) — phase 1 (map-side combine): each input
      partition emits one partial state per group it saw; phase 2 shuffles
      *states* by group key and segment-folds them.  Right when groups are
      few or skewed: a hot key costs one partial per partition, never one
      task.
    * ``"rows"`` — repartition the ``(group, key)`` tuples by group, sort
      within partitions, and build each group's FINALIZED sketch in one
      segment-fold pass: ONE shuffle of narrow rows, no partial states at
      all, task memory = one live sketch.  Right for HIGH-cardinality
      groups (round-5 sf1 finding: with ~4-row groups scattered over every
      partition, the states shape degenerates to one partial per ROW —
      5.8M state blobs through two Python passes for 1.5M groups).  A hot
      group's rows serialize into one task (time bounded by that group's
      size; memory stays O(1)) — keep ``"states"`` for skewed keys.

    Task memory is BOUNDED regardless of group cardinality (round-2 verdict
    item): whenever a ``"states"`` task's live states exceed
    ``max_task_state_bytes`` (estimated as groups-seen x one state's
    serialized size), the dict is flushed as partial rows and cleared —
    phase 2 merges per group anyway, so multiple partials per (partition,
    group) are free.  High-cardinality group keys therefore cost extra
    merge rows, never worker memory.  For per-group filters individually
    too large for one task, use
    :func:`poppy_spark.spark.sharded.build_sharded_bloom_grouped` — one
    bucket-range-sharded filter per group, task memory = one shard.

    Like :func:`build_sketch_df`, a small input file count must not
    serialize phase 1 (round-5: a one-split scan ran the whole update on
    ONE core): with ``repartition=None`` a scan with fewer splits than
    cores is spread round-robin first — extra partials per group, which
    phase 2 absorbs.  Pass an explicit ``repartition`` to pin it.
    """
    if shuffle not in ("states", "rows"):
        raise ValueError(f"unknown shuffle shape {shuffle!r}")
    group_cols = list(group_cols)
    sel = df.select(*group_cols, _key_expr(df, col, factory, int_keys).alias("__key__"))
    n_parts = sel.rdd.getNumPartitions()
    if repartition is None:
        cores = df.sparkSession.sparkContext.defaultParallelism
        if n_parts < cores:
            repartition = cores
    if repartition and repartition != n_parts:
        sel = sel.repartition(repartition)
    out_schema = _grouped_schema(df, group_cols)
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(out_schema)

    n_group_cols = len(group_cols)

    if shuffle == "rows":
        # single-shuffle shape: co-locate each group's rows, sort them
        # contiguous, and fold finalized states directly — no partials
        rows2 = sel.repartition(*[F.col(c) for c in group_cols]).sortWithinPartitions(
            *group_cols
        )

        def build_sorted(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            unset = object()
            nan_key = ("__nan__",)  # python NaN != NaN; Spark groups NaN equal

            def normg(v):
                return nan_key if isinstance(v, float) and v != v else v

            template = factory()
            template.int_keys = int_keys
            cur_key = unset
            cur_vals: tuple = ()
            cur_sk = None
            cur_n = 0
            out_groups: list = []
            out_states: list = []
            out_n: list = []

            def close_group():
                nonlocal cur_sk, cur_n
                cur_sk.finalize_merge()
                out_groups.append(cur_vals)
                out_states.append(cur_sk.dumps())
                out_n.append(cur_n)
                cur_sk, cur_n = None, 0

            def drain():
                cols = [
                    pa.array(
                        [g[i] for g in out_groups], type=arrow_schema.field(i).type
                    )
                    for i in range(n_group_cols)
                ]
                cols.append(pa.array(out_states, type=pa.binary()))
                cols.append(pa.array(out_n, type=pa.int64()))
                batch = pa.RecordBatch.from_arrays(cols, schema=arrow_schema)
                out_groups.clear()
                out_states.clear()
                out_n.clear()
                return batch

            for b in batches:
                n = b.num_rows
                if not n:
                    continue
                key_col = b.column(n_group_cols)
                gcols_py = [b.column(i).to_pylist() for i in range(n_group_cols)]
                ctx = template.batch_context(key_col)
                r = 0
                while r < n:
                    key = (
                        normg(gcols_py[0][r])
                        if n_group_cols == 1
                        else tuple(normg(col[r]) for col in gcols_py)
                    )
                    r2 = r + 1
                    while r2 < n and all(
                        normg(col[r2]) == normg(col[r]) for col in gcols_py
                    ):
                        r2 += 1
                    if key != cur_key:
                        if cur_sk is not None:
                            close_group()
                        cur_key = key
                        cur_vals = tuple(col[r] for col in gcols_py)
                    if cur_sk is None:
                        cur_sk = factory()
                        cur_sk.int_keys = int_keys
                    if ctx is not None:
                        cur_sk.update_slice(ctx, r, r2)
                    else:
                        cur_sk.update_arrow(key_col.slice(r, r2 - r))
                    cur_n += r2 - r
                    r = r2
                if len(out_groups) >= 1024:
                    yield drain()
            if cur_sk is not None:
                close_group()
            if out_groups:
                yield drain()

        return rows2.mapInArrow(build_sorted, out_schema)

    def update(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # Per-batch shape (round-6 rework, guide §4.2): sort the batch by
        # the group key once (Arrow C++), so each group's rows are a
        # CONTIGUOUS slice — per-group work is then a dict probe plus either
        # a pre-routed numpy scatter (``batch_context``/``update_slice``,
        # sketches that can hash the whole batch once) or an
        # ``update_arrow`` on a zero-copy slice.  The former pandas
        # ``groupby().indices`` + per-group ``take`` + ``iloc`` shape cost
        # ~360us per (partition, group) — 63% of the sf1 suite wall on the
        # high-cardinality row.
        import pyarrow.compute as pc

        states: dict = {}
        group_vals: dict = {}
        state_bytes_est = 0  # serialized size of ONE empty state, set lazily
        template = factory()
        template.int_keys = int_keys
        sort_keys = [(c, "ascending") for c in group_cols]

        def flush():
            items = list(states.items())
            arrs = [
                pa.array(
                    [group_vals[k][i] for k, _ in items],
                    type=arrow_schema.field(i).type,
                )
                for i in range(n_group_cols)
            ]
            arrs.append(
                pa.array([_z_dumps(ent[0]) for _, ent in items], type=pa.binary())
            )
            arrs.append(pa.array([ent[1] for _, ent in items], type=pa.int64()))
            states.clear()
            group_vals.clear()
            return [pa.RecordBatch.from_arrays(arrs, schema=arrow_schema)]

        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            sb = batch.take(pc.sort_indices(batch, sort_keys=sort_keys))
            key_col = sb.column(n_group_cols)
            gcols_py = [sb.column(i).to_pylist() for i in range(n_group_cols)]
            ctx = template.batch_context(key_col)
            r = 0
            if n_group_cols == 1:
                g0 = gcols_py[0]
                while r < n:
                    gkey = g0[r]
                    r2 = r + 1
                    while r2 < n and g0[r2] == gkey:
                        r2 += 1
                    ent = states.get(gkey)
                    if ent is None:
                        sk_new = factory()
                        sk_new.int_keys = int_keys
                        if not state_bytes_est:
                            # in-memory bound, NOT len(dumps()): sketches
                            # with a compact serialized form (sparse HLL)
                            # still cost their dense size once updated
                            state_bytes_est = max(sk_new.memory_bound_bytes(), 1)
                        ent = states[gkey] = [sk_new, 0]
                        group_vals[gkey] = (gkey,)
                    if ctx is not None:
                        ent[0].update_slice(ctx, r, r2)
                    else:
                        ent[0].update_arrow(key_col.slice(r, r2 - r))
                    ent[1] += r2 - r
                    r = r2
            else:
                while r < n:
                    gkey = tuple(col[r] for col in gcols_py)
                    r2 = r + 1
                    while r2 < n and all(col[r2] == col[r] for col in gcols_py):
                        r2 += 1
                    ent = states.get(gkey)
                    if ent is None:
                        sk_new = factory()
                        sk_new.int_keys = int_keys
                        if not state_bytes_est:
                            state_bytes_est = max(sk_new.memory_bound_bytes(), 1)
                        ent = states[gkey] = [sk_new, 0]
                        group_vals[gkey] = gkey
                    if ctx is not None:
                        ent[0].update_slice(ctx, r, r2)
                    else:
                        ent[0].update_arrow(key_col.slice(r, r2 - r))
                    ent[1] += r2 - r
                    r = r2
            if states:
                # re-estimate from a LIVE sketch each batch: bounds that
                # depend on observed data (TopK key sizes) grow after the
                # fresh-sketch estimate was taken (round-3 advice)
                live = next(iter(states.values()))[0]
                state_bytes_est = max(state_bytes_est, live.memory_bound_bytes())
            if len(states) * state_bytes_est > max_task_state_bytes:
                yield from flush()
        if states:
            yield from flush()

    partials = sel.mapInArrow(update, out_schema)

    # Phase 2: merge partials per group.  NOT groupBy().applyInPandas — that
    # invokes the Python merge function once per group (round-5 sf1 finding:
    # ~1.5M few-row invocations = the per-row-Python anti-pattern at group
    # granularity, 63% of the suite's wall).  Instead shuffle the partials by
    # group, sort within partitions so each group's rows are contiguous, and
    # fold segments in ONE mapInArrow pass — thousands of groups per Python
    # call.  Merge order within a group stays arbitrary exactly as the
    # cogrouped shape's was (shuffle arrival order); all sketches either
    # merge order-invariantly (Bloom/HLL/CMS/MinHash/Theta) or are gated by
    # rank-bound oracles (KLL/t-digest).
    part2 = partials.repartition(*[F.col(c) for c in group_cols]).sortWithinPartitions(
        *group_cols
    )
    n_group_cols = len(group_cols)
    cls = type(factory())

    def merge_sorted(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        unset = object()
        nan_key = ("__nan__",)  # python NaN != NaN; Spark groups NaN as equal

        def normg(v):
            return nan_key if isinstance(v, float) and v != v else v

        cur_key = unset
        cur_vals: tuple = ()
        cur_sk = None
        cur_n = 0
        out_groups: list = []
        out_states: list = []
        out_n: list = []

        def close_group():
            nonlocal cur_sk, cur_n
            cur_sk.finalize_merge()
            out_groups.append(cur_vals)
            out_states.append(cur_sk.dumps())
            out_n.append(cur_n)
            cur_sk, cur_n = None, 0

        def drain():
            cols = []
            for i in range(n_group_cols):
                cols.append(
                    pa.array([g[i] for g in out_groups], type=arrow_schema.field(i).type)
                )
            cols.append(pa.array(out_states, type=pa.binary()))
            cols.append(pa.array(out_n, type=pa.int64()))
            batch = pa.RecordBatch.from_arrays(cols, schema=arrow_schema)
            out_groups.clear()
            out_states.clear()
            out_n.clear()
            return batch

        for b in batches:
            if not b.num_rows:
                continue
            gcols_py = [b.column(i).to_pylist() for i in range(n_group_cols)]
            states_col = b.column(n_group_cols)
            nrows_col = b.column(n_group_cols + 1).to_pylist()
            for r in range(b.num_rows):
                key = tuple(normg(col[r]) for col in gcols_py)
                if key != cur_key:
                    if cur_sk is not None:
                        close_group()
                    cur_key = key
                    cur_vals = tuple(col[r] for col in gcols_py)
                part = _z_loads(cls, states_col[r].as_py())
                if cur_sk is None:
                    cur_sk = part
                else:
                    cur_sk.merge(part)
                cur_n += int(nrows_col[r])
            if len(out_groups) >= 1024:
                yield drain()
        if cur_sk is not None:
            close_group()
        if out_groups:
            yield drain()

    return part2.mapInArrow(merge_sorted, out_schema)


def sketch_value_column(
    states_df: DataFrame,
    sketch_cls: type[Sketch],
    value_name: str = "estimate",
    value_type: str = "bigint",
) -> DataFrame:
    """Append the finalized ``result()`` of each row's state as a column."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(value_type)
    def finalize(states: pd.Series) -> pd.Series:
        return pd.Series([sketch_cls.loads(bytes(s)).result() for s in states])

    return states_df.withColumn(value_name, finalize(F.col("state")))


def sketch_pairwise(
    states_df: DataFrame,
    sketch_cls: type[Sketch],
    value_fn,
    group_col: str,
    value_name: str = "estimate",
    value_type: str = "double",
    max_groups: int = 2000,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Pairwise sketch comparisons between groups, distributed.

    ``(group_a, group_b, <value_name>)`` for every unordered group pair,
    with ``value_fn(sk_a, sk_b) -> float`` (e.g. ``ThetaSketch.
    intersection`` / ``.jaccard``, MinHash signature similarity) evaluated
    in an Arrow-batched pandas UDF — the overlap matrix never funnels
    through the driver.

    The self-join is quadratic in groups, so it refuses past ``max_groups``
    (raise it deliberately, or pass an explicit ``pairs`` DataFrame
    ``(group_a, group_b)`` — e.g. LSH-bucketed candidates — to bound the
    comparisons yourself, which is the 10^5-groups shape).
    """
    from pyspark.sql.functions import pandas_udf

    a = states_df.select(
        F.col(group_col).alias("group_a"), F.col("state").alias("__sa")
    )
    b = states_df.select(
        F.col(group_col).alias("group_b"), F.col("state").alias("__sb")
    )
    if pairs is None:
        n = states_df.count()
        if n > max_groups:
            raise ValueError(
                f"{n} groups would make {n * (n - 1) // 2} pairs; pass an "
                "explicit candidate-pairs DataFrame (or raise max_groups)"
            )
        joined = a.join(b, F.col("group_a") < F.col("group_b"))
    else:
        joined = pairs.join(a, "group_a").join(b, "group_b")

    @pandas_udf(value_type)
    def compare(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                value_fn(sketch_cls.loads(bytes(x)), sketch_cls.loads(bytes(y)))
                for x, y in zip(sa, sb)
            ]
        )

    return joined.select(
        "group_a", "group_b", compare(F.col("__sa"), F.col("__sb")).alias(value_name)
    )
