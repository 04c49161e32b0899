"""Sequence packing: group documents into fixed token-budget packs for
LLM training batches.

The distributed shape: documents hash-partition by id into ``n_buckets``
independent buckets (one shuffle), then each bucket packs greedily in
sorted-id order inside one Arrow-batched ``applyInPandas`` task.  Packs
never span buckets, so the result is a pure function of (ids, lengths,
budget, n_buckets) — NOT of the input's physical layout: re-running on a
repartitioned / retried / differently-sized cluster yields byte-identical
assignments, which resumable pipelines need and ``RDD.zipWithIndex``-style
packing cannot give.

Greedy fill guarantee: a pack is closed only when the next document does
not fit, so every closed pack is more than ``budget - max_doc_len`` full;
with docs small relative to the budget, utilization approaches 100% and
``n_packs <= total_tokens / (budget - max_len) + n_buckets``.

Scale notes: per-task memory is one bucket's rows (size it like shard
count: ``n_buckets ~ total_rows / rows_per_task``).  Documents longer than
the budget get a single-doc pack flagged ``overflow`` — the caller decides
whether to split or drop them (splitting changes row identity, so it is
not silently done here).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: pack ids are bucket * _PACK_STRIDE + local index — collision-free while
#: a single bucket holds fewer than 2^40 packs
_PACK_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    n_buckets: int = 256,
) -> DataFrame:
    """``df`` + ``(pack_id bigint, overflow boolean)``.

    Every row is assigned exactly one pack; the sum of ``len_col`` within a
    pack is <= ``budget`` unless the pack is a single ``overflow`` row.

    Only ``(id, len)`` tuples cross the Python boundary (see
    :func:`pack_assignments`); the document payload joins the assignment
    back JVM-side — at 100 TB the text never rides through Arrow.
    """
    asg = pack_assignments(df, id_col, len_col, budget, n_buckets=n_buckets)
    return df.join(asg, id_col)


def pack_assignments(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    n_buckets: int = 256,
) -> DataFrame:
    """``(id, pack_id, overflow)`` — the packing decision alone.

    The shuffle and the Arrow crossing carry ~16 bytes/row regardless of
    document size; callers with wide rows join this back (what
    :func:`pack_sequences` does) or write it as a manifest.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")

    proj = df.select(id_col, len_col)
    out_schema = (
        f"{id_col} {proj.schema[id_col].dataType.simpleString()}, "
        "pack_id long, overflow boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["__bucket"].iloc[0])
        base = bucket * _PACK_STRIDE
        lens = pdf[len_col].to_numpy()
        pack_ids = []
        overflow = []
        cur, filled, ovf = 0, 0, 0
        for ln in lens:
            ln = int(ln)
            if ln > budget:
                # oversized: its own flagged pack, allocated from the top of
                # the bucket's id range; the in-progress pack stays open
                ovf += 1
                pack_ids.append(base + _PACK_STRIDE - ovf)
                overflow.append(True)
                continue
            if filled + ln > budget:
                cur += 1
                filled = 0
            pack_ids.append(base + cur)
            overflow.append(False)
            filled += ln
        pdf["pack_id"] = pack_ids
        pdf["overflow"] = overflow
        return pdf[[id_col, "pack_id", "overflow"]]

    return (
        proj.withColumn(
            "__bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
        )
        .groupBy("__bucket")
        .applyInPandas(pack, out_schema)
    )


def pack_stats(packed: DataFrame, len_col: str) -> DataFrame:
    """Per-pack (pack_id, n_docs, n_tokens, overflow) — the verification /
    monitoring view."""
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(len_col).alias("n_tokens"),
        F.max(F.col("overflow").cast("int")).cast("boolean").alias("overflow"),
    )
