"""Deterministic content-hash sampling and splits.

``df.sample()`` is partition-order dependent: a task retry, AQE re-plan, or
repartition resamples different rows, which breaks resumable pipelines and
makes train/test splits irreproducible.  Everything here instead keys the
decision on ``md5(seed | key)`` — a pure function of row CONTENT — so the
same row lands on the same side of every threshold on every run, every
cluster size, and every retry.  All JVM expressions (whole-stage codegen,
no Python workers), and the md5-hex comparison is engine-portable: DuckDB /
Trino / BigQuery replicate the exact row set, which is how the oracle rows
verify these operators bit-for-bit.

Scale notes: a narrow filter/withColumn — no shuffle, pushes through scans
unchanged; skew-free because md5 output is uniform regardless of key
distribution.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: 16^8 — the sampling decision uses the first 8 hex chars of the md5
_SPACE = 1 << 32


def _hex8(key: Column, seed: int) -> Column:
    """First 8 hex chars of md5('seed{seed}|' || key) — uniform in [0, 2^32)."""
    return F.substring(F.md5(F.concat(F.lit(f"seed{seed}|"), key.cast("string"))), 1, 8)


def _thr_hex(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * _SPACE), _SPACE - 1), "08x")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by content hash of ``key_col``.

    Rows with equal keys are kept or dropped together (sampling is by key,
    which is usually what a dedup-aware corpus pipeline wants).  Exactly
    reproducible in ANSI SQL::

        WHERE substr(md5('seed0|' || key), 1, 8) < '<thr>'
    """
    return df.filter(_hex8(F.col(key_col), seed) < F.lit(_thr_hex(rate)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-group sampling rates (e.g. downsample boilerplate-heavy sources,
    keep all rare-language docs): ``rates`` maps group value -> keep rate;
    groups not listed use ``default_rate``."""
    thr = F.lit(_thr_hex(default_rate))
    for g, r in rates.items():
        thr = F.when(F.col(group_col) == F.lit(g), F.lit(_thr_hex(r))).otherwise(thr)
    return df.filter(_hex8(F.col(key_col), seed) < thr)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float],
    seed: int = 0,
    output_col: str = "split",
) -> DataFrame:
    """Deterministic, disjoint, exhaustive N-way split (train/val/test).

    Adds ``output_col`` = the 0-based split index.  Unlike
    ``DataFrame.randomSplit`` the assignment is a pure function of the key:
    stable across reruns, retries, and repartitioning, and rows sharing a
    key always land in the same split (no train/test leakage through
    duplicated documents)."""
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _hex8(F.col(key_col), seed)
    expr = F.lit(len(weights) - 1)
    acc = 0.0
    # chain from the last boundary down so the first matching when() wins
    bounds = []
    for w in weights[:-1]:
        acc += w / total
        bounds.append(_thr_hex(acc))
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(h < F.lit(bounds[i]), F.lit(i)).otherwise(expr)
    return df.withColumn(output_col, expr)


def bottom_k_sample(
    df: DataFrame, key_col: str, k: int, seed: int = 0
) -> DataFrame:
    """Deterministic uniform sample of ``k`` DISTINCT keys: the k smallest
    ``md5(seed|key)`` values.

    This is a bottom-k / KMV sample — mergeable by construction (the bottom
    k of a union is the bottom k of the parts' bottom k's), so Spark's
    distributed ``orderBy().limit()`` (TakeOrderedAndProject: per-partition
    top-k, then a k-row merge on the driver — no full sort, no full
    shuffle) computes it exactly.  Content-determined like everything in
    this module: stable across reruns, layouts, and cluster sizes, and
    reproducible in ANSI SQL (``ORDER BY md5(...) LIMIT k``).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return (
        df.select(F.col(key_col).alias("key"))
        .distinct()
        .withColumn("__h", _hex8(F.col("key"), seed))
        .orderBy("__h", "key")
        .limit(k)
        .select("key")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``k`` distinct
    keys, P(key in sample) increasing with its total weight — Efraimidis &
    Spirakis (2006) A-ES, with the random draw replaced by the content hash
    so the sample is a pure function of the data.

    Each key gets ``u = (u32 + 0.5) / 2^32`` from the first 8 md5 hex
    chars (uniform, never 0/1) and score ``ln(u) / W`` where ``W`` is the
    key's summed weight; the k LARGEST scores win — exactly the classic
    ``u^(1/w)`` order, in log space.  Duplicate keys pool their weight
    (item-weight semantics: a document counted twice is twice as likely).

    Physical shape: one hash-partial-aggregated shuffle for the per-key
    weight sum, then TakeOrderedAndProject (per-partition top-k + k-row
    driver merge — no full sort).  The score is reproducible in ANSI SQL
    (DuckDB: ``ln((('0x'||substr(md5(...),1,8))::bigint + 0.5)/2^32)/W``);
    Spark and DuckDB produce bit-identical doubles, and the key itself
    breaks any residual ordering tie, so the selected row SET is a true
    cross-engine value oracle.

    Returns columns ``key`` and ``weight`` (the pooled weight).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u32 = F.conv(_hex8(F.col("key"), seed), 16, 10).cast("long")
    u = (u32 + F.lit(0.5)) / F.lit(float(_SPACE))
    return (
        df.select(F.col(key_col).alias("key"), F.col(weight_col).cast("double").alias("w"))
        .filter(F.col("w") > 0)
        .groupBy("key")
        .agg(F.sum("w").alias("weight"))
        .withColumn("__s", F.log(u) / F.col("weight"))
        .orderBy(F.col("__s").desc(), "key")
        .limit(k)
        .select("key", "weight")
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    k: int = 400,
    output_col: str = "bucket",
) -> DataFrame:
    """Equal-mass bucketing driven by a distributed KLL sketch: one
    two-phase sketch build learns the value distribution, its ``1/B``
    quantile boundaries broadcast as a plain CASE expression, and a second
    pass assigns every row a bucket in [0, B) — the "length-balanced
    training shards" operator (token-count-balanced shards, latency-band
    splits) without ever sorting the data.

    Exactly two passes over the data, no shuffle of data rows at all: the
    build ships one KLL state per partition; assignment is a pushed-down
    scan + projection.  Bucket masses are balanced within the KLL rank
    error (~1/k per boundary), gated by the oracle row.  Boundary
    assignment rule: bucket b covers (q_b, q_{b+1}] with bucket 0 taking
    everything <= q_1 — ties on a boundary value land deterministically in
    the lower bucket.  Re-running on the same input layout reproduces the
    same buckets (the KLL build is seeded); a different partitioning can
    shift boundaries within the rank error, moving only rows adjacent to a
    boundary — pin the boundaries (collect and reuse) when byte-stable
    assignment across layouts matters.
    """
    from poppy_spark.sketches import KllSketch
    from poppy_spark.spark.agg import build_sketch

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    sk = build_sketch(df, value_col, KllSketch.factory(k))
    bounds = [sk.quantile(i / n_buckets) for i in range(1, n_buckets)]
    v = F.col(value_col)
    expr = F.lit(n_buckets - 1)
    for b in range(n_buckets - 2, -1, -1):
        expr = F.when(v <= F.lit(bounds[b]), F.lit(b)).otherwise(expr)
    # NULL values get a NULL bucket (they have no rank) — without the guard
    # the when-chain would silently fall through to the top bucket
    return df.withColumn(
        output_col, F.when(v.isNotNull(), expr).cast("int")
    )


def mix_keep_rates(
    counts: Mapping[str, int], target_weights: Mapping[str, float]
) -> dict[str, float]:
    """Per-group keep rates realizing a target mixture (domain-mixing math).

    Given observed group sizes and target proportions, find the keep rate
    per group such that the EXPECTED kept sizes are proportional to
    ``target_weights`` while retaining as many rows as possible — the
    binding group is the one with the smallest ``count / weight`` ratio
    (it is kept in full; every other group downsamples to match).  Groups
    absent from ``target_weights`` get rate 0; weighted groups absent from
    ``counts`` are ignored (nothing to keep).  Pure driver-side arithmetic
    over one row per domain."""
    ratios = [
        counts[g] / w
        for g, w in target_weights.items()
        if w > 0 and counts.get(g, 0) > 0
    ]
    if not ratios:
        return {g: 0.0 for g in counts}
    scale = min(ratios)
    out = {}
    for g, n in counts.items():
        w = target_weights.get(g, 0.0)
        out[g] = min(w * scale / n, 1.0) if n > 0 and w > 0 else 0.0
    return out


def proportional_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    target_weights: Mapping[str, float],
    seed: int = 0,
) -> DataFrame:
    """Deterministically re-mix a corpus to target domain proportions
    (e.g. ``{"web": 0.6, "code": 0.3, "books": 0.1}``): one tiny
    pre-aggregated count per domain sizes the keep rates
    (:func:`mix_keep_rates`), then a single content-hash stratified filter
    applies them — no shuffle of data rows, retry/layout-stable, and
    reproducible in ANSI SQL exactly like :func:`stratified_sample`.

    The largest mixture satisfiable without oversampling is kept: the
    scarcest domain (relative to its weight) survives in full and the
    rest downsample to match.  Expected proportions are exact; realized
    counts are binomial around them (hash thresholds)."""
    counts = {
        r[0]: r[1] for r in df.groupBy(group_col).count().collect()
    }
    rates = mix_keep_rates(counts, target_weights)
    return stratified_sample(df, key_col, group_col, rates, 0.0, seed)


def grouped_bottom_k(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic bottom-k sample PER GROUP: for every group value, the
    rows carrying the k smallest distinct keys by ``md5(seed|key)``
    survive — the "inspect k documents per domain" verb, content-
    determined like everything in this module (stable across retries,
    layouts, cluster sizes; rows sharing a key sample together, both
    across and within groups).  Rows with a NULL key carry no sampling
    hash and are excluded.

    Two-phase shape, so a hot group NEVER funnels through one task (the
    round-4 finding: a ``Window.partitionBy(group)`` sends an SEO farm's
    10^8 pages into a single partition before rank-filtering to k):

    1. **Map-side pre-thin** (narrow, zero shuffle): each input partition
       keeps its k smallest ``(hash, key)`` per group via one Arrow-batched
       pandas sort — any key among a group's global bottom-k is necessarily
       in the bottom-k of its own batch, so no survivor can be lost.
    2. **Tiny global agg**: ``collect_set`` of the surviving (hash, key)
       structs per group (map-side combined; <= k x n_partitions structs
       per group even for the hottest group), sorted + sliced to the
       final k smallest distinct keys.
    3. **Join-back**: an equi-join of ``df`` against the survivor keys on
       (group, key) — hash-distributed by KEY, so the hot group's rows
       spread across all tasks; AQE broadcasts the survivor side when
       small.

    Only hashes and keys ride phases 1-2; full rows move once, in the
    skew-free phase-3 exchange.  ANSI replica (keys unique per group, the
    normal corpus case): ``QUALIFY row_number() OVER (PARTITION BY g
    ORDER BY md5(...), key) <= k``."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    import pandas as pd  # noqa: F401  (mapInPandas contract)
    import pyspark.sql.types as T

    h = _hex8(F.col(key_col), seed)
    ks = F.col(key_col).cast("string")
    tup = df.select(
        F.col(group_col).alias("__g"),
        F.col(key_col).alias("__k"),
        ks.alias("__ks"),
        h.alias("__h"),
    ).filter(F.col("__h").isNotNull())

    def thin(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.drop_duplicates(["__g", "__ks"])
            # md5-hex + the key's string form sort bytewise identically in
            # pandas and in Spark (ASCII hex / code-point order)
            pdf = pdf.sort_values(["__h", "__ks"], kind="stable")
            yield pdf.groupby("__g", sort=False, dropna=False).head(k)

    thinned = tup.mapInPandas(thin, tup.schema)
    survivors = (
        thinned.groupBy("__g")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_set(F.struct(F.col("__h"), F.col("__ks"), F.col("__k")))
                ),
                1,
                k,
            ).alias("__w")
        )
        .select("__g", F.explode("__w").alias("__s"))
        .select("__g", F.col("__s.__k").alias("__k"))
    )
    joined = df.join(
        survivors,
        F.col(group_col).eqNullSafe(F.col("__g")) & (F.col(key_col) == F.col("__k")),
        "inner",
    )
    return joined.select(*[F.col(c) for c in df.columns])


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int = 0,
    n_buckets: int | None = None,
    output_col: str = "epoch_rank",
    bucket_col: str = "epoch_bucket",
) -> DataFrame:
    """Deterministic global shuffle for training-data emission: every epoch
    gets a different but fully REPRODUCIBLE ordering, keyed on content —
    ``md5(epoch|key)`` — so a resumed/retried job emits the identical
    sequence and no random state is ever stored.

    No global sort barrier: rows get a ``bucket_col`` from the hash PREFIX
    (bucket b covers hash range [b/N, (b+1)/N) — bucket ranges are
    disjoint and ordered by construction) and only sort within tasks.
    The emission contract is ``write.partitionBy(bucket_col)`` then read
    buckets in numeric order: that concatenation IS the global
    permutation, at shuffle-map cost.  ``output_col`` carries the hash so
    checkpointing can seek ("resume after hash H")."""
    h = _hex8(F.col(key_col), epoch)
    if n_buckets is None:
        n_buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n = int(n_buckets)
    bucket = (
        F.conv(h, 16, 10).cast("bigint") * n / F.lit(float(_SPACE))
    ).cast("int")
    return (
        df.withColumn(output_col, h)
        .withColumn(bucket_col, F.least(bucket, F.lit(n - 1)))
        .repartition(n, bucket_col)
        .sortWithinPartitions(bucket_col, output_col, F.col(key_col).cast("string"))
    )
