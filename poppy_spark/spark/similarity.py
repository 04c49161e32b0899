"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — exact brute-force top-k by cosine, the correctness
  baseline: JVM-side ``zip_with``/``aggregate`` dot products against a
  broadcast query set, ranked with a window.
* :func:`lsh_topk` — the scale path: random-hyperplane (sign) LSH buckets
  prune candidates before exact scoring, so the crossJoin shrinks from
  |corpus| x |queries| to bucket-collision pairs.

Both are pure DataFrame plans (broadcast + codegen), no Python UDFs.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def with_normalized(df: DataFrame, vec_col: str, out_col: str = "vec_n") -> DataFrame:
    """Append an L2-normalized copy of the embedding column."""
    n = _norm(F.col(vec_col))
    return df.withColumn(
        out_col,
        F.transform(F.col(vec_col), lambda v: (v / F.greatest(n, F.lit(1e-12))).cast("double")),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k: (query_id, id, cosine, rank).  The query side is
    broadcast — the corpus is scanned once, no shuffle of corpus rows."""
    c = with_normalized(corpus, vec_col).select(
        F.col(id_col).alias("id"), F.col("vec_n").alias("cv")
    )
    q = with_normalized(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"), F.col("vec_n").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "id", _dot(F.col("cv"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    method: str = "exact",
    n_planes: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine similarity >= ``threshold`` —
    embedding-space near-duplicate detection for the dedup family.

    ``method="exact"`` scores every pair (a self cross join: n^2/2 dot
    products — the correctness baseline, fine up to ~10^5 vectors).
    ``method="lsh"`` prunes to pairs sharing any of ``n_tables``
    hyperplane-sign buckets before exact scoring (the 100 TB path; recall
    < 1 for pairs far below cosine ~1, so verify-stage thresholds near 1
    keep recall high — see the planted-recall gate).
    """
    c = with_normalized(corpus, vec_col).select(
        F.col(id_col).alias("id"), F.col("vec_n").alias("v")
    )
    if method == "exact":
        a = c.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = c.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        dim = len(corpus.select(vec_col).first()[0])
        cb = c
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, seed=7_777_777 + t)
            cb = cb.withColumn(f"b{t}", lsh_bucket(F.col("v"), planes))
        buckets = cb.select(
            "id", "v",
            F.explode(F.array(*[
                F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b"))
                for t in range(n_tables)
            ])).alias("tb"),
        ).select("id", "v", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
        l, r = buckets.alias("a"), buckets.alias("b")
        pairs = (
            l.join(r, (F.col("a.t") == F.col("b.t")) & (F.col("a.b") == F.col("b.b"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(
                F.col("a.id").alias("id_a"), F.col("a.v").alias("va"),
                F.col("b.id").alias("id_b"), F.col("b.v").alias("vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    scored = pairs.select(
        "id_a", "id_b", _dot(F.col("va"), F.col("vb")).alias("cosine")
    )
    return scored.filter(F.col("cosine") >= threshold)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7_777_777) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((n_planes, dim))]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one sign bit per plane, packed to bigint."""
    bits = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in p])
        bit = F.when(_dot(vec, arr) >= 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, i)
        bits = term if bits is None else bits.bitwiseXOR(term)
    return bits


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing any of
    ``n_tables`` hyperplane-sign buckets with the query, then exact cosine
    on the candidates only.  Recall grows with ``n_tables``; cost shrinks by
    ~2^n_planes per table vs brute force."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = with_normalized(corpus, vec_col).select(
        F.col(id_col).alias("id"), F.col("vec_n").alias("cv")
    )
    q = with_normalized(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"), F.col("vec_n").alias("qv")
    )
    cb, qb = c, q
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=7_777_777 + t)
        cb = cb.withColumn(f"b{t}", lsh_bucket(F.col("cv"), planes))
        qb = qb.withColumn(f"b{t}", lsh_bucket(F.col("qv"), planes))
    # one bucket stream per table; candidates = matches in any table
    c_buckets = cb.select(
        "id", "cv",
        F.explode(F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b")) for t in range(n_tables)])).alias("tb"),
    ).select("id", "cv", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    q_buckets = qb.select(
        "query_id", "qv",
        F.explode(F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b")) for t in range(n_tables)])).alias("tb"),
    ).select("query_id", "qv", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    cands = (
        c_buckets.join(F.broadcast(q_buckets), ["t", "b"])
        .select("query_id", "id", "cv", "qv")
        .dropDuplicates(["query_id", "id"])
    )
    scored = cands.select("query_id", "id", _dot(F.col("cv"), F.col("qv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
