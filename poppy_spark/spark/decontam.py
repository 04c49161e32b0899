"""Eval-set decontamination: flag training documents that share word
n-grams with a benchmark/eval corpus.

The classic corpus-hygiene operator (GPT-3 appendix C / PaLM-style n-gram
overlap checks), built on the poppy Bloom filter this library is centered
on:

1. hash every distinct word ``k``-gram of the EVAL set (JVM ``xxhash64``
   over the word slots — no shingle strings are materialized),
2. build one Bloom filter over those hashes (eval sets are small next to
   the training corpus; even 10^8 eval n-grams at fpp=1e-6 is a ~343 MB
   filter, and past a worker's budget :mod:`poppy_spark.spark.sharded`
   holds the same role),
3. broadcast-probe every training document's n-gram stream — a narrow,
   shuffle-free pass over the 100 TB side — and count hits per document
   with map-side partial aggregation (the only shuffle is (doc_id, counts)).

Bloom zero-false-negative guarantee => NO contaminated document escapes;
false positives only ever over-flag, bounded by ``n_shingles * fpp`` per
document, so ``min_hits`` > 1 (standard practice for long documents) also
absorbs FP noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from poppy_spark.sketches import BloomSketch
from poppy_spark.spark.agg import build_sketch
from poppy_spark.spark.dedup import shingle_hashes
from poppy_spark.spark.probe import bloom_contains


def contamination_flags(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_hits: int = 1,
    fpp: float = 1e-6,
) -> DataFrame:
    """``train_df`` + ``(n_shingles, n_hits, contaminated)`` columns.

    ``contaminated`` is true when at least ``min_hits`` of the document's
    word ``k``-grams appear in ``eval_df``.  Documents producing no
    shingles (empty text) get ``n_shingles = n_hits = 0``.
    """
    ev = shingle_hashes(eval_df, text_col, id_col, k).select("sh").distinct()
    n_grams = ev.count()
    filt = build_sketch(
        ev, "sh", BloomSketch.factory(max(n_grams, 1), fpp), int_keys="le8"
    )
    tr = shingle_hashes(train_df, text_col, id_col, k)
    per_doc = (
        bloom_contains(tr, "sh", filt.dumps(), "hit", int_keys="le8")
        .groupBy("id")
        .agg(
            F.count("*").alias("__n_shingles"),
            F.sum(F.col("hit").cast("long")).alias("__n_hits"),
        )
        .withColumnRenamed("id", "__decontam_id")
    )
    return (
        train_df.join(
            per_doc, F.col(id_col) == F.col("__decontam_id"), "left"
        )
        .drop("__decontam_id")
        .select(
            "*",
            F.coalesce(F.col("__n_shingles"), F.lit(0)).alias("n_shingles"),
            F.coalesce(F.col("__n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("__n_hits"), F.lit(0)) >= F.lit(min_hits)).alias(
                "contaminated"
            ),
        )
        .drop("__n_shingles", "__n_hits")
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_hits: int = 1,
    fpp: float = 1e-6,
) -> DataFrame:
    """The clean training corpus: ``train_df`` minus every document sharing
    >= ``min_hits`` word ``k``-grams with ``eval_df`` (plus whatever the
    configured Bloom false-positive rate over-flags — never the reverse:
    zero false negatives means true contamination cannot survive)."""
    flagged = contamination_flags(
        train_df, eval_df, text_col, id_col, k=k, min_hits=min_hits, fpp=fpp
    )
    return flagged.filter(~F.col("contaminated")).drop(
        "n_shingles", "n_hits", "contaminated"
    )
