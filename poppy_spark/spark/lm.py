"""N-gram language-model scoring for corpus quality signals.

A KenLM-shaped (but dependency-free) add-k-smoothed bigram model trained
WITH Spark aggregations and applied WITH Spark joins — both sides of the
contract stay distributed:

* :func:`train_bigram_lm` — bigram + unigram counts are two partially-
  aggregated ``groupBy`` passes over exploded word arrays (map-side
  combine absorbs Zipf skew: each task emits one partial count per
  distinct gram it saw, so ``the the`` never concentrates a shuffle).
* :func:`score_bigram_lm` — per-document average log-probability and
  perplexity via two equi-joins against the count tables (AQE handles the
  hot-word skew; Catalyst broadcasts small vocabularies automatically).

Every expression is a JVM builtin (``ln``/arithmetic), so DuckDB
reproduces scores bit-for-bit — the oracle row is a TRUE-value comparison,
not a bound gate.  Smoothing: ``p(w2|w1) = (c(w1 w2) + k) / (c(w1) + k V)``
with ``V`` = unigram vocabulary size; unseen bigrams and unseen context
words degrade through the same formula (``c = 0``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from poppy_spark.spark.text import _words


def _doc_bigrams(text_col: str, id_col: str, df: DataFrame) -> DataFrame:
    """(id, w1, w2) rows: adjacent lowercase word pairs per document."""
    w = _words(F.col(text_col))
    pairs = F.when(
        F.size(w) >= 2,
        F.zip_with(F.slice(w, 1, F.size(w) - 1), F.slice(w, 2, F.size(w) - 1),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
    ).otherwise(F.array())
    return df.select(
        F.col(id_col).alias("__id"), F.explode(pairs).alias("p")
    ).select("__id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def train_bigram_lm(df: DataFrame, text_col: str, id_col: str):
    """Train on a corpus: returns ``(bigrams, unigrams, vocab_size)`` where
    ``bigrams`` is ``(w1, w2, c12)``, ``unigrams`` is ``(w1, c1)`` counting
    CONTEXT occurrences (bigram left sides), and ``vocab_size`` is the
    distinct-word count.  All three are reusable artifacts — persist the
    DataFrames (or write them out) to score many corpora against one
    model."""
    big = _doc_bigrams(text_col, id_col, df)
    bigrams = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    unigrams = big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        df.select(F.explode(_words(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    return bigrams, unigrams, int(vocab)


def score_bigram_lm(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab_size: int,
    k: float = 0.1,
) -> DataFrame:
    """Score every document: ``(id_col, n_bigrams, avg_logp, perplexity)``.

    ``avg_logp`` is the mean ``ln p(w2|w1)`` over the document's bigrams
    (0-bigram docs score NULL); ``perplexity = exp(-avg_logp)``.  Shape:
    one explode, two left equi-joins on the count tables, one doc-keyed
    aggregate — no driver-side vocabulary, no Python.
    """
    pairs = _doc_bigrams(text_col, id_col, df)
    scored = (
        pairs.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, ["w1"], "left")
        .select(
            "__id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.lit(float(vocab_size)))
            ).alias("__logp"),
        )
    )
    per_doc = scored.groupBy("__id").agg(
        F.count("*").alias("n_bigrams"),
        F.avg("__logp").alias("avg_logp"),
    )
    ids = df.select(F.col(id_col).alias("__id"))
    return (
        ids.join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("avg_logp"),
            F.exp(-F.col("avg_logp")).alias("perplexity"),
        )
    )
