"""Two-parallelism scaling evidence for the text/corpus-pipeline family
(the round-3 operator additions), same protocol as bench/scaling.py: the
IDENTICAL job at two core counts with file-split-pinned scan partitions,
efficiency = (T_low / T_high) / (high/low), target >= 0.8 for the N->4N
pair.

Jobs:
* ``tfidf``   — per-doc top-3 TF-IDF terms (explode + two aggs + join),
* ``repeat``  — Gopher repetition signals (array exprs + doc-keyed aggs),
* ``convdd``  — whole-conversation dedup (ordered digests, md5 grouping),
* ``wsample`` — weighted A-ES sample (partial agg + TakeOrdered),
* ``spans``   — round-4 repeated-span detection (winnowing stride 4;
  every replicated doc repeats its spans 60x — dense cross-doc mass).

The input replicates the sf0.1 documents table REPL_FACTOR times with
disjoint doc_ids (fixed overheads would dominate the raw 5k rows).
Results append to BENCH/BASELINE.md.  Run: python bench/text_scaling.py
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIR = (2, 8)
REPS = 2
REPL_FACTOR = 60
MAX_PARTITION_BYTES = "4m"


def _make_dataset(path: str, sf_dir: str) -> int:
    from pyspark.sql import functions as F

    from poppy_spark.spark.session import get_spark

    spark = get_spark("poppy-text-scaling-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = docs.crossJoin(
        spark.range(REPL_FACTOR).select(F.col("id").alias("__rep"))
    ).select(
        (F.col("doc_id") + F.col("__rep") * 1_000_000).alias("doc_id"),
        "text",
        F.col("n_chars"),
    )
    big.repartition(64).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def _run_at(cores: int, path: str) -> dict:
    from pyspark.sql import functions as F

    from poppy_spark.spark.dedup import ordered_group_duplicates
    from poppy_spark.spark.sampling import weighted_sample
    from poppy_spark.spark.session import get_spark
    from poppy_spark.spark.spans import repeated_spans
    from poppy_spark.spark.text import repetition_stats, tf_idf_top_terms

    spark = get_spark(f"poppy-text-scaling-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores,
                      max_partition_bytes=MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(path)
    df.limit(1000).count()  # warm

    def best(fn):
        b = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    convs = df.select(
        (F.col("doc_id") % 20_000).alias("conv"), F.col("doc_id").alias("idx"), "text"
    )
    # the weighted sample runs over the exploded word stream (tens of
    # millions of rows) so the partial-agg + TakeOrdered path has real mass
    words = df.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).withColumn("w", F.lit(1.0))
    out = {
        "cores": cores,
        "tfidf_sec": round(best(
            lambda: tf_idf_top_terms(df, "text", "doc_id", 3)
            .agg(F.count("*")).collect()
        ), 3),
        "repeat_sec": round(best(
            lambda: repetition_stats(df, "text", "doc_id")
            .agg(F.avg("dup_line_frac"), F.avg("top_ngram_char_frac")).collect()
        ), 3),
        "convdd_sec": round(best(
            lambda: ordered_group_duplicates(convs, "conv", "idx", "text").count()
        ), 3),
        "wsample_sec": round(best(
            lambda: weighted_sample(words, "word", "w", 1000).count()
        ), 3),
        "spans_sec": round(best(
            lambda: repeated_spans(
                df, "text", "doc_id", span_words=10, min_docs=2, stride=4
            ).count()
        ), 3),
    }
    spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    path = os.environ.get("POPPY_TEXT_SCALE_DATA", "/tmp/poppy_text_scaling_docs")
    n_rows = _make_dataset(path, sf_dir)

    lo, hi = PAIR
    runs = {c: _run_at(c, path) for c in (lo, hi)}
    jobs = ("tfidf", "repeat", "convdd", "wsample", "spans")
    ratio = hi / lo

    lines = [
        f"\n## Text-family scaling run {datetime.now(timezone.utc).isoformat(timespec='seconds')}",
        "",
        f"Identical jobs over {n_rows:,} documents ({REPL_FACTOR}x-replicated sf0.1 corpus, "
        f"disjoint ids), file-split-pinned scan partitions "
        f"(maxPartitionBytes={MAX_PARTITION_BYTES}), best of {REPS} per level.",
        "",
        "| cores | " + " | ".join(f"{j} s" for j in jobs) + " |",
        "|---|" + "---|" * len(jobs),
    ]
    for c in (lo, hi):
        lines.append(
            f"| {c} | " + " | ".join(str(runs[c][f"{j}_sec"]) for j in jobs) + " |"
        )
    effs = {
        j: round((runs[lo][f"{j}_sec"] / runs[hi][f"{j}_sec"]) / ratio, 3)
        for j in jobs
    }
    lines += [
        "",
        f"Scaling efficiency {lo}->{hi}: "
        + ", ".join(f"{j} {effs[j]}" for j in jobs)
        + " (= (T_low/T_high)/(high/low), target >= 0.8 per the north rule).",
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "BASELINE.md")
    with open(base, "a") as f:
        f.write(out)


if __name__ == "__main__":
    main()
