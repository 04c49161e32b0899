"""Composed-pipeline scale evidence (round-3 verdict item #8).

Runs the full corpus-cleaning pipeline — exact dedup -> quality filter ->
near-duplicate pairs -> survivor table — as ONE composed plan at 1x and 10x
the sf0.1 documents table, proving the composition (not just each operator)
holds when the data grows an order of magnitude.

The 10x corpus is a clearly-labeled synthetic scale-up of the driver's own
sf0.1 documents table (the driver generates no sf1): each replica r shifts
doc ids by r*10^7 and prepends a per-replica token to the text, so replicas
are distinct under exact dedup and non-near-duplicate across replicas —
duplicate structure (planted exact + near copies per replica) scales
linearly with the corpus, like a real crawl.  Everything is deterministic.

Results append to BENCH/BASELINE.md.  Run: python bench/pipeline_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _corpus(spark, docs, replicas: int):
    """docs + per-replica planted exact (id+1M) and near (id+2M) copies,
    replicated ``replicas`` times under disjoint id ranges.  Replica r>0
    interleaves a replica-specific separator token between the words, so
    EVERY word 3-shingle contains the separator: cross-replica shingle
    overlap is zero (replicas are genuinely new content to the near-dup
    stage, like distinct crawl segments) while token counts and quality
    ratios stay in the keep range."""
    from pyspark.sql import functions as F

    from poppy_spark.spark.dedup import normalized_words

    from poppy_spark.spark.text import STOPWORDS

    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    parts = []
    for r in range(replicas):
        # per-replica BIJECTION on the vocabulary: non-stopwords get a
        # replica suffix, stopwords stay.  Within a replica the similarity
        # structure (shingle sets, LSH buckets, quality ratios) is identical
        # to the base corpus; across replicas shingle overlap is ~zero
        # (only all-stopword triples survive), so replicas are genuinely
        # new content to the near-dup stage — like distinct crawl segments.
        # Applied to replica 0 too, so 1x and 10x rows have identical shape.
        words = normalized_words(F.col("text"))
        tagged = F.transform(
            words,
            lambda w: F.when(F.array_contains(sw, w), w).otherwise(
                F.concat(w, F.lit(f"r{r}"))
            ),
        )
        base = docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            F.concat_ws(" ", tagged).alias("text"),
        )
        long_docs = base.filter(F.size(normalized_words(F.col("text"))) >= 30)
        parts.append(base)
        parts.append(
            base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        )
        parts.append(
            long_docs.select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz-near-dup")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _pipeline(spark, corpus):
    from pyspark.sql import functions as F

    from poppy_spark.spark.dedup import drop_exact_duplicates, near_duplicate_pairs
    from poppy_spark.spark.text import quality_score

    surv = drop_exact_duplicates(corpus, "text", "doc_id")
    qual = (
        quality_score(surv, "text")
        .filter(F.col("quality") >= 0.99)
        .select("doc_id", "text")
    )
    pairs = near_duplicate_pairs(
        qual, "text", "doc_id", threshold=0.85, n_perms=64, bands=16
    )
    final = qual.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    return final.count()


def main() -> None:
    from poppy_spark.spark.session import get_spark

    spark = get_spark(
        "poppy-pipeline-scale", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .repartition(CPUS)
        .cache()
    )
    n_docs = docs.count()

    results = {}
    for replicas in (1, 10):
        corpus = _corpus(spark, docs, replicas).repartition(CPUS).cache()
        n_rows = corpus.count()
        best = float("inf")
        survivors = None
        for _ in range(2):
            t0 = time.perf_counter()
            survivors = _pipeline(spark, corpus)
            best = min(best, time.perf_counter() - t0)
        corpus.unpersist()
        results[f"{replicas}x"] = {
            "corpus_rows": n_rows,
            "survivors": survivors,
            "sec": round(best, 2),
            "k_rows_per_sec": round(n_rows / best / 1e3, 1),
        }
    r1, r10 = results["1x"], results["10x"]
    ratio = r10["sec"] / r1["sec"]
    out = {
        "job": "corpus_clean_pipeline_scale",
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "n_base_docs": n_docs,
        "results": results,
        "time_ratio_10x_over_1x": round(ratio, 2),
        "throughput_retained_at_10x": round(
            r10["k_rows_per_sec"] / r1["k_rows_per_sec"], 2
        ),
        "at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    print(json.dumps(out))
    md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\n### Composed pipeline 1x -> 10x scale ({out['at']})\n\n"
            f"Full cleaning pipeline (exact dedup -> quality -> near-dup -> survivors)\n"
            f"as one plan over the sf0.1 documents table and a deterministic 10x\n"
            f"replica expansion (see bench/pipeline_scale.py), local[{CPUS}]:\n\n"
            f"| corpus | rows | survivors | sec | k rows/s |\n|---|---|---|---|---|\n"
            f"| 1x | {r1['corpus_rows']} | {r1['survivors']} | {r1['sec']} | {r1['k_rows_per_sec']} |\n"
            f"| 10x | {r10['corpus_rows']} | {r10['survivors']} | {r10['sec']} | {r10['k_rows_per_sec']} |\n\n"
            f"10x data costs {out['time_ratio_10x_over_1x']}x the time "
            f"({out['throughput_retained_at_10x']}x throughput retained).\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
