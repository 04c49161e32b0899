"""Benchmark harness: headline sketch queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "throughput": {...}}

The headline figure mirrors the reference bench (``poppy/src/bin/poppy.rs:
411-556``): bulk Bloom build + membership probe, reported both as seconds and
as M keys/sec.  Scaling-efficiency evidence (local[8] vs local[32]) lives in
``bench/scaling.py`` (writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _read_steal() -> tuple[int, int] | None:
    """(steal_jiffies, total_jiffies) from the aggregate /proc/stat cpu line."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
    except OSError:
        return None
    if not parts or parts[0] != "cpu":
        return None
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def steal_probe(probe_sec: float) -> dict | None:
    """Sample hypervisor steal for ``probe_sec`` before the timed suite.

    Cross-boot forensics (BENCH/BASELINE.md, round 4) showed 0.48-0.76x
    scaling 'regressions' that were pure hypervisor steal; the protocol
    that settled it — probe first, measure during, discard >2% — is
    automated here so every BENCH JSON carries its own noise verdict."""
    a = _read_steal()
    if a is None:
        return None
    time.sleep(probe_sec)
    b = _read_steal()
    dt = max(1, b[1] - a[1])
    return {
        "probe_sec": probe_sec,
        "probe_steal_jiffies": b[0] - a[0],
        "probe_steal_frac": round((b[0] - a[0]) / dt, 5),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    steal = steal_probe(float(os.environ.get("SPARK_GRAFT_STEAL_PROBE_SEC", "5")))
    run_start_steal = _read_steal()

    from poppy_spark.spark.session import get_spark

    spark = get_spark(app_name="poppy-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from poppy_spark.sketches import (
        BloomSketch, CmsSketch, HllSketch, KllSketch, MinHashSketch, TDigestSketch,
    )
    from poppy_spark.spark.agg import build_sketch, build_sketch_grouped
    from poppy_spark.spark.probe import bloom_contains

    ncpu = int(cpus)
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(ncpu).cache()
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(ncpu).cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(min(ncpu, 8)).cache()
    n_line = lineitem.count()
    n_events = events.count()
    docs.count()
    # warm the Python workers (imports, numpy page-in) before timing,
    # mirroring the reference's repeated-run protocol (bin/poppy.rs:127-129)
    from poppy_spark.sketches import BloomSketch as _B
    from poppy_spark.spark.agg import build_sketch as _bs
    _bs(lineitem.limit(10000), "l_orderkey", _B.factory(10000, 0.01))

    timings: dict[str, float] = {}
    throughput: dict[str, float] = {}

    def bench(name, fn, runs=2):
        best, out = float("inf"), None
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        return out

    # 1. bulk bloom build (insert) over all lineitem keys
    n_keys = lineitem.select("l_orderkey").distinct().count()
    factory = BloomSketch.factory(n_keys, 0.001)
    sk = bench(
        "bloom_build",
        lambda: build_sketch(lineitem, "l_orderkey", factory),
    )
    # 2. membership probe of every row (the `check` path)
    bench(
        "bloom_probe",
        lambda: bloom_contains(lineitem, "l_orderkey", sk.dumps(), "hit")
        .agg(F.sum(F.col("hit").cast("long")))
        .collect(),
    )
    throughput["bloom_insert_M_keys_per_sec"] = round(n_line / timings["bloom_build"] / 1e6, 3)
    throughput["bloom_probe_M_keys_per_sec"] = round(n_line / timings["bloom_probe"] / 1e6, 3)

    # 2b. bucket-range-sharded build + shuffle-join probe (the >10^9-capacity
    # path: per-task memory is its shards' bytes, shuffle is index tuples)
    from poppy_spark.spark.sharded import build_sharded_bloom

    def sharded_build():
        sb = build_sharded_bloom(
            lineitem, "l_orderkey", capacity=n_keys, fpp=0.001,
            n_shards=int(cpus), persist=False,
        )
        sb.states.write.format("noop").mode("overwrite").save()
        return sb

    bench("sharded_build", sharded_build)
    sb = build_sharded_bloom(
        lineitem, "l_orderkey", capacity=n_keys, fpp=0.001, n_shards=int(cpus)
    )
    sb.states.count()  # materialize the persisted states before timing probes
    bench(
        "sharded_probe",
        lambda: sb.contains(lineitem, "l_orderkey", "hit", strategy="shuffle")
        .agg(F.sum(F.col("hit").cast("long")))
        .collect(),
    )
    # auto strategy: this filter fits the broadcast budget, so contains()
    # reassembles once and broadcast-probes — should track bloom_probe, not
    # sharded_probe (round-3 item: auto-pick the probe shape)
    bench(
        "sharded_probe_auto",
        lambda: sb.contains(lineitem, "l_orderkey", "hit")
        .agg(F.sum(F.col("hit").cast("long")))
        .collect(),
    )
    sb.states.unpersist()
    throughput["sharded_insert_M_keys_per_sec"] = round(n_line / timings["sharded_build"] / 1e6, 3)
    throughput["sharded_probe_M_keys_per_sec"] = round(n_line / timings["sharded_probe"] / 1e6, 3)

    # 3. grouped HLL distinct users per event_type
    bench(
        "hll_grouped",
        lambda: build_sketch_grouped(events, "user_id", ["event_type"], HllSketch.factory(14)).collect(),
    )
    # 4. CMS frequencies over event_type
    bench("cms_build", lambda: build_sketch(events, "event_type", CmsSketch.factory(65536, 5)))
    # 5. KLL median of value
    kll = bench("kll_build", lambda: build_sketch(events, "value", KllSketch.factory(200)))
    kll.quantile(0.5)
    # 6. t-digest p99
    td = bench("tdigest_build", lambda: build_sketch(events, "value", TDigestSketch.factory(200)))
    td.quantile(0.99)
    # 7. MinHash signatures per doc source
    bench(
        "minhash_grouped",
        lambda: build_sketch_grouped(docs, "text", ["source"], MinHashSketch.factory(128)).collect(),
    )
    # 8. near-duplicate detection over documents (signatures -> LSH -> verify)
    from poppy_spark.spark.dedup import near_duplicate_pairs

    bench(
        "neardup_docs",
        lambda: near_duplicate_pairs(docs, "text", "doc_id", threshold=0.8, n_perms=64, bands=16).count(),
    )
    # 9. text quality + language id over documents
    from poppy_spark.spark.text import detect_language, quality_score

    bench(
        "text_quality",
        lambda: detect_language(quality_score(docs, "text"), "text")
        .agg(F.avg("quality"), F.count_distinct("lang_guess"))
        .collect(),
    )
    # 10. the composed corpus-cleaning pipeline as one plan (round-3
    # flagship): exact dedup -> quality filter -> near-dup pairs -> survivor
    # count, over docs + planted exact/near copies (same shape as the
    # corpus_clean_pipeline oracle row, at bench scale)
    from poppy_spark.spark.dedup import (
        drop_exact_duplicates, near_duplicate_pairs, normalized_words,
    )

    def corpus_pipeline():
        long_docs = docs.filter(F.size(normalized_words(F.col("text"))) >= 30)
        corpus = docs.select("doc_id", "text").unionAll(
            docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        ).unionAll(
            long_docs.select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz-near-dup")).alias("text"),
            )
        )
        surv = drop_exact_duplicates(corpus, "text", "doc_id")
        qual = quality_score(surv, "text").filter(F.col("quality") >= 0.99).select("doc_id", "text")
        pairs = near_duplicate_pairs(qual, "text", "doc_id", threshold=0.85, n_perms=64, bands=16)
        return qual.join(
            pairs.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
        ).count()

    bench("corpus_pipeline", corpus_pipeline)

    from poppy_spark.sketches import ThetaSketch
    from poppy_spark.spark.decontam import contamination_flags
    from poppy_spark.spark.packing import pack_sequences

    bench(
        "theta_grouped",
        lambda: build_sketch_grouped(
            events, "user_id", ["event_type"], ThetaSketch.factory(4096)
        ).count(),
    )

    ev_docs = docs.filter(F.col("doc_id") % 7 == 0)
    tr_docs = docs.filter(F.col("doc_id") % 7 != 0)
    bench(
        "decontam_docs",
        lambda: contamination_flags(tr_docs, ev_docs, "text", "doc_id", k=5)
        .filter("contaminated")
        .count(),
    )

    from poppy_spark.spark.decontam import remove_contaminated_spans

    bench(
        "decontam_spans",
        lambda: remove_contaminated_spans(
            tr_docs, ev_docs, "text", "doc_id", span_words=5
        )
        .agg(F.sum(F.length("text")))
        .collect(),
    )

    bench(
        "pack_docs",
        lambda: pack_sequences(docs, "doc_id", "n_chars", 2048, n_buckets=64).count(),
    )

    from poppy_spark.spark.text import repetition_stats, tf_idf_top_terms

    bench(
        "tfidf_docs",
        lambda: tf_idf_top_terms(docs, "text", "doc_id", 3).count(),
    )
    bench(
        "repetition_docs",
        lambda: repetition_stats(docs, "text", "doc_id")
        .agg(F.avg("dup_line_frac"), F.avg("top_ngram_char_frac"))
        .collect(),
    )

    from poppy_spark.spark.similarity import ivf_topk, ivf_train_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()
    ivf_queries = emb.limit(50).select(F.col("vec_id").alias("qid"), "embedding")
    # index build (centroid training) and query timed separately — at scale
    # the quantizer is trained once and reused across query batches
    cents = bench(
        "ivf_train",
        lambda: ivf_train_centroids(emb, "vec_id", "embedding", 32),
    )
    bench(
        "ivf_topk",
        lambda: ivf_topk(
            emb, ivf_queries, "vec_id", "embedding", "qid",
            k=10, n_centroids=32, n_probe=4, centroids=cents,
        ).count(),
    )

    from poppy_spark.spark.dedup import line_dedup_corpus, ordered_group_duplicates
    from poppy_spark.spark.profile import profile_table
    from poppy_spark.spark.text import scrub_pii

    bench(
        "line_dedup_docs",
        lambda: line_dedup_corpus(docs, "text", "doc_id")
        .agg(F.sum(F.length("text"))).collect(),
    )
    # 10b. line dedup under planted skew: ONE boilerplate line appended to
    # every document (one digest holding n_docs copies).  The round-4 plan
    # keeps text off the digest-keyed exchange, so this row should track
    # line_dedup_docs, not blow up with the hot key
    skew_docs = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit("\naccept all cookies to continue")).alias("text"),
    )
    bench(
        "line_dedup_skew",
        lambda: line_dedup_corpus(skew_docs, "text", "doc_id")
        .agg(F.sum(F.length("text"))).collect(),
    )
    convs = docs.select(
        (F.col("doc_id") % 500).alias("conv"), F.col("doc_id").alias("idx"), "text"
    )
    bench(
        "conv_dedup_docs",
        lambda: ordered_group_duplicates(convs, "conv", "idx", "text").count(),
    )
    bench(
        "scrub_docs",
        lambda: scrub_pii(docs, "text")
        .agg(F.sum(F.col("pii_found").cast("long"))).collect(),
    )
    from poppy_spark.spark.text import gopher_quality_filters, normalize_text

    # round-5 text ops: gopher is all-codegen (should track scrub_docs);
    # normalize carries the one Arrow-batched unicodedata UDF stage
    bench(
        "gopher_docs",
        lambda: gopher_quality_filters(docs, "text")
        .agg(F.sum(F.col("gopher_pass").cast("long"))).collect(),
    )
    bench(
        "normalize_docs",
        lambda: normalize_text(docs, "text")
        .agg(F.sum(F.length("text"))).collect(),
    )
    bench(
        "profile_events",
        lambda: profile_table(
            events, ["event_id", "user_id", "event_type", "value"]
        ).count(),
    )

    # round-4 operators
    from poppy_spark.spark.lm import score_bigram_lm, train_bigram_lm
    from poppy_spark.spark.sampling import proportional_mix
    from poppy_spark.spark.spans import repeated_spans

    def lm_train_score():
        bigrams, unigrams, v = train_bigram_lm(docs, "text", "doc_id")
        return (
            score_bigram_lm(docs, "text", "doc_id", bigrams, unigrams, v)
            .agg(F.avg("perplexity"))
            .collect()
        )

    bench("lm_docs", lm_train_score)
    bench(
        "spans_docs",
        lambda: repeated_spans(docs, "text", "doc_id", span_words=10, min_docs=2).count(),
    )
    bench(
        "mix_docs",
        lambda: proportional_mix(
            docs, "doc_id", "lang", {"en": 0.5, "fr": 0.2, "de": 0.2, "es": 0.1}
        ).count(),
    )

    # real-media codec throughput (BMP encode+decode+features per doc)
    from poppy_spark.spark.multimodal import encode_bmp, extract_media_features

    def media_row():
        import numpy as _np
        import pandas as _pd
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
                T.StructField("media_type", T.StringType()),
                T.StructField("media_w", T.IntegerType()),
                T.StructField("media_h", T.IntegerType()),
                T.StructField("media_ms", T.IntegerType()),
            ]
        )

        def gen(batches):
            for pdf in batches:
                yield _pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media": [
                            encode_bmp(
                                _np.full((16, 16, 3), int(d) % 256, dtype=_np.uint8)
                            )
                            for d in pdf["doc_id"]
                        ],
                        "media_type": "image",
                        "media_w": 16,
                        "media_h": 16,
                        "media_ms": None,
                    }
                )

        imgs = docs.select("doc_id").mapInPandas(gen, schema)
        return extract_media_features(imgs, allow_fake=False).agg(
            F.count("feat")
        ).collect()

    from poppy_spark.spark.text import cap_per_domain

    # per-domain capping, uniform domains vs ONE hot SEO-farm domain holding
    # ~95% of rows.  grouped_bottom_k's two-phase plan pre-thins the farm
    # map-side, so the skew row should track the uniform row (the
    # line_dedup_skew pattern: a planted-skew gate beside its clean twin)
    uni_urls = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://site"), (F.col("doc_id") % 500).cast("string"),
            F.lit(".org/p/"), F.col("doc_id").cast("string"),
        ),
    )
    skew_urls = docs.withColumn(
        "url",
        F.when(
            F.col("doc_id") % 20 != 0,
            F.concat(F.lit("https://farm.example.com/p/"),
                     F.col("doc_id").cast("string")),
        ).otherwise(
            F.concat(
                F.lit("https://site"), (F.col("doc_id") % 500).cast("string"),
                F.lit(".org/p/"), F.col("doc_id").cast("string"),
            )
        ),
    )
    bench(
        "cap_domain_docs",
        lambda: cap_per_domain(uni_urls, "url", "doc_id", 10).count(),
    )
    bench(
        "cap_domain_skew",
        lambda: cap_per_domain(skew_urls, "url", "doc_id", 10).count(),
    )

    # round-5 verbs: repeated-span removal (boilerplate tail planted on a
    # quarter of the docs) and SemDeDup-shaped semantic dedup over the
    # embeddings table
    from poppy_spark.spark.similarity import semantic_dedup
    from poppy_spark.spark.spans import remove_repeated_spans

    spans_docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"),
                     F.lit(" all rights reserved contact the site administrator today")),
        ).otherwise(F.col("text")).alias("text"),
    )
    bench(
        "remove_spans_docs",
        lambda: remove_repeated_spans(spans_docs, "text", "doc_id",
                                      span_words=8, min_docs=2)
        .agg(F.sum(F.length("text"))).collect(),
    )
    bench(
        "semantic_dedup_emb",
        lambda: semantic_dedup(emb, "vec_id", "embedding", threshold=0.95,
                               n_centroids=32, iters=3).count(),
    )
    bench("media_codecs", media_row)

    from poppy_spark.spark.similarity import pq_encode, pq_topk, pq_train_codebooks

    pq_books = bench(
        "pq_train_encode",
        lambda: (
            lambda b: (pq_encode(emb, "vec_id", "embedding", b).count(), b)[1]
        )(pq_train_codebooks(emb, "vec_id", "embedding", 16, 64, iters=5)),
    )
    pq_codes = pq_encode(emb, "vec_id", "embedding", pq_books).cache()
    pq_codes.count()
    bench(
        "pq_topk",
        lambda: pq_topk(pq_codes, ivf_queries, "embedding", "qid", 10, pq_books).count(),
    )
    pq_codes.unpersist()

    throughput["events_M_rows_per_sec_hll"] = round(n_events / timings["hll_grouped"] / 1e6, 3)

    total = round(sum(timings.values()), 4)
    # boot id: cross-boot timings on this VM class vary ~1.5x (see
    # BENCH/PERF_NOTES.md) — only same-boot_id runs are comparable
    try:
        with open("/proc/sys/kernel/random/boot_id") as fh:
            boot_id = fh.read().strip()
    except OSError:
        boot_id = None
    run_end_steal = _read_steal()
    if steal is not None and run_start_steal and run_end_steal:
        dt = max(1, run_end_steal[1] - run_start_steal[1])
        steal["run_steal_jiffies"] = run_end_steal[0] - run_start_steal[0]
        steal["run_steal_frac"] = round(steal["run_steal_jiffies"] / dt, 5)
        # the round-4 forensics threshold: samples above ~2% steal are
        # hypervisor-contaminated and must not be read as perf deltas
        steal["contaminated"] = bool(
            steal["probe_steal_frac"] > 0.02 or steal["run_steal_frac"] > 0.02
        )
    print(
        json.dumps(
            {
                "metric": "sketch suite wall-clock (bloom build+probe, grouped hll, cms, kll, tdigest, minhash)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "throughput": throughput,
                "cpus": int(cpus),
                "boot_id": boot_id,
                "steal": steal,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
