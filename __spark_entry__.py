"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operators from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame callables; ``oracle_sql()`` gives the DuckDB
ANSI-SQL ground truth for each.  Approximate sketches are gated through
*exact-matchable* outputs: the query returns exact values (computed with
Spark's exact aggregates, which must agree with DuckDB) plus boolean
``within_bound`` columns asserting the sketch's published error bound —
so the value-hash comparison is deterministic while still failing if a
sketch breaks its guarantee.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

_HLL_P = 14
_HLL_TOL = 3 * 1.04 / (2 ** (_HLL_P / 2))  # 3 standard errors


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Bloom membership (poppy core: insert/check/union — SURVEY §2.4)
# --------------------------------------------------------------------------


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate LEFT SEMI JOIN: lineitem keys through a bloom of orders.
    All probes are members, so zero false negatives => exact result."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch
    from poppy_spark.spark.probe import bloom_semi_join

    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    sk = build_sketch(orders, "o_orderkey", BloomSketch.factory(orders.count(), 0.001))
    probes = lineitem.select("l_orderkey").distinct()
    return bloom_semi_join(probes, "l_orderkey", sk.dumps())


def q_bloom_anti_join_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-FN + FPR-bound gate: members must all hit; synthesized
    non-members may false-positive at most 2x the configured fpp."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch
    from poppy_spark.spark.probe import bloom_contains

    orders = _read(spark, sf_dir, "orders")
    fpp = 0.01
    sk = build_sketch(orders, "o_orderkey", BloomSketch.factory(orders.count(), fpp))
    members = orders.select(F.col("o_orderkey").cast("string").alias("probe"), F.lit(True).alias("is_member"))
    nonmembers = orders.select(
        F.format_string("nonmember-%09d", F.col("o_orderkey")).alias("probe"),
        F.lit(False).alias("is_member"),
    )
    probes = members.unionAll(nonmembers)
    hits = bloom_contains(probes, "probe", sk.dumps(), "hit")
    agg = hits.agg(
        F.count("*").alias("n_probed"),
        F.sum(F.when(F.col("is_member") & ~F.col("hit"), 1).otherwise(0)).alias("n_members_missed"),
        (
            F.sum(F.when(~F.col("is_member") & F.col("hit"), 1).otherwise(0))
            / F.sum(F.when(~F.col("is_member"), 1).otherwise(0))
        ).alias("fp_rate"),
    )
    return agg.select(
        "n_probed",
        "n_members_missed",
        (F.col("fp_rate") <= F.lit(fpp * 2.0)).alias("fp_within_bound"),
    )


def q_bloom_count_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom count_estimate (approx COUNT DISTINCT analog, bloom.rs:393-400)
    must land within 5% of the exact distinct count."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch

    docs = _read(spark, sf_dir, "documents")
    n_exact = docs.select("text").distinct().count()
    sk = build_sketch(docs.select("text").distinct(), "text", BloomSketch.factory(n_exact, 0.001))
    est = sk.result()
    ok = abs(est - n_exact) <= max(0.05 * n_exact, 2)
    return spark.createDataFrame([(n_exact, ok)], "n_exact bigint, within_5pct boolean")


def q_bloom_merge_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North rule: byte-identical final state across independent partition
    orderings (union associativity + commutativity)."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch

    orders = _read(spark, sf_dir, "orders")
    n = orders.count()
    factory = BloomSketch.factory(n, 0.001)
    states = [
        build_sketch(orders.repartition(p), "o_orderkey", factory).dumps()
        for p in (3, 8, 17)
    ]
    agree = states[0] == states[1] == states[2]
    return spark.createDataFrame([(n, agree)], "n_rows bigint, orderings_agree boolean")


def q_bloom_count_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_common_entries (approximate join-cardinality, bloom.rs:343-356):
    customers-with-orders via AND-popcount of two blooms, within 15%."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch

    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    cap = customer.count()
    factory = BloomSketch.factory(cap, 0.001)
    b_cust = build_sketch(customer, "c_custkey", factory)
    b_ord = build_sketch(orders.select("o_custkey").distinct(), "o_custkey", factory)
    est = b_cust.filter.count_common_entries(b_ord.filter)
    n_exact = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_semi")
        .select("o_custkey")
        .distinct()
        .count()
    )
    ok = abs(est - n_exact) <= max(0.15 * n_exact, 5)
    return spark.createDataFrame([(n_exact, ok)], "n_exact bigint, within_bound boolean")


# --------------------------------------------------------------------------
# HLL distinct counts per group / time bucket (SURVEY §2.9)
# --------------------------------------------------------------------------


def _hll_grouped(spark, df, key, group_col_expr, group_name, group_type):
    from poppy_spark.sketches import HllSketch
    from poppy_spark.spark.agg import build_sketch_grouped, sketch_value_column

    gdf = df.select(group_col_expr.alias(group_name), F.col(key).alias("__k"))
    states = build_sketch_grouped(gdf, "__k", [group_name], HllSketch.factory(_HLL_P))
    ests = sketch_value_column(states, HllSketch, "est").select(group_name, "est")
    exact = gdf.groupBy(group_name).agg(F.countDistinct("__k").alias("n_exact"))
    joined = exact.join(ests, group_name)
    return joined.select(
        group_name,
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.greatest(F.lit(_HLL_TOL) * F.col("n_exact"), F.lit(3.0))
        ).alias("within_bound"),
    )


def q_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    return _hll_grouped(spark, events, "user_id", F.col("event_type"), "event_type", "string")


def q_hll_users_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin the session timezone so collected timestamps match DuckDB's naive
    # reading of the parquet values regardless of the host default
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = _read(spark, sf_dir, "events")
    return _hll_grouped(spark, events, "user_id", F.date_trunc("day", F.col("ts")), "day", "timestamp")


# --------------------------------------------------------------------------
# Count-min frequency per key (SURVEY §2.9)
# --------------------------------------------------------------------------


def q_cms_event_type_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from poppy_spark.sketches import CmsSketch
    from poppy_spark.spark.agg import build_sketch

    events = _read(spark, sf_dir, "events")
    sk = build_sketch(events, "event_type", CmsSketch.factory(w=65536, d=5))
    exact = {r[0]: r[1] for r in events.groupBy("event_type").count().collect()}
    n_total = sum(exact.values())
    ests = sk.query_keys(list(exact))
    rows = []
    for i, k in enumerate(exact):
        est = int(ests[i])
        ok = exact[k] <= est <= exact[k] + sk.eps * n_total
        rows.append((k, exact[k], ok))
    return spark.createDataFrame(rows, "event_type string, n_exact bigint, within_bound boolean")


def q_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters: the exact top-10 users' estimated counts
    must sit inside the published MG bound [n_exact - N/(m+1), n_exact]
    after the distributed merge tree (mergeable-summaries guarantee)."""
    from poppy_spark.sketches import TopKSketch
    from poppy_spark.spark.agg import build_sketch

    events = _read(spark, sf_dir, "events")
    sk = build_sketch(events, "user_id", TopKSketch.factory(256))
    exact = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(10)
        .collect()
    )
    rows = []
    for r in exact:
        est = sk.estimate(str(r["user_id"]))
        ok = r["n_exact"] - sk.max_error <= est <= r["n_exact"]
        rows.append((r["user_id"], r["n_exact"], ok))
    return spark.createDataFrame(
        rows, "user_id bigint, n_exact bigint, within_bound boolean"
    )


def q_grouped_sharded_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One bucket-range-sharded Bloom filter PER GROUP (per event_type):
    build shuffles index tuples keyed by (group, shard) and each task
    materializes one shard at a time; probe cogroups on (group, shard).
    Gate: zero FN per group, a never-built group answers all-False, and
    every group's reassembled shards are byte-identical to a one-shot
    classic build of that group."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch
    from poppy_spark.spark.sharded import build_sharded_bloom_grouped

    events = _read(spark, sf_dir, "events")
    gsb = build_sharded_bloom_grouped(
        events, "user_id", "event_type", capacity=50_000, fpp=0.001, n_shards=4
    )
    probed = gsb.contains(events.select("event_type", "user_id"), "user_id")
    n_missed = probed.filter(~F.col("hit")).count()
    ghost = events.select(F.lit("no-such-type").alias("event_type"), "user_id")
    n_ghost = gsb.contains(ghost, "user_id").filter("hit").count()
    groups = [r[0] for r in events.select("event_type").distinct().collect()]
    bytes_equal = all(
        gsb.reassemble_group(g)
        == build_sketch(
            events.filter(F.col("event_type") == g),
            "user_id",
            BloomSketch.factory(50_000, 0.001),
        ).dumps()
        for g in sorted(groups)
    )
    # round-4: per-group set algebra (intersection + count_common, poppy
    # §2.4 #26/#28 in the grouped-sharded dimension) must match
    # BloomV2.intersection_merge / count_common_entries on the reassembled
    # group filters
    from poppy_spark.core import loads as core_loads

    lo = events.filter(F.col("user_id") % 2 == 0)
    hi = events.filter(F.col("user_id") % 3 == 0)
    a = build_sharded_bloom_grouped(
        lo, "user_id", "event_type", capacity=50_000, fpp=0.001, n_shards=4
    )
    b = build_sharded_bloom_grouped(
        hi, "user_id", "event_type", capacity=50_000, fpp=0.001, n_shards=4
    )
    inter = a.intersection(b)
    common = {r["event_type"]: r["estimate"] for r in a.count_common(b).collect()}
    algebra_ok = True
    for g in sorted(groups):
        fa = core_loads(a.reassemble_group(g))
        fb = core_loads(b.reassemble_group(g))
        want_common = fa.count_common_entries(fb)
        fa.intersection_merge(fb)
        algebra_ok = (
            algebra_ok
            and inter.reassemble_group(g) == fa.dumps()
            and common.get(g, 0) == want_common
        )
    return spark.createDataFrame(
        [(len(groups), n_missed, n_ghost, bool(bytes_equal), bool(algebra_ok))],
        "n_groups bigint, n_missed bigint, n_ghost_hits bigint, "
        "bytes_equal boolean, algebra_ok boolean",
    )


def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass-per-stat-family table profile of events: exact counts /
    nulls / min / max (JVM aggregate, reproduced exactly by DuckDB) plus
    HLL distinct and KLL median gated within their published bounds — two
    scans for any column count, the 100 TB profiling shape."""
    from poppy_spark.spark.profile import profile_table

    events = _read(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    prof = profile_table(events, cols)
    exact = events.agg(
        *[F.countDistinct(c).alias(f"d:{c}") for c in cols],
        F.expr("percentile(value, 0.5)").alias("p50v"),
    ).first()
    rows = []
    for r in prof.collect():
        c = r["column"]
        d_exact = exact[f"d:{c}"]
        d_ok = abs(r["distinct_est"] - d_exact) <= max(3.0, 5 * 1.04 / 128 * d_exact)
        p_ok = (
            abs(r["p50"] - exact["p50v"]) <= 0.06 * max(abs(exact["p50v"]), 1.0)
            if c == "value"
            else r["p50"] is None or c != "value"
        )
        rows.append(
            (c, r["n_rows"], r["n_nulls"], r["min_num"], r["max_num"],
             r["min_str"], r["max_str"], bool(d_ok), bool(p_ok))
        )
    return spark.createDataFrame(
        rows,
        "column string, n_rows bigint, n_nulls bigint, min_num double, "
        "max_num double, min_str string, max_str string, "
        "distinct_in_bound boolean, p50_in_bound boolean",
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-level dedup (C4/RefinedWeb-style) with a planted
    boilerplate footer on every 3rd document: the globally smallest
    (doc_id, line index) occurrence of each line survives, every later
    copy is removed, and documents are rebuilt in order.  Shuffle keys are
    md5 digests, never repeated line text.  DuckDB reproduces every
    rebuilt document byte-for-byte."""
    from poppy_spark.spark.dedup import line_dedup_corpus

    docs = _read(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\nsubscribe to our newsletter for updates"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return line_dedup_corpus(planted, "text", "doc_id")


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents with planted emails/IPs/phones on every
    5th/7th/11th doc: chained JVM regexp_replace (codegen, no shuffle), and
    every pattern is Java-regex/RE2-portable, so DuckDB reproduces the
    scrubbed text and the pii_found flag byte-for-byte."""
    from poppy_spark.spark.text import scrub_pii

    docs = _read(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" contact bob.smith@corp.example.com")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" from 10.1.2.3")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call 415-555-0199")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_pii(planted, "text").select("doc_id", "text", "pii_found")


def q_text_clean_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite (folds scrub_pii — round-4 window discipline): the full
    corpus text-cleaning pass end-to-end.  Plants non-NFC sequences
    (decomposed combining accents), C0/C1 control bytes, whitespace runs,
    AND the scrub_pii email/IP/phone fixtures, then runs
    ``normalize_text`` (NFC via the Arrow-batched unicodedata UDF;
    control-strip + whitespace-collapse stay codegen ``regexp_replace``)
    followed by ``scrub_pii``.  DuckDB reproduces the final text
    byte-for-byte (``nfc_normalize`` + the identical RE2 chain), so this
    is a TRUE-value oracle over every cleaning stage at once — the exact
    normalize-then-dedup ordering a C4/RefinedWeb-style pipeline uses."""
    from poppy_spark.spark.text import normalize_text, scrub_pii, strip_html

    docs = _read(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" cafe\u0301  tab\there"),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" contact bob.smith@corp.example.com")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" from 10.1.2.3")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call 415-555-0199")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" ctl\x01\x7fend")).otherwise(F.lit("")),
            # round-5 session 3: markup plant \u2014 strip_html runs FIRST,
            # the real web-pipeline order (markup -> normalize -> scrub)
            F.when(
                F.col("doc_id") % 17 == 0,
                F.lit(" <p>click <b>here</b> &amp; enjoy</p><script>evil()</script>"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    stripped = strip_html(planted, "text")
    cleaned = normalize_text(stripped, "text", form="NFC")
    return scrub_pii(cleaned, "text").select("doc_id", "text", "pii_found")


def q_conversation_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-conversation exact dedup (the transcripts shape): documents
    rolled into 100 synthetic conversations plus an exact planted copy of
    each; sequences ordered by turn index collapse to md5 digests (32-byte
    shuffle keys, never full texts), duplicate classes grouped on the
    digest.  DuckDB reproduces every (canonical, n_groups) row exactly via
    ordered string_agg + md5."""
    from poppy_spark.spark.dedup import ordered_group_duplicates

    docs = _read(spark, sf_dir, "documents")
    convs = docs.select(
        (F.col("doc_id") % 100).alias("conv"), F.col("doc_id").alias("idx"), "text"
    )
    both = convs.unionAll(convs.select(F.col("conv") + 10_000, "idx", "text"))
    return ordered_group_duplicates(both, "conv", "idx", "text")


def q_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL-driven equal-mass bucketing of event values into 8 shards: two
    passes, zero row shuffles (states-only build + CASE projection).  Gate:
    every bucket's mass within 5% of N/8 and all N rows assigned exactly
    once — the balance the sketch's rank error promises."""
    from poppy_spark.spark.sampling import quantile_buckets

    events = _read(spark, sf_dir, "events")
    out = quantile_buckets(events, "value", 8)
    n = events.count()
    counts = out.groupBy("bucket").count().collect()
    total = sum(r["count"] for r in counts)
    rows = [
        (int(r["bucket"]), bool(abs(r["count"] - n / 8) <= 0.05 * n / 8), total)
        for r in counts
    ]
    return spark.createDataFrame(
        rows, "bucket int, within_tol boolean, n_total bigint"
    )


def q_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy-hitter word 2-grams (boilerplate-phrase discovery)
    via the same Misra-Gries summary, fed by a pure-array n-gram explode:
    the exact top-10 grams' estimates must sit in [n_exact - N/(m+1),
    n_exact] after the distributed merge tree."""
    from poppy_spark.sketches import TopKSketch
    from poppy_spark.spark.agg import build_sketch
    from poppy_spark.spark.text import word_ngrams

    docs = _read(spark, sf_dir, "documents")
    grams = docs.select(F.explode(word_ngrams(F.col("text"), 2)).alias("gram"))
    sk = build_sketch(grams, "gram", TopKSketch.factory(8192))
    exact = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("gram"))
        .limit(10)
        .collect()
    )
    rows = [
        (
            r["gram"],
            r["n_exact"],
            bool(r["n_exact"] - sk.max_error <= sk.estimate(r["gram"]) <= r["n_exact"]),
        )
        for r in exact
    ]
    return spark.createDataFrame(rows, "gram string, n_exact bigint, within_bound boolean")


# --------------------------------------------------------------------------
# Quantiles: KLL median and t-digest p99 per group (SURVEY §2.9)
# --------------------------------------------------------------------------


def _quantile_gate(spark, sf_dir, factory, sketch_cls, q, tol):
    from poppy_spark.spark.agg import build_sketch_grouped

    events = _read(spark, sf_dir, "events")
    states = build_sketch_grouped(events, "value", ["event_type"], factory)
    est_by_type = {
        r["event_type"]: sketch_cls.loads(bytes(r["state"])).quantile(q)
        for r in states.collect()
    }
    est_map = F.create_map(*[F.lit(x) for kv in est_by_type.items() for x in kv])
    ranks = (
        events.withColumn("__est", est_map[F.col("event_type")])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_exact"),
            F.avg((F.col("value") <= F.col("__est")).cast("double")).alias("rank"),
        )
    )
    return ranks.select(
        "event_type",
        "n_exact",
        (F.abs(F.col("rank") - F.lit(q)) <= F.lit(tol)).alias("within_bound"),
    )


def q_kll_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from poppy_spark.sketches import KllSketch

    return _quantile_gate(spark, sf_dir, KllSketch.factory(200), KllSketch, 0.5, 3.0 / 200 + 0.005)


def q_tdigest_value_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    from poppy_spark.sketches import TDigestSketch

    return _quantile_gate(spark, sf_dir, TDigestSketch.factory(200), TDigestSketch, 0.99, 0.01)


# --------------------------------------------------------------------------
# MinHash set similarity between document sources (dedup family)
# --------------------------------------------------------------------------


def q_minhash_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from poppy_spark.sketches import MinHashSketch
    from poppy_spark.spark.agg import build_sketch_grouped

    docs = _read(spark, sf_dir, "documents")
    states = build_sketch_grouped(docs, "text", ["source"], MinHashSketch.factory(128))
    sigs = {r["source"]: MinHashSketch.loads(bytes(r["state"])) for r in states.collect()}
    # exact jaccard per pair via exact distinct counts
    texts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.countDistinct("text").alias("n")).collect()
    }
    inter = {
        (r["sa"], r["sb"]): r["n"]
        for r in docs.alias("a")
        .join(docs.alias("b"), F.col("a.text") == F.col("b.text"))
        .filter(F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"), F.col("a.text"))
        .distinct()
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    tol = 3.0 / (128 ** 0.5)
    rows = []
    srcs = sorted(sigs)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            ni = inter.get((a, b), 0)
            true_j = ni / (texts[a] + texts[b] - ni) if (texts[a] + texts[b] - ni) else 0.0
            est_j = sigs[a].jaccard(sigs[b])
            rows.append((a, b, abs(est_j - true_j) <= tol + 0.02))
    return spark.createDataFrame(rows, "source_a string, source_b string, within_bound boolean")


# --------------------------------------------------------------------------
# Exact dedup + text analysis (training-data pipeline family)
# --------------------------------------------------------------------------


def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"))
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ", -1)).cast("bigint").alias("n_tokens"),
        (F.length("text") == F.col("n_chars")).alias("chars_ok"),
    )


def q_text_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Punctuation/digit counts per document — exact SQL-expressible text
    statistics from the text-analysis family."""
    docs = _read(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("bigint").alias("n_digits"),
        (F.length(t) - F.length(F.regexp_replace(t, r"\s", ""))).cast("bigint").alias("n_spaces"),
    )


def q_text_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score + stopword-vote language id + the published Gopher
    quality rules (Rae et al. 2021) per document — all pure JVM
    expressions, replicated exactly in the DuckDB oracle (same ratios,
    same tie-break: max score then lexicographically-max language; the
    Gopher ratio rules evaluate in integer arithmetic on both sides, so
    every boolean is bit-exact)."""
    from poppy_spark.spark.text import (
        detect_language,
        gopher_quality_filters,
        quality_score,
    )

    docs = _read(spark, sf_dir, "documents")
    out = gopher_quality_filters(
        detect_language(quality_score(docs, "text"), "text"), "text"
    )
    return out.select(
        "doc_id",
        F.col("quality"),
        F.col("lang_guess"),
        F.col("n_words"),
        F.col("rule_words"),
        F.col("rule_mean_wl"),
        F.col("rule_symbols"),
        F.col("rule_bullets"),
        F.col("rule_ellipsis"),
        F.col("rule_alpha"),
        F.col("rule_stops"),
        F.col("gopher_pass"),
    )


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-flavored word-piece counts — the lookaround splitter is
    equivalent to counting maximal [A-Za-z_]+ / [0-9]+ / single-punct runs,
    which IS expressible in DuckDB's RE2 (lookarounds are not)."""
    from poppy_spark.spark.text import bpe_ish_token_count

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n_pieces"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint gates: reordering a document's
    tokens must not change its fingerprint, and distinct fingerprints must
    match the exact distinct token-set count (collision-freeness on this
    corpus — deterministic, so hash-stable)."""
    from poppy_spark.spark.text import doc_fingerprint

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    fp_a = doc_fingerprint(docs, "text").select("doc_id", F.col("fingerprint").alias("fa"))
    reordered = docs.select(
        "doc_id",
        F.concat_ws(" ", F.reverse(F.split(F.lower(F.col("text")), r"\s+"))).alias("text"),
    )
    fp_b = doc_fingerprint(reordered, "text").select("doc_id", F.col("fingerprint").alias("fb"))
    joined = fp_a.join(fp_b, "doc_id")
    n_mismatch = joined.filter(F.col("fa") != F.col("fb")).count()
    n_fp = fp_a.select("fa").distinct().count()
    n_sets = (
        docs.select(
            F.sort_array(
                F.array_distinct(F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != ""))
            ).alias("ts")
        )
        .distinct()
        .count()
    )
    return spark.createDataFrame(
        [(docs.count(), n_mismatch, n_fp == n_sets)],
        "n_docs bigint, n_mismatch bigint, fp_distinct_matches_sets boolean",
    )


def q_lsh_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate recall on exact duplicates: duplicate every document
    under a shifted id; every (i, i+offset) pair must be an LSH candidate
    (identical texts share all band buckets) — n_missed must be 0."""
    from poppy_spark.spark.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dup = docs.select((F.col("doc_id") + F.lit(off)).alias("doc_id"), "text")
    both = docs.unionAll(dup)
    sigs = minhash_signatures(both, "text", "doc_id", n_perms=64, k=3)
    cands = lsh_candidate_pairs(sigs, bands=16, rows_per_band=4)
    found = cands.filter(
        (F.col("id_a") < off) & (F.col("id_b") - F.col("id_a") == off)
    ).count()
    return spark.createDataFrame(
        [(n, n - found)], "n_docs bigint, n_missed bigint"
    )


def q_simhash_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash of an exact duplicate is identical: count hamming-0 pairs
    among (doc, shifted-copy) — must equal the document count."""
    from poppy_spark.spark.dedup import simhash64

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dup = docs.select((F.col("doc_id") + F.lit(off)).alias("doc_id"), "text")
    sh = simhash64(docs.unionAll(dup), "text", "doc_id")
    a = sh.filter(F.col("id") < off).select(F.col("id").alias("ia"), F.col("simhash").alias("ha"))
    b = sh.filter(F.col("id") >= off).select((F.col("id") - off).alias("ia"), F.col("simhash").alias("hb"))
    n_h0 = a.join(b, "ia").filter(F.col("ha") == F.col("hb")).count()
    return spark.createDataFrame([(n, n_h0)], "n_docs bigint, n_hamming0 bigint")


def q_cosine_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine nearest neighbor (excluding self) for the
    first 10 embedding vectors — matched against DuckDB's
    list_cosine_similarity."""
    from poppy_spark.spark.similarity import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    top = cosine_topk(emb, queries, "vec_id", "embedding", "qid", k=2)
    return (
        top.filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.min("id").alias("nn_id"))
        .select(F.col("query_id").cast("bigint"), F.col("nn_id").cast("bigint"))
    )


def q_bloom_grouped_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group membership: each order key probed against its own
    priority-group filter must hit (zero FN per group)."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch_grouped
    from poppy_spark.spark.probe import bloom_contains_grouped

    orders = _read(spark, sf_dir, "orders")
    # capacity sized from the data (any single group holds at most n keys)
    states = build_sketch_grouped(
        orders, "o_orderkey", ["o_orderpriority"], BloomSketch.factory(orders.count(), 0.001)
    )
    probed = bloom_contains_grouped(orders, "o_orderkey", "o_orderpriority", states, "hit")
    return probed.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(~F.col("hit"), 1).otherwise(0)).alias("n_missed"),
    )


def q_transcripts_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star shape end-to-end on the transcripts table itself:
    'has this text been seen?' (Bloom over turn text, salted repartition for
    the skewed conversation, zero FN) and 'distinct conversations per role'
    (grouped HLL within its published bound)."""
    from poppy_spark.data.transcripts import generate_transcripts
    from poppy_spark.sketches import BloomSketch, HllSketch
    from poppy_spark.spark.agg import (
        build_sketch, build_sketch_grouped, repartition_salted, sketch_value_column,
    )
    from poppy_spark.spark.probe import bloom_contains

    t = generate_transcripts(spark, n_convs=500, seed=42)
    t = repartition_salted(t, "conv_id", 16)
    n_texts = t.select("text").distinct().count()
    sk = build_sketch(t, "text", BloomSketch.factory(n_texts, 0.001))
    n_missed = bloom_contains(t, "text", sk.dumps(), "hit").filter(~F.col("hit")).count()
    states = build_sketch_grouped(t, "conv_id", ["role"], HllSketch.factory(_HLL_P))
    ests = sketch_value_column(states, HllSketch, "est").select("role", "est")
    exact = t.groupBy("role").agg(F.countDistinct("conv_id").alias("n"))
    bad = (
        exact.join(ests, "role")
        .filter(
            F.abs(F.col("est") - F.col("n"))
            > F.greatest(F.lit(_HLL_TOL) * F.col("n"), F.lit(3.0))
        )
        .count()
    )
    n_roles = exact.count()
    return spark.createDataFrame(
        [(n_missed, n_roles, bad == 0)],
        "n_missed bigint, n_roles bigint, hll_within_bound boolean",
    )


def q_transcripts_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator determinism: regenerating the transcripts table yields zero
    row differences (per-turn text equality under stable ordering)."""
    from poppy_spark.data.transcripts import generate_transcripts

    a = generate_transcripts(spark, n_convs=300, seed=42)
    b = generate_transcripts(spark, n_convs=300, seed=42)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    return spark.createDataFrame([(diff == 0,)], "stable boolean")


def q_transcripts_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full north-star query family per role/tool/time bucket on the
    transcripts table: membership ('has this conv_id been seen for tool T?'
    — grouped Bloom, zero FN), distinct-count (HLL conversations per day
    within bound), frequency (count-min of tool calls per day within
    eps*N_day), and quantiles (KLL median + t-digest p99 of turn length per
    role within rank bounds).  States stay distributed through the grouped
    build; only finished per-group states (KBs each) are collected."""
    from poppy_spark.data.transcripts import generate_transcripts
    from poppy_spark.sketches import (
        BloomSketch, CmsSketch, HllSketch, KllSketch, TDigestSketch,
    )
    from poppy_spark.spark.agg import build_sketch_grouped, sketch_value_column
    from poppy_spark.spark.probe import bloom_contains_grouped

    t = generate_transcripts(spark, n_convs=600, seed=11).withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    ).withColumn("n_chars", F.length("text"))
    tooled = t.filter(F.col("tool").isNotNull())

    # membership per tool: Bloom over conv_id, grouped by tool; zero FN
    blooms = build_sketch_grouped(
        tooled, "conv_id", ["tool"], BloomSketch.factory(20_000, 0.001)
    ).select("tool", "state")
    n_missed = (
        bloom_contains_grouped(tooled, "conv_id", "tool", blooms, "hit")
        .filter(~F.col("hit"))
        .count()
    )

    # distinct conversations per day bucket: HLL within its published bound
    hll = sketch_value_column(
        build_sketch_grouped(t, "conv_id", ["day"], HllSketch.factory(_HLL_P)),
        HllSketch, "est",
    ).select("day", "est")
    hll_bad = (
        t.groupBy("day").agg(F.countDistinct("conv_id").alias("n"))
        .join(hll, "day")
        .filter(
            F.abs(F.col("est") - F.col("n"))
            > F.greatest(F.lit(_HLL_TOL) * F.col("n"), F.lit(3.0))
        )
        .count()
    )

    # tool-call frequency per day bucket: count-min within eps * N_day
    cms_by_day = {
        r["day"]: CmsSketch.loads(bytes(r["state"]))
        for r in build_sketch_grouped(
            tooled, "tool", ["day"], CmsSketch.factory(w=8192, d=5)
        ).collect()
    }
    exact = tooled.groupBy("day", "tool").count().collect()
    n_day = {}
    for r in exact:
        n_day[r["day"]] = n_day.get(r["day"], 0) + r["count"]
    cms_bad = sum(
        1
        for r in exact
        if not (
            r["count"]
            <= int(cms_by_day[r["day"]].query_keys([r["tool"]])[0])
            <= r["count"] + cms_by_day[r["day"]].eps * n_day[r["day"]]
        )
    )

    # turn-length quantiles per role: KLL median + t-digest p99 rank bounds
    def _rank_bad(sketch_cls, factory, q, tol):
        ests = {
            r["role"]: sketch_cls.loads(bytes(r["state"])).quantile(q)
            for r in build_sketch_grouped(t, "n_chars", ["role"], factory).collect()
        }
        est_map = F.create_map(*[F.lit(x) for kv in ests.items() for x in kv])
        return (
            t.withColumn("__est", est_map[F.col("role")])
            .groupBy("role")
            .agg(F.avg((F.col("n_chars") <= F.col("__est")).cast("double")).alias("rank"))
            .filter(F.abs(F.col("rank") - F.lit(q)) > F.lit(tol))
            .count()
        )

    kll_bad = _rank_bad(KllSketch, KllSketch.factory(200), 0.5, 3.0 / 200 + 0.005)
    td_bad = _rank_bad(TDigestSketch, TDigestSketch.factory(200), 0.99, 0.01)

    n_days = t.select("day").distinct().count()
    n_roles = t.select("role").distinct().count()
    n_tools = tooled.select("tool").distinct().count()
    return spark.createDataFrame(
        [(n_days, n_roles, n_tools, n_missed,
          hll_bad == 0, cms_bad == 0, kll_bad == 0, td_bad == 0)],
        "n_days bigint, n_roles bigint, n_tools bigint, n_missed bigint, "
        "hll_in_bound boolean, cms_in_bound boolean, "
        "kll_in_bound boolean, tdigest_in_bound boolean",
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing over documents: every doc assigned to
    exactly one pack, no non-overflow pack exceeding the budget, pack count
    within the greedy bound, and the assignment invariant under input
    repartitioning (content-determined, the resumability property)."""
    import math

    from poppy_spark.spark.packing import pack_sequences, pack_stats

    docs = _read(spark, sf_dir, "documents")
    budget, n_buckets = 2048, 8
    packed = pack_sequences(docs, "doc_id", "n_chars", budget, n_buckets=n_buckets)
    stats = pack_stats(packed, "n_chars").collect()
    agg = docs.agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("tot"), F.max("n_chars").alias("mx")
    ).collect()[0]
    n_docs, total, max_len = agg["n"], agg["tot"], agg["mx"]
    all_assigned = (
        packed.count() == n_docs
        and packed.select("doc_id").distinct().count() == n_docs
    )
    budget_ok = all(r["n_tokens"] <= budget for r in stats if not r["overflow"])
    n_packs = len(stats)
    packs_bound_ok = n_packs <= math.ceil(total / max(budget - max_len, 1)) + n_buckets
    relayout = pack_sequences(
        docs.repartition(17), "doc_id", "n_chars", budget, n_buckets=n_buckets
    )
    stable = packed.exceptAll(relayout).count() + relayout.exceptAll(packed).count() == 0
    return spark.createDataFrame(
        [(n_docs, int(total), all_assigned, budget_ok, packs_bound_ok, stable)],
        "n_docs bigint, total_tokens bigint, all_assigned boolean, "
        "budget_ok boolean, packs_within_bound boolean, layout_invariant boolean",
    )


def q_decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: Bloom over the eval set's hashed word
    5-grams, broadcast-probed by every training doc's n-gram stream.  The
    oracle recomputes the exactly-contaminated set in DuckDB via string
    shingles; the gate asserts the Bloom path flags a superset (zero FN —
    poppy's guarantee) with overflagging bounded by the configured fpp."""
    from poppy_spark.spark.decontam import contamination_flags
    from poppy_spark.spark.dedup import shingles

    docs = _read(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    tr = docs.filter(F.col("doc_id") % 7 != 0)
    flags = contamination_flags(tr, ev, "text", "doc_id", k=5, fpp=1e-6)
    flagged = flags.filter("contaminated").select(F.col("doc_id").alias("id"))

    evs = shingles(ev, "text", "doc_id", 5).select("shingle").distinct()
    exact_ids = (
        shingles(tr, "text", "doc_id", 5).join(evs, "shingle").select("id").distinct()
    )
    n_exact = exact_ids.count()
    n_fn = exact_ids.join(flagged, "id", "left_anti").count()
    n_flagged = flagged.count()
    # expected FPs ~ n_train_shingles * fpp ~ 0; allow a couple
    overflag_ok = (n_flagged - n_exact) <= 2

    # round-5: span-level REMOVAL (GPT-3 appendix C's surgical half) —
    # excise eval-overlapping 5-gram windows from the training text and
    # gate the TRUE word-level damage tally against the DuckDB replica
    from poppy_spark.spark.decontam import remove_contaminated_spans
    from poppy_spark.spark.text import _words

    rebuilt = remove_contaminated_spans(
        tr, ev, "text", "doc_id", span_words=5, output_col="clean"
    )
    orig = tr.select("doc_id", F.size(_words(F.col("text"))).alias("n_orig"))
    kept = rebuilt.select(
        "doc_id",
        F.when(F.col("clean") == "", 0)
        .otherwise(F.size(F.split(F.col("clean"), " ")))
        .alias("n_kept"),
    )
    dmg = (
        orig.join(kept, "doc_id")
        .agg(
            F.sum(
                (F.col("n_orig") > F.col("n_kept")).cast("long")
            ).alias("n_docs_rewritten"),
            F.sum(F.col("n_orig") - F.col("n_kept")).alias("n_removed_words"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [
            (
                tr.count(),
                ev.count(),
                n_exact,
                n_fn == 0,
                overflag_ok,
                dmg["n_docs_rewritten"],
                dmg["n_removed_words"],
            )
        ],
        "n_train bigint, n_eval bigint, n_contaminated_exact bigint, "
        "no_false_negatives boolean, overflag_within_bound boolean, "
        "n_docs_rewritten bigint, n_removed_words bigint",
    )


def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union-sort-carry, ONE shuffle, no join operator): every
    click event picks up the user's most recent purchase value at or before
    it.  DuckDB's native ASOF LEFT JOIN is the oracle — exact row match."""
    from poppy_spark.spark.asof import asof_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = _read(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(clicks, purchases, "user_id", "ts", ["value"]).select(
        "event_id", "user_id", "ts", F.col("value_asof").alias("purchase_value_asof")
    )


def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via time-bucket explode + equi-join (SortMergeJoin, no
    nested loop): clicks landing inside each user's 30-minute post-purchase
    window.  DuckDB computes the same pairs with a plain inequality join —
    exact row oracle."""
    from poppy_spark.spark.asof import interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = _read(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    windows = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t_end"),
        F.col("event_id").alias("purchase_id"),
    )
    return interval_join(
        clicks, windows, "ts", "t_start", "t_end", 1800, key_col="user_id"
    ).select("event_id", "user_id", "ts", "purchase_id")


def q_rolling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling count/sum/avg of event value per user: one
    key-hash shuffle + in-partition sort, RANGE framing over integer
    microseconds — closed-form, so DuckDB reproduces every row."""
    from poppy_spark.spark.sessions import rolling_agg

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = _read(spark, sf_dir, "events")
    return rolling_agg(events, "user_id", "ts", "value", 3600).select(
        "event_id", "user_id", "w_count", "w_sum", "w_avg"
    )


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (1h gap) of the events stream per user,
    rolled up to per-session stats — closed-form window expressions, so
    DuckDB reproduces every (user, session, count, bounds) row exactly."""
    from poppy_spark.spark.sessions import session_stats, sessionize

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = _read(spark, sf_dir, "events")
    s = sessionize(events, "user_id", "ts", gap_seconds=3600)
    return session_stats(s, "user_id", "ts").select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        "n_events",
        "t_start",
        "t_end",
        F.col("duration_sec").cast("bigint").alias("duration_sec"),
    )


def q_duplicate_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clustering (connected components by min-label
    propagation) over a deterministic chain edge list: consecutive doc_ids
    linked within blocks of 10 — diameter-9 chains, so the answer REQUIRES
    transitive closure (pair-local logic gets it wrong), and DuckDB
    reproduces the exact (id, component) assignment."""
    from poppy_spark.spark.dedup import duplicate_components

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    edges = (
        docs.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
        .filter(F.pmod(F.col("id_a"), F.lit(10)) < 9)
        .join(docs.withColumnRenamed("doc_id", "id_b"), "id_b")
    )
    return duplicate_components(edges).orderBy("id")


def q_bottom_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k (KMV) sample of distinct document texts —
    Spark computes it as a distributed TakeOrderedAndProject over
    md5(seed|key); DuckDB reproduces the exact same k rows (true value
    oracle, layout/cluster-size invariant)."""
    from poppy_spark.spark.sampling import bottom_k_sample

    docs = _read(spark, sf_dir, "documents")
    return bottom_k_sample(docs, "text", 25, seed=3)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (smoothed IDF, word-ascending tie
    break): explode + doc-keyed tf count, map-side-combined document
    frequency, word-keyed join (AQE skew-split for stop words), per-doc
    top-k window.  Deterministic doubles — DuckDB reproduces every score
    bit-for-bit."""
    from poppy_spark.spark.text import tf_idf_top_terms

    docs = _read(spark, sf_dir, "documents")
    return tf_idf_top_terms(docs, "text", "doc_id", 3)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    A1): duplicate-line fraction, duplicate-line character fraction, and
    the character share of the most frequent word 2-gram.  Line metrics
    are pure array expressions (no shuffle); the 2-gram mode explodes and
    aggregates keyed by doc_id, skew-free at any corpus size.  DuckDB
    reproduces all three doubles bit-for-bit."""
    from poppy_spark.spark.text import repetition_stats

    docs = _read(spark, sf_dir, "documents")
    return repetition_stats(docs, "text", "doc_id")


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis-
    Spirakis A-ES with the random draw replaced by md5 content hash):
    P(doc in sample) grows with n_chars, the selected set is a pure
    function of the data, and DuckDB reproduces the exact same rows —
    ln/pow double math is bit-identical across both engines.  Physical
    shape: one partial-aggregated shuffle + TakeOrderedAndProject."""
    from poppy_spark.spark.sampling import weighted_sample

    docs = _read(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", 50, seed=7).select(
        F.col("key").cast("string").alias("key"), "weight"
    )


def q_theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV set-operation algebra: distinct-user INTERSECTION between
    every event-type pair — the query HLL cannot answer.  One grouped build
    (states stay distributed until the per-group collect of <=32 KB each);
    pairwise intersections come from the trimmed KMV samples.  Below k
    distinct values the sketch is exact, so the driver-scale oracle is a
    true value match; the estimation-mode error bound is pinned by pytest
    (tests/test_theta.py) at 200k distinct keys."""
    from poppy_spark.sketches import ThetaSketch
    from poppy_spark.spark.agg import build_sketch_grouped

    events = _read(spark, sf_dir, "events")
    sks = {
        r["event_type"]: ThetaSketch.loads(bytes(r["state"]))
        for r in build_sketch_grouped(
            events, "user_id", ["event_type"], ThetaSketch.factory(4096)
        ).collect()
    }
    du = events.select("event_type", "user_id").distinct()
    exact = {
        (r["ta"], r["tb"]): r["n"]
        for r in du.alias("a")
        .join(du.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = []
    for (ta, tb), n in sorted(exact.items()):
        est = sks[ta].intersection(sks[tb])
        tol = max(6 * sks[ta].relative_error() * n, 3.0)
        rows.append((ta, tb, n, abs(est - n) <= tol))
    return spark.createDataFrame(
        rows, "type_a string, type_b string, n_inter_exact bigint, inter_in_bound boolean"
    )


def q_hash_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling + N-way split: the exact row set
    is a pure function of md5(seed|key), so DuckDB reproduces it
    bit-for-bit (no tolerance, no constants — a true value oracle).  This is
    the retry/AQE/repartition-stable replacement for df.sample in resumable
    corpus pipelines."""
    from poppy_spark.spark.sampling import hash_sample, hash_split, stratified_sample

    docs = _read(spark, sf_dir, "documents")
    n_sampled = hash_sample(docs, "text", 0.2, seed=1).count()
    n_strat = stratified_sample(
        docs, "text", "lang", {"en": 0.5}, default_rate=0.05, seed=0
    ).count()
    split = hash_split(docs, "doc_id", [0.8, 0.1, 0.1], seed=2)
    return (
        split.groupBy("split")
        .agg(F.count("*").alias("n"))
        .withColumn("n_sampled", F.lit(n_sampled))
        .withColumn("n_strat", F.lit(n_strat))
        .select(
            F.col("split").cast("int").alias("split"),
            F.col("n"),
            F.col("n_sampled").cast("bigint"),
            F.col("n_strat").cast("bigint"),
        )
    )


# --------------------------------------------------------------------------
# round-2 additions: sharded bloom, v1 distributed, intersection, OptLevel
# cache paths, partial reads, ANN recall, dedup survivors, hot-bucket cap
# --------------------------------------------------------------------------


def q_sharded_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-range-sharded filter whose single-file size exceeds a
    configured per-worker state budget while every shard fits it: zero FN
    through the shuffle-join probe, FPR in bound, and the concatenated
    shards byte-equal the one-shot build (poppy v2 bucket addressing,
    ``poppy/src/bloom/v2.rs:125-127,376-382``)."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch, decompress_blob
    from poppy_spark.spark.sharded import build_sharded_bloom

    orders = _read(spark, sf_dir, "orders")
    n = orders.count()
    capacity = max(2 * n, 600_000)
    budget = 512 * 1024  # bytes one worker is allowed to hold
    # size the shard count FROM the budget (not a fixed 8) so the
    # shards-fit gate holds at any table scale — the auto-sizing path is
    # itself part of the contract under test
    sb = build_sharded_bloom(
        orders, "o_orderkey", capacity, 0.001, target_shard_bytes=budget // 2
    )
    single = build_sketch(orders, "o_orderkey", BloomSketch.factory(capacity, 0.001))
    single_bytes = single.dumps()
    bytes_equal = sb.to_poppy_bytes(max_bytes=1 << 31) == single_bytes
    exceeds = sb.size_in_bytes() > budget
    shard_sizes = [
        len(decompress_blob(bytes(r["state"]))) for r in sb.states.collect()
    ]
    shards_fit = max(shard_sizes) <= budget
    n_missed = (
        sb.contains(orders, "o_orderkey", "hit", strategy="shuffle")
        .filter(~F.col("hit"))
        .count()
    )
    non = orders.select(
        F.format_string("sharded-nonmember-%09d", F.col("o_orderkey")).alias("probe")
    )
    fp = sb.contains(non, "probe", "hit", strategy="shuffle").filter(F.col("hit")).count()
    fp_ok = fp / n <= 0.001 * 2
    sb.states.unpersist()
    return spark.createDataFrame(
        [(n, n_missed, bytes_equal, exceeds, shards_fit, fp_ok)],
        "n_keys bigint, n_missed bigint, bytes_equal_single boolean, "
        "single_exceeds_budget boolean, shards_within_budget boolean, "
        "fp_within_bound boolean",
    )


def q_bloom_v1_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 (DCSO format, FNV-1 chain) end-to-end distributed: build + probe
    zero FN, byte-identical states across partition orderings."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch
    from poppy_spark.spark.probe import bloom_contains

    orders = _read(spark, sf_dir, "orders")
    n = orders.count()
    factory = BloomSketch.factory(n, 0.001, version=1)
    states = [
        build_sketch(orders.repartition(p), "o_orderkey", factory).dumps()
        for p in (3, 8, 17)
    ]
    agree = states[0] == states[1] == states[2]
    n_missed = (
        bloom_contains(orders, "o_orderkey", states[0], "hit")
        .filter(~F.col("hit"))
        .count()
    )
    return spark.createDataFrame(
        [(n, n_missed, agree)], "n_keys bigint, n_missed bigint, orderings_agree boolean"
    )


def q_bloom_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersection_merge (AND of bitsets, ``poppy/src/bloom/v2.rs``): the
    count estimate of customers-bloom AND ordering-customers-bloom tracks the
    exact INTERSECT cardinality (bias is positive: shared coincidental
    bits)."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch

    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    cap = customer.count()
    factory = BloomSketch.factory(cap, 0.001)
    b_cust = build_sketch(customer, "c_custkey", factory)
    b_ord = build_sketch(orders.select("o_custkey").distinct(), "o_custkey", factory)
    b_cust.filter.intersection_merge(b_ord.filter)
    est = b_cust.filter.count_estimate
    n_exact = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi").count()
    )
    ok = n_exact * 0.85 <= est <= n_exact * 1.3 + 10
    return spark.createDataFrame(
        [(n_exact, ok)], "n_exact bigint, within_bound boolean"
    )


def q_bloom_optlevel_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OptLevel SPEED/BEST cache-path filters (power-of-two bucket routing +
    index cache, ``poppy/src/bloom/v2.rs:294-312,467-474``) built
    distributed, probed with zero false negatives."""
    from poppy_spark.core import OptLevel
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch
    from poppy_spark.spark.probe import bloom_contains

    orders = _read(spark, sf_dir, "orders")
    n = orders.count()
    rows = []
    for opt in (OptLevel.SPEED, OptLevel.BEST):
        sk = build_sketch(orders, "o_orderkey", BloomSketch.factory(n, 0.001, 2, opt))
        missed = (
            bloom_contains(orders, "o_orderkey", sk.dumps(), "hit")
            .filter(~F.col("hit"))
            .count()
        )
        rows.append((int(opt), n, missed))
    return spark.createDataFrame(rows, "opt_level bigint, n_keys bigint, n_missed bigint")


def q_bloom_partial_read_show(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial (header-only) reads — the ``show`` command's shape: params and
    count match the full read without materializing the bucket bytes."""
    from poppy_spark.core import loads as bloom_loads
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch

    orders = _read(spark, sf_dir, "orders")
    n = orders.count()
    raw = build_sketch(orders, "o_orderkey", BloomSketch.factory(n, 0.001)).dumps()
    full = bloom_loads(raw)
    part = bloom_loads(raw, partial=True)
    params_equal = (
        part.capacity == full.capacity
        and part.fpp == full.fpp
        and part.version == full.version
    )
    count_matches = part.count_estimate == full.count_estimate
    return spark.createDataFrame(
        [(n, count_matches, params_equal)],
        "n_keys bigint, count_matches boolean, params_equal boolean",
    )


def q_ann_planted_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN recall gate: a perturbed copy of each query vector
    planted into the corpus must be retrieved in the top-5 for >= 90% of
    queries (measured 0.98 at these parameters; deterministic seeded
    planes)."""
    from poppy_spark.spark.similarity import lsh_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50).select(F.col("vec_id").alias("qid"), "embedding")
    planted = q.select(
        (F.col("qid") + 100_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x + F.lit(0.3)).otherwise(x)
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionAll(planted)
    approx = lsh_topk(corpus, q, "vec_id", "embedding", "qid", k=5, n_planes=8, n_tables=8)
    found = approx.filter(F.col("id") == F.col("query_id") + 100_000).count()
    n_q = q.count()
    return spark.createDataFrame(
        [(n_q, found / n_q >= 0.9)], "n_queries bigint, recall_ok boolean"
    )


def q_ivf_planted_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means-bucketed) ANN recall gate, same planted-neighbor
    protocol as the LSH row: a perturbed copy of each query vector planted
    into the corpus must land in the top-5 for >= 90% of queries.  The
    whole path is deterministic (hash-sampled centroid training, seeded
    init), so the measured recall is stable across runs and layouts."""
    from poppy_spark.spark.similarity import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50).select(F.col("vec_id").alias("qid"), "embedding")
    planted = q.select(
        (F.col("qid") + 100_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x + F.lit(0.3)).otherwise(x)
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionAll(planted)
    approx = ivf_topk(
        corpus, q, "vec_id", "embedding", "qid", k=5, n_centroids=32, n_probe=4
    )
    found = approx.filter(F.col("id") == F.col("query_id") + 100_000).count()
    n_q = q.count()
    return spark.createDataFrame(
        [(n_q, found / n_q >= 0.9)], "n_queries bigint, recall_ok boolean"
    )


def q_streaming_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming end-to-end: a rate-micro-batch readStream folded
    through foreachBatch into one Bloom state; every streamed value must be
    a member of the final filter (zero FN across micro-batch boundaries)."""
    import tempfile

    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.streaming import StreamingSketch

    n_rows = 500  # rate-micro-batch under availableNow yields one batch
    with tempfile.TemporaryDirectory() as d:
        ss = StreamingSketch(f"{d}/state", BloomSketch.factory(4 * n_rows, 0.001))
        stream = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 500)
            .option("numPartitions", 4)
            .option("startTimestamp", 0)
            .load()
            .select(F.format_string("stream-evt-%06d", F.col("value")).alias("value"))
        )
        q = (
            stream.writeStream.foreachBatch(ss)
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        sk = ss.current()
    probes = [f"stream-evt-{i:06d}" for i in range(n_rows)]
    hits = sk.filter.contains_batch(probes)
    n_streamed = int(sk.filter.count_estimate)
    n_missed = int(len(probes) - int(hits.sum()))
    return spark.createDataFrame(
        [(len(probes), n_missed, n_streamed >= n_rows // 2)],
        "n_probed bigint, n_missed bigint, state_nonempty boolean",
    )


def q_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline) —
    id pairs with cosine >= 0.4, cross-checked against DuckDB's
    list_cosine_similarity."""
    from poppy_spark.spark.similarity import cosine_near_dup_pairs

    emb = _read(spark, sf_dir, "embeddings")
    pairs = cosine_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.4)
    return pairs.select(
        F.col("id_a").cast("bigint"), F.col("id_b").cast("bigint")
    )


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup library verbs end-to-end: duplicate the corpus under
    shifted ids; survivors are exactly the original (min-id) rows and the
    group id sample stays bounded at max_ids."""
    from poppy_spark.spark.dedup import drop_exact_duplicates, exact_duplicate_groups

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    # id-layout-robust shift (works at any scale/replication of the table)
    off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    both = docs.unionAll(
        docs.select((F.col("doc_id") + off).alias("doc_id"), "text")
    )
    surv = drop_exact_duplicates(both, "text", "doc_id")
    groups = exact_duplicate_groups(both, "text", "doc_id", max_ids=20)
    n_surv = surv.count()
    all_orig = surv.filter(F.col("doc_id") >= off).count() == 0
    n_groups = groups.count()
    n_sampled = groups.agg(F.sum(F.size("doc_ids"))).collect()[0][0]
    return spark.createDataFrame(
        [(n_surv, n_groups, int(n_sampled), all_orig)],
        "n_survivors bigint, n_groups bigint, n_sampled_ids bigint, "
        "survivors_all_originals boolean",
    )


def q_lsh_hot_bucket_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew robustness: one boilerplate text duplicated 3000x must not blow
    up LSH candidate generation (per-bucket cap bounds the B^2 self-join)
    while recall on normal duplicated pairs stays total."""
    from poppy_spark.spark.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dup = docs.select((F.col("doc_id") + off).alias("doc_id"), "text")
    hot = spark.range(0, 3000).select(
        (F.col("id") + 2 * off).alias("doc_id"),
        F.lit("accept all cookies to continue to the site content").alias("text"),
    )
    corpus = docs.unionAll(dup).unionAll(hot)
    cap = 32
    sigs = minhash_signatures(corpus, "text", "doc_id", n_perms=32, k=3)
    cands = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4, max_bucket_size=cap)
    hot_pairs = cands.filter(
        (F.col("id_a") >= 2 * off) & (F.col("id_b") >= 2 * off)
    ).count()
    bounded = 0 < hot_pairs <= 8 * cap * (cap - 1) // 2
    found = cands.filter(
        (F.col("id_a") < off) & (F.col("id_b") - F.col("id_a") == off)
    ).count()
    return spark.createDataFrame(
        [(n, n - found, bounded)],
        "n_docs bigint, n_missed bigint, hot_pairs_bounded boolean",
    )


# --------------------------------------------------------------------------
# round-3 additions: bounded-memory high-cardinality grouped builds and the
# composed corpus-cleaning flagship pipeline
# --------------------------------------------------------------------------


def q_grouped_hc_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-cardinality grouped build: one Bloom per ORDER (~15k groups at
    sf0.01), probed through the single-shuffle sorted segment join — every
    (order, part) row must hit its own group's filter.  The flush budget
    stays at the production default so the row measures the operator
    (round-5 verdict #6: the former 256 KiB stress knob multiplied partial
    rows ~4x into the merge; flush-on-budget itself stays pinned by the
    small-budget pytest stress tests).  The final merged state per group is
    budget-invariant (Bloom OR is associative/commutative), so the result
    is unchanged."""
    from poppy_spark.sketches import BloomSketch
    from poppy_spark.spark.agg import build_sketch_grouped
    from poppy_spark.spark.probe import bloom_contains_grouped_join

    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    states = build_sketch_grouped(
        li,
        "l_partkey",
        ["l_orderkey"],
        BloomSketch.factory(16, 0.01),  # <= 7 parts per order in TPC-H data
        shuffle="rows",  # high-cardinality shape: one narrow-row shuffle,
        # no per-(partition, group) partial states (round-6 rework)
    ).persist()
    n_groups = states.count()
    hits = bloom_contains_grouped_join(li, "l_partkey", "l_orderkey", states)
    n_missed = hits.filter(~F.col("hit")).count()
    states.unpersist()
    return spark.createDataFrame(
        [(n_groups, li.count(), n_missed)],
        "n_groups bigint, n_rows bigint, n_missed bigint",
    )


def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data cleaning pipeline as ONE plan — exact
    dedup -> quality filter -> near-duplicate removal -> survivor counts —
    over a corpus with planted exact copies (id+1M) and planted near-dup
    copies (id+2M, one appended token on >=30-word docs, shingle Jaccard
    >= ~0.9).  Every stage is replicated exactly in the DuckDB oracle; the
    near-dup stage's LSH (64 perms, 16 bands) has per-pair miss probability
    <= 2e-5 at j=0.85 and the data is deterministic, so the exact-verified
    pair set equals the oracle's brute-force Jaccard pairs."""
    from poppy_spark.spark.dedup import (
        drop_exact_duplicates,
        near_duplicate_pairs,
        normalized_words,
    )
    from poppy_spark.spark.text import quality_score

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    long_docs = docs.filter(F.size(normalized_words(F.col("text"))) >= 30)
    corpus = docs.unionAll(
        docs.select((F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text")
    ).unionAll(
        long_docs.select(
            (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzneardupmarker")).alias("text"),
        )
    )
    n_input = corpus.count()
    surv = drop_exact_duplicates(corpus, "text", "doc_id")
    n_exact = surv.count()
    qual = (
        quality_score(surv, "text")
        .filter(F.col("quality") >= 0.99)
        .select("doc_id", "text")
        .persist()
    )
    n_quality = qual.count()
    pairs = (
        near_duplicate_pairs(
            qual, "text", "doc_id", threshold=0.85, n_perms=64, bands=16
        )
        .select("id_a", "id_b")
        .persist()
    )
    n_pairs = pairs.count()
    n_final = n_quality - pairs.select("id_b").distinct().count()
    qual.unpersist()
    pairs.unpersist()
    return spark.createDataFrame(
        [(n_input, n_exact, n_quality, n_pairs, n_final)],
        "n_input bigint, n_after_exact bigint, n_after_quality bigint, "
        "n_neardup_pairs bigint, n_final bigint",
    )


# --------------------------------------------------------------------------
# round-4 composite rows: fold single-boolean smoke queries into labeled
# multi-row composites so EVERY operator fits the driver's 50-row
# correctness window (round-3 verdict #1).  The single-operator functions
# above stay importable and tested; these rows collect their (tiny)
# outputs and emit one labeled (chk, n, ok) row per check.
# --------------------------------------------------------------------------


def q_bloom_algebra_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite driver row for poppy's filter algebra (SURVEY §2.4-2.5):
    count_estimate / union merge-invariance / count_common / intersection /
    OptLevel cache probes / partial (header-only) reads / v1 DCSO
    end-to-end — one labeled row per check, each `n` an exact count the
    DuckDB oracle reproduces and each `ok` a gate on the sketch bound."""
    rows = []
    r = q_bloom_count_estimate(spark, sf_dir).collect()[0]
    rows.append(("count_estimate", r["n_exact"], bool(r["within_5pct"])))
    r = q_bloom_merge_invariance(spark, sf_dir).collect()[0]
    rows.append(("merge_invariance", r["n_rows"], bool(r["orderings_agree"])))
    r = q_bloom_count_common(spark, sf_dir).collect()[0]
    rows.append(("count_common", r["n_exact"], bool(r["within_bound"])))
    r = q_bloom_intersection(spark, sf_dir).collect()[0]
    rows.append(("intersection", r["n_exact"], bool(r["within_bound"])))
    for r in q_bloom_optlevel_probe(spark, sf_dir).collect():
        rows.append((f"optlevel_{r['opt_level']}", r["n_keys"], r["n_missed"] == 0))
    r = q_bloom_partial_read_show(spark, sf_dir).collect()[0]
    rows.append(
        ("partial_read", r["n_keys"], bool(r["count_matches"] and r["params_equal"]))
    )
    r = q_bloom_v1_distributed(spark, sf_dir).collect()[0]
    rows.append(
        ("v1_distributed", r["n_keys"], bool(r["orderings_agree"]) and r["n_missed"] == 0)
    )
    return spark.createDataFrame(rows, "chk string, n bigint, ok boolean")


def q_ann_recall_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite ANN row: hyperplane-LSH and IVF planted-neighbor recall
    gates (>= 0.9 each) as labeled rows, plus the round-4 product-
    quantization path: ADC top-20 over 16x64 codebooks must recall >= 70%
    of the exact cosine top-10 and retrieve the query's own quantized
    vector >= 90% of the time."""
    rows = []
    r = q_ann_planted_recall(spark, sf_dir).collect()[0]
    rows.append(("lsh", r["n_queries"], bool(r["recall_ok"])))
    r = q_ivf_planted_recall(spark, sf_dir).collect()[0]
    rows.append(("ivf", r["n_queries"], bool(r["recall_ok"])))

    from poppy_spark.spark.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    emb = _read(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb, "vec_id", "embedding", 16, 64, iters=5)
    codes = pq_encode(emb, "vec_id", "embedding", books).persist()
    # deterministic query set: an unordered limit(20) is NOT stable across
    # the several independent jobs below (pq/exact/ivfpq each re-evaluate
    # the plan), so the recall gates could compare mismatched query sets
    q = emb.orderBy("vec_id").limit(20).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    approx = pq_topk(codes, q, "embedding", "qid", 20, books).collect()
    exact = cosine_topk(emb, q, "vec_id", "embedding", "qid", k=10).collect()
    codes.unpersist()
    qids = {r["query_id"] for r in exact}
    hits = sum(
        len(
            {r["id"] for r in approx if r["query_id"] == qid}
            & {r["id"] for r in exact if r["query_id"] == qid}
        )
        for qid in qids
    )
    own = sum(1 for r in approx if r["id"] == r["query_id"])
    ok = hits / (10 * len(qids)) >= 0.7 and own >= 0.9 * len(qids)
    rows.append(("pq", len(qids), bool(ok)))

    # IVF-PQ composition (FAISS IVFPQ shape): cell-pruned ADC top-20 must
    # recall >= 60% of the exact top-10 at half the cells probed and still
    # retrieve the query's own vector >= 90% of the time
    from poppy_spark.spark.similarity import ivfpq_topk

    approx = ivfpq_topk(
        emb, q, "vec_id", "embedding", "qid", k=20,
        n_centroids=16, n_probe=8, m_subspaces=16, n_codes=64,
    ).collect()
    hits = sum(
        len(
            {r["id"] for r in approx if r["query_id"] == qid}
            & {r["id"] for r in exact if r["query_id"] == qid}
        )
        for qid in qids
    )
    own = sum(1 for r in approx if r["id"] == r["query_id"])
    ok = hits / (10 * len(qids)) >= 0.6 and own >= 0.9 * len(qids)
    rows.append(("ivfpq", len(qids), bool(ok)))

    # folded former cosine_top1 row: exact brute-force nearest neighbor
    # (excluding self, min-id over the non-self top-2) for the first 10
    # vectors, re-derived independently with driver numpy
    import numpy as np

    q10 = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    top = cosine_topk(emb, q10, "vec_id", "embedding", "qid", k=2).collect()
    spark_nn = {}
    for r in top:
        if r["id"] != r["query_id"]:
            spark_nn[r["query_id"]] = min(
                spark_nn.get(r["query_id"], r["id"]), r["id"]
            )
    vecs = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in vecs]
    mat = np.asarray([r["embedding"] for r in vecs], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    by_id = {v: i for i, v in enumerate(ids)}
    ok = True
    for qid in range(10):
        cos = mat @ mat[by_id[qid]]
        top2 = sorted(range(len(ids)), key=lambda j: (-cos[j], ids[j]))[:2]
        ref = min(ids[j] for j in top2 if ids[j] != qid)
        ok = ok and spark_nn.get(qid) == ref
    rows.append(("exact_top1", 10, bool(ok)))
    return spark.createDataFrame(rows, "chk string, n bigint, ok boolean")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact text statistics in ONE scan: whitespace token
    count + char-count consistency, digit/space counts, and BPE-flavored
    word-piece counts — all pure JVM expressions replicated exactly in
    DuckDB (folds the former token_stats / text_ratios / bpe_tokens
    rows)."""
    from poppy_spark.spark.text import bpe_ish_token_count

    docs = _read(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.size(F.split(t, " ", -1)).cast("bigint").alias("n_tokens"),
        (F.length(t) == F.col("n_chars")).alias("chars_ok"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", "")))
        .cast("bigint")
        .alias("n_digits"),
        (F.length(t) - F.length(F.regexp_replace(t, r"\s", "")))
        .cast("bigint")
        .alias("n_spaces"),
        bpe_ish_token_count(t).alias("n_pieces"),
    )


def q_quantile_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL median + t-digest p99 rank gates per event_type as labeled rows
    (folds kll_value_median / tdigest_value_p99)."""
    kll = q_kll_value_median(spark, sf_dir).select(
        F.lit("kll_p50").alias("sketch"), "event_type", "n_exact", "within_bound"
    )
    td = q_tdigest_value_p99(spark, sf_dir).select(
        F.lit("tdigest_p99").alias("sketch"), "event_type", "n_exact", "within_bound"
    )
    return kll.unionAll(td)


def q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users per event_type AND per day in one result (folds
    hll_users_by_type / hll_users_by_day); day keys pinned to yyyy-MM-dd
    strings so Spark and DuckDB render identically."""
    by_type = q_hll_users_by_type(spark, sf_dir).select(
        F.lit("type").alias("group_kind"),
        F.col("event_type").alias("group_key"),
        "n_exact",
        "within_bound",
    )
    by_day = q_hll_users_by_day(spark, sf_dir).select(
        F.lit("day").alias("group_kind"),
        F.date_format("day", "yyyy-MM-dd").alias("group_key"),
        "n_exact",
        "within_bound",
    )
    return by_type.unionAll(by_day)


def q_dedup_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup robustness gates as labeled rows (folds dedup_survivors /
    lsh_hot_bucket_cap): survivor counts are exact values the oracle
    recomputes; hot_bucket asserts the planted 3000x-boilerplate bucket is
    capped with recall kept."""
    rows = []
    r = q_dedup_survivors(spark, sf_dir).collect()[0]
    rows.append(("survivors", r["n_survivors"], bool(r["survivors_all_originals"])))
    rows.append(("survivor_groups", r["n_groups"], True))
    rows.append(("survivor_sample", r["n_sampled_ids"], True))
    r = q_lsh_hot_bucket_cap(spark, sf_dir).collect()[0]
    rows.append(
        ("hot_bucket", r["n_docs"], bool(r["hot_pairs_bounded"]) and r["n_missed"] == 0)
    )
    # folded former lsh_dedup_recall / simhash_duplicates rows (round-5
    # window discipline: new verbs displace single-boolean smoke rows)
    r = q_lsh_dedup_recall(spark, sf_dir).collect()[0]
    rows.append(("lsh_dup_recall", r["n_docs"], r["n_missed"] == 0))
    r = q_simhash_duplicates(spark, sf_dir).collect()[0]
    rows.append(("simhash_h0", r["n_docs"], r["n_hamming0"] == r["n_docs"]))
    return spark.createDataFrame(rows, "chk string, n bigint, ok boolean")


def q_model_plug_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4: the text model seams driven by genuinely TRAINED artifacts
    (naive-Bayes char-trigram langid, learned-merge BPE) instead of the
    heuristics — labeled gates: every document scores through the plugged
    classifier (exact count oracle), planted unambiguous rows agree with
    the heuristic path, BPE counts through the Arrow seam equal driver-side
    reference tokenization, and the model instantiates once per Python
    worker (marker files: one per distinct pid)."""
    import os
    import tempfile

    from poppy_spark.models import (
        BpeTokenizer,
        NaiveBayesLangId,
        train_bpe,
        train_naive_bayes_langid,
    )
    from poppy_spark.spark.text import STOPWORDS, detect_language, model_token_count

    samples = []
    for lang, words in STOPWORDS.items():
        for i in range(6):
            chunk = words[i % len(words) :] + words[: i % len(words)]
            samples.append((" ".join(chunk[:10]), lang))
    art = train_naive_bayes_langid(samples)
    docs = _read(spark, sf_dir, "documents")
    rows = []

    with tempfile.TemporaryDirectory() as marker_dir:
        factory = NaiveBayesLangId(art, marker_dir=marker_dir)
        scored = detect_language(docs.repartition(16), "text", model_factory=factory)
        # ONE job for both counts: each Spark job may spawn a fresh set of
        # Python workers (no reuse guarantee), so the <= 16 marker bound
        # below is only meaningful if the UDF runs in exactly one job
        agg = scored.agg(
            F.count("*").alias("n"),
            F.sum(F.col("lang_guess").isNull().cast("long")).alias("n_null"),
        ).collect()[0]
        n_docs, n_null = agg["n"], int(agg["n_null"] or 0)
        rows.append(("nb_docs_scored", n_docs, n_null == 0))
        markers = os.listdir(marker_dir)
        pids = {m.split("-")[0] for m in markers}
        # once-per-worker proof: every pid instantiated exactly once, and
        # never more instantiations than the 16 partitions (with 16+ cores
        # each partition may land on its own fresh worker, so == 16 is
        # legitimate; > 16 would mean per-batch instantiation)
        rows.append(("worker_cached", 1, len(markers) == len(pids) and len(markers) <= 16))

    planted = spark.createDataFrame(
        [
            (1, "the cat and the dog are not in this house"),
            (2, "le chat est dans la maison avec les enfants"),
            (3, "der hund ist nicht mit der katze auf dem dach"),
            (4, "el perro y el gato en la casa del pueblo"),
        ],
        "doc_id long, text string",
    )
    heur = {r["doc_id"]: r["lang_guess"] for r in detect_language(planted, "text").collect()}
    plug = {
        r["doc_id"]: r["lang_guess"]
        for r in detect_language(planted, "text", model_factory=NaiveBayesLangId(art)).collect()
    }
    want = {1: "en", 2: "fr", 3: "de", 4: "es"}
    rows.append(("nb_planted_langid", 4, plug == heur == want))

    # deterministic subset: unordered limit() is not stable across the two
    # independent jobs below (Arrow-seam count vs driver tokenize)
    sub = docs.orderBy("doc_id").limit(50).persist()
    texts = [r["text"] for r in sub.select("text").collect()]
    tok = BpeTokenizer(train_bpe(texts, n_merges=200))
    sub = sub.repartition(4)
    got = {
        r["doc_id"]: r["n_bpe"]
        for r in model_token_count(sub, "text", tok, "n_bpe").collect()
    }
    ref = {
        r["doc_id"]: len(tok.tokenize(r["text"]))
        for r in sub.select("doc_id", "text").collect()
    }
    rows.append(("bpe_seam_parity", 50, got == ref))
    return spark.createDataFrame(rows, "chk string, n bigint, ok boolean")


def q_runtime_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite: Structured-Streaming fold zero-FN gate + transcripts
    generator per-turn-text stability (folds streaming_fold /
    transcripts_invariance into labeled rows)."""
    rows = []
    r = q_streaming_fold(spark, sf_dir).collect()[0]
    rows.append(
        ("streaming_fold", r["n_probed"], r["n_missed"] == 0 and bool(r["state_nonempty"]))
    )
    r = q_transcripts_invariance(spark, sf_dir).collect()[0]
    rows.append(("transcripts_stable", 1, bool(r["stable"])))

    # round-5 session 3: compression-ratio quality signal (CCNet/Dolma
    # style) — boilerplate docs (one phrase repeated) must compress an
    # order of magnitude better than natural corpus text; the gate checks
    # hard separation (planted max < 0.05 << 0.3 < natural min over docs
    # with >= 200 chars, where the zlib header is amortized)
    from poppy_spark.spark.text import compression_ratio

    docs = _read(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("lorem ipsum boilerplate " * 50),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cr = compression_ratio(planted, "text").filter(F.length("text") >= 200)
    agg = cr.agg(
        F.max(F.when(F.col("doc_id") % 2 == 0, F.col("comp_ratio"))).alias("rep_max"),
        F.min(F.when(F.col("doc_id") % 2 != 0, F.col("comp_ratio"))).alias("nat_min"),
        F.count("*").alias("n"),
    ).collect()[0]
    rows.append(
        (
            "compression_signal",
            agg["n"],
            agg["rep_max"] < 0.05 and agg["nat_min"] > 0.3,
        )
    )
    return spark.createDataFrame(rows, "chk string, n bigint, ok boolean")


def q_multimodal_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4: REAL multimodal codecs driven at table scale — every
    documents row gets a genuine 24-bit BMP (solid color derived from
    doc_id) and a genuine PCM WAV (sine at a doc-derived frequency),
    decoded by the no-dependency codecs through the Arrow feature stages;
    gates are analytic (BMP luma == constructed gray level, WAV RMS ==
    A/sqrt(2), ZCR == 2f/fs) and the content-hash dedup key is exact."""
    import math

    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    from poppy_spark.spark.multimodal import (
        encode_bmp,
        encode_wav,
        extract_audio_features,
        extract_media_features,
        media_content_hash,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n_docs = docs.count()

    media_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("media_w", T.IntegerType()),
            T.StructField("media_h", T.IntegerType()),
            T.StructField("media_ms", T.IntegerType()),
        ]
    )

    def make_bmp(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                g = int(did) % 256
                px = np.full((8, 8, 3), g, dtype=np.uint8)
                out.append(encode_bmp(px))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "media_type": "image",
                    "media_w": 8,
                    "media_h": 8,
                    "media_ms": None,
                }
            )

    imgs = docs.mapInPandas(make_bmp, media_schema)
    feats = extract_media_features(imgs, allow_fake=False).select("doc_id", "feat")
    bad_img = (
        feats.select(
            "doc_id",
            F.abs(F.col("feat")[0] - (F.col("doc_id") % 256) / F.lit(255.0)).alias("err"),
        )
        .filter(F.col("err") > 0.01)
        .count()
    )
    n_distinct = media_content_hash(imgs).select("media_hash").distinct().count()
    rows = [
        ("bmp_luma_analytic", n_docs, bad_img == 0),
        # 256 distinct gray levels -> exactly min(n_docs, 256) distinct blobs
        ("bmp_dedup_hash", min(n_docs, 256), n_distinct == min(n_docs, 256)),
    ]

    rate = 8000

    def make_wav(batches):
        t = np.arange(rate // 4) / rate  # 250 ms
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                freq = 100.0 + (int(did) % 10) * 50.0
                out.append(encode_wav(0.5 * np.sin(2 * math.pi * freq * t), rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "media_type": "audio",
                    "media_w": None,
                    "media_h": None,
                    "media_ms": 250,
                }
            )

    wavs = docs.mapInPandas(make_wav, media_schema)
    afeat = extract_audio_features(wavs)
    bad_audio = afeat.filter(
        (F.col("audio_ms") != 250)
        | (F.abs(F.col("audio_rms") - 0.5 / math.sqrt(2.0)) > 0.01)
        | (
            F.abs(
                F.col("audio_zcr")
                - 2.0 * (F.lit(100.0) + (F.col("doc_id") % 10) * 50.0) / F.lit(float(rate))
            )
            > 0.005
        )
    ).count()
    rows.append(("wav_features_analytic", n_docs, bad_audio == 0))

    # round-5: real zero-dep PNG codec at table scale — same analytic luma
    # gate as BMP, exercised through the PNG decode path (magic-dispatch)
    from poppy_spark.spark.multimodal import encode_png

    def make_png(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                g = int(did) % 256
                out.append(encode_png(np.full((8, 8, 3), g, dtype=np.uint8)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "media_type": "image",
                    "media_w": 8,
                    "media_h": 8,
                    "media_ms": None,
                }
            )

    pngs = docs.mapInPandas(make_png, media_schema)
    bad_png = (
        extract_media_features(pngs, allow_fake=False)
        .select(
            "doc_id",
            F.abs(F.col("feat")[0] - (F.col("doc_id") % 256) / F.lit(255.0)).alias("err"),
        )
        .filter(F.col("err") > 0.01)
        .count()
    )
    rows.append(("png_luma_analytic", n_docs, bad_png == 0))

    # round-5: perceptual image near-dup — 5 seeded base images x 4
    # one-pixel variants each; dHash + the banded Hamming join must find
    # exactly the 30 within-base pairs and nothing across bases
    from poppy_spark.spark.dedup import signature_near_pairs
    from poppy_spark.spark.multimodal import image_dhash

    imgs20 = []
    for i in range(20):
        rng = np.random.default_rng(1000 + i % 5)
        px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        px[0, 0] = i // 5  # one-pixel variant marker
        imgs20.append((i, bytearray(encode_png(px))))
    img_df = spark.createDataFrame(imgs20, "id long, media binary")
    pairs = signature_near_pairs(
        image_dhash(img_df, "id", "media"), "id", "dhash", max_hamming=3
    ).collect()
    within = all(r["id_a"] % 5 == r["id_b"] % 5 for r in pairs)
    rows.append(("image_near_dup", len(pairs), len(pairs) == 30 and within))

    # round-5 session 3: perceptual AUDIO near-dup — 5 amplitude-modulated
    # chirp bases x 4 low-noise variants; the 64-bit band-delta fingerprint
    # + the same banded Hamming join must find exactly the 30 within-base
    # pairs (variants sit <= 3 bits apart, the banding's exact-recall zone;
    # bases sit > 20 bits apart) and nothing across
    from poppy_spark.spark.multimodal import audio_near_pairs

    t20 = np.arange(16_000 // 2) / 16_000.0
    clips = []
    for i in range(20):
        base = i % 5
        rng = np.random.default_rng(7000 + i)
        f0 = 200 + 700 * base
        kr = (base + 1) * 1200 * (1 if base % 2 == 0 else -1)
        env = 0.3 + 0.2 * np.sin(2 * math.pi * (1.5 + base) * t20)
        x = env * np.sin(2 * math.pi * (f0 + kr * t20) * t20)
        x = np.clip(x + rng.normal(0, 0.001, x.shape), -1, 1)
        clips.append((i, bytearray(encode_wav(x, 16_000))))
    wav_df = spark.createDataFrame(clips, "id long, media binary")
    apairs = audio_near_pairs(wav_df, max_hamming=3).collect()
    a_within = all(r["id_a"] % 5 == r["id_b"] % 5 for r in apairs)
    rows.append(("audio_near_dup", len(apairs), len(apairs) == 30 and a_within))
    return spark.createDataFrame(rows, "chk string, n bigint, ok boolean")


def q_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4: add-k-smoothed bigram LM trained on the documents corpus
    (two grouped counts + a distinct-count) and self-scored — per-doc
    bigram count, mean log-probability, perplexity.  Pure ln/arithmetic on
    both engines, so the oracle is a TRUE-value float comparison."""
    from poppy_spark.spark.lm import score_bigram_lm, train_bigram_lm

    docs = _read(spark, sf_dir, "documents")
    bigrams, unigrams, v = train_bigram_lm(docs, "text", "doc_id")
    return score_bigram_lm(docs, "text", "doc_id", bigrams, unigrams, v, k=0.1)


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4: verbatim repeated-span audit — an 8-word boilerplate tail
    planted on every doc_id % 4 == 0 document must surface as cross-doc
    repeated spans; output is the exact (span md5, doc count, occurrence
    count, first occurrence) table DuckDB recomputes."""
    from poppy_spark.spark.spans import repeated_spans

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" all rights reserved contact the site administrator today")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return repeated_spans(docs, "text", "doc_id", span_words=8, min_docs=2)


def q_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: repeated-span REMOVAL (the Lee et al. rebuild half) — the
    same planted boilerplate as `repeated_spans`, excised everywhere but
    its first occurrence; DuckDB rebuilds every document byte-exactly
    (lowercased word-space, the detection's token space)."""
    from poppy_spark.spark.spans import remove_repeated_spans

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" all rights reserved contact the site administrator today")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return remove_repeated_spans(docs, "text", "doc_id", span_words=8, min_docs=2)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: SemDeDup-shaped semantic dedup — k-means-cell-bounded
    cosine pairs + transitive components as ONE verb.  Planted paraphrase
    groups (exact scaled copies of the first 10 vectors, cosine exactly 1
    after normalization, always co-celled) must each come out as one
    component, distinct from each other; gates + exact planted counts."""
    from poppy_spark.spark.similarity import semantic_dedup

    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = [
        emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100_000 * j).alias("vec_id"),
            F.transform("embedding", lambda x: x * float(2 ** j))
            .cast("array<float>")
            .alias("embedding"),
        )
        for j in (1, 2)
    ]
    allv = emb.unionAll(copies[0]).unionAll(copies[1])
    out = semantic_dedup(
        allv, "vec_id", "embedding", threshold=0.999, n_centroids=8, iters=3
    )
    comp = {r["id"]: r["component"] for r in out.collect()}
    groups_ok = all(
        comp.get(i) is not None
        and comp.get(i) == comp.get(100_000 + i) == comp.get(200_000 + i)
        for i in range(10)
    )
    distinct_ok = len({comp.get(i) for i in range(10)}) == 10
    n_planted = sum(
        1 for i in comp if i < 10 or (100_000 <= i < 100_010) or (200_000 <= i < 200_010)
    )
    rows = [
        ("planted_groups", 10, bool(groups_ok)),
        ("planted_ids_clustered", n_planted, n_planted == 30),
        ("groups_distinct", 10, bool(distinct_ok)),
    ]
    return spark.createDataFrame(rows, "chk string, n bigint, ok boolean")


def q_cap_per_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: per-domain capping over the reworked two-phase
    grouped_bottom_k — a planted SEO farm holds 95% of rows and must cap
    to exactly k content-hash-chosen survivors.  TRUE-value oracle:
    DuckDB replays the identical URL construction, host/domain parsing,
    and QUALIFY bottom-k (keys are unique, where the key-based and
    row-based semantics coincide)."""
    from poppy_spark.spark.text import cap_per_domain

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 != 0,
            F.concat(F.lit("https://farm.example.com/p/"), F.col("doc_id").cast("string")),
        ).otherwise(
            F.concat(
                F.lit("https://site"), F.pmod(F.col("doc_id"), F.lit(50)).cast("string"),
                F.lit(".org/p/"), F.col("doc_id").cast("string"),
            )
        ).alias("url"),
    )
    return cap_per_domain(urls, "url", "doc_id", 10, seed=4).select(
        "doc_id", "url_domain"
    )


def q_proportional_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4: deterministic domain re-mixing to target language
    proportions — the scarcest weighted language (relative to its weight)
    survives in full, the rest downsample by content hash.  TRUE-value
    oracle: DuckDB recomputes the same rates from the same counts and the
    same md5 thresholds, reproducing the kept row set bit-for-bit."""
    from poppy_spark.spark.sampling import proportional_mix

    docs = _read(spark, sf_dir, "documents")
    out = proportional_mix(
        docs, "doc_id", "lang", {"en": 0.5, "fr": 0.2, "de": 0.2, "es": 0.1}, seed=5
    )
    return out.select("doc_id", "lang")


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Bloom-accelerated semi-join on sf0.001."""
    return q_bloom_semi_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 entries — the driver's correctness window is full (round-3
    # verdict #1): adding a new row requires folding an existing one into a
    # composite first.  Never-driver-verified flagships lead;
    # single-boolean smoke rows are folded into the *_suite / *_guards /
    # text_stats / hll_users / quantile_sketches composites (the underlying
    # single-operator callables remain importable + pytest-gated).
    return {
        # round-3 flagships that never had a driver row
        "profile_events": q_profile_events,
        "grouped_sharded_bloom": q_grouped_sharded_bloom,
        "grouped_hc_membership": q_grouped_hc_membership,
        "corpus_clean_pipeline": q_corpus_clean_pipeline,
        "cosine_near_dup": q_cosine_near_dup,
        "dedup_guards": q_dedup_guards,
        # poppy core bloom surface
        "bloom_semi_join": q_bloom_semi_join,
        "bloom_anti_join_bounds": q_bloom_anti_join_bounds,
        "bloom_algebra_suite": q_bloom_algebra_suite,
        "sharded_bloom_semi_join": q_sharded_bloom_semi_join,
        "bloom_grouped_membership": q_bloom_grouped_membership,
        # sketch family (§2.9)
        "hll_users": q_hll_users,
        "cms_event_type_freq": q_cms_event_type_freq,
        "quantile_sketches": q_quantile_sketches,
        "topk_users": q_topk_users,
        "topk_ngrams": q_topk_ngrams,
        "theta_user_overlap": q_theta_user_overlap,
        "minhash_source_overlap": q_minhash_source_overlap,
        # dedup family
        "exact_dedup_groups": q_exact_dedup_groups,
        "duplicate_components": q_duplicate_components,
        "conversation_dedup": q_conversation_dedup,
        "line_dedup": q_line_dedup,
        "semantic_dedup": q_semantic_dedup,
        # similarity family
        "ann_recall_suite": q_ann_recall_suite,
        # text family
        "model_plug_suite": q_model_plug_suite,
        "text_stats": q_text_stats,
        "text_quality_lang": q_text_quality_lang,
        "doc_fingerprint": q_doc_fingerprint,
        "tfidf_top_terms": q_tfidf_top_terms,
        "repetition_stats": q_repetition_stats,
        "text_clean_suite": q_text_clean_suite,  # folds scrub_pii + normalize_text
        # sampling family
        "hash_sample_split": q_hash_sample_split,
        "bottom_k_sample": q_bottom_k_sample,
        "weighted_sample": q_weighted_sample,
        "quantile_buckets": q_quantile_buckets,
        # temporal / relational family
        "sessionize_events": q_sessionize_events,
        "rolling_agg": q_rolling_agg,
        "asof_join_events": q_asof_join_events,
        "interval_join_events": q_interval_join_events,
        # round-4 additions
        "bigram_lm_scores": q_bigram_lm_scores,
        "repeated_spans": q_repeated_spans,
        "remove_spans": q_remove_spans,
        "cap_per_domain": q_cap_per_domain,
        "proportional_mix": q_proportional_mix,
        "multimodal_codecs": q_multimodal_codecs,
        # pipeline operators
        "decontaminate_eval": q_decontaminate_eval,
        "pack_sequences": q_pack_sequences,
        # transcripts (north-rule input)
        "transcripts_sketches": q_transcripts_sketches,
        "transcripts_rollup": q_transcripts_rollup,
        "runtime_gates": q_runtime_gates,
    }


def _hash_sample_oracle_sql() -> str:
    """DuckDB replica of q_hash_sample_split; thresholds come from the same
    helper the Spark operators use, so the two sides cannot drift."""
    from poppy_spark.spark.sampling import _thr_hex

    t20, t50, t05 = _thr_hex(0.2), _thr_hex(0.5), _thr_hex(0.05)
    b0, b1 = _thr_hex(0.8), _thr_hex(0.9)
    return (
        "WITH s AS (SELECT CASE "
        f"WHEN substr(md5('seed2|' || CAST(doc_id AS VARCHAR)), 1, 8) < '{b0}' THEN 0 "
        f"WHEN substr(md5('seed2|' || CAST(doc_id AS VARCHAR)), 1, 8) < '{b1}' THEN 1 "
        "ELSE 2 END AS split FROM documents) "
        "SELECT CAST(split AS INT) AS split, COUNT(*) AS n, "
        "(SELECT COUNT(*) FROM documents "
        f"WHERE substr(md5('seed1|' || text), 1, 8) < '{t20}') AS n_sampled, "
        "(SELECT COUNT(*) FROM documents WHERE substr(md5('seed0|' || text), 1, 8) < "
        f"CASE WHEN lang = 'en' THEN '{t50}' ELSE '{t05}' END) AS n_strat "
        "FROM s GROUP BY split"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "bloom_semi_join": "SELECT DISTINCT l_orderkey FROM lineitem",
        "bloom_anti_join_bounds": (
            "SELECT 2 * COUNT(*) AS n_probed, 0 AS n_members_missed, TRUE AS fp_within_bound FROM orders"
        ),
        "bloom_algebra_suite": (
            "SELECT 'count_estimate' AS chk, (SELECT COUNT(DISTINCT text) FROM documents) AS n, TRUE AS ok "
            "UNION ALL SELECT 'merge_invariance', (SELECT COUNT(*) FROM orders), TRUE "
            "UNION ALL SELECT 'count_common', (SELECT COUNT(DISTINCT o_custkey) FROM orders "
            "WHERE o_custkey IN (SELECT c_custkey FROM customer)), TRUE "
            "UNION ALL SELECT 'intersection', (SELECT COUNT(*) FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders)), TRUE "
            "UNION ALL SELECT 'optlevel_2', (SELECT COUNT(*) FROM orders), TRUE "
            "UNION ALL SELECT 'optlevel_3', (SELECT COUNT(*) FROM orders), TRUE "
            "UNION ALL SELECT 'partial_read', (SELECT COUNT(*) FROM orders), TRUE "
            "UNION ALL SELECT 'v1_distributed', (SELECT COUNT(*) FROM orders), TRUE"
        ),
        "hll_users": (
            "SELECT 'type' AS group_kind, event_type AS group_key, "
            "COUNT(DISTINCT user_id) AS n_exact, TRUE AS within_bound "
            "FROM events GROUP BY event_type "
            "UNION ALL "
            "SELECT 'day', strftime(date_trunc('day', ts), '%Y-%m-%d'), "
            "COUNT(DISTINCT user_id), TRUE FROM events GROUP BY date_trunc('day', ts)"
        ),
        "cms_event_type_freq": (
            "SELECT event_type, COUNT(*) AS n_exact, TRUE AS within_bound FROM events GROUP BY event_type"
        ),
        "quantile_sketches": (
            "SELECT s.sketch, e.event_type, e.n_exact, TRUE AS within_bound "
            "FROM (SELECT 'kll_p50' AS sketch UNION ALL SELECT 'tdigest_p99') s "
            "CROSS JOIN (SELECT event_type, COUNT(*) AS n_exact FROM events "
            "GROUP BY event_type) e"
        ),
        "minhash_source_overlap": (
            "SELECT a.source AS source_a, b.source AS source_b, TRUE AS within_bound "
            "FROM (SELECT DISTINCT source FROM documents) a "
            "JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source"
        ),
        "exact_dedup_groups": (
            "SELECT md5(text) AS text_hash, COUNT(*) AS n_copies FROM documents GROUP BY md5(text)"
        ),
        "model_plug_suite": (
            "SELECT 'nb_docs_scored' AS chk, (SELECT COUNT(*) FROM documents) AS n, TRUE AS ok "
            "UNION ALL SELECT 'worker_cached', 1, TRUE "
            "UNION ALL SELECT 'nb_planted_langid', 4, TRUE "
            "UNION ALL SELECT 'bpe_seam_parity', 50, TRUE"
        ),
        "text_stats": (
            "SELECT doc_id, len(str_split(text, ' ')) AS n_tokens, "
            "length(text) = n_chars AS chars_ok, "
            "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits, "
            "length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS n_spaces, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z_]+|[0-9]+|[^\\w\\s]')) AS BIGINT) AS n_pieces FROM documents"
        ),
        "doc_fingerprint": (
            "SELECT COUNT(*) AS n_docs, 0 AS n_mismatch, "
            "TRUE AS fp_distinct_matches_sets FROM documents"
        ),
        "text_quality_lang": """WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS words,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS words_cs,
         regexp_split_to_array(text, '\\n') AS lines,
         length(text) AS n_chars
  FROM documents
), gm AS (
  SELECT doc_id,
         CAST(len(words_cs) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(words_cs, x -> length(x))), 0) AS BIGINT) AS total_chars,
         CAST(len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS BIGINT) AS n_sym,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines, l -> regexp_matches(l, '^[ \\t]*[-*•]'))) AS BIGINT) AS n_bullet,
         CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)[ \\t]*$'))) AS BIGINT) AS n_ell,
         CAST(len(list_filter(words_cs, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         (CAST(list_contains(words, 'the') AS INT) + CAST(list_contains(words, 'be') AS INT)
          + CAST(list_contains(words, 'to') AS INT) + CAST(list_contains(words, 'of') AS INT)
          + CAST(list_contains(words, 'and') AS INT) + CAST(list_contains(words, 'that') AS INT)
          + CAST(list_contains(words, 'have') AS INT) + CAST(list_contains(words, 'with') AS INT)) AS stop_hits
  FROM w
), gr AS (
  SELECT doc_id, n_words,
         n_words >= 50 AND n_words <= 100000 AS rule_words,
         3 * n_words <= total_chars AND total_chars <= 10 * n_words AS rule_mean_wl,
         10 * n_sym <= n_words AS rule_symbols,
         10 * n_bullet <= 9 * n_lines AS rule_bullets,
         10 * n_ell <= 3 * n_lines AS rule_ellipsis,
         5 * n_alpha >= 4 * n_words AS rule_alpha,
         stop_hits >= 2 AS rule_stops
  FROM gm
), s AS (
  SELECT doc_id,
         len(words) AS n_tokens,
         CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
           / GREATEST(n_chars, 1) AS punct_ratio,
         CAST(n_chars - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
           / GREATEST(n_chars, 1) AS digit_ratio,
         CAST(len(list_filter(words, x -> list_contains(['the','and','of','to','in','is','that','it','was','for','with','are','this','not','you'], x))) AS DOUBLE)
           / GREATEST(len(words), 1) AS stop_ratio,
         len(list_filter(words, x -> list_contains(['the','and','of','to','in','is','that','it','was','for','with','are','this','not','you'], x))) AS s_en,
         len(list_filter(words, x -> list_contains(['le','la','les','de','des','et','un','une','est','que','pour','dans','qui','pas','avec'], x))) AS s_fr,
         len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','für','auf','von','dem','den','sich'], x))) AS s_de,
         len(list_filter(words, x -> list_contains(['el','la','los','las','de','que','y','en','un','una','es','por','con','para','del'], x))) AS s_es
  FROM w
)
SELECT doc_id,
       CAST((CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.3 END)
     * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.4 END)
     * (CASE WHEN digit_ratio <= 0.3 THEN 1.0 ELSE 0.5 END)
     * (CASE WHEN stop_ratio >= 0.05 THEN 1.0 ELSE 0.6 END) AS DOUBLE) AS quality,
       CASE WHEN GREATEST(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
            WHEN s_fr = GREATEST(s_en, s_fr, s_de, s_es) THEN 'fr'
            WHEN s_es = GREATEST(s_en, s_fr, s_de, s_es) THEN 'es'
            WHEN s_en = GREATEST(s_en, s_fr, s_de, s_es) THEN 'en'
            ELSE 'de' END AS lang_guess,
       gr.n_words, gr.rule_words, gr.rule_mean_wl, gr.rule_symbols,
       gr.rule_bullets, gr.rule_ellipsis, gr.rule_alpha, gr.rule_stops,
       (gr.rule_words AND gr.rule_mean_wl AND gr.rule_symbols AND gr.rule_bullets
        AND gr.rule_ellipsis AND gr.rule_alpha AND gr.rule_stops) AS gopher_pass
FROM s JOIN gr USING (doc_id)""",
        "semantic_dedup": (
            "SELECT 'planted_groups' AS chk, 10 AS n, TRUE AS ok "
            "UNION ALL SELECT 'planted_ids_clustered', 30, TRUE "
            "UNION ALL SELECT 'groups_distinct', 10, TRUE"
        ),
        "bloom_grouped_membership": (
            "SELECT o_orderpriority, COUNT(*) AS n_keys, 0 AS n_missed "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "transcripts_sketches": (
            "SELECT 0 AS n_missed, 4 AS n_roles, TRUE AS hll_within_bound"
        ),
        "runtime_gates": (
            "SELECT 'streaming_fold' AS chk, 500 AS n, TRUE AS ok "
            "UNION ALL SELECT 'transcripts_stable', 1, TRUE "
            # compression_signal n: the deterministic doc_id < 200 slice,
            # even ids planted with 1200-char boilerplate (always >= 200
            # chars), odd ids keep natural text and its length filter
            "UNION ALL SELECT 'compression_signal', "
            "(SELECT COUNT(*) FROM documents WHERE doc_id < 200 "
            "AND (doc_id % 2 = 0 OR length(text) >= 200)), TRUE"
        ),
        "multimodal_codecs": (
            "SELECT 'bmp_luma_analytic' AS chk, (SELECT COUNT(*) FROM documents) AS n, TRUE AS ok "
            "UNION ALL SELECT 'bmp_dedup_hash', "
            "(SELECT LEAST(COUNT(*), 256) FROM documents), TRUE "
            "UNION ALL SELECT 'wav_features_analytic', (SELECT COUNT(*) FROM documents), TRUE "
            "UNION ALL SELECT 'png_luma_analytic', (SELECT COUNT(*) FROM documents), TRUE "
            "UNION ALL SELECT 'image_near_dup', 30, TRUE "
            "UNION ALL SELECT 'audio_near_dup', 30, TRUE"
        ),
        # the transcripts table is generated in-session (not a registered
        # DuckDB view), so the oracle pins the deterministic generator's
        # group cardinalities and the expected in-bound verdicts
        "transcripts_rollup": (
            "SELECT CAST(61 AS BIGINT) AS n_days, CAST(4 AS BIGINT) AS n_roles, "
            "CAST(30 AS BIGINT) AS n_tools, CAST(0 AS BIGINT) AS n_missed, "
            "TRUE AS hll_in_bound, TRUE AS cms_in_bound, "
            "TRUE AS kll_in_bound, TRUE AS tdigest_in_bound"
        ),
        # exact value oracle: DuckDB's md5 over the same seeded key strings
        # reproduces the sampled/split row sets bit-for-bit
        "hash_sample_split": _hash_sample_oracle_sql(),
        # TRUE-value float oracle: ln / division doubles are bit-identical
        # between Spark and DuckDB (same trick as weighted_sample); AVG
        # reassociation noise is far below the 9-sig-digit compare
        "bigram_lm_scores": r"""
WITH w AS (
  SELECT doc_id, list_filter(str_split_regex(lower(text), '\s+'), x -> x <> '') AS words
  FROM documents
), pairs AS (
  SELECT doc_id, words[i] AS w1, words[i+1] AS w2
  FROM w, unnest(generate_series(1, len(words) - 1)) AS u(i)
  WHERE len(words) >= 2
), big AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2
), uni AS (
  SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1
), v AS (
  SELECT COUNT(DISTINCT x) AS vs FROM (SELECT unnest(words) AS x FROM w)
), lp AS (
  SELECT p.doc_id,
         ln((COALESCE(b.c12, 0) + 0.1) / (COALESCE(u.c1, 0) + 0.1 * CAST(v.vs AS DOUBLE))) AS logp
  FROM pairs p LEFT JOIN big b USING (w1, w2) LEFT JOIN uni u USING (w1) CROSS JOIN v
), agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, AVG(logp) AS avg_logp FROM lp GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams, a.avg_logp,
       exp(-a.avg_logp) AS perplexity
FROM documents d LEFT JOIN agg a USING (doc_id)""",
        "repeated_spans": r"""
WITH planted AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 4 = 0
      THEN ' all rights reserved contact the site administrator today' ELSE '' END AS text
  FROM documents
), w AS (
  SELECT doc_id, list_filter(str_split_regex(lower(text), '\s+'), x -> x <> '') AS words
  FROM planted
), spans AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         md5(array_to_string(words[i:i+7], ' ')) AS key
  FROM w, unnest(generate_series(1, len(words) - 8 + 1)) AS u(i)
  WHERE len(words) >= 8
), per_doc AS (
  SELECT key, doc_id, COUNT(*) AS n_in_doc, MIN(pos) AS min_pos
  FROM spans GROUP BY key, doc_id
)
, agg AS (
  SELECT key, COUNT(*) AS n_docs, CAST(SUM(n_in_doc) AS BIGINT) AS n_occurrences,
         MIN({'i': doc_id, 'p': min_pos}) AS fst
  FROM per_doc GROUP BY key HAVING COUNT(*) >= 2
)
SELECT key AS span_hash, n_docs, n_occurrences,
       fst.i AS first_id, fst.p AS first_pos FROM agg""",
        # removal half: same planted spans; every non-first occurrence's
        # covered word range is excised and the doc rebuilt word-by-word
        "remove_spans": r"""
WITH planted AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 4 = 0
      THEN ' all rights reserved contact the site administrator today' ELSE '' END AS text
  FROM documents
), w AS (
  SELECT doc_id, list_filter(str_split_regex(lower(text), '\s+'), x -> x <> '') AS words
  FROM planted
), spans AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         md5(array_to_string(words[i:i+7], ' ')) AS key
  FROM w, unnest(generate_series(1, len(words) - 8 + 1)) AS u(i)
  WHERE len(words) >= 8
), per_doc AS (
  SELECT key, doc_id, MIN(pos) AS min_pos FROM spans GROUP BY key, doc_id
), agg AS (
  SELECT key, MIN({'i': doc_id, 'p': min_pos}) AS fst
  FROM per_doc GROUP BY key HAVING COUNT(*) >= 2
), removals AS (
  SELECT s.doc_id, s.pos FROM spans s JOIN agg a ON s.key = a.key
  WHERE NOT (s.doc_id = struct_extract(a.fst, 'i')
             AND s.pos = struct_extract(a.fst, 'p'))
), covered AS (
  SELECT DISTINCT doc_id, pos + u.off AS idx
  FROM removals, unnest(generate_series(0, 7)) AS u(off)
), toks AS (
  SELECT doc_id, words[i] AS word, CAST(i - 1 AS INT) AS idx
  FROM w, unnest(generate_series(1, len(words))) AS u(i)
), kept AS (
  SELECT t.doc_id, t.word, t.idx
  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
  WHERE c.idx IS NULL
), rebuilt AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY idx) AS text FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(r.text, '') AS text
FROM documents d LEFT JOIN rebuilt r USING (doc_id)""",
        # the QUALIFY replica is exact because doc_id keys are unique —
        # the two-phase key-based sampler and row_number coincide there
        "cap_per_domain": r"""
WITH u AS (
  SELECT doc_id, CASE WHEN doc_id % 20 <> 0
    THEN 'https://farm.example.com/p/' || CAST(doc_id AS VARCHAR)
    ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.org/p/' || CAST(doc_id AS VARCHAR) END AS url
  FROM documents
), p AS (
  SELECT doc_id, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host FROM u
), d AS (
  SELECT doc_id, CASE WHEN len(string_split(host, '.')) >= 2
    THEN string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
    ELSE host END AS url_domain
  FROM p
)
SELECT doc_id, url_domain FROM d
QUALIFY row_number() OVER (PARTITION BY url_domain
  ORDER BY substr(md5('seed4|' || CAST(doc_id AS VARCHAR)), 1, 8),
           CAST(doc_id AS VARCHAR)) <= 10""",
        # the rates CTE mirrors mix_keep_rates' float arithmetic
        # operation-for-operation; the threshold comparison is the numeric
        # equivalent of the hex-string compare in sampling._thr_hex
        "proportional_mix": (
            "WITH cnt AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY lang), "
            "wts AS (SELECT * FROM (VALUES ('en', 0.5), ('fr', 0.2), ('de', 0.2), ('es', 0.1)) w(lang, wt)), "
            "sc AS (SELECT MIN(n / wt) AS s FROM cnt JOIN wts USING (lang) WHERE wt > 0 AND n > 0), "
            "rates AS (SELECT c.lang, LEAST(w.wt * sc.s / c.n, 1.0) AS rate "
            "FROM cnt c JOIN wts w USING (lang) CROSS JOIN sc) "
            "SELECT d.doc_id, d.lang FROM documents d JOIN rates r USING (lang) "
            "WHERE ('0x' || substr(md5('seed5|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT "
            "< LEAST(CAST(FLOOR(r.rate * 4294967296.0) AS BIGINT), 4294967295)"
        ),
        # SUM must be cast: DuckDB types a bare SUM(BIGINT) as HUGEINT
        # (int128) while Spark returns BIGINT — the round-3 hash-mismatch
        "pack_sequences": (
            "SELECT COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_tokens, "
            "TRUE AS all_assigned, TRUE AS budget_ok, "
            "TRUE AS packs_within_bound, TRUE AS layout_invariant FROM documents"
        ),
        # real n-gram oracle: DuckDB recomputes the exactly-contaminated
        # doc set from word 5-gram shingles (same normalization: lowercase,
        # split on \s+, drop empties)
        "decontaminate_eval": (
            r"WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            r"'\s+'), x -> x <> '') AS w FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, "
            "greatest(len(w)-4, 1)), i -> array_to_string(w[i:i+4], ' '))) AS g FROM w), "
            "ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 7 = 0), "
            "cont AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (g) "
            "WHERE s.doc_id % 7 <> 0), "
            # span-removal replica: positioned train-side 5-gram windows
            # (the spans rule emits nothing for sub-5-word docs, unlike the
            # flags' padded shingles), eval-matching windows' covered word
            # indexes, then the exact word-level damage tally
            "spans AS (SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+4], ' ') AS g "
            "FROM w, unnest(generate_series(1, len(w) - 5 + 1)) AS u(i) "
            "WHERE len(w) >= 5 AND doc_id % 7 <> 0), "
            "covered AS (SELECT DISTINCT s.doc_id, s.pos + o.off AS idx "
            "FROM spans s JOIN ev USING (g), unnest(generate_series(0, 4)) AS o(off)) "
            "SELECT (SELECT COUNT(*) FROM documents WHERE doc_id % 7 <> 0) AS n_train, "
            "(SELECT COUNT(*) FROM documents WHERE doc_id % 7 = 0) AS n_eval, "
            "(SELECT COUNT(*) FROM cont) AS n_contaminated_exact, "
            "TRUE AS no_false_negatives, TRUE AS overflag_within_bound, "
            "(SELECT COUNT(DISTINCT doc_id) FROM covered) AS n_docs_rewritten, "
            "(SELECT COUNT(*) FROM covered) AS n_removed_words"
        ),
        "interval_join_events": (
            "SELECT l.event_id, l.user_id, l.ts, r.event_id AS purchase_id "
            "FROM (SELECT * FROM events WHERE event_type = 'click') l "
            "JOIN (SELECT * FROM events WHERE event_type = 'purchase') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts "
            "AND l.ts <= r.ts + INTERVAL 30 MINUTE"
        ),
        "asof_join_events": (
            "SELECT l.event_id, l.user_id, l.ts, r.value AS purchase_value_asof "
            "FROM (SELECT * FROM events WHERE event_type = 'click') l "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "sessionize_events": (
            "WITH g AS (SELECT user_id, ts, CASE WHEN epoch_us(ts) - "
            "epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 3600000000 "
            "THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, ts, SUM(brk) OVER "
            "(PARTITION BY user_id ORDER BY ts) AS session_id FROM g) "
            "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
            "COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end, "
            "CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) "
            "AS duration_sec FROM s GROUP BY user_id, session_id"
        ),
        # exact CC oracle: vertices of the chain edge list get component =
        # min id of their block (both chain endpoints are vertices)
        "duplicate_components": (
            "WITH v AS (SELECT DISTINCT doc_id AS id FROM ("
            "  SELECT a.doc_id FROM documents a JOIN documents b "
            "    ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 10 < 9 "
            "  UNION ALL "
            "  SELECT b.doc_id FROM documents a JOIN documents b "
            "    ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 10 < 9) t(doc_id)) "
            "SELECT id, (id - (id % 10)) AS component FROM v ORDER BY id"
        ),
        "bottom_k_sample": (
            "SELECT key FROM (SELECT DISTINCT text AS key FROM documents) "
            "ORDER BY substr(md5('seed3|' || key), 1, 8), key LIMIT 25"
        ),
        "tfidf_top_terms": r"""
WITH pairs AS (
  SELECT doc_id, unnest(list_filter(str_split_regex(lower(text), '\s+'), w -> w <> '')) AS word
  FROM documents
), tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM pairs GROUP BY doc_id, word
), dfreq AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df FROM pairs GROUP BY word
), n AS (SELECT COUNT(*) AS nd FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
         tf.tf * (ln((n.nd + 1.0) / (dfreq.df + 1.0)) + 1.0) AS tf_idf
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
)
SELECT doc_id, word, tf, df, tf_idf,
       row_number() OVER (PARTITION BY doc_id ORDER BY tf_idf DESC, word ASC) AS rank
FROM scored QUALIFY rank <= 3""",
        "repetition_stats": r"""
WITH base AS (
  SELECT doc_id,
    list_filter(list_transform(str_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS lines,
    list_filter(str_split_regex(lower(text), '\s+'), w -> w <> '') AS words
  FROM documents
), scal AS (
  SELECT doc_id,
    CASE WHEN len(lines) > 0 THEN 1.0 - len(list_distinct(lines)) / greatest(len(lines),1)::DOUBLE ELSE 0.0 END AS dup_line_frac,
    CASE WHEN len(lines) > 0 THEN 1.0 - coalesce(list_sum(list_transform(list_distinct(lines), x -> length(x))),0) / greatest(coalesce(list_sum(list_transform(lines, x -> length(x))),0),1)::DOUBLE ELSE 0.0 END AS dup_line_char_frac,
    coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS word_chars
  FROM base
), grams AS (
  SELECT doc_id, unnest(CASE WHEN len(words) >= 2
      THEN list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])
      ELSE [] END) AS gram
  FROM base
), cnt AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram
), top AS (
  SELECT doc_id, c, gram FROM (
    SELECT doc_id, c, gram, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram DESC) rn
    FROM cnt) WHERE rn = 1
)
SELECT s.doc_id, dup_line_frac, dup_line_char_frac,
  coalesce(t.c * length(replace(t.gram, ' ', '')) / greatest(s.word_chars,1)::DOUBLE, 0.0) AS top_ngram_char_frac
FROM scal s LEFT JOIN top t USING (doc_id)""",
        "weighted_sample": (
            "SELECT key, weight FROM ("
            " SELECT CAST(doc_id AS VARCHAR) AS key, SUM(CAST(n_chars AS DOUBLE)) AS weight"
            " FROM documents WHERE n_chars > 0 GROUP BY doc_id)"
            " ORDER BY ln((('0x' || substr(md5('seed7|' || key), 1, 8))::BIGINT + 0.5)"
            " / 4294967296.0) / weight DESC, key LIMIT 50"
        ),
        "theta_user_overlap": (
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "COUNT(DISTINCT a.user_id) AS n_inter_exact, TRUE AS inter_in_bound "
            "FROM (SELECT DISTINCT event_type, user_id FROM events) a "
            "JOIN (SELECT DISTINCT event_type, user_id FROM events) b "
            "ON a.user_id = b.user_id AND a.event_type < b.event_type "
            "GROUP BY a.event_type, b.event_type"
        ),
        "sharded_bloom_semi_join": (
            "SELECT COUNT(*) AS n_keys, 0 AS n_missed, TRUE AS bytes_equal_single, "
            "TRUE AS single_exceeds_budget, TRUE AS shards_within_budget, "
            "TRUE AS fp_within_bound FROM orders"
        ),
        "ann_recall_suite": (
            "SELECT 'lsh' AS chk, (SELECT COUNT(*) FROM embeddings WHERE vec_id < 50) AS n, TRUE AS ok "
            "UNION ALL SELECT 'ivf', (SELECT COUNT(*) FROM embeddings WHERE vec_id < 50), TRUE "
            "UNION ALL SELECT 'pq', 20, TRUE "
            "UNION ALL SELECT 'ivfpq', 20, TRUE "
            "UNION ALL SELECT 'exact_top1', 10, TRUE"
        ),
        "topk_users": (
            "SELECT user_id, COUNT(*) AS n_exact, TRUE AS within_bound FROM events "
            "GROUP BY user_id ORDER BY n_exact DESC, user_id LIMIT 10"
        ),
        "grouped_sharded_bloom": (
            "SELECT COUNT(DISTINCT event_type) AS n_groups, CAST(0 AS BIGINT) AS n_missed, "
            "CAST(0 AS BIGINT) AS n_ghost_hits, TRUE AS bytes_equal, "
            "TRUE AS algebra_ok FROM events"
        ),
        "rolling_agg": (
            "SELECT event_id, user_id, COUNT(value) OVER w AS w_count, "
            "SUM(value) OVER w AS w_sum, AVG(value) OVER w AS w_avg FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) "
            "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"
        ),
        "profile_events": r"""
SELECT c.column,
  (SELECT COUNT(*) FROM events) AS n_rows,
  CAST(0 AS BIGINT) AS n_nulls,
  CASE c.column WHEN 'event_id' THEN (SELECT MIN(event_id)::DOUBLE FROM events)
                WHEN 'user_id' THEN (SELECT MIN(user_id)::DOUBLE FROM events)
                WHEN 'value' THEN (SELECT MIN(value)::DOUBLE FROM events) END AS min_num,
  CASE c.column WHEN 'event_id' THEN (SELECT MAX(event_id)::DOUBLE FROM events)
                WHEN 'user_id' THEN (SELECT MAX(user_id)::DOUBLE FROM events)
                WHEN 'value' THEN (SELECT MAX(value)::DOUBLE FROM events) END AS max_num,
  CASE c.column WHEN 'event_type' THEN (SELECT MIN(event_type) FROM events) END AS min_str,
  CASE c.column WHEN 'event_type' THEN (SELECT MAX(event_type) FROM events) END AS max_str,
  TRUE AS distinct_in_bound, TRUE AS p50_in_bound
FROM (SELECT unnest(['event_id','user_id','event_type','value']) AS column) c""",
        "line_dedup": r"""
WITH planted AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 3 = 0
      THEN chr(10) || 'subscribe to our newsletter for updates' ELSE '' END AS text
  FROM documents
), lines AS (
  SELECT doc_id, (generate_subscripts(l, 1) - 1)::BIGINT AS pos, unnest(l) AS line
  FROM (SELECT doc_id, str_split(text, chr(10)) AS l FROM planted)
), ranked AS (
  SELECT doc_id, pos, line,
    CASE WHEN length(trim(line)) < 1 THEN 1
         ELSE row_number() OVER (PARTITION BY CASE WHEN length(trim(line)) >= 1 THEN md5(line) END
                                 ORDER BY doc_id, pos) END AS rn
  FROM lines
), kept AS (
  SELECT doc_id, pos, line FROM ranked WHERE rn = 1
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text FROM kept GROUP BY doc_id
)
SELECT p.doc_id, coalesce(r.text, '') AS text
FROM planted p LEFT JOIN rebuilt r USING (doc_id)""",
        "text_clean_suite": r"""
WITH planted AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 3 = 0 THEN ' caf' || 'e' || chr(769) || '  tab' || chr(9) || 'here' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' contact bob.smith@corp.example.com' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' from 10.1.2.3' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call 415-555-0199' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' ctl' || chr(1) || chr(127) || 'end' ELSE '' END
         || CASE WHEN doc_id % 17 = 0 THEN ' <p>click <b>here</b> &amp; enjoy</p><script>evil()</script>' ELSE '' END AS text
  FROM documents
), html AS (
  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, '(?is)<(script|style)[^>]*>.*?</(script|style)\s*>', ' ', 'g'), '(?s)<!--.*?-->', ' ', 'g'), '(?i)<(br|hr)\s*/?>|</(p|div|li|tr|h1|h2|h3|h4|h5|h6)\s*>', '
', 'g'), '(?s)<[^>]*>', ' ', 'g'), '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&amp;', '&', 'g'), '[ \t]+', ' ', 'g'), '^\s+|\s+$', '', 'g') AS text
  FROM planted
), cleaned AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(nfc_normalize(text),
      '[\x00-\x08\x0b-\x1f\x7f-\x9f]', '', 'g'),
      '[ \t]+', ' ', 'g')) AS text
  FROM html
), scrubbed AS (
  SELECT doc_id, text AS orig,
    regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
      '(?:\+?[0-9]{1,2}[ .-]?)?(?:\([0-9]{3}\)[ .-]?|[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}', '<PHONE>', 'g') AS text
  FROM cleaned
)
SELECT doc_id, text, text <> orig AS pii_found FROM scrubbed""",
        "conversation_dedup": r"""
WITH convs AS (
  SELECT doc_id % 100 AS conv, doc_id AS idx, text FROM documents
  UNION ALL
  SELECT doc_id % 100 + 10000, doc_id, text FROM documents
), seq AS (
  SELECT conv, md5(string_agg(text, chr(31) ORDER BY idx, text)) AS digest
  FROM convs GROUP BY conv
)
SELECT MIN(conv) AS canonical, COUNT(*) AS n_groups FROM seq GROUP BY digest""",
        "quantile_buckets": (
            "SELECT b.bucket, TRUE AS within_tol, "
            "(SELECT COUNT(*) FROM events) AS n_total "
            "FROM (SELECT unnest(range(0, 8))::INT AS bucket) b"
        ),
        "topk_ngrams": r"""
WITH words AS (
  SELECT doc_id, list_filter(str_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents
), grams AS (
  SELECT unnest(CASE WHEN len(w) >= 2
      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
      ELSE [] END) AS gram
  FROM words
)
SELECT gram, COUNT(*) AS n_exact, TRUE AS within_bound FROM grams
GROUP BY gram ORDER BY n_exact DESC, gram LIMIT 10""",
        "cosine_near_dup": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
        ),
        "dedup_guards": (
            "WITH c AS (SELECT COUNT(*) AS cnt FROM documents GROUP BY text) "
            "SELECT 'survivors' AS chk, (SELECT COUNT(*) FROM c) AS n, TRUE AS ok "
            "UNION ALL SELECT 'survivor_groups', (SELECT COUNT(*) FROM c), TRUE "
            "UNION ALL SELECT 'survivor_sample', "
            "CAST((SELECT SUM(LEAST(cnt * 2, 20)) FROM c) AS BIGINT), TRUE "
            "UNION ALL SELECT 'hot_bucket', (SELECT COUNT(*) FROM documents), TRUE "
            "UNION ALL SELECT 'lsh_dup_recall', (SELECT COUNT(*) FROM documents), TRUE "
            "UNION ALL SELECT 'simhash_h0', (SELECT COUNT(*) FROM documents), TRUE"
        ),
        "grouped_hc_membership": (
            "SELECT COUNT(DISTINCT l_orderkey) AS n_groups, COUNT(*) AS n_rows, "
            "0 AS n_missed FROM lineitem"
        ),
        "corpus_clean_pipeline": """WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents
  UNION ALL SELECT doc_id + 2000000, text || ' zzneardupmarker' FROM documents
  WHERE len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) >= 30
), surv AS (
  SELECT min(doc_id) AS doc_id, text FROM corpus GROUP BY text
), w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS words,
         length(text) AS n_chars
  FROM surv
), s AS (
  SELECT doc_id, words,
         len(words) AS n_tokens,
         CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
           / GREATEST(n_chars, 1) AS punct_ratio,
         CAST(n_chars - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
           / GREATEST(n_chars, 1) AS digit_ratio,
         CAST(len(list_filter(words, x -> list_contains(['the','and','of','to','in','is','that','it','was','for','with','are','this','not','you'], x))) AS DOUBLE)
           / GREATEST(len(words), 1) AS stop_ratio
  FROM w
), q AS (
  SELECT doc_id, words FROM s
  WHERE (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.3 END)
      * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.4 END)
      * (CASE WHEN digit_ratio <= 0.3 THEN 1.0 ELSE 0.5 END)
      * (CASE WHEN stop_ratio >= 0.05 THEN 1.0 ELSE 0.6 END) >= 0.99
), sh AS (
  SELECT doc_id,
         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                        FOR i IN range(1, GREATEST(len(words) - 1, 2))]) AS sset
  FROM q
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sset, b.sset))) >= 0.85
)
SELECT (SELECT COUNT(*) FROM corpus) AS n_input,
       (SELECT COUNT(*) FROM surv) AS n_after_exact,
       (SELECT COUNT(*) FROM q) AS n_after_quality,
       (SELECT COUNT(*) FROM pairs) AS n_neardup_pairs,
       (SELECT COUNT(*) FROM q) - (SELECT COUNT(DISTINCT id_b) FROM pairs) AS n_final""",
    }
