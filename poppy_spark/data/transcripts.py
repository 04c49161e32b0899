"""Deterministic synthetic multi-turn conversation transcripts.

Generates the north-rule input table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` entirely with built-in Spark expressions (xxhash64-seeded
selection — no Python UDFs), so:

* generation scales linearly and runs JVM-side under whole-stage codegen;
* every field is a pure function of ``(conv_id, turn_idx, seed)`` — the
  per-turn text equality invariant under stable ordering holds by
  construction and is pinned by ``tests/test_transcripts.py``;
* one configurable skewed conversation holds ``skew_frac`` of all turns to
  exercise salting/repartitioning.

Role weights 0.45/0.45/0.02/0.08 (user/assistant/system/tool) and the other
shape parameters follow FIXTURES.md §1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WORDS = [
    # fixed 128-word vocabulary; includes <=8-byte tokens that exercise
    # poppy's identity hash path (poppy/src/hash.rs:52-63)
    "the", "a", "of", "to", "and", "in", "is", "it", "you", "that", "was",
    "for", "on", "are", "with", "as", "his", "they", "be", "at", "one",
    "have", "this", "from", "or", "had", "by", "hot", "word", "but", "what",
    "some", "we", "can", "out", "other", "were", "all", "there", "when",
    "up", "use", "your", "how", "said", "an", "each", "she", "which", "do",
    "their", "time", "if", "will", "way", "about", "many", "then", "them",
    "write", "would", "like", "so", "these", "her", "long", "make", "thing",
    "see", "him", "two", "has", "look", "more", "day", "could", "go", "come",
    "did", "number", "sound", "no", "most", "people", "my", "over", "know",
    "water", "than", "call", "first", "who", "may", "down", "side", "been",
    "now", "find", "any", "new", "work", "part", "take", "get", "place",
    "made", "live", "where", "after", "back", "little", "only", "round",
    "man", "year", "came", "show", "every", "good", "me", "give", "our",
    "under", "name", "very", "through", "just", "form", "sentence",
]

TOOLS = [
    "search", "browser", "calculator", "python", "bash", "sql", "files",
    "editor", "compiler", "linter", "debugger", "profiler", "http", "email",
    "calendar", "weather", "maps", "translate", "summarize", "classify",
    "extract", "ocr", "speech", "vision", "embed", "rerank", "fetch",
    "cache", "queue", "scheduler",
]

BASE_EPOCH = 1767225600  # 2026-01-01T00:00:00Z


def _h(*cols):
    return F.xxhash64(*cols)


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    skew_frac: float = 0.05,
    max_turns: int = 40,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts table; ~``n_convs * (max_turns/2 + 3)`` rows
    plus one skewed conversation holding ``skew_frac`` of all turns."""
    s = F.lit(seed)
    convs = spark.range(n_convs).withColumnRenamed("id", "cid")
    if partitions:
        convs = convs.repartition(partitions, "cid")
    avg_turns = 3 + max_turns // 2
    skew_turns = int(skew_frac * n_convs * avg_turns / max(1.0 - skew_frac, 0.01))
    convs = convs.withColumn(
        "n_turns",
        F.when(F.col("cid") == 0, F.lit(skew_turns)).otherwise(
            3 + F.pmod(_h(F.col("cid"), s, F.lit(1)), F.lit(max_turns - 2))
        ),
    ).withColumn("conv_start", F.pmod(_h(F.col("cid"), s, F.lit(2)), F.lit(60 * 86400)))

    turns = convs.select(
        F.col("cid"),
        F.col("conv_start"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    word_arr = F.array(*[F.lit(w) for w in WORDS])
    tool_arr = F.array(*[F.lit(t) for t in TOOLS])

    rolecode = F.pmod(_h("cid", "turn_idx", s, F.lit(3)), F.lit(100))
    role = (
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .when(rolecode < F.lit(4), F.lit("system"))
        .when(rolecode < F.lit(20), F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )

    n_tok = F.when(
        F.pmod(_h("cid", "turn_idx", s, F.lit(4)), F.lit(17)) == 0, F.lit(1)
    ).otherwise(1 + F.pmod(_h("cid", "turn_idx", s, F.lit(5)), F.lit(59)))

    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_tok - 1),
            lambda i: F.element_at(
                word_arr, (F.pmod(_h("cid", "turn_idx", i, s, F.lit(6)), F.lit(len(WORDS))) + 1).cast("int")
            ),
        ),
        " ",
    )

    tool = F.when(
        F.col("role").isin("tool", "assistant")
        & (F.pmod(_h("cid", "turn_idx", s, F.lit(7)), F.lit(3)) == 0),
        F.element_at(
            tool_arr, (F.pmod(_h("cid", "turn_idx", s, F.lit(8)), F.lit(len(TOOLS))) + 1).cast("int")
        ),
    ).otherwise(F.lit(None).cast("string"))

    # per-conversation constant gap keeps ts strictly monotone in turn_idx
    ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH)
        + F.col("conv_start")
        + F.col("turn_idx") * (30 + F.pmod(_h("cid", s, F.lit(9)), F.lit(240)))
    )

    return (
        turns.withColumn("role", role)
        .select(
            F.format_string("conv-%08d", F.col("cid")).alias("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.col("role"),
            text.alias("text"),
            tool.alias("tool"),
            ts.alias("ts"),
        )
    )
