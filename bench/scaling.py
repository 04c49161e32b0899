"""Scaling-efficiency evidence for the north rule.

No real cluster exists in this sandbox, so we run the IDENTICAL job at two
parallelism levels with PINNED partitioning and report throughput at both
plus ``efficiency = (T_low / T_high) / (high/low)`` (1.0 = perfect, target
>= 0.8).  Two N->4N pairs are measured (2->8 and 8->32 cores) for three
jobs:

* ``bloom``   — bulk Bloom build over raw transcript text (poppy-compatible
  hashing; the full text crosses the JVM->Python Arrow boundary),
* ``sharded`` — the bucket-range-sharded Bloom build (index-tuple shuffle;
  the 10^12-capacity path — per-task memory is its shards' bytes only),
* ``probe``   — full membership probe of every turn,
* ``hll``     — distinct-conversation HLL with JVM-side xxhash64 pre-hashing
  (8 bytes/row across the boundary — the scale path for non-poppy sketches).

Results append to BENCH/BASELINE.md.  Run: python bench/scaling.py [n_convs]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRS = [(2, 8), (8, 32)]
PARTITIONS = 64  # files in the generated dataset
#: pin scan partitioning via file splits (core-count independent) instead of
#: an in-measurement repartition — the round-robin shuffle of the raw text
#: was costing 3x the build itself at 32 cores (0.37 vs 1.11 M turns/s)
MAX_PARTITION_BYTES = "4m"
REPS = 3


def _make_dataset(path: str, n_convs: int) -> int:
    from poppy_spark.data.transcripts import generate_transcripts
    from poppy_spark.spark.session import get_spark

    spark = get_spark("poppy-scaling-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    df = generate_transcripts(spark, n_convs=n_convs, partitions=PARTITIONS)
    df.repartition(PARTITIONS).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def _run_at(cores: int, path: str, n_rows: int) -> dict:
    from pyspark.sql import functions as F

    from poppy_spark.sketches import BloomSketch, HllSketch
    from poppy_spark.spark.agg import build_sketch
    from poppy_spark.spark.probe import bloom_contains
    from poppy_spark.spark.session import get_spark

    spark = get_spark(f"poppy-scaling-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores,
                      max_partition_bytes=MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")
    # read straight from parquet each pass: the OS page cache holds the
    # bytes, and Spark's columnar cache adds an expensive cold first pass
    df = spark.read.parquet(path).select("conv_id", "text")
    bloom_factory = BloomSketch.factory(n_rows, 0.001)
    hll_factory = HllSketch.factory(14)
    # warm python workers so we time the aggregation, not interpreter startup
    build_sketch(df.limit(20000), "text", bloom_factory)

    def best(fn):
        b = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    from poppy_spark.spark.sharded import build_sharded_bloom

    state = build_sketch(df, "text", bloom_factory, strategy="states").dumps()

    def sharded_build():
        sb = build_sharded_bloom(
            df, "text", capacity=n_rows, fpp=0.001, n_shards=32, persist=False
        )
        sb.states.write.format("noop").mode("overwrite").save()

    out = {
        "cores": cores,
        # pinned to the classic states path: auto would route this filter size
        # through sharded and the row would stop measuring the states shape
        "bloom_sec": round(best(lambda: build_sketch(df, "text", bloom_factory, strategy="states")), 3),
        "sharded_sec": round(best(sharded_build), 3),
        "probe_sec": round(best(
            lambda: bloom_contains(df, "text", state, "hit")
            .agg(F.sum(F.col("hit").cast("long"))).collect()
        ), 3),
        "hll_sec": round(best(lambda: build_sketch(df, "conv_id", hll_factory)), 3),
    }
    for job in ("bloom", "sharded", "probe", "hll"):
        out[f"{job}_M_turns_per_sec"] = round(n_rows / out[f"{job}_sec"] / 1e6, 3)
    spark.stop()
    return out


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    path = os.environ.get("POPPY_SCALE_DATA", "/tmp/poppy_scaling_transcripts")
    n_rows = _make_dataset(path, n_convs)

    levels = sorted({c for pair in PAIRS for c in pair})
    runs = {c: _run_at(c, path, n_rows) for c in levels}

    lines = [
        f"\n## Scaling run {datetime.now(timezone.utc).isoformat(timespec='seconds')}",
        "",
        f"Identical jobs over {n_rows:,} transcript turns, file-split-pinned "
        f"scan partitions (maxPartitionBytes={MAX_PARTITION_BYTES}), best of {REPS} runs per level.",
        "",
        "| cores | bloom s | sharded s | probe s | hll s | bloom M/s | sharded M/s | probe M/s | hll M/s |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for c in levels:
        r = runs[c]
        lines.append(
            f"| {c} | {r['bloom_sec']} | {r['sharded_sec']} | {r['probe_sec']} | {r['hll_sec']} "
            f"| {r['bloom_M_turns_per_sec']} | {r['sharded_M_turns_per_sec']} "
            f"| {r['probe_M_turns_per_sec']} | {r['hll_M_turns_per_sec']} |"
        )
    lines += ["", "| pair | bloom eff | sharded eff | probe eff | hll eff |", "|---|---|---|---|---|"]
    effs = {}
    for lo, hi in PAIRS:
        ratio = hi / lo
        row = [f"| {lo}->{hi} "]
        for job in ("bloom", "sharded", "probe", "hll"):
            e = (runs[lo][f"{job}_sec"] / runs[hi][f"{job}_sec"]) / ratio
            effs[f"{job}_{lo}to{hi}"] = round(e, 3)
            row.append(f"| {e:.3f} ")
        lines.append("".join(row) + "|")
    lines += [
        "",
        "Efficiency = (T_low/T_high)/(high/low); target >= 0.8 per the north",
        "rule.  Context: this single host saturates its memory subsystem well",
        "below 32 concurrent workers for string-heavy feeds (see PERF_NOTES in",
        "BENCH/); the pre-hashed HLL path ships 8 bytes/row and scales",
        "furthest.",
    ]
    md = "\n".join(lines) + "\n"
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(md)
    print(json.dumps({"n_rows": n_rows, "runs": runs, "efficiency": effs}))


if __name__ == "__main__":
    main()
