"""Controlled kernel-scaling evidence (no Spark, no JVM).

Runs the identical single-partition work — pack + hash + Bloom insert over a
fixed slice of the transcripts parquet — in P independent OS processes and
reports per-process kernel seconds.  Flat per-process time from P=1 to P=32
demonstrates the *kernels* scale linearly with cores; any gap between this
and the Spark-level numbers in BASELINE.md is scheduler/JVM/host overhead,
not the algorithm.

Run:  python bench/kernel_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r"""
import sys, time
sys.path.insert(0, "%(repo)s")
import pyarrow.parquet as pq, pyarrow as pa
from poppy_spark.core.hashkern import pack_arrow
from poppy_spark.sketches import BloomSketch
t = pq.read_table("%(data)s", columns=["text"])
arr = t.column(0).combine_chunks().slice(0, 200000).cast(pa.string())
b = BloomSketch.create(2700000, 0.001); f = b.filter._inner
CH = 16384
# the production Spark update path: bulk OR-only insert
m, l = pack_arrow(arr.slice(0, CH)); f.insert_packed_bulk(m, l)  # warm
t0 = time.perf_counter()
for off in range(0, len(arr), CH):
    m, l = pack_arrow(arr.slice(off, CH))
    f.insert_packed_bulk(m, l)
print(f"{time.perf_counter()-t0:.3f}")
"""


def run(p: int, repo: str, data: str) -> list[float]:
    env = dict(
        os.environ,
        MALLOC_MMAP_THRESHOLD_=str(16 << 30),
        MALLOC_TRIM_THRESHOLD_=str(16 << 30),
        MALLOC_TOP_PAD_=str(256 << 20),
    )
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER % {"repo": repo, "data": data})
        script = f.name
    procs = [
        subprocess.Popen([sys.executable, script], stdout=subprocess.PIPE, env=env)
        for _ in range(p)
    ]
    outs = [float(pr.communicate()[0].strip()) for pr in procs]
    os.unlink(script)
    return outs


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.environ.get("POPPY_SCALE_DATA", "/tmp/poppy_scaling_transcripts")
    results = {}
    for p in (1, 8, 32):
        outs = run(p, repo, data)
        results[p] = {
            "median_kernel_sec": round(sorted(outs)[len(outs) // 2], 3),
            "max_kernel_sec": round(max(outs), 3),
        }
    base = results[1]["median_kernel_sec"]
    md = [
        "",
        f"## Kernel scaling (no Spark) {time.strftime('%Y-%m-%dT%H:%M:%S')}",
        "",
        "Identical 200k-row pack+hash+insert per process, P concurrent",
        "processes (16k-row chunks, tuned malloc):",
        "",
        "| P | median kernel s | max | per-core efficiency vs P=1 |",
        "|---|---|---|---|",
    ]
    for p, r in results.items():
        eff = base / r["median_kernel_sec"]
        md.append(f"| {p} | {r['median_kernel_sec']} | {r['max_kernel_sec']} | {eff:.2f} |")
    md.append("")
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
