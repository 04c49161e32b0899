"""Resumable sketch builds: per-partition state checkpointing with lineage.

The distributed build writes one serialized partial state per input
partition plus a JSON manifest (partition id, row count, input fingerprint,
timing).  A resumed build loads the manifest, recomputes ONLY missing or
fingerprint-changed partitions, and unions everything — the poppy ``insert``
command's incremental shape (load filter, add new data, save —
``poppy/src/bin/poppy.rs:320-335``) generalized to partitioned inputs.

Layout under ``dir``::

    manifest.json                 {"sketch": kind, "partitions": {pid: {...}}}
    part-00000.state ...          one poppy/sketch state file per partition
    final.state                   merged state (written by ``finish``)
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from poppy_spark.sketches.base import Sketch


def _fingerprint(df: DataFrame, col: str) -> DataFrame:
    """Cheap per-partition input fingerprint: row count + xor/sum of
    xxhash64(key) — order-insensitive, so it is stable under rescans."""
    import pyarrow as pa

    def fp(batches):
        from pyspark import TaskContext

        import numpy as np

        n = 0
        acc = np.uint64(0)
        for b in batches:
            h = b.column(1).to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            acc ^= np.bitwise_xor.reduce(h) if h.size else np.uint64(0)
            n += b.num_rows
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], pa.int64()),
                pa.array([n], pa.int64()),
                pa.array([int(acc.astype(np.int64))], pa.int64()),
            ],
            ["pid", "n_rows", "fingerprint"],
        )

    sel = df.select(F.col(col).alias("__k"), F.xxhash64(F.col(col)).alias("__h"))
    return sel.mapInArrow(fp, "pid bigint, n_rows bigint, fingerprint bigint")


class SketchCheckpoint:
    def __init__(self, directory: str, factory: Callable[[], Sketch]):
        self.dir = directory
        self.factory = factory
        os.makedirs(directory, exist_ok=True)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"sketch": type(self.factory()).kind, "partitions": {}}

    def _save_manifest(self, manifest: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def build(self, df: DataFrame, col: str, resume: bool = True) -> Sketch:
        """Build (or resume) the sketch over ``df[col]``.

        Partitions whose fingerprint matches the manifest are skipped; their
        checkpointed states are reused.  Returns the merged sketch and writes
        ``final.state``.
        """
        from poppy_spark.spark.agg import _key_expr, _update_fn

        manifest = self.load_manifest() if resume else {"sketch": type(self.factory()).kind, "partitions": {}}
        done = manifest["partitions"]

        fps = {r["pid"]: r for r in _fingerprint(df, col).collect()}
        todo = [
            pid
            for pid, r in fps.items()
            if str(pid) not in done
            or done[str(pid)]["fingerprint"] != r["fingerprint"]
            or done[str(pid)]["n_rows"] != r["n_rows"]
        ]

        if todo:
            sdf = df.select(_key_expr(df, col, self.factory).alias("__key__"))
            todo_set = set(todo)
            factory = self.factory

            def update(batches):
                # checkpoint files stay raw (each one a valid poppy/sketch
                # file); compression is a shuffle-internal concern
                yield from _update_fn(factory, compress=False)(batches)

            states = sdf.mapInArrow(update, "pid bigint, state binary, n_rows bigint")
            rows = states.filter(F.col("pid").isin([int(p) for p in todo_set])).collect()
            t = time.time()
            for r in rows:
                path = os.path.join(self.dir, f"part-{r['pid']:05d}.state")
                with open(path, "wb") as f:
                    f.write(bytes(r["state"]))
                done[str(r["pid"])] = {
                    "n_rows": fps[r["pid"]]["n_rows"],
                    "fingerprint": fps[r["pid"]]["fingerprint"],
                    "state_file": os.path.basename(path),
                    "updated_at": t,
                }
            self._save_manifest(manifest)

        # merge all checkpointed partitions
        cls = type(self.factory())
        merged = None
        for pid in sorted(done, key=int):
            with open(os.path.join(self.dir, done[pid]["state_file"]), "rb") as f:
                part = cls.loads(f.read())
            if merged is None:
                merged = part
            else:
                merged.merge(part)
        if merged is None:
            merged = self.factory()
        merged.finalize_merge()
        with open(os.path.join(self.dir, "final.state"), "wb") as f:
            f.write(merged.dumps())
        return merged

    def metrics(self) -> dict:
        """Lineage summary: rows per partition, total, staleness."""
        manifest = self.load_manifest()
        parts = manifest["partitions"]
        return {
            "sketch": manifest.get("sketch"),
            "n_partitions": len(parts),
            "total_rows": sum(p["n_rows"] for p in parts.values()),
            "partitions": parts,
        }
