"""Synthesize a deterministic sf3 dataset from sf1.0 (3 id-shifted
replicas — the round-5 sf1_verify recipe, one scale up) for the round-6
super-linearity rehearsal.  Documents get a distinct replica-tag header
line (full 3x text cardinality); lineitem/orders shift join keys by the
same offset; dimensions stay 1x; embeddings stay at sf1 (identical-vector
replication would turn the ANN rows into a pure duplicate-stress workload
— recorded honestly, as the sf1 run recorded its sf0.1 embeddings).

Usage: python bench/sf3_synth.py [/tmp/poppy_sf3]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE = "/root/testdata/sf1.0"
OFF = 100_000_000
REPLICAS = 3


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/poppy_sf3"
    os.makedirs(work, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{work}/{t}.parquet")

    def replicate(table: str, id_cols: list[str], tag_text: str | None = None):
        src = pq.read_table(f"{BASE}/{table}.parquet")
        parts = []
        for r in range(REPLICAS):
            t = src
            if r:
                for c in id_cols:
                    t = t.set_column(
                        t.schema.get_field_index(c), c,
                        pc.add(t.column(c), r * OFF),
                    )
                if tag_text:
                    idx = t.schema.get_field_index(tag_text)
                    t = t.set_column(
                        idx, tag_text,
                        pc.binary_join_element_wise(
                            pa.array([f"replica-{r} corpus segment"] * len(t)),
                            t.column(tag_text).cast(pa.string()),
                            "\n",
                        ),
                    )
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{work}/{table}.parquet")
        print(f"{table}: {len(src)} -> {len(out)}")

    replicate("events", ["event_id", "user_id"])
    replicate("orders", ["o_orderkey"])
    replicate("lineitem", ["l_orderkey"])
    replicate("documents", ["doc_id"], tag_text="text")
    open(f"{work}/_DONE", "w").close()
    print("done:", work)


if __name__ == "__main__":
    main()
