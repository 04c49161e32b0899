"""Spark-side verbs of the poppy_spark engine."""

from .agg import (
    build_sketch,
    build_sketch_df,
    build_sketch_grouped,
    merge_states_tree,
    repartition_salted,
    sketch_value_column,
)
from .catalog import load_table, write_table
from .checkpoint import SketchCheckpoint
from .probe import (
    bloom_anti_join,
    bloom_contains,
    bloom_contains_grouped,
    bloom_contains_grouped_join,
    bloom_contains_udf,
    bloom_semi_join,
    register_bloom_sql,
)
from .session import get_spark
from .sharded import (
    ShardedBloom,
    ShardedBloomStream,
    build_sharded_bloom,
    estimate_distinct_keys,
)
from .streaming import StreamingSketch, merge_grouped_states

__all__ = [
    "ShardedBloom",
    "ShardedBloomStream",
    "SketchCheckpoint",
    "StreamingSketch",
    "bloom_anti_join",
    "bloom_contains",
    "bloom_contains_grouped",
    "bloom_contains_grouped_join",
    "bloom_contains_udf",
    "bloom_semi_join",
    "register_bloom_sql",
    "build_sharded_bloom",
    "build_sketch",
    "build_sketch_df",
    "build_sketch_grouped",
    "estimate_distinct_keys",
    "get_spark",
    "load_table",
    "merge_states_tree",
    "merge_grouped_states",
    "repartition_salted",
    "sketch_value_column",
    "write_table",
]
