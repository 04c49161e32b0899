"""Mergeable sketch family (Bloom, HLL, count-min, KLL,
t-digest, MinHash, Misra-Gries top-k, theta/KMV).

All follow the update/merge/result contract proven by poppy's Bloom union
(fixed-size state, elementwise update, commutative+associative merge) so each
drops into the same two-phase Spark aggregation in
:mod:`poppy_spark.spark.agg`.
"""

from .base import Sketch
from .bloom import BloomSketch
from .cms import CmsSketch
from .hll import HllSketch
from .kll import KllSketch
from .minhash import MinHashSketch
from .tdigest import TDigestSketch
from .theta import ThetaSketch
from .topk import TopKSketch

SKETCH_KINDS = {
    cls.kind: cls
    for cls in (BloomSketch, HllSketch, CmsSketch, KllSketch, TDigestSketch, MinHashSketch, TopKSketch, ThetaSketch)
}

__all__ = [
    "Sketch",
    "BloomSketch",
    "CmsSketch",
    "HllSketch",
    "KllSketch",
    "MinHashSketch",
    "TDigestSketch",
    "ThetaSketch",
    "TopKSketch",
    "SKETCH_KINDS",
]
