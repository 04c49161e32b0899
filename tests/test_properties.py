"""Property-based tests (hypothesis): serialization roundtrips, batch ==
sequential equivalence, and merge algebra over arbitrary key sets."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import HealthCheck, given, settings

from poppy_spark.core import BloomFilter, loads
from poppy_spark.core.hashes import fnv1_64, hash_pop, wyhash
from poppy_spark.core import hashkern as hk
from poppy_spark.sketches import CmsSketch, HllSketch, KllSketch, MinHashSketch

keys_strategy = st.lists(st.binary(min_size=0, max_size=96), min_size=1, max_size=120)
SET = settings(
    max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@SET
@given(keys=keys_strategy)
def test_batch_hashes_equal_scalar(keys):
    mat, lens = hk.pack_keys(keys)
    assert [int(x) for x in hk.fnv1_batch(mat, lens)] == [fnv1_64(k) for k in keys]
    assert [int(x) for x in hk.wyhash_batch(mat, lens)] == [wyhash(k) for k in keys]
    assert [int(x) for x in hk.hash_pop_batch(mat, lens)] == [hash_pop(k) for k in keys]


@SET
@given(keys=keys_strategy, version=st.sampled_from([1, 2]))
def test_batch_insert_equals_sequential(keys, version):
    seq = BloomFilter.with_version(version, 4 * len(keys) + 8, 0.01)
    bat = BloomFilter.with_version(version, 4 * len(keys) + 8, 0.01)
    seq_new = [seq.insert_bytes(k) for k in keys]
    assert list(bat.insert_batch(keys)) == seq_new
    assert bat.dumps() == seq.dumps()


@SET
@given(keys=keys_strategy, version=st.sampled_from([1, 2]))
def test_serialization_roundtrip(keys, version):
    b = BloomFilter.with_version(version, 4 * len(keys) + 8, 0.01)
    b.insert_batch(keys)
    raw = b.dumps()
    r = loads(raw)
    assert r.dumps() == raw
    assert bool(r.contains_batch(keys).all())


@SET
@given(keys=keys_strategy, split=st.integers(min_value=0, max_value=120))
def test_union_merge_equals_single_build(keys, split):
    split = min(split, len(keys))
    cap = 4 * len(keys) + 8
    whole = BloomFilter.with_capacity(cap, 0.01)
    whole.insert_batch(keys)
    whole.update_count()
    a = BloomFilter.with_capacity(cap, 0.01)
    b = BloomFilter.with_capacity(cap, 0.01)
    if keys[:split]:
        a.insert_batch(keys[:split])
    if keys[split:]:
        b.insert_batch(keys[split:])
    a.union_merge(b)
    assert a.dumps() == whole.dumps()


@SET
@given(keys=keys_strategy)
def test_zero_false_negatives(keys):
    b = BloomFilter.with_capacity(4 * len(keys) + 8, 0.001)
    b.insert_batch(keys)
    assert bool(b.contains_batch(keys).all())


@SET
@given(keys=st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=100))
def test_sketch_merge_commutative(keys):
    half = len(keys) // 2
    for cls, kwargs in [
        (HllSketch, {"p": 10}),
        (CmsSketch, {"w": 256, "d": 3}),
        (MinHashSketch, {"n_perms": 32}),
    ]:
        ab = cls(**kwargs)
        ab.update_keys(keys[:half] or ["x"])
        tail = cls(**kwargs)
        tail.update_keys(keys[half:] or ["y"])
        ba_l = cls(**kwargs)
        ba_l.update_keys(keys[half:] or ["y"])
        ba_r = cls(**kwargs)
        ba_r.update_keys(keys[:half] or ["x"])
        ab.merge(tail)
        ba_l.merge(ba_r)
        assert ab.dumps() == ba_l.dumps(), cls.__name__


@SET
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=5, max_size=400
    )
)
def test_kll_quantiles_within_range(vals):
    sk = KllSketch(64)
    sk.update_values(np.array(vals))
    assert min(vals) <= sk.quantile(0.5) <= max(vals)
    assert sk.quantile(0.0) == min(vals) or sk.n > 64  # exact while uncompressed
