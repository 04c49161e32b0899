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


@SET
@given(vals=st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=100))
def test_int_keys_equal_le_bytes(vals):
    """poppy typed-key property: an int key behaves exactly like its 8 LE
    bytes for every hash and both filter versions."""
    arr = np.array(vals, dtype=np.int64)
    mat_i, lens_i = hk.pack_int64_le(arr)
    manual = [int(v).to_bytes(8, "little", signed=v < 0) for v in vals]
    mat_b, lens_b = hk.pack_keys(manual)
    assert (hk.hash_pop_batch(mat_i, lens_i) == hk.hash_pop_batch(mat_b, lens_b)).all()
    assert (hk.fnv1_batch(mat_i, lens_i) == hk.fnv1_batch(mat_b, lens_b)).all()
    f_int = BloomFilter.with_capacity(4 * len(vals) + 8, 0.01)
    f_int.insert_batch(vals)
    f_byt = BloomFilter.with_capacity(4 * len(vals) + 8, 0.01)
    f_byt.insert_batch(manual)
    assert f_int.dumps() == f_byt.dumps()


@SET
@given(
    keys=st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=300),
    m=st.integers(min_value=4, max_value=32),
    n_parts=st.integers(min_value=1, max_value=6),
)
def test_topk_mg_bound_any_merge_tree(keys, m, n_parts):
    """Misra-Gries invariant under arbitrary data and merge splits:
    true - N/(m+1) <= estimate <= true for every key, and roundtrip."""
    import collections

    from poppy_spark.sketches import TopKSketch

    parts = [keys[i::n_parts] for i in range(n_parts)]
    sketches = []
    for p in parts:
        s = TopKSketch(m=m)
        if p:
            s.update_keys(p)
        sketches.append(s)
    merged = sketches[0]
    for s in sketches[1:]:
        merged.merge(TopKSketch.loads(s.dumps()))
    true = collections.Counter(keys)
    n = len(keys)
    slack = n // (m + 1)
    for k, t in true.items():
        est = merged.estimate(k)
        assert t - slack <= est <= t, (k, t, est, slack)
    assert merged.n_total == n


@SET
@given(keys=st.lists(st.binary(min_size=0, max_size=48), min_size=1, max_size=80))
def test_bulk_insert_sets_same_bits(keys):
    """insert_packed_bulk flips exactly the bits insert_packed flips (count
    differs by design; bits must match for both versions)."""
    for version in (1, 2):
        a = BloomFilter.with_version(version, 4 * len(keys) + 8, 0.01)
        b = BloomFilter.with_version(version, 4 * len(keys) + 8, 0.01)
        mat, lens = hk.pack_keys(keys)
        a.insert_packed(mat, lens)
        b.insert_packed_bulk(mat, lens)
        b.update_count()
        a.update_count()
        assert a.dumps() == b.dumps()


@SET
@given(keys=st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=100))
def test_sharded_routing_equals_core_route(keys):
    """The sharded build/probe router computes exactly the (bucket, k index)
    tuples BloomV2's own _route does — the invariant that makes shard
    reassembly byte-identical."""
    import pyarrow as pa

    from poppy_spark.core.v2 import BloomV2
    from poppy_spark.spark.sharded import _Params, _route_batch

    cap = 4 * len(keys) + 50000  # enough buckets to make sharding meaningful
    f = BloomV2.with_capacity(cap, 0.001)
    p = _Params.make(cap, 0.001, 4)
    assert (p.n_buckets, p.n_hash_buck) == (f.n_buckets, f.n_hash_buck)
    mat, lens = hk.pack_keys(keys)
    ib_core, idx_core, _ = f._route(mat, lens)
    shard, ib, idx, _ = _route_batch(pa.array(keys, type=pa.binary()), p, dedup=False)
    assert (ib == ib_core.astype("int64")).all()
    assert (idx.astype("uint64") == idx_core).all()
    assert (shard == (ib // p.bps).astype("int32")).all()


@SET
@given(keys=st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=200),
       split=st.integers(min_value=0, max_value=200),
       k=st.sampled_from([16, 64, 256]))
def test_theta_merge_equals_single_build_and_exact_below_k(keys, split, k):
    from poppy_spark.sketches import ThetaSketch

    split = min(split, len(keys))
    one = ThetaSketch(k)
    one.update_keys(keys)
    a = ThetaSketch(k)
    a.update_keys(keys[:split] or [b"x"])
    b = ThetaSketch(k)
    b.update_keys(keys[split:] or [b"x"])
    if not keys[:split]:
        a = ThetaSketch(k)
    if not keys[split:]:
        b = ThetaSketch(k)
    a.merge(b)
    assert a.dumps() == one.dumps()
    distinct = len(set(keys))
    if distinct < k:
        assert one.result() == distinct  # exact mode below k


@SET
@given(lens=st.lists(st.integers(min_value=1, max_value=3000), min_size=1, max_size=200),
       budget=st.integers(min_value=100, max_value=2000))
def test_packing_greedy_invariants(lens, budget):
    """Driver-side replica of the per-bucket greedy: every non-overflow pack
    within budget, overflow rows isolated, all rows assigned once."""
    import pandas as pd

    from poppy_spark.spark.packing import _PACK_STRIDE

    # reuse the exact kernel by importing the module-level algorithm shape:
    # simulate one bucket's pandas frame through the same logic
    pdf = pd.DataFrame({"id": range(len(lens)), "n": lens})
    # inline greedy identical to pack_assignments' inner loop
    pack_ids, overflow = [], []
    cur, filled, ovf = 0, 0, 0
    for ln in lens:
        if ln > budget:
            ovf += 1
            pack_ids.append(_PACK_STRIDE - ovf)
            overflow.append(True)
            continue
        if filled + ln > budget:
            cur += 1
            filled = 0
        pack_ids.append(cur)
        overflow.append(False)
        filled += ln
    assert len(pack_ids) == len(lens)
    sums = {}
    for pid, ln, ov in zip(pack_ids, lens, overflow):
        if not ov:
            sums[pid] = sums.get(pid, 0) + ln
    assert all(s <= budget for s in sums.values())
    # overflow ids never collide with normal ids
    assert not (set(p for p, o in zip(pack_ids, overflow) if o)
                & set(p for p, o in zip(pack_ids, overflow) if not o))


@SET
@given(rate=st.floats(min_value=0.0, max_value=1.0),
       keys=st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=50))
def test_hash_sample_threshold_monotone(rate, keys):
    """A key kept at rate r is kept at every rate r' >= r (nested samples —
    the property that makes deterministic sampling composable)."""
    import hashlib

    from poppy_spark.spark.sampling import _thr_hex

    t1 = _thr_hex(rate)
    t2 = _thr_hex(min(1.0, rate + 0.25))
    for key in keys:
        h = hashlib.md5(f"seed0|{key}".encode()).hexdigest()[:8]
        if h < t1:
            assert h < t2  # larger rate keeps a superset


class TestSparseHllProperties:
    @given(
        st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=400),
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=0, max_value=2**32),
    )
    @settings(max_examples=40, deadline=None)
    def test_any_partitioning_matches_single_update(self, keys, n_parts, seed):
        import numpy as np

        from poppy_spark.sketches.hll import HllSketch

        h = np.array(keys, dtype=np.uint64)
        want = HllSketch(10)
        want.update_hashes(h)
        rng = np.random.default_rng(seed)
        assign = rng.integers(0, n_parts, h.size) if h.size else np.empty(0, int)
        acc = HllSketch(10)
        for p in range(n_parts):
            part = HllSketch(10)
            part.update_hashes(h[assign == p])
            # exercise mixed sparse/dense crossings via the wire format too
            acc.merge(HllSketch.loads(part.dumps()))
        # compare wire bytes FIRST: reading .registers densifies both
        # sketches, which would silently skip the sparse-encoding
        # determinism this assertion exists to pin (round-3 advice)
        assert acc.dumps() == want.dumps()
        assert (acc.registers == want.registers).all()
