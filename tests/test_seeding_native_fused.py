"""Differential tests: native fused seeding helpers vs their numpy
twins (run_firsts, fill_hits_strand) and the A-index block cache.

The native C paths are exact replicas — byte-identical outputs — so
the emitted .las does not depend on which path served the process
(same contract as the bp kernels, tests/test_native_bp.py).
"""
import numpy as np
import pytest

from damar_tpu import native
from damar_tpu.core.blocks import block_from_reads
from damar_tpu.core.config import OverlapConfig
from damar_tpu.utils.sim import make_genome, sample_reads

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _run_firsts_np(codes):
    n = len(codes)
    first = np.empty(n, bool)
    first[0] = True
    np.not_equal(codes[1:], codes[:-1], out=first[1:])
    starts = np.maximum.accumulate(
        np.where(first, np.arange(n, dtype=np.int64), 0))
    seg_idx = np.flatnonzero(first)
    seg_len = np.diff(np.append(seg_idx, n))
    return starts, np.repeat(seg_len, seg_len)


@pytest.mark.parametrize("n", [1, 2, 7, 1000, 50000])
def test_run_firsts_matches_numpy(n):
    rng = np.random.default_rng(n)
    codes = np.sort(rng.integers(0, max(n // 6, 2), n).astype(np.uint32))
    starts, cnt = native.run_firsts(codes)
    e_starts, e_cnt = _run_firsts_np(codes)
    assert np.array_equal(starts, e_starts)
    assert np.array_equal(cnt, e_cnt)


@pytest.mark.parametrize("self_pair", [True, False])
@pytest.mark.parametrize("cap", [1 << 22, 1 << 12])
def test_fused_fill_matches_numpy_path(self_pair, cap):
    """find_seeds_canonical_host: fused C fill+strand vs forced-numpy
    fallback — identical seed dicts, including under cap truncation."""
    import damar_tpu.ops.seeding_host as sh

    g = make_genome(80_000, seed=11)
    blk = block_from_reads(sample_reads(g, coverage=8.0, mean_len=3000,
                                        err=0.13, seed=12).reads)
    blk2 = block_from_reads(sample_reads(g, coverage=5.0, mean_len=2500,
                                         err=0.13, seed=13).reads)
    cfg = OverlapConfig()

    def run():
        return sh.find_seeds_canonical_host(
            blk, blk if self_pair else blk2, cfg, upper_only=self_pair,
            hit_cap=cap, seed_cap=1 << 15, self_pair=self_pair)

    a = run()
    real_fill = native.fill_hits_strand
    real_shc = native.self_hit_counts
    native.fill_hits_strand = lambda *args, **kw: None
    native.self_hit_counts = lambda *args, **kw: None
    try:
        b = run()
    finally:
        native.fill_hits_strand = real_fill
        native.self_hit_counts = real_shc
    assert a.keys() == b.keys()
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, np.ndarray):
            assert np.array_equal(va, vb), k
        else:
            assert va == vb, k


def test_a_index_cache_reuse_and_invalidation():
    """The block-level A-index memo returns the same index for the
    same (k, mask) and rebuilds when the mask changes."""
    from damar_tpu.pipeline.overlap import _cached_a_index

    g = make_genome(30_000, seed=21)
    blk = block_from_reads(sample_reads(g, coverage=4.0, mean_len=2000,
                                        err=0.1, seed=22).reads)
    calls = []

    def build(tag):
        def b():
            calls.append(tag)
            return tag
        return b

    r1 = _cached_a_index(blk, "host", 14, None, build("i1"))
    r2 = _cached_a_index(blk, "host", 14, None, build("i2"))
    assert r1 == r2 == "i1" and calls == ["i1"]
    mask = np.zeros(blk.cap, bool)
    mask[:100] = True
    r3 = _cached_a_index(blk, "host", 14, mask, build("i3"))
    assert r3 == "i3"
    # same mask content -> cache hit even for a distinct array object
    r4 = _cached_a_index(blk, "host", 14, mask.copy(), build("i4"))
    assert r4 == "i3"
    blk.cache.clear()
    r5 = _cached_a_index(blk, "host", 14, mask, build("i5"))
    assert r5 == "i5"


def test_overlap_same_las_with_and_without_cache():
    """A second overlap_block_pair call on a warm cache emits exactly
    the same records as a cold one."""
    from damar_tpu.pipeline.overlap import overlap_block_pair

    g = make_genome(60_000, seed=31)
    blk = block_from_reads(sample_reads(g, coverage=8.0, mean_len=3000,
                                        err=0.13, seed=32).reads)
    cfg = OverlapConfig()
    la1, lb1, _ = overlap_block_pair(blk, blk, cfg, self_block=True,
                                     emit_mirrors=False)
    la2, lb2, _ = overlap_block_pair(blk, blk, cfg, self_block=True,
                                     emit_mirrors=False)
    assert la1.novl == la2.novl
    assert np.array_equal(la1.columns.headers, la2.columns.headers)
    assert np.array_equal(la1.columns.trace, la2.columns.trace)
