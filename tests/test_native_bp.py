"""Differential tests: native C bit-parallel kernels vs the JAX bp
kernels (ops/wave_bp.py).

The C replicas (native/damar_native.c bp_extend_batch/bp_trace_batch)
serve the CPU fallback path (DAMAR_BP=native); they must be
BIT-IDENTICAL to the JAX kernels — same extents, same trace points,
same .las bytes — so switching backends never changes results.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from damar_tpu import native
from damar_tpu.utils.sim import mutate

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C toolchain")


def _unit_batch(rng, S):
    """Random mutated-pair units laid out in two block arrays; returns
    (A, B, aorigin, borigin, alim, blim, rev) with mixed directions."""
    a_parts, b_parts = [], []
    for _ in range(S):
        L = int(rng.integers(100, 2500))
        src = rng.integers(0, 4, L).astype(np.uint8)
        a_parts.append(src)
        b_parts.append(mutate(src, float(rng.uniform(0.05, 0.25)), rng))
    a_off = np.cumsum([0] + [len(x) for x in a_parts])
    b_off = np.cumsum([0] + [len(x) for x in b_parts])
    A, B = np.concatenate(a_parts), np.concatenate(b_parts)
    ao, bo, alim, blim, rv = [], [], [], [], []
    for i in range(S):
        la = a_off[i + 1] - a_off[i]
        lb = b_off[i + 1] - b_off[i]
        pa = int(rng.integers(0, la))
        pb = int(np.clip(pa + rng.integers(-30, 30), 0, lb - 1))
        rev = bool(rng.integers(0, 2))
        ao.append(a_off[i] + pa)
        bo.append(b_off[i] + pb)
        alim.append(pa if rev else la - pa)
        blim.append(pb if rev else lb - pb)
        rv.append(rev)
    return (A, B, np.array(ao, np.int32), np.array(bo, np.int32),
            np.array(alim, np.int32), np.array(blim, np.int32),
            np.array(rv, bool))


class TestExtendBitIdentity:
    def test_fuzz_batches(self):
        from damar_tpu.ops.wave_bp import extend_wave_bp
        for seed in (5, 6, 7):
            rng = np.random.default_rng(seed)
            A, B, ao, bo, alim, blim, rv = _unit_batch(rng, 48)
            kw = dict(R=128, max_rows=65536, diff_cost=5, xdrop=60)
            ref = extend_wave_bp(
                jnp.asarray(A), jnp.asarray(B), jnp.asarray(ao),
                jnp.asarray(bo), jnp.asarray(alim), jnp.asarray(blim),
                dirs=jnp.asarray(rv), **kw)
            nat = native.bp_extend_batch(A, B, ao, bo, alim, blim, rv,
                                         **kw)
            for name, x, y in zip("va vb d s".split(), ref, nat):
                np.testing.assert_array_equal(np.asarray(x), y,
                                              err_msg=f"{name} s{seed}")


class TestTraceBitIdentity:
    def test_fuzz_batches(self):
        from damar_tpu.ops.wave_bp import trace_wave_bp
        for seed in (8, 9):
            rng = np.random.default_rng(seed)
            A, B, ao, bo, alim, blim, rv = _unit_batch(rng, 32)
            # the trace pass runs FORWARD from its anchor: reverse
            # units' (alim, blim) describe backward room, so clip every
            # span to the array (out-of-array reads are unspecified
            # garbage on both paths; in the pipeline extents are always
            # in-array)
            alim = np.minimum(alim, len(A) - ao).astype(np.int32)
            blim = np.minimum(blim, len(B) - bo).astype(np.int32)
            z = np.zeros(len(ao), np.int32)
            ref = trace_wave_bp(
                jnp.asarray(A), jnp.asarray(B), jnp.asarray(ao),
                jnp.asarray(bo), jnp.asarray(z), jnp.asarray(z),
                jnp.asarray(alim), jnp.asarray(blim),
                tspace=100, max_segs=32)
            nat = native.bp_trace_batch(A, B, ao, bo, z, z, alim, blim,
                                        tspace=100, max_segs=32)
            for name, x, y in zip(("trace", "nseg", "dsum"), ref, nat):
                np.testing.assert_array_equal(np.asarray(x), y,
                                              err_msg=f"{name} s{seed}")

    def test_odd_tspace_and_offsets(self):
        """Non-zero abpos (tspace boundaries off-phase) and a tspace
        above TRACE_XOVR."""
        from damar_tpu.ops.wave_bp import trace_wave_bp
        rng = np.random.default_rng(11)
        src = rng.integers(0, 4, 3000).astype(np.uint8)
        der = mutate(src, 0.12, rng)
        ab = np.array([137], np.int32)
        bb = np.array([140], np.int32)
        alim = np.array([2500], np.int32)
        blim = np.array([len(der) - 140], np.int32)
        z = np.zeros(1, np.int32)
        for tspace in (100, 126, 250):
            ref = trace_wave_bp(
                jnp.asarray(src), jnp.asarray(der), jnp.asarray(z),
                jnp.asarray(z), jnp.asarray(ab), jnp.asarray(bb),
                jnp.asarray(alim), jnp.asarray(blim),
                tspace=tspace, max_segs=64)
            nat = native.bp_trace_batch(src, der, z, z, ab, bb, alim,
                                        blim, tspace=tspace,
                                        max_segs=64)
            for x, y in zip(ref, nat):
                np.testing.assert_array_equal(np.asarray(x), y)


class TestTandemHostTwin:
    def test_matches_device_path(self):
        """find_tandem_seeds_host (datander seeding) must reproduce
        the JAX path exactly."""
        from damar_tpu.core.blocks import block_from_reads
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.ops.seeding import find_tandem_seeds
        from damar_tpu.ops.seeding_host import find_tandem_seeds_host
        from damar_tpu.utils.sim import make_genome, sample_reads
        g = make_genome(60_000, seed=41, tandem=2, tandem_period=90,
                        tandem_len=1500)
        sim = sample_reads(g, coverage=6, mean_len=3500, err=0.13,
                           seed=42)
        blk = block_from_reads(sim.reads)
        cfg = OverlapConfig()
        ref = find_tandem_seeds(blk, cfg)
        host = find_tandem_seeds_host(blk, cfg)
        assert ref["nseeds"] > 0
        for k in ("aread", "bread", "apos", "bpos", "cov"):
            np.testing.assert_array_equal(np.asarray(ref[k]),
                                          np.asarray(host[k]), k)
        for k in ("nseeds", "total_seeds", "nhits", "total_hits"):
            assert int(ref[k]) == int(host[k]), k


class TestTrace64Tier:
    def test_catches_band_drift(self):
        """A pair whose alignment drifts 25 diagonals inside one
        segment — beyond the 32-band's drift capacity (BW-1-CTR = 15
        net inserted bases per segment) but within the 64-band's (31):
        the 32-lane kernel cannot commit a consistent trace, the
        64-diagonal tier can."""
        rng = np.random.default_rng(13)
        head = rng.integers(0, 4, 400).astype(np.uint8)
        tail = rng.integers(0, 4, 800).astype(np.uint8)
        a = np.concatenate([head, tail])
        b = np.concatenate([head, rng.integers(0, 4, 25).astype(
            np.uint8), tail])          # 25-base insertion in B
        z = np.zeros(1, np.int32)
        alim = np.array([len(a)], np.int32)
        blim = np.array([len(b)], np.int32)
        r32 = native.bp_trace_batch(a, b, z, z, z, z, alim, blim,
                                    tspace=100, max_segs=32)
        r64 = native.bp_trace_batch(a, b, z, z, z, z, alim, blim,
                                    tspace=100, max_segs=32, wide=True)
        ns32, ns64 = int(r32[1][0]), int(r64[1][0])
        bspan64 = int(r64[0][0, :ns64, 1].sum())
        # the 64-band trace must span the whole of B; diffs ~ the
        # insertion length (the 32-band one under-spans or over-costs)
        assert bspan64 == len(b)
        assert int(r64[2][0]) < 80
        bad32 = int(r32[0][0, :ns32, 1].sum()) != len(b) \
            or int(r32[2][0]) > int(r64[2][0])
        assert bad32, "32-band unexpectedly matched the 64-band tier"

    def test_property_random_drift(self):
        """Property fuzz for the 64-band kernel (it has no JAX twin):
        on random pairs with insertions within its drift capacity,
        every trace must satisfy the caller's structural invariants
        AND cost no more than 1.3x the wide per-cell DP reference."""
        rng = np.random.default_rng(17)
        ok = 0
        for _ in range(25):
            la = int(rng.integers(400, 2500))
            a = rng.integers(0, 4, la).astype(np.uint8)
            b = mutate(a, float(rng.uniform(0.05, 0.2)), rng)
            p = int(rng.integers(50, la - 50))
            insert = rng.integers(0, 4,
                                  int(rng.integers(0, 29))).astype(
                np.uint8)
            # splice an insertion into b near a-position p
            cutb = min(p, len(b) - 1)
            b = np.concatenate([b[:cutb], insert, b[cutb:]])
            z = np.zeros(1, np.int32)
            alim = np.array([la], np.int32)
            blim = np.array([len(b)], np.int32)
            tr, ns, ds = native.bp_trace_batch(
                a, b, z, z, z, z, alim, blim, tspace=100,
                max_segs=64, wide=True)
            n = int(ns[0])
            rows = tr[0, :n]
            # a trace is allowed to FAIL (callers' consistency check
            # drops it to the next retry tier) — but a trace that
            # LOOKS consistent must be structurally sound and no more
            # costly than the wide per-cell DP reference
            consistent = (n == (la - 1) // 100 + 1
                          and int(rows[:, 1].sum()) == len(b)
                          and (rows[:, 1] >= 0).all())
            if not consistent:
                continue
            ok += 1
            assert int(ds[0]) == int(rows[:, 0].sum())
            a0 = 0
            for s_ in range(n):
                a1 = min((a0 // 100 + 1) * 100, la)
                assert rows[s_, 0] >= abs((a1 - a0) - rows[s_, 1])
                a0 = a1
            ref = native.trace_points_batch(
                a, b, [0], [0], [0], [la], [0], [len(b)],
                tspace=100, band=128, max_segs=64)
            if int(ref[1][0]) > 0:
                ref_d = int(ref[2][0])
                assert int(ds[0]) <= ref_d * 1.3 + 12, \
                    f"64-band cost {int(ds[0])} vs wide {ref_d}"
        # the tier must actually force through most moderate cases
        assert ok >= 15, f"only {ok}/25 consistent traces"


class TestBandFilterDualPaths:
    """The banding stage has four implementations that must agree
    element-for-element: C fused-key, C two-pass (>64-bit fused key),
    numpy fused, numpy lexsort (>64-bit band key).  Key widths change
    only the sort key packing, never the order, so inflating
    a_cap/nreads1 on the SAME hits must reproduce identical seeds."""

    def _hits(self):
        rng = np.random.default_rng(21)
        n = 4000
        nreads = 40
        rid = np.sort(rng.integers(0, nreads, 3000)).astype(np.int32)
        apos = rng.integers(0, 3000, n).astype(np.int32)
        bpos = rng.integers(0, 3000, n).astype(np.int32)
        comp = rng.integers(0, 2, n).astype(bool)
        return apos, bpos, comp, rid, rid

    def test_all_paths_agree(self, monkeypatch):
        from damar_tpu import native
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.ops.seeding_host import _band_filter
        cfg = OverlapConfig()
        apos, bpos, comp, a_rid, b_rid = self._hits()
        kw = dict(seed_cap=1 << 12, upper_only=False,
                  include_self=False)
        base = _band_filter(apos, bpos, comp, a_rid, b_rid,
                            a_cap=4096, b_cap=4096, nreads1=41,
                            cfg=cfg, **kw)           # C fused
        twop = _band_filter(apos, bpos, comp, a_rid, b_rid,
                            a_cap=1 << 28, b_cap=4096, nreads1=41,
                            cfg=cfg, **kw)           # C two-pass
        wide = _band_filter(apos, bpos, comp, a_rid, b_rid,
                            a_cap=1 << 28, b_cap=4096,
                            nreads1=3_000_000, cfg=cfg,
                            **kw)                    # numpy lexsort
        monkeypatch.setattr(native, "band_filter",
                            lambda *a, **k: None)
        nump = _band_filter(apos, bpos, comp, a_rid, b_rid,
                            a_cap=4096, b_cap=4096, nreads1=41,
                            cfg=cfg, **kw)           # numpy fused
        for name, other in (("two-pass", twop), ("lexsort", wide),
                            ("numpy", nump)):
            for i, (x, y) in enumerate(zip(base, other)):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y),
                    err_msg=f"{name} field {i}")


class TestDriverByteIdentity:
    def test_pair_driver_las_identical(self):
        """overlap_block_pair under DAMAR_BP=native +DAMAR_SORT=host
        emits byte-identical .las columns to the default JAX path."""
        from damar_tpu.core.blocks import block_from_reads
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.pipeline.overlap import overlap_block_pair
        from damar_tpu.utils.sim import make_genome, sample_reads
        g = make_genome(30_000, seed=77)
        sim = sample_reads(g, coverage=8, mean_len=3000, err=0.14,
                           seed=78)
        blk = block_from_reads(sim.reads)
        cfg = OverlapConfig(seed_batch=256)

        def run():
            return overlap_block_pair(blk, blk, cfg, self_block=True,
                                      hit_cap=1 << 19,
                                      seed_cap=1 << 14)
        la0, lb0, _ = run()
        prev = {k: os.environ.get(k) for k in ("DAMAR_BP", "DAMAR_SORT")}
        os.environ["DAMAR_BP"] = "native"
        os.environ["DAMAR_SORT"] = "host"
        jax.clear_caches()
        try:
            la1, lb1, _ = run()
        finally:
            for k, v in prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            jax.clear_caches()
        assert la0.novl == la1.novl and lb0.novl == lb1.novl
        for a, b in ((la0, la1), (lb0, lb1)):
            np.testing.assert_array_equal(a.columns.headers,
                                          b.columns.headers)
            np.testing.assert_array_equal(a.columns.trace,
                                          b.columns.trace)
