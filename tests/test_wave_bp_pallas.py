"""Pallas bp kernels vs the pure-JAX bp kernels: outputs must be
BIT-IDENTICAL (interpret mode on CPU) — the backend choice can never
change results.  The same fuzz batches as tests/test_native_bp.py, so
all three implementations (JAX, native C, Pallas) are pinned to one
another."""
import numpy as np
import jax.numpy as jnp

from damar_tpu.ops.wave_bp import extend_wave_bp, trace_wave_bp
from damar_tpu.ops.wave_bp_pallas import (extend_wave_bp_pl,
                                          trace_wave_bp_pl)
from damar_tpu.utils.sim import mutate
from test_native_bp import _unit_batch


class TestExtendBitIdentity:
    def test_fuzz_batches(self):
        for seed in (5, 6, 7):
            rng = np.random.default_rng(seed)
            A, B, ao, bo, alim, blim, rv = _unit_batch(rng, 48)
            kw = dict(R=128, max_rows=65536, diff_cost=5, xdrop=60)
            args = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(ao),
                    jnp.asarray(bo), jnp.asarray(alim),
                    jnp.asarray(blim))
            ref = extend_wave_bp(*args, dirs=jnp.asarray(rv), **kw)
            out = extend_wave_bp_pl(*args, dirs=jnp.asarray(rv), **kw)
            for n, x, y in zip("va vb d s".split(), ref, out):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y), err_msg=f"{n} s{seed}")

    def test_static_reverse_and_small_batch(self):
        rng = np.random.default_rng(13)
        src = rng.integers(0, 4, 2000).astype(np.uint8)
        der = mutate(src, 0.13, rng)
        S = 3                     # far below one [8, L] block
        ao = jnp.full(S, 1000, jnp.int32)
        bo = jnp.full(S, 1005, jnp.int32)
        al = jnp.array([1000, 500, 0], jnp.int32)
        bl = jnp.full(S, 1005, jnp.int32)
        a = (jnp.asarray(src), jnp.asarray(der), ao, bo, al, bl)
        for rev in (False, True):
            ref = extend_wave_bp(*a, reverse=rev)
            out = extend_wave_bp_pl(*a, reverse=rev)
            for n, x, y in zip("va vb d s".split(), ref, out):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y),
                    err_msg=f"{n} rev={rev}")


class TestTraceBitIdentity:
    def test_fuzz_batches(self):
        for seed in (8, 9):
            rng = np.random.default_rng(seed)
            A, B, ao, bo, alim, blim, rv = _unit_batch(rng, 32)
            alim = np.minimum(alim, len(A) - ao).astype(np.int32)
            blim = np.minimum(blim, len(B) - bo).astype(np.int32)
            z = np.zeros(len(ao), np.int32)
            args = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(ao),
                    jnp.asarray(bo), jnp.asarray(z), jnp.asarray(z),
                    jnp.asarray(alim), jnp.asarray(blim))
            ref = trace_wave_bp(*args, tspace=100, max_segs=32)
            out = trace_wave_bp_pl(*args, tspace=100, max_segs=32)
            for n, x, y in zip(("trace", "nseg", "dsum"), ref, out):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y), err_msg=f"{n} s{seed}")

    def test_odd_tspace_and_offsets(self):
        rng = np.random.default_rng(11)
        src = rng.integers(0, 4, 3000).astype(np.uint8)
        der = mutate(src, 0.12, rng)
        ab = jnp.array([137], jnp.int32)
        bb = jnp.array([140], jnp.int32)
        alim = jnp.array([2500], jnp.int32)
        blim = jnp.array([len(der) - 140], jnp.int32)
        z = jnp.zeros(1, jnp.int32)
        for tspace in (100, 126, 250):
            args = (jnp.asarray(src), jnp.asarray(der), z, z, ab, bb,
                    alim, blim)
            ref = trace_wave_bp(*args, tspace=tspace, max_segs=40)
            out = trace_wave_bp_pl(*args, tspace=tspace, max_segs=40)
            for n, x, y in zip(("trace", "nseg", "dsum"), ref, out):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y),
                    err_msg=f"{n} ts{tspace}")
