"""On-chip probe: per-iteration overhead of the extension's
while_loop body (gather + unpack + transpose + pallas dispatch) at the
real shapes (S lanes, R rows per chunk), vs a fused variant keeping
the chunk loop inside one pallas kernel.

Also: XLA sort cost at the 25M-hit buffer the 50 Mbp bench really
uses (2 u32 words + payload).
"""
from __future__ import annotations

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/damar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

print(f"# backend={jax.default_backend()}", file=sys.stderr)


def timed(label, fn, *a, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[-1:])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn_j(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[-1:])
        best = min(best, time.time() - t0)
    print(f"  {label:<46s} {best*1e3:9.1f} ms", file=sys.stderr)
    return best


key = jax.random.PRNGKey(0)

# ---- sort at the real 25M buffer --------------------------------------
NH = 25 * (1 << 20)
MX = (1 << 31) - 1
k0 = jax.random.randint(key, (NH,), 0, MX, jnp.int32)
k1 = jax.random.randint(key, (NH,), 0, MX, jnp.int32)
p0 = jax.random.randint(key, (NH,), 0, MX, jnp.int32)
timed("XLA sort 25M (2 keys + 1 payload)",
      lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                   is_stable=True), k1, k0, p0, reps=2)

# combined-pair scatter (fill v4 shape): 67M index rows, 2-wide values
NT = 1 << 26
CAP = NH
sidx = jnp.sort(jax.random.randint(key, (NT,), 0, CAP, jnp.int32))
vals = jax.random.randint(key, (NT, 2), -100, 100, jnp.int32)

def expand2(idx, v):
    w = jnp.zeros((CAP + 1, 2), jnp.int32).at[idx].add(v)
    return jnp.cumsum(w[:CAP], axis=0)

timed("scatter-add 67Mx2 pairs into 25M + cumsum", expand2, sidx, vals,
      reps=2)

v1 = vals[:, 0]

def expand1(idx, v):
    w = jnp.zeros(CAP + 1, jnp.int32).at[idx].add(v)
    return jnp.cumsum(w[:CAP])

timed("scatter-add 67Mx1 into 25M + cumsum", expand1, sidx, v1, reps=2)

# ---- while_loop body overhead at real shapes ---------------------------
NW = 1 << 22
words = jax.random.randint(key, (NW,), 0, MX, jnp.int32)


def mk_loop(S, R, iters):
    aorig = jax.random.randint(key, (S,), 0, NW - 4 * R, jnp.int32)
    WV = R // 16 + 2

    def body_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].sum(axis=0).astype(jnp.int32)

    def run(words, aorig):
        def body(c):
            i, acc = c
            w = words[(aorig[:, None] // 16
                       + jnp.arange(WV)[None, :] + i)]     # word gather
            # unpack 16 chars/word like _gather_packed does
            sh = (jnp.arange(R)[None, :] % 16) * 2
            chars = (w[:, jnp.arange(R) // 16] >> sh) & 3
            tile = jnp.transpose(chars, (1, 0)).reshape(
                R, S // 128, 128)
            s = pl.pallas_call(
                body_kernel,
                grid=(S // (8 * 128),),
                in_specs=[pl.BlockSpec((R, 8, 128), lambda g: (0, g, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S // 128, 128),
                                               jnp.int32),
            )(tile)
            return i + 1, acc + s[0, 0]
        return jax.lax.while_loop(lambda c: c[0] < iters, body,
                                  (jnp.int32(0), jnp.int32(0)))[1]

    t = timed(f"while_loop {iters}x S={S} R={R} "
              "(gather+unpack+T+pallas)", run, words, aorig, reps=2)
    print(f"    = {t/iters*1e3:.2f} ms/iter, "
          f"{t/iters/ (S) *1e9:.1f} ns/seed-chunk", file=sys.stderr)


mk_loop(8192, 64, 96)
mk_loop(8192, 256, 24)
mk_loop(32768, 64, 96)

# fused variant: whole-window VMEM slab, chunk loop inside the kernel
def mk_fused(S, R, iters):
    BOUND = R * iters
    WV = BOUND // 16 + 4
    aorig = jax.random.randint(key, (S,), 0, NW - WV - 2, jnp.int32)

    def fused_kernel(slab_ref, o_ref):
        def chunk(i, acc):
            # unpack R chars for every lane from the VMEM slab
            def row(r, acc2):
                j = (i * R + r) // 16
                sh = ((i * R + r) % 16) * 2
                w = slab_ref[:, j, :]
                return acc2 + ((w >> sh) & 3)
            return jax.lax.fori_loop(0, R, row, acc)
        acc = jnp.zeros((8, 128), jnp.int32)
        o_ref[:] = jax.lax.fori_loop(0, iters, chunk, acc)

    def run(words, aorig):
        slab = words[aorig[:, None] // 16
                     + jnp.arange(WV)[None, :]]       # [S, WV] once
        slab3 = jnp.transpose(
            slab.reshape(S // 128, 128, WV), (0, 2, 1))
        return pl.pallas_call(
            fused_kernel,
            grid=(S // (8 * 128),),
            in_specs=[pl.BlockSpec((8, WV, 128), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S // 128, 128), jnp.int32),
        )(slab3)

    t = timed(f"FUSED slab kernel S={S} R={R} iters={iters}", run,
              words, aorig, reps=2)
    print(f"    = {t/iters*1e3:.2f} ms/chunk-equiv", file=sys.stderr)


mk_fused(8192, 64, 96)
