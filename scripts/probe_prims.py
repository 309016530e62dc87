"""On-chip primitive-cost probe at the bench's real sizes.

Answers the round-3 design questions:
  1. Is a CONTIGUOUS-SLICE gather (per-seed char windows, per-run hit
     payloads) cheaper per element than the measured 28-38 ns random
     element gather?  (vmap dynamic_slice vs take.)
  2. What do the seeding fill's scatter-add expand and the banding
     sort cost at the ~96M-hit buffer the 50 Mbp bench really uses?
  3. What is the per-iteration overhead of the extension's
     while_loop (gather + transpose + pallas dispatch) — the
     suspected 13 s extension wall?

Times by fetching one output element (np.asarray) — the tunnel does
not honor block_until_ready.
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
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[-1:])  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn_j(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[-1:])
        best = min(best, time.time() - t0)
    print(f"  {label:<44s} {best*1e3:9.1f} ms", file=sys.stderr)
    return best


key = jax.random.PRNGKey(0)

# ---- 1. slice gather vs element gather --------------------------------
NW = 1 << 22              # 4M u32 words (= 67M packed chars)
words = jax.random.randint(key, (NW,), 0, 1 << 30, jnp.int32)
S = 8192
WW = 384                  # words per window (6 kb window)
origins = jax.random.randint(key, (S,), 0, NW - WW, jnp.int32)

def elem_gather(w, o):
    idx = o[:, None] + jnp.arange(WW)[None, :]
    return w[idx]

def slice_gather(w, o):
    return jax.vmap(lambda i: jax.lax.dynamic_slice(w, (i,), (WW,)))(o)

t = timed(f"element gather [{S},{WW}] from {NW>>20}M words",
          elem_gather, words, origins)
print(f"    = {t/ (S*WW) * 1e9:.1f} ns/elem", file=sys.stderr)
t = timed(f"vmap dynamic_slice [{S},{WW}]", slice_gather, words, origins)
print(f"    = {t/ (S*WW) * 1e9:.1f} ns/elem", file=sys.stderr)

# hit-scale piecewise gather (fill's A-payload): 96M random
NH = 96 * (1 << 20)
big = jax.random.randint(key, (1 << 26,), 0, 1 << 30, jnp.int32)
hidx = jax.random.randint(key, (NH,), 0, 1 << 26, jnp.int32)
t = timed("random element gather 96M from 67M", lambda b, i: b[i],
          big, hidx, reps=2)
print(f"    = {t/NH*1e9:.1f} ns/elem", file=sys.stderr)

# ---- 2. seeding fill + banding sort at 96M ----------------------------
NT = 1 << 25              # 33M tuples
tid = jax.random.randint(key, (2 * NT,), 0, NH, jnp.int32)
tv = jax.random.randint(key, (2 * NT,), -100, 100, jnp.int32)

def expand(idx, v):
    w = jnp.zeros(NH + 1, jnp.int32).at[idx].add(v)
    return jnp.cumsum(w[:NH])

t = timed("scatter-add 66M into 96M + cumsum 96M", expand, tid, tv,
          reps=2)

k0 = jax.random.randint(key, (NH,), 0, (1 << 31) - 1, jnp.int32)
k1 = jax.random.randint(key, (NH,), 0, (1 << 31) - 1, jnp.int32)
p0 = jax.random.randint(key, (NH,), 0, (1 << 31) - 1, jnp.int32)

def sort2p1(a, b, c):
    return jax.lax.sort((a, b, c), num_keys=2, is_stable=True)

t = timed("XLA sort 96M (2 keys + 1 payload)", sort2p1, k1, k0, p0,
          reps=2)

def sort1p1(a, c):
    return jax.lax.sort((a, c), num_keys=1, is_stable=True)

t = timed("XLA sort 96M (1 key + 1 payload)", sort1p1, k0, p0, reps=2)

t = timed("cumsum 96M", jnp.cumsum, k0, reps=2)
t = timed("cummax 96M", jax.lax.cummax, k0, reps=2)

# ---- 3. pallas dispatch + while_loop step overhead --------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1

x = jnp.zeros((64, 128), jnp.int32)

def one_call(x):
    return pl.pallas_call(
        tiny_kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )(x)

t = timed("single tiny pallas_call", one_call, x, reps=5)

def chain20(x):
    for _ in range(20):
        x = pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        )(x)
    return x

t = timed("20 chained tiny pallas_calls", chain20, x, reps=3)
print(f"    = {t/20*1e3:.2f} ms per call", file=sys.stderr)

# while_loop with a gather + transpose + pallas per step (extension
# body shape at S=8192, R=128)
R = 128
aorig = jax.random.randint(key, (S,), 0, NW - 64, jnp.int32)

def wl_body_shape(words, aorig):
    def body(c):
        i, acc = c
        w = words[(aorig[:, None] + jnp.arange(R // 16 + 1)[None, :]
                   + i)]                       # [S, 9] word gather
        chars = jnp.repeat(w, 16, axis=1)[:, :R]   # fake unpack
        tile = jnp.transpose(chars, (1, 0)).reshape(R, S // 128, 128)
        s = pl.pallas_call(
            tiny3,
            grid=(S // (8 * 128),),
            in_specs=[pl.BlockSpec((R, 8, 128), lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S // 128, 128), jnp.int32),
        )(tile)
        return i + 1, acc + s[0, 0]
    return jax.lax.while_loop(lambda c: c[0] < 47, body,
                              (jnp.int32(0), jnp.int32(0)))[1]

def tiny3(x_ref, o_ref):
    o_ref[:] = x_ref[:].sum(axis=0).astype(jnp.int32)

t = timed("while_loop 47x (gather+transpose+pallas)", wl_body_shape,
          words, aorig, reps=2)
print(f"    = {t/47*1e3:.2f} ms per iteration", file=sys.stderr)

# ---- 4. (removed) per-seed DMA slab fill ----------------------------
# Measured round 4: Mosaic tiles 1-D HBM memrefs at 1024 words and
# rejects unaligned/short slices (and the remote compiler 500s even on
# aligned 1024/2048-word tiles), so the per-seed DMA slab design is a
# dead end on this stack.  The word-tile gather path (ops.wave_pallas.
# _gather_packed_words + in-kernel unpack) replaced it; ops/slab.py
# was deleted.
