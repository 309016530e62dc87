"""Micro-bench the bp extension/trace kernels on the live backend:
per-row cost of the JAX while/fori formulation (baseline for the
Pallas chunk kernel)."""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/damar_jax_cache")

from damar_tpu.ops.wave_bp import extend_wave_bp, trace_wave_bp

S = 1024
L = 8192          # read length
rng = np.random.default_rng(0)
base = rng.integers(0, 4, L, dtype=np.uint8)
# two near-identical reads: extension runs the full length
mut = base.copy()
flip = rng.random(L) < 0.14
mut[flip] = (mut[flip] + rng.integers(1, 4, flip.sum())) % 4
a_bases = jnp.asarray(np.concatenate([base, mut]))
aorigin = jnp.zeros(S, jnp.int32)
borigin = jnp.full(S, L, jnp.int32)
alim = jnp.full(S, L, jnp.int32)
blim = jnp.full(S, L, jnp.int32)

print(f"# backend={jax.default_backend()}", file=sys.stderr)

def timeit(label, fn, n=3):
    jax.block_until_ready(fn())  # compile + drain (async backend)
    t0 = time.time()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms", file=sys.stderr)
    return dt

for R in (64, 128, 256, 1024):
    dt = timeit(f"extend S={S} rows={L} R={R}", lambda R=R: extend_wave_bp(
        a_bases, a_bases, aorigin, borigin, alim, blim, R=R,
        max_rows=L))
    # ns/row assumes full-length extension (near-identical pair: no
    # early X-drop termination on this workload)
    print(f"  -> {dt/L*1e9:.0f} ns/batch-row", file=sys.stderr)

dt = timeit("trace S=1024 rows=8192", lambda: trace_wave_bp(
    a_bases, a_bases, aorigin, borigin,
    jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.int32), alim, blim,
    tspace=100, max_segs=84))
print(f"  -> {dt/L*1e9:.0f} ns/batch-row", file=sys.stderr)
