"""Per-seed contiguous slab fetch: DMA fill kernel + align/transpose.

The fused bp kernels (ops.wave_bp_fused) keep each seed's character
windows VMEM-resident for the whole extension/trace, so the per-chunk
XLA gathers (15 ns/element on v5e — they dominated the round-2 wave
phases) disappear.  The slabs are fetched by DMA: one contiguous
copy per seed from the packed-word pool in HBM into a seed-major
[S, W] buffer (pallas grid over 1024-seed blocks, per-seed
make_async_copy), then a DENSE XLA transpose + per-seed funnel shift
turns it into the char-aligned word-major [W, S/L, L] layout the DP
kernels consume with scalar indices.  The random-access work rides
the DMA engines at descriptor rate; the layout change is
bandwidth-bound — no per-element gather anywhere.

Upstream shape: DALIGNER keeps A/B blocks in RAM and reads characters
directly (dalign/align.c forward_wave, upstream-path citation — mount
empty); the slab is the TPU-native equivalent of those pointer walks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _fill_kernel(ws_ref, pool_ref, out_ref, sem, *, BS: int, W: int):
    """Copy pool_ref[ws[s] : ws[s]+W] -> out_ref[s] for the block's
    BS seeds.  All copies are issued back-to-back on one DMA
    semaphore, then drained (identical shapes, so each wait retires
    one copy's worth of signal)."""
    g = pl.program_id(0)

    def issue(s, _):
        w0 = ws_ref[g * BS + s]
        pltpu.make_async_copy(pool_ref.at[pl.ds(w0, W)],
                              out_ref.at[s], sem).start()
        return 0

    jax.lax.fori_loop(0, BS, issue, 0)  # Mosaic: only unroll=1/full

    def drain(s, _):
        pltpu.make_async_copy(pool_ref.at[pl.ds(0, W)],
                              out_ref.at[0], sem).wait()
        return 0

    jax.lax.fori_loop(0, BS, drain, 0)


@functools.partial(jax.jit, static_argnames=("W", "BS"))
def fill_slab(pool_words, ws, W: int, BS: int = 1024):
    """[S, W] int32 word rows: row s = pool_words[ws[s] : ws[s]+W].

    ws must be pre-clamped to [0, len(pool)-W] (callers pad the pool
    so clamping never lands real rows on wrong data; out-of-window
    garbage is masked downstream by alim/blim/PV validity).  S must be
    a BS multiple."""
    S = ws.shape[0]
    assert S % BS == 0
    grid = (S // BS,)
    kernel = functools.partial(_fill_kernel, BS=BS, W=W)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BS, W), lambda g, ws: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.int32),
        interpret=_interpret(),
    )(ws, pool_words)


@functools.partial(jax.jit, static_argnames=("L",))
def align_transpose(slab, phase, L: int = 128):
    """Char-align each seed row to its window start and lay out
    word-major: [S, W] + phase[S] (chars 0..15) -> [W, S/L, L] where
    out[w, :, :][s] holds chars 16w..16w+15 of seed s's window.

    After this, char t of a seed's window is word t//16, bit 2*(t%16)
    — a SCALAR word index for lockstep rows, which is what makes the
    fused kernels' VMEM slab access legal/TPU-fast."""
    S, W = slab.shape
    u = jax.lax.bitcast_convert_type(slab, jnp.uint32)
    hi = jnp.concatenate([u[:, 1:], jnp.zeros((S, 1), jnp.uint32)],
                         axis=1)
    sh = (phase.astype(jnp.uint32) * 2)[:, None]
    al = jnp.where(sh == 0, u, (u >> sh) | (hi << (32 - sh)))
    al = jax.lax.bitcast_convert_type(al, jnp.int32)
    return jnp.transpose(al, (1, 0)).reshape(W, S // L, L)


def slab_params(origin_chars, W_words: int, pool_words_len: int):
    """Host-side (numpy) slab fetch parameters: word starts (clamped)
    + phases for a char-origin vector."""
    o = _np.asarray(origin_chars, dtype=_np.int64)
    ws = o >> 4
    ws = _np.clip(ws, 0, max(pool_words_len - W_words, 0))
    phase = (o - (ws << 4)).astype(_np.int32)
    return ws.astype(_np.int32), phase
