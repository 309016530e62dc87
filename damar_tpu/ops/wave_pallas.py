"""Pallas TPU kernel for the banded-DP row loop.

The pure-JAX kernels in ops.wave execute each DP row as ~25 separate
[S, W] HBM-level ops; this kernel fuses R rows into one pallas_call
with the band state D resident in VMEM, which removes the per-op HBM
round trips and dispatch overhead — the hot loop of the entire
framework (SURVEY.md §7 step 4).

Layout: seeds are blocked along the grid (SB seeds per program);
every ref is blocked [SB, ...] with lane width W = 128 (one VPU row).
The kernel runs R rows with row masking, maintains per-seed best
(score, va, vb, d) trackers and X-drop deactivation in-kernel, and
returns the updated band so the (cheap, once per R rows) commit /
recenter logic stays in JAX.

Shared by both passes:
  * extension: caller recenters the band between chunks;
  * trace: caller commits a trace point and resets the band between
    per-seed segments (rows_limit = distance to each seed's next
    absolute tspace boundary).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from damar_tpu.ops.wave import INF

INF_I = 1 << 20  # plain int for in-kernel use (jnp scalars become
# captured constants, which pallas_call rejects)


def _shift_right_iota(u, s, lane, fill):
    rolled = pltpu.roll(u, s, axis=1)
    return jnp.where(lane >= s, rolled, fill)


def _shift_left_iota(u, s, lane, W, fill):
    rolled = pltpu.roll(u, W - s, axis=1)   # pltpu.roll requires s >= 0
    return jnp.where(lane < W - s, rolled, fill)


def _dp_rows_kernel(D_ref, a_ref, b_ref, vbb_ref, pb_ref, blim_ref,
                    rows_ref, act_ref, bs_ref, bva_ref, bvb_ref, bd_ref,
                    Do_ref, act_o_ref, bs_o_ref, bva_o_ref, bvb_o_ref,
                    bd_o_ref, *, R: int, W: int, diff_cost: int,
                    xdrop: int, track_best: bool):
    """Fixed-lane-frame DP: lane L corresponds to the FIXED b-position
    v_b = (vbb - 1) + L for the whole chunk, so the per-row diagonal
    transition is a static shift-right and the B compare characters
    load once — no dynamic lane slicing (which Mosaic cannot lower).
    The active W-wide band slides across the lanes via masks: after
    row r the sliding-frame lane j lives at L = r + 1 + j.  The A
    character for row r is extracted with a masked reduction over the
    lane-major a_ref.  All per-seed quantities stay 2D [SB, 1]
    (Mosaic cannot reshape 1D vectors).
    """
    SB, Wb = b_ref.shape
    Ra = a_ref.shape[1]
    laneB = jax.lax.broadcasted_iota(jnp.int32, (SB, Wb), 1)
    laneA = jax.lax.broadcasted_iota(jnp.int32, (SB, Ra), 1)
    vbb = vbb_ref[:]            # [SB, 1] sliding-frame base
    pb = pb_ref[:]
    blim = blim_ref[:]
    rows = rows_ref[:]
    a_all = a_ref[:]
    # compare char for lane L is tile[L-1] (tile[k] = B''[v0b + k])
    bcmp = _shift_right_iota(b_ref[:], 1, laneB, 0)
    v_b = (vbb - 1) + laneB                   # fixed per lane
    vb_ok = (v_b >= 0) & (v_b <= blim)
    diag_ok = (v_b >= 1) & (v_b <= blim)

    # place the incoming sliding-frame band at lanes [0, W)
    D0 = jnp.where(laneB < W,
                   jnp.pad(D_ref[:], ((0, 0), (0, Wb - W)),
                           constant_values=INF_I), INF_I)

    def body(r, carry):
        D, act_i, bs, bva, bvb, bd = carry
        act = act_i != 0          # bools stay transient: i1 vectors
        # cannot be loop-carried (Mosaic relayout limitation)
        row_active = act & (r < rows)                     # [SB, 1]
        x = jnp.sum(jnp.where(laneA == r, a_all, 0), axis=1,
                    keepdims=True)                        # [SB, 1]
        win = (laneB >= r + 1) & (laneB < r + 1 + W)
        diag_valid = diag_ok & win
        sub = jnp.where(diag_valid & (bcmp == x), 0, 1)
        sub = jnp.where(diag_valid, sub, INF_I)
        diag = _shift_right_iota(D, 1, laneB, INF_I) + sub
        tmp = jnp.minimum(diag, D + 1)
        u = tmp - laneB
        s = 1
        while s < Wb:
            u = jnp.minimum(u, _shift_right_iota(u, s, laneB, INF_I))
            s *= 2
        Dn = jnp.where(vb_ok & win, u + laneB, INF_I)
        # masked rows: the sliding frame still advances one lane per
        # row, so an idle seed's band must SHIFT without a DP update —
        # this keeps every band at lanes [R, R+W) at kernel exit and
        # reproduces the sliding-frame "keep D" semantics exactly.
        D = jnp.where(row_active, Dn,
                      _shift_right_iota(D, 1, laneB, INF_I))
        if track_best:
            score = jnp.where(win & vb_ok & (D < INF_I),
                              (pb + r) + v_b - diff_cost * D, -INF_I)
            smax = jnp.max(score, axis=1, keepdims=True)
            at_best = score == smax
            vb_best = jnp.min(jnp.where(at_best, v_b, INF_I), axis=1,
                              keepdims=True)
            d_best = jnp.min(jnp.where(at_best, D, INF_I), axis=1,
                             keepdims=True)
            improve = row_active & (smax > bs)
            bs = jnp.where(improve, smax, bs)
            bva = jnp.where(improve, pb + r, bva)
            bvb = jnp.where(improve, vb_best, bvb)
            bd = jnp.where(improve, d_best, bd)
            act = act & ~(row_active & (smax < bs - xdrop))
        return D, act.astype(jnp.int32), bs, bva, bvb, bd

    assert R + W <= Wb, (R, W, Wb)
    init = (D0, act_ref[:], bs_ref[:], bva_ref[:],
            bvb_ref[:], bd_ref[:])
    D, act, bs, bva, bvb, bd = jax.lax.fori_loop(0, R, body, init)
    # every band (active or idled) now sits at lanes [R, R+W)
    Do_ref[:] = jax.lax.slice_in_dim(D, R, R + W, axis=1)
    act_o_ref[:] = act
    bs_o_ref[:] = bs
    bva_o_ref[:] = bva
    bvb_o_ref[:] = bvb
    bd_o_ref[:] = bd


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (tests run on the CPU backend)."""
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=(
    "R", "W", "SB", "diff_cost", "xdrop", "track_best"))
def dp_rows(D, a_chars, b_tile, vb_base, p_base, blim, rows_limit,
            active, best_s, best_va, best_vb, best_d, R: int,
            W: int = 128, SB: int = 256, diff_cost: int = 5,
            xdrop: int = 60, track_best: bool = True):
    """Run R DP rows over all seeds with VMEM-resident band state.

    D [S, W] i32; a_chars [S, Ra>=R] i32; b_tile [S, Wb>=R+W] i32;
    per-seed i32 vectors for the v-space bases, limits and trackers.
    Returns (D, active, best_s, best_va, best_vb, best_d).
    """
    S0 = D.shape[0]
    S = -(-S0 // SB) * SB
    if S != S0:
        padn = lambda x: jnp.pad(x, [(0, S - S0)] + [(0, 0)] *
                                 (x.ndim - 1))
        D, a_chars, b_tile = padn(D), padn(a_chars), padn(b_tile)
        vb_base, p_base, blim = padn(vb_base), padn(p_base), padn(blim)
        rows_limit, active = padn(rows_limit), padn(active)
        best_s, best_va = padn(best_s), padn(best_va)
        best_vb, best_d = padn(best_vb), padn(best_d)
    grid = (S // SB,)
    bspec = lambda w: pl.BlockSpec((SB, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((SB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _dp_rows_kernel, R=R, W=W, diff_cost=diff_cost, xdrop=xdrop,
        track_best=track_best)
    col = lambda x: x.reshape(S, 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(W), bspec(a_chars.shape[1]),
                  bspec(b_tile.shape[1]), vspec, vspec, vspec, vspec,
                  vspec, vspec, vspec, vspec, vspec],
        out_specs=(bspec(W), vspec, vspec, vspec, vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((S, W), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(D, col(a_chars) if False else a_chars, b_tile, col(vb_base),
      col(p_base), col(blim), col(rows_limit),
      col(active.astype(jnp.int32)), col(best_s), col(best_va),
      col(best_vb), col(best_d))
    out = (out[0],) + tuple(o.reshape(S) for o in out[1:])
    if S != S0:
        out = tuple(o[:S0] for o in out)
    return out


# --- full-pass wrappers (same contracts as ops.wave) ------------------------

def _pad_cols(x, m: int):
    w = x.shape[1]
    target = -(-w // m) * m
    if target == w:
        return x
    return jnp.pad(x, ((0, 0), (0, target - w)))


def _gather_i32(bases, origin, v0, length, reverse: bool):
    from damar_tpu.ops.wave import _gather_chars
    return _gather_chars(bases, origin, v0, length,
                         reverse).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "reverse", "W", "R", "SB", "max_rows", "diff_cost", "xdrop"))
def extend_wave_pl(a_bases, b_bases, aorigin, borigin, alim, blim,
                   reverse: bool = False, W: int = 128, R: int = 128,
                   SB: int = 256, max_rows: int = 65536,
                   diff_cost: int = 5, xdrop: int = 60, dirs=None):
    """Pallas-backed drop-in for ops.wave.extend_wave (same returns).

    dirs: optional traced bool[S] per-seed direction (True = reverse),
    overriding the static `reverse` — lets forward and reverse
    extensions share one launch so batches stay length-homogeneous."""
    rv = reverse if dirs is None else dirs
    S = aorigin.shape[0]
    CTR = W // 2
    lane0 = jnp.arange(W, dtype=jnp.int32)
    D0 = jnp.where(lane0 >= CTR, lane0 - CTR, INF)[None, :].repeat(S, 0)
    z = jnp.zeros(S, jnp.int32)
    state = dict(D=D0, boff=z, rtot=jnp.int32(0), active=alim > 0,
                 bs=z, bva=z, bvb=z, bd=z)

    def cond(st):
        return jnp.any(st["active"]) & (st["rtot"] < max_rows)

    def body(st):
        a_chars = _gather_i32(a_bases, aorigin,
                              jnp.full((S,), st["rtot"], jnp.int32),
                              R, rv)
        v0b = st["rtot"] + st["boff"] - CTR
        b_tile = _gather_i32(b_bases, borigin, v0b, R + W, rv)
        vb_base = st["rtot"] + 1 - CTR + st["boff"]
        p_base = jnp.full((S,), st["rtot"] + 1, jnp.int32)
        rows = jnp.clip(alim - st["rtot"], 0, R)
        D, act, bs, bva, bvb, bd = dp_rows(
            st["D"], a_chars, _pad_cols(b_tile, 128), vb_base, p_base,
            blim, rows, st["active"], st["bs"], st["bva"], st["bvb"],
            st["bd"], R=R, W=W, SB=SB, diff_cost=diff_cost,
            xdrop=xdrop, track_best=True)
        rtot = st["rtot"] + R
        active = (act != 0) & (rtot < alim)
        # recenter band on the minimum-distance column
        jmin = jnp.argmin(D, axis=1).astype(jnp.int32)
        drift = jnp.where(active & (jnp.min(D, axis=1) < INF),
                          jmin - CTR, 0)

        def _roll_row(row, s):
            rolled = jnp.roll(row, -s)
            idx = jnp.arange(W, dtype=jnp.int32)
            ok = (idx + s >= 0) & (idx + s < W)
            return jnp.where(ok, rolled, INF)

        return dict(D=jax.vmap(_roll_row)(D, drift),
                    boff=st["boff"] + drift, rtot=rtot, active=active,
                    bs=bs, bva=bva, bvb=bvb, bd=bd)

    st = jax.lax.while_loop(cond, body, state)
    return st["bva"], st["bvb"], st["bd"], st["bs"]


@functools.partial(jax.jit, static_argnames=("tspace", "W", "SB",
                                             "max_segs"))
def trace_wave_pl(a_bases, b_bases, astart, bstart, abpos, bbpos,
                  alim, blim, tspace: int = 100, W: int = 128,
                  SB: int = 256, max_segs: int = 660):
    """Pallas-backed drop-in for ops.wave.trace_wave (same returns)."""
    S = abpos.shape[0]
    CTR = W // 2
    lane = jnp.arange(W, dtype=jnp.int32)[None, :]
    lane0 = jnp.arange(W, dtype=jnp.int32)
    aorigin = astart + abpos
    borigin = bstart + bbpos

    def seg_rows_of(done):
        a = abpos + done
        nxt = (a // tspace + 1) * tspace - a
        return jnp.minimum(nxt, alim - done)

    D0 = jnp.where(lane0 >= CTR, lane0 - CTR, INF)[None, :].repeat(S, 0)
    z = jnp.zeros(S, jnp.int32)
    state = dict(D=D0, boff=z, done=z, nseg=z, prev_vb=z, dsum=z,
                 trace=jnp.zeros((S, max_segs, 2), jnp.int32))
    rows_idx = jnp.arange(S)

    def cond(st):
        return jnp.any(st["done"] < alim)

    def body(st):
        live = st["done"] < alim
        seg_rows = jnp.where(live, seg_rows_of(st["done"]), 0)
        a_chars = _gather_i32(a_bases, aorigin, st["done"], tspace,
                              False)
        v0b = st["done"] + st["boff"] - CTR
        b_tile = _gather_i32(b_bases, borigin, v0b, tspace + W, False)
        vb_base = st["done"] + 1 - CTR + st["boff"]
        D, _, _, _, _, _ = dp_rows(
            st["D"], _pad_cols(a_chars, 128), _pad_cols(b_tile, 128),
            vb_base, z, blim, seg_rows, live, z, z, z, z,
            R=tspace, W=W, SB=SB, track_best=False)
        va = st["done"] + seg_rows
        at_end = live & (va == alim)
        commit = live
        v_b_fin = va[:, None] + lane - CTR + st["boff"][:, None]
        lane_valid = (v_b_fin >= 0) & (v_b_fin <= blim[:, None])
        Dm = jnp.where(lane_valid, D, INF)
        j_min = jnp.argmin(Dm, axis=1).astype(jnp.int32)
        j_end = jnp.clip(blim - va + CTR - st["boff"], 0, W - 1)
        j_com = jnp.where(at_end, j_end, j_min)
        vb_com = jnp.take_along_axis(v_b_fin, j_com[:, None], 1)[:, 0]
        d_com = jnp.take_along_axis(D, j_com[:, None], 1)[:, 0]
        d_com = jnp.where(d_com >= INF, alim + blim, d_com)
        bspan = vb_com - st["prev_vb"]
        ns = jnp.minimum(st["nseg"], max_segs - 1)
        cur = st["trace"][rows_idx, ns]
        pair = jnp.stack([d_com, bspan], axis=1)
        newv = jnp.where(commit[:, None], pair, cur)
        trace = st["trace"].at[rows_idx, ns].set(newv)
        reset_D = jnp.broadcast_to(
            jnp.where(lane >= CTR, lane - CTR, INF), D.shape)
        return dict(
            D=jnp.where(commit[:, None], reset_D, D),
            boff=jnp.where(commit, st["boff"] + (j_com - CTR),
                           st["boff"]),
            done=st["done"] + seg_rows,
            nseg=jnp.where(commit, st["nseg"] + 1, st["nseg"]),
            prev_vb=jnp.where(commit, vb_com, st["prev_vb"]),
            dsum=jnp.where(commit, st["dsum"] + d_com, st["dsum"]),
            trace=trace,
        )

    st = jax.lax.while_loop(cond, body, state)
    return st["trace"], st["nseg"], st["dsum"]
