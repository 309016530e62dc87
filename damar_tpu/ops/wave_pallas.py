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


def _roll_left(x, s: int):
    """Rotate lanes left by static s (pltpu.roll rotates right)."""
    W = x.shape[1]
    return pltpu.roll(x, W - s, axis=1)


def _dp_rows_kernel(D_ref, a_ref, b_ref, vbb_ref, pb_ref, blim_ref,
                    rows_ref, act_ref, cont_ref, bs_ref, bva_ref,
                    bvb_ref, bd_ref, Do_ref, act_o_ref, bs_o_ref,
                    bva_o_ref, bvb_o_ref, bd_o_ref, drift_o_ref, *,
                    R: int, W: int, diff_cost: int, xdrop: int,
                    track_best: bool, recenter: bool):
    """Band-frame DP: lane j of D always holds band position j; after
    in-chunk row r, lane j corresponds to v_b = vbb + r + j (the frame
    advances implicitly with the row index, not by shifting lanes).
    The A character and B compare window are consumed by rotating the
    loop-carried a/b registers one lane per row, so every DP op runs
    at width W instead of R+W.  Masked rows keep D unchanged — which
    freezes that seed's frame at its last active row, exactly the
    pure-JAX ops.wave semantics.  All per-seed quantities stay 2D
    [SB, 1] (Mosaic cannot reshape 1D vectors).

    recenter: fold the between-chunk band recentering (argmin column ->
    variable per-seed roll) into the kernel tail; drift_o reports the
    applied shift so the caller can update boff.
    """
    SB, Wb = b_ref.shape
    Ra = a_ref.shape[1]
    assert R + W <= Wb, (R, W, Wb)
    assert R <= Ra, (R, Ra)
    CTR = W // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (SB, W), 1)
    vbb = vbb_ref[:]            # [SB, 1] band base: v_b = vbb + r + j
    pb = pb_ref[:]
    blim = blim_ref[:]
    rows = rows_ref[:]

    def body(r, carry):
        D, areg, breg, bs, bva, bvb, bd = carry
        row_active = (act_ref[:] != 0) & (r < rows)       # [SB, 1]
        x = jax.lax.slice_in_dim(areg, 0, 1, axis=1)      # [SB, 1]
        bcmp = jax.lax.slice_in_dim(breg, 0, W, axis=1)   # [SB, W]
        v_b = vbb + r + lane
        lane_valid = (v_b >= 0) & (v_b <= blim)
        diag_valid = lane_valid & (v_b >= 1)
        sub = jnp.where(diag_valid,
                        jnp.where(bcmp == x, 0, 1), INF_I)
        Dl = jnp.where(lane < W - 1, _roll_left(D, 1), INF_I)
        tmp = jnp.minimum(D + sub, Dl + 1)
        u = tmp - lane
        s = 1
        while s < W:
            us = jnp.where(lane >= s, pltpu.roll(u, s, axis=1), INF_I)
            u = jnp.minimum(u, us)
            s *= 2
        Dn = jnp.where(lane_valid, u + lane, INF_I)
        D = jnp.where(row_active, Dn, D)
        if track_best:
            # per-LANE best trackers: elementwise only — cross-lane
            # reductions (max/argmax) run once in the kernel tail, not
            # every row
            score = jnp.where(lane_valid & (D < INF_I),
                              (pb + r) + v_b - diff_cost * D, -INF_I)
            improve = row_active & (score > bs)
            bs = jnp.where(improve, score, bs)
            bva = jnp.where(improve, pb + r, bva)
            bvb = jnp.where(improve, v_b, bvb)
            bd = jnp.where(improve, D, bd)
        return (D, _roll_left(areg, 1), _roll_left(breg, 1),
                bs, bva, bvb, bd)

    init = (D_ref[:], a_ref[:], b_ref[:], bs_ref[:],
            bva_ref[:], bvb_ref[:], bd_ref[:])
    D, _, _, bs, bva, bvb, bd = jax.lax.fori_loop(0, R, body, init)
    act = act_ref[:]
    if track_best:
        # X-drop at chunk granularity (per-row deactivation saves no
        # masked vector work): final-row best vs all-time best
        v_b = vbb + (rows - 1) + lane
        lane_valid = (v_b >= 0) & (v_b <= blim)
        score_fin = jnp.where(lane_valid & (D < INF_I),
                              (pb + rows - 1) + v_b - diff_cost * D,
                              -INF_I)
        smax = jnp.max(score_fin, axis=1, keepdims=True)
        bs_glob = jnp.max(bs, axis=1, keepdims=True)
        act = (act != 0) & (smax >= bs_glob - xdrop)
        act = act.astype(jnp.int32)
    if recenter:
        # recenter the band on the (first) minimum-distance column for
        # seeds that continue into the next chunk
        m = jnp.min(D, axis=1, keepdims=True)
        jmin = jnp.min(jnp.where(D == m, lane, INF_I), axis=1,
                       keepdims=True)
        go = (act != 0) & (cont_ref[:] != 0) & (m < INF_I)
        drift = jnp.where(go, jmin - CTR, 0)              # [SB, 1]
        sh = jnp.where(drift < 0, drift + W, drift)       # mod W
        k = 1
        while k < W:
            D = jnp.where((sh & k) != 0, _roll_left(D, k), D)
            k *= 2
        ok = (lane + drift >= 0) & (lane + drift < W)
        D = jnp.where(ok, D, INF_I)
        drift_o_ref[:] = drift
    else:
        drift_o_ref[:] = jnp.zeros((SB, 1), jnp.int32)
    Do_ref[:] = D
    act_o_ref[:] = act
    bs_o_ref[:] = bs
    bva_o_ref[:] = bva
    bvb_o_ref[:] = bvb
    bd_o_ref[:] = bd


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (tests run on the CPU backend)."""
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=(
    "R", "W", "SB", "diff_cost", "xdrop", "track_best", "recenter"))
def dp_rows(D, a_chars, b_tile, vb_base, p_base, blim, rows_limit,
            active, best_s, best_va, best_vb, best_d, R: int,
            W: int = 128, SB: int = 256, diff_cost: int = 5,
            xdrop: int = 60, track_best: bool = True,
            recenter: bool = False, cont=None):
    """Run R DP rows over all seeds with VMEM-resident band state.

    D [S, W] i32; a_chars [S, Ra>=R] i32; b_tile [S, Wb>=R+W] i32;
    per-seed i32 vectors for the v-space bases and limits; best_* are
    PER-LANE trackers [S, W] when track_best (reduced by the caller
    via ops.wave.reduce_best_lanes), or [S] dummies otherwise.
    recenter/cont: fold the between-chunk band recentering into the
    kernel for seeds continuing into the next chunk (cont[S] bool).
    Returns (D, active, best_s, best_va, best_vb, best_d, drift).
    """
    S0 = D.shape[0]
    S = -(-S0 // SB) * SB
    if cont is None:
        cont = jnp.zeros(S0, jnp.int32)
    cont = cont.astype(jnp.int32)
    col = lambda x: x.reshape(x.shape[0], 1) if x.ndim == 1 else x
    best_s, best_va = col(best_s), col(best_va)
    best_vb, best_d = col(best_vb), col(best_d)
    if S != S0:
        padn = lambda x: jnp.pad(x, [(0, S - S0)] + [(0, 0)] *
                                 (x.ndim - 1))
        D, a_chars, b_tile = padn(D), padn(a_chars), padn(b_tile)
        vb_base, p_base, blim = padn(vb_base), padn(p_base), padn(blim)
        rows_limit, active, cont = (padn(rows_limit), padn(active),
                                    padn(cont))
        best_s, best_va = padn(best_s), padn(best_va)
        best_vb, best_d = padn(best_vb), padn(best_d)
    grid = (S // SB,)
    bspec = lambda w: pl.BlockSpec((SB, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((SB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    tspec = [bspec(x.shape[1]) if x.shape[1] > 1 else vspec
             for x in (best_s, best_va, best_vb, best_d)]
    tshape = [jax.ShapeDtypeStruct(x.shape, jnp.int32)
              for x in (best_s, best_va, best_vb, best_d)]
    kernel = functools.partial(
        _dp_rows_kernel, R=R, W=W, diff_cost=diff_cost, xdrop=xdrop,
        track_best=track_best, recenter=recenter)
    colv = lambda x: x.reshape(S, 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(W), bspec(a_chars.shape[1]),
                  bspec(b_tile.shape[1]), vspec, vspec, vspec, vspec,
                  vspec, vspec] + tspec,
        out_specs=(bspec(W), vspec) + tuple(tspec) + (vspec,),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((S, W), jnp.int32),
             jax.ShapeDtypeStruct((S, 1), jnp.int32)] + tshape +
            [jax.ShapeDtypeStruct((S, 1), jnp.int32)]),
        interpret=_interpret(),
    )(D, a_chars, b_tile, colv(vb_base),
      colv(p_base), colv(blim), colv(rows_limit),
      colv(active.astype(jnp.int32)), colv(cont), best_s,
      best_va, best_vb, best_d)
    out = tuple(o.reshape(S) if o.ndim == 2 and o.shape[1] == 1 else o
                for o in out)
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


def _pack_bases(bases_u8):
    """uint8 base codes -> int32 words, 16 bases per word (2 bits each,
    base i of word w at bits [2i, 2i+2)).  The PAD_BASE sentinel (4)
    packs as 0; wave kernels never read unmasked out-of-read positions
    (validity comes from alim/blim lane masks, not the sentinel).

    Built from 16 strided FLAT slices, not a [n/16, 16] reshape: TPU
    tiling pads a 16-wide minor dim to 128 lanes (8x memory), which
    planned a 16 GB HLO temp at the 200 Mbp block unit."""
    n = bases_u8.shape[0]
    m = -(-n // 16) * 16
    if m != n:
        bases_u8 = jnp.pad(bases_u8, (0, m - n))
    b = bases_u8.astype(jnp.int32) & 3
    acc = jnp.zeros(m // 16, jnp.int32)
    for j in range(16):
        acc = acc | (jax.lax.slice(b, (j,), (m - 15 + j,), (16,))
                     << (2 * j))
    return acc


def _rev16(w):
    """Reverse the 16 2-bit groups of each uint32 word (char-order
    reversal within a packed word)."""
    w = ((w >> 2) & jnp.uint32(0x33333333)) \
        | ((w & jnp.uint32(0x33333333)) << 2)
    w = ((w >> 4) & jnp.uint32(0x0F0F0F0F)) \
        | ((w & jnp.uint32(0x0F0F0F0F)) << 4)
    w = ((w >> 8) & jnp.uint32(0x00FF00FF)) \
        | ((w & jnp.uint32(0x00FF00FF)) << 8)
    return (w >> 16) | (w << 16)


def _gather_packed_words(words, origin, v0, length: int, reverse):
    """Bit-0-aligned packed-word windows: [S, length//16] int32 words
    whose char i (= bits [2*(i&15), 2*(i&15)+2) of word i>>4) equals
    _gather_packed(...)[:, i] exactly.  length must be a multiple of
    16 (the bp chunk sizes R and R+BW always are).

    This replaces the char-tile materialization of _gather_packed on
    the bp kernel path: the [S, length] char array, its 4-step binary
    roll, and the row transpose were ~16x the traffic of the word
    window itself — the kernels now unpack chars in VMEM with scalar
    row indices (r >> 4, 2*(r & 15)), so XLA only gathers, funnel-
    aligns, and transposes words.  Out-of-range words are clip-
    gathered garbage the callers mask via v-space limits (same
    contract as _gather_packed).

    reverse: static bool or traced bool[S].  Reversal keeps the SAME
    output contract (char i = reversed stream's char i): the window is
    gathered forward, funnel-aligned, then word-reversed with a 2-bit
    group swizzle (_rev16) — exact because length % 16 == 0.  Forward-
    only callers may pass any length (rounded up internally; the tail
    chars past length are in-pool continuation the kernels never
    read)."""
    if length % 16:
        assert reverse is False, "reversal needs length % 16 == 0"
    nwc = -(-length // 16)
    nw = nwc + 2
    both = not isinstance(reverse, bool)
    if both:
        start_f = origin + v0
        start_r = origin - v0 - length
        start = jnp.where(reverse, start_r, start_f)
    else:
        start = (origin - v0 - length) if reverse else (origin + v0)
    w0 = start >> 4                    # arithmetic shift: floors negatives
    j0 = start & 15
    widx = w0[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :]
    wg = _cu(words[jnp.clip(widx, 0, words.shape[0] - 1)])
    # funnel shift: aligned[i] = (wg[i] >> 2*j0) | (wg[i+1] << (32-2*j0))
    sh = (2 * j0)[:, None].astype(jnp.uint32)
    lo = wg[:, :-1] >> sh
    hi = jnp.where(sh > 0, wg[:, 1:] << (32 - sh), jnp.uint32(0))
    aligned = (lo | hi)[:, :nwc]       # [S, nwc]
    if both:
        rev_w = _rev16(aligned[:, ::-1])
        out = jnp.where(reverse[:, None], rev_w, aligned)
    elif reverse:
        out = _rev16(aligned[:, ::-1])
    else:
        out = aligned
    return jax.lax.bitcast_convert_type(out, jnp.int32)


def _cu(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _gather_packed(words, origin, v0, length: int, reverse):
    """[S, length] int32 chars at v-space positions v0..v0+length-1,
    gathered WORD-wise from the packed base array (16x fewer gathered
    elements than a byte gather — the XLA byte gather was the dominant
    cost of the whole wave path).  Word misalignment is fixed with a
    4-step binary roll; per-word index clipping preserves alignment of
    in-range words, and out-of-range chars are garbage the callers mask
    via v-space limits (same contract as ops.wave._gather_chars).
    reverse: static bool or traced bool[S] (mixed-direction batches)."""
    nw = length // 16 + 2
    if isinstance(reverse, bool):
        start = (origin - v0 - length) if reverse else (origin + v0)
    else:
        start = jnp.where(reverse, origin - v0 - length, origin + v0)
    w0 = start >> 4                    # arithmetic shift: floors negatives
    j0 = start & 15                    # nonnegative remainder
    widx = w0[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :]
    words_g = words[jnp.clip(widx, 0, words.shape[0] - 1)]
    rep = jnp.repeat(words_g, 16, axis=1)             # [S, nw*16]
    sh = (2 * (jnp.arange(nw * 16, dtype=jnp.int32) & 15))[None, :]
    chars = (rep >> sh) & 3
    for k in (1, 2, 4, 8):             # left-roll by j0 in binary steps
        chars = jnp.where((j0[:, None] & k) != 0,
                          jnp.roll(chars, -k, axis=1), chars)
    chars = chars[:, :length]
    if isinstance(reverse, bool):
        return chars[:, ::-1] if reverse else chars
    return jnp.where(reverse[:, None], chars[:, ::-1], chars)




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
    a_words = _pack_bases(a_bases)
    b_words = _pack_bases(b_bases)
    lane0 = jnp.arange(W, dtype=jnp.int32)
    D0 = jnp.where(lane0 >= CTR, lane0 - CTR, INF)[None, :].repeat(S, 0)
    z = jnp.zeros(S, jnp.int32)
    zl = jnp.zeros((S, W), jnp.int32)
    state = dict(D=D0, boff=z, rtot=jnp.int32(0), active=alim > 0,
                 bs=zl, bva=zl, bvb=zl, bd=zl)

    def cond(st):
        return jnp.any(st["active"]) & (st["rtot"] < max_rows)

    def body(st):
        a_chars = _gather_packed(a_words, aorigin,
                                 jnp.full((S,), st["rtot"], jnp.int32),
                                 R, rv)
        v0b = st["rtot"] + st["boff"] - CTR
        b_tile = _gather_packed(b_words, borigin, v0b, R + W, rv)
        vb_base = st["rtot"] + 1 - CTR + st["boff"]
        p_base = jnp.full((S,), st["rtot"] + 1, jnp.int32)
        rows = jnp.clip(alim - st["rtot"], 0, R)
        cont = (st["rtot"] + R) < alim
        D, act, bs, bva, bvb, bd, drift = dp_rows(
            st["D"], a_chars, _pad_cols(b_tile, 128), vb_base, p_base,
            blim, rows, st["active"], st["bs"], st["bva"], st["bvb"],
            st["bd"], R=R, W=W, SB=SB, diff_cost=diff_cost,
            xdrop=xdrop, track_best=True, recenter=True, cont=cont)
        rtot = st["rtot"] + R
        active = (act != 0) & (rtot < alim)
        return dict(D=D, boff=st["boff"] + drift, rtot=rtot,
                    active=active, bs=bs, bva=bva, bvb=bvb, bd=bd)

    st = jax.lax.while_loop(cond, body, state)
    from damar_tpu.ops.wave import reduce_best_lanes
    va, vb, d, sc = reduce_best_lanes(st["bs"], st["bva"], st["bvb"],
                                      st["bd"])
    return va, vb, d, sc


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
    a_words = _pack_bases(a_bases)
    b_words = _pack_bases(b_bases)
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
        a_chars = _gather_packed(a_words, aorigin, st["done"], tspace,
                                 False)
        v0b = st["done"] + st["boff"] - CTR
        b_tile = _gather_packed(b_words, borigin, v0b, tspace + W, False)
        vb_base = st["done"] + 1 - CTR + st["boff"]
        D = dp_rows(
            st["D"], _pad_cols(a_chars, 128), _pad_cols(b_tile, 128),
            vb_base, z, blim, seg_rows, live, z, z, z, z,
            R=tspace, W=W, SB=SB, track_best=False)[0]
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
