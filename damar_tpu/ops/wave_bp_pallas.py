"""Pallas TPU kernels for the bit-parallel band DP (ops.wave_bp).

The pure-JAX bp kernels execute each DP row as ~60 separate HBM-level
ops on [S] vectors — a rounding error of VPU occupancy and entirely
bound by per-op dispatch.  These kernels fuse the whole R-row chunk
(row loop + Peq plane maintenance + best/X-drop tracking + the chunk
tail's band-wide eval and recenter) into one pallas_call with all band
state resident in VMEM, so a row costs ~60 genuinely back-to-back VPU
ops on [8, L]-tile lanes.

Layout: seed s of a launch lives at tile position (s // L % 8-row
group) — states are [S/L, L] viewed as [G*8, L] with one grid program
per [8, L] block; A/B character tiles arrive transposed as
[R(+BW), G*8, L] so the per-row slice is a cheap leading-dim index.

Bit identity: these kernels must produce EXACTLY the outputs of
ops.wave_bp (which in turn bit-matches the native C replicas) — the
backend choice can never change results.  tests/test_wave_bp_pallas.py
enforces this differentially; the chunk-tail recenter is re-derived
here with per-lane variable shifts + popcounts instead of the wide
reconstruct, with identical tie-breaking (first-min / first-max).

Upstream reference for the algorithm shape: DALIGNER dalign/align.c
forward_wave/reverse_wave (upstream-path citation, mount empty); the
bit-parallel band formulation follows Myers JACM 1999 / Hyyrö 2003
(public algorithms, re-derived for this band frame in ops.wave_bp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from damar_tpu.ops.wave_pallas import (_pack_bases,
                                       _gather_packed_words)

BW = 32
CTR = 16
INF_I = 1 << 20
NEG_I = -(1 << 20)
U1 = 1
MASKW = _np.uint32(0xFFFFFFFF)
NOT1 = _np.uint32(0xFFFFFFFE)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _c32(x):
    """Bitcast a uint32 vector to int32 (free on the VPU) — scf.for
    loop carries must be int32/bool-free for Mosaic to legalize."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _cu32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


def _popcount(x):
    """SWAR popcount of a uint32 vector (no hw popcnt in Mosaic)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return _i((x * jnp.uint32(0x01010101)) >> 24)


def _row_step(VP, VN, Db, Dc, Eq):
    """One DP row — identical algebra to ops.wave_bp._row_step."""
    X = Eq | (VN >> U1)
    seed = (X << U1) & VP
    G0 = X | (VP & (seed | ((seed + VP) ^ VP)))
    g = ~G0
    gp = g << U1
    d = g ^ gp
    nd = ~d
    Z = ~(VP | VN)
    VPn = (VP & nd) | (Z & g & ~gp)
    VNn = (VN & nd) | (Z & gp & G0)
    VPn = VPn & NOT1
    VNn = (VNn & NOT1) | (G0 & U1)
    Dbn = Db + 1 + _i(VP & U1) - _i(VN & U1)
    Dcn = Dc + 1 - _i((G0 >> CTR) & U1)
    return VPn, VNn, Dbn, Dcn


def _eq_bits(PH, PL, PV, x):
    xh = _u(x >> 1)
    xl = _u(x & 1)
    return (PH ^ (xh - U1)) & (PL ^ (xl - U1)) & PV & MASKW


def _shift_planes(PH, PL, PV, nb, nvalid):
    nh = _u((nb >> 1) & 1)
    nl = _u(nb & 1)
    nv = _u(nvalid)
    return ((PH >> U1) | (nh << (BW - 1)),
            (PL >> U1) | (nl << (BW - 1)),
            (PV >> U1) | (nv << (BW - 1)))


def _char_at(wT_ref, i):
    """Char i from a word-tile ref [nw, 8, L] (16 chars per int32
    word, bit-0-aligned — see _gather_packed_words).  i may be a
    traced scalar (fori index): the word row index i >> 4 and the
    shift 2*(i & 15) are both scalars, so the read is one dynamic
    leading-dim slice + a splat shift — no per-lane gather."""
    w = _cu32(wT_ref[i >> 4])
    return _i((w >> _u(jnp.asarray(2 * (i & 15)))) & jnp.uint32(3))


def _init_planes(bT_ref, v0b, blim):
    """Peq planes from the first BW chars of the transposed B word
    tile (bit j = char at B v-index v0b + j)."""
    shp = v0b.shape
    PH = jnp.zeros(shp, jnp.uint32)
    PL = jnp.zeros(shp, jnp.uint32)
    PV = jnp.zeros(shp, jnp.uint32)
    for jw in range(BW // 16):
        w = _cu32(bT_ref[jw])
        for t in range(16):
            j = jw * 16 + t
            c = _i((w >> _u(jnp.uint32(2 * t))) & jnp.uint32(3))
            p = v0b + j
            ok = (p >= 0) & (p < blim)
            PH = PH | (_u((c >> 1) & 1) << j)
            PL = PL | (_u(c & 1) << j)
            PV = PV | (_u(ok) << j)
    return PH, PL, PV


def _band_scan(VP, VN, Db, vbb_t, blim, extra_valid, diff_cost,
               prev_vb=None, want_score=True, want_end=False):
    """Walk the 32 band positions once, reconstructing D lane-by-lane
    from the delta words, and return the tail statistics the chunk
    tails need: (smax [without the +t term, added by the caller],
    jbest) over the score vb - diff_cost*D on valid positions;
    (jmin, dsel) the first-minimum position of the INF-masked D and
    the RAW D value there (matches argmin on Dm then take from Dw);
    dend = raw D at the per-seed end column clip(blim - vbb_t).
    First-min/first-max tie-breaking matches jnp.argmin/argmax on the
    wide form (strict compare, increasing j)."""
    D = Db
    smax = jnp.full_like(Db, NEG_I)
    jbest = jnp.zeros_like(Db)
    dmin = jnp.full_like(Db, 1 << 30)
    jmin = jnp.zeros_like(Db)
    dsel = jnp.zeros_like(Db)
    dend = jnp.zeros_like(Db)
    j_end = jnp.clip(blim - vbb_t, 0, BW - 1) if want_end else None
    for j in range(BW):
        D = D + _i((VP >> j) & U1) - _i((VN >> j) & U1)
        vb = vbb_t + j
        in_b = (vb >= 0) & (vb <= blim)
        if want_score:
            sc = jnp.where(in_b & extra_valid, vb - diff_cost * D,
                           NEG_I)
            upd = sc > smax
            smax = jnp.where(upd, sc, smax)
            jbest = jnp.where(upd, j, jbest)
        mvalid = in_b if prev_vb is None else in_b & (vb > prev_vb)
        Dm = jnp.where(mvalid, D, INF_I)
        updm = Dm < dmin
        dmin = jnp.where(updm, Dm, dmin)
        jmin = jnp.where(updm, j, jmin)
        dsel = jnp.where(updm, D, dsel)
        if want_end:
            dend = jnp.where(j_end == j, D, dend)
    return smax, jbest, jmin, dsel, dend


def _recenter(VP, VN, Db, drift):
    """Recenter the delta words by per-seed drift: equivalent to the
    wide clip-gather-repack of ops.wave_bp (out-of-range lanes extend
    at +1 per step), expressed as variable per-lane shifts.  Returns
    (VP', VN', Db') with the canonical bit-0 = +1 representation."""
    d = drift
    du = _u(jnp.maximum(d, 0))
    mu = _u(jnp.maximum(-d, 0))
    # positive drift: shift down, fill top bits with VP (+1 region)
    topfill = ~(MASKW >> du)
    VPp = (_u(VP) >> du) | topfill
    VNp = (_u(VN) >> du) & (MASKW >> du)
    # negative drift: shift up, fill bits 1..m with VN (-1 region)
    lowfill = ((jnp.uint32(2) << mu) - 2)
    VPm = (_u(VP) << mu) & MASKW
    VNm = ((_u(VN) << mu) | lowfill) & MASKW
    pos = d >= 0
    VPn = jnp.where(pos, VPp, VPm)
    VNn = jnp.where(pos, VNp, VNm)
    # Dn[0] = D[clip(drift,0,31)] + max(-drift,0)
    idx0 = jnp.clip(d, 0, BW - 1)
    m0 = _u(idx0 + 1)
    mask0 = jnp.where(m0 >= BW, MASKW, (jnp.uint32(1) << m0) - 1)
    D0 = Db + _popcount(_u(VP) & mask0) - _popcount(_u(VN) & mask0) \
        + jnp.maximum(-d, 0)
    # Dn[CTR] = D[clip(CTR+drift,0,31)] + |CTR+drift-clip|
    idxc = jnp.clip(CTR + d, 0, BW - 1)
    mc = _u(idxc + 1)
    maskc = jnp.where(mc >= BW, MASKW, (jnp.uint32(1) << mc) - 1)
    Dc = Db + _popcount(_u(VP) & maskc) - _popcount(_u(VN) & maskc) \
        + jnp.abs(CTR + d - idxc)
    return (VPn | U1, VNn & NOT1, D0 - 1, Dc)


def _vinit_words(shape):
    vn = jnp.uint32((1 << (CTR + 1)) - 1)
    vp = MASKW ^ vn
    return (jnp.full(shape, vp, jnp.uint32),
            jnp.full(shape, vn, jnp.uint32),
            jnp.full(shape, CTR + 1, jnp.int32))


# --- extension kernel --------------------------------------------------------

def _ext_chunk_kernel(sc_ref, aT_ref, bT_ref, VP_ref, VN_ref, Db_ref,
                      Dc_ref, vbb_ref, alim_ref, blim_ref, act_ref,
                      bs_ref, bva_ref, bvb_ref,
                      VP_o, VN_o, Db_o, Dc_o, vbb_o, act_o, bs_o,
                      bva_o, bvb_o, *, R: int, diff_cost: int,
                      xdrop: int):
    """One R-row extension chunk, bit-identical to the body of
    ops.wave_bp.extend_wave_bp (rows + chunk tail + recenter)."""
    rtot = sc_ref[0]
    vbb = vbb_ref[:]
    alim = alim_ref[:]
    blim = blim_ref[:]
    active = act_ref[:] != 0
    PH, PL, PV = _init_planes(bT_ref, vbb - 1, blim)

    def row(r, carry):
        VPi, VNi, Db, Dc, PHi, PLi, PVi, bs, bva, bvb, died = carry
        VP, VN = _cu32(VPi), _cu32(VNi)
        PH, PL, PV = _cu32(PHi), _cu32(PLi), _cu32(PVi)
        x = _char_at(aT_ref, r)
        Eq = _eq_bits(PH, PL, PV, x)
        VP, VN, Db, Dc = _row_step(VP, VN, Db, Dc, Eq)
        t = rtot + r + 1
        vc = vbb + r + CTR
        sc = t + vc - diff_cost * Dc
        ok = active & (t <= alim) & (vc >= 0) & (vc <= blim)
        improve = ok & (sc > bs)
        bs = jnp.where(improve, sc, bs)
        bva = jnp.where(improve, t, bva)
        bvb = jnp.where(improve, vc, bvb)
        died = died | _i(ok & (sc < bs - (xdrop + diff_cost)))
        nbp = vbb + r + BW - 1
        nb = _char_at(bT_ref, r + BW)
        PH, PL, PV = _shift_planes(PH, PL, PV, nb,
                                   (nbp >= 0) & (nbp < blim))
        return (_c32(VP), _c32(VN), Db, Dc, _c32(PH), _c32(PL),
                _c32(PV), bs, bva, bvb, died)

    z = jnp.zeros_like(vbb)
    carry = (_c32(VP_ref[:]), _c32(VN_ref[:]), Db_ref[:], Dc_ref[:],
             _c32(PH), _c32(PL), _c32(PV),
             bs_ref[:], bva_ref[:], bvb_ref[:], z)
    # static trip count + int32-only carries: Mosaic cannot legalize
    # scf.for with dynamic bounds or uint32/bool loop carries on v5e
    VPi, VNi, Db, Dc, _, _, _, bs, bva, bvb, died = jax.lax.fori_loop(
        0, R, row, carry)
    VP, VN = _cu32(VPi), _cu32(VNi)
    died = died != 0
    # ---- chunk tail: exact band-wide eval, X-drop, recenter ----
    t = rtot + R
    vbb_t = vbb + R - 1
    smax, jbest, jmin, _, _ = _band_scan(
        VP, VN, Db, vbb_t, blim, (t <= alim), diff_cost)
    # scores in _band_scan omit the +t term (constant per chunk); add
    # it back only where a real candidate existed
    smax = jnp.where(smax > NEG_I, smax + t, smax)
    better = active & (smax > bs)
    bs = jnp.where(better, smax, bs)
    bva = jnp.where(better, t, bva)
    bvb = jnp.where(better, vbb_t + jbest, bvb)
    act = active & (smax >= bs - xdrop) & (t < alim) & ~died
    drift = jnp.where(act, jmin - CTR, 0)
    VP, VN, Db, Dc = _recenter(VP, VN, Db, drift)
    VP_o[:] = VP
    VN_o[:] = VN
    Db_o[:] = Db
    Dc_o[:] = Dc
    vbb_o[:] = vbb_t + 1 + drift
    act_o[:] = act.astype(jnp.int32)
    bs_o[:] = bs
    bva_o[:] = bva
    bvb_o[:] = bvb


def _grid_call(kernel, n_rows_a, n_rows_b, S, L, states, aT, bT,
               scalars, n_out):
    """Shared pallas_call builder: grid over [8, L] seed blocks,
    transposed char tiles blocked on the seed axis."""
    G = S // (8 * L)
    row_spec_a = pl.BlockSpec((n_rows_a, 8, L), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    row_spec_b = pl.BlockSpec((n_rows_b, 8, L), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((8, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_specs = tuple(st_spec for _ in range(n_out))
    out_shape = tuple(jax.ShapeDtypeStruct((G * 8, L), s)
                      for s in ([jnp.uint32, jnp.uint32] +
                                [jnp.int32] * (n_out - 2)))
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[sc_spec, row_spec_a, row_spec_b] +
                 [st_spec] * len(states),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(scalars, aT, bT, *states)


def _to_tiles(x, S, L):
    """[S] vector -> [S/L, L] tile view."""
    return x.reshape(S // L, L)


def _to_rows(x, S, L):
    """[S, R] char tile -> [R, S/L, L] transposed row view."""
    R = x.shape[1]
    return jnp.transpose(x, (1, 0)).reshape(R, S // L, L)


@functools.partial(jax.jit, static_argnames=(
    "reverse", "R", "max_rows", "diff_cost", "xdrop", "L", "packed",
    "with_active"))
def extend_wave_bp_pl(a_bases, b_bases, aorigin, borigin, alim, blim,
                      reverse: bool = False, R: int = 128,
                      max_rows: int = 65536, diff_cost: int = 5,
                      xdrop: int = 60, dirs=None, L: int = 128,
                      W: int = 128, SB: int = 256,
                      packed: bool = False, with_active: bool = False):
    """Pallas drop-in for ops.wave_bp.extend_wave_bp (same returns,
    bit-identical outputs).  packed=True: a_bases/b_bases are already
    _pack_bases words (callers cache the block-scale pack — repacking
    a 67M-base block inside every launch costs ~0.1 s on chip).
    with_active: also return the final active mask (see
    wave_bp.extend_wave_bp) for the two-phase launch."""
    assert R % 16 == 0, "bp chunk must be word-aligned (R % 16 == 0)"
    rv = reverse if dirs is None else dirs
    S0 = aorigin.shape[0]
    SBLK = 8 * L
    S = -(-S0 // SBLK) * SBLK
    if S != S0:
        pad = lambda x: jnp.pad(x, (0, S - S0))
        aorigin, borigin = pad(aorigin), pad(borigin)
        alim, blim = pad(alim), pad(blim)
        if not isinstance(rv, bool):
            rv = jnp.pad(rv, (0, S - S0))
    a_words = a_bases if packed else _pack_bases(a_bases)
    b_words = b_bases if packed else _pack_bases(b_bases)

    VP0, VN0, Db0 = _vinit_words((S // L, L))
    zt = jnp.zeros((S // L, L), jnp.int32)
    alim_t = _to_tiles(alim.astype(jnp.int32), S, L)
    blim_t = _to_tiles(blim.astype(jnp.int32), S, L)
    state = dict(VP=VP0, VN=VN0, Db=Db0, Dc=zt,
                 vbb=jnp.full((S // L, L), 1 - CTR, jnp.int32),
                 rtot=jnp.int32(0),
                 active=(alim_t > 0).astype(jnp.int32),
                 bs=zt, bva=zt, bvb=zt)

    kernel = functools.partial(_ext_chunk_kernel, R=R,
                               diff_cost=diff_cost, xdrop=xdrop)

    def cond(st):
        return jnp.any(st["active"] != 0) & (st["rtot"] < max_rows)

    def body(st):
        rt = jnp.full((S,), st["rtot"], jnp.int32)
        a_tile = _gather_packed_words(a_words, aorigin, rt, R, rv)
        b_tile = _gather_packed_words(b_words, borigin,
                                      _to_tiles_inv(st["vbb"], S) - 1,
                                      R + BW, rv)
        outs = _grid_call(
            kernel, R // 16, (R + BW) // 16, S, L,
            (st["VP"], st["VN"], st["Db"], st["Dc"], st["vbb"],
             alim_t, blim_t, st["active"], st["bs"], st["bva"],
             st["bvb"]),
            _to_rows(a_tile, S, L), _to_rows(b_tile, S, L),
            jnp.stack([st["rtot"], jnp.int32(R)]), n_out=9)
        VP, VN, Db, Dc, vbb, act, bs, bva, bvb = outs
        return dict(VP=VP, VN=VN, Db=Db, Dc=Dc, vbb=vbb,
                    rtot=st["rtot"] + R, active=act, bs=bs, bva=bva,
                    bvb=bvb)

    st = jax.lax.while_loop(cond, body, state)
    flat = lambda x: x.reshape(S)[:S0]
    bs, bva, bvb = flat(st["bs"]), flat(st["bva"]), flat(st["bvb"])
    none = bs <= 0
    zed = jnp.zeros_like(bs)
    d = jnp.where(none, zed, (bva + bvb - bs) // diff_cost)
    out = (jnp.where(none, zed, bva), jnp.where(none, zed, bvb),
           d, jnp.where(none, zed, bs))
    return out + (flat(st["active"]) != 0,) if with_active else out


def _to_tiles_inv(x, S):
    return x.reshape(S)


# --- trace kernel ------------------------------------------------------------

def _trace_chunk_kernel(sc_ref, aT_ref, bT_ref, VP_ref, VN_ref,
                        Db_ref, vbb_ref, segr_ref, live_ref, blim_ref,
                        alim_ref, done_ref, prev_ref,
                        VP_o, VN_o, Db_o, vbb_o, dcom_o, vbcom_o, *,
                        TS: int):
    """One trace segment chunk: TS lockstep rows with per-seed
    freezing, then the commit-point selection of
    ops.wave_bp.trace_wave_bp's tail (without the trace scatter, which
    stays in JAX)."""
    vbb = vbb_ref[:]
    blim = blim_ref[:]
    seg_rows = segr_ref[:]
    live = live_ref[:] != 0
    PH, PL, PV = _init_planes(bT_ref, vbb - 1, blim)

    def row(r, carry):
        VPi, VNi, Db, PHi, PLi, PVi = carry
        VP, VN = _cu32(VPi), _cu32(VNi)
        PH, PL, PV = _cu32(PHi), _cu32(PLi), _cu32(PVi)
        go = r < seg_rows
        x = _char_at(aT_ref, r)
        Eq = _eq_bits(PH, PL, PV, x)
        VPn, VNn, Dbn, _ = _row_step(VP, VN, Db, Db, Eq)
        nbp = vbb + r + BW - 1
        nb = _char_at(bT_ref, r + BW)
        PHn, PLn, PVn = _shift_planes(PH, PL, PV, nb,
                                      (nbp >= 0) & (nbp < blim))
        gu = jnp.uint32(0) - _u(go)
        VP = (VPn & gu) | (VP & ~gu)
        VN = (VNn & gu) | (VN & ~gu)
        Db = jnp.where(go, Dbn, Db)
        PH = (PHn & gu) | (PH & ~gu)
        PL = (PLn & gu) | (PL & ~gu)
        PV = (PVn & gu) | (PV & ~gu)
        return _c32(VP), _c32(VN), Db, _c32(PH), _c32(PL), _c32(PV)

    VPi, VNi, Db, _, _, _ = jax.lax.fori_loop(
        0, TS, row, (_c32(VP_ref[:]), _c32(VN_ref[:]), Db_ref[:],
                     _c32(PH), _c32(PL), _c32(PV)))
    VP, VN = _cu32(VPi), _cu32(VNi)
    # ---- commit-point selection ----
    done = done_ref[:]
    alim = alim_ref[:]
    prev_vb = prev_ref[:]
    va = done + seg_rows
    at_end = live & (va == alim)
    vbb_end = vbb + seg_rows - 1
    _, _, jmin, dsel, dend = _band_scan(
        VP, VN, Db, vbb_end, blim, live, 0, prev_vb=prev_vb,
        want_score=False, want_end=True)
    j_end = jnp.clip(blim - vbb_end, 0, BW - 1)
    j_com = jnp.where(at_end, j_end, jmin)
    vb_com = jnp.clip(vbb_end + j_com, prev_vb, blim)
    d_com = jnp.where(at_end, dend, dsel)
    d_com = jnp.where(d_com >= INF_I, alim + blim, d_com)
    # reset band at the committed column for live seeds
    vnw = jnp.uint32((1 << (CTR + 1)) - 1)
    vpw = MASKW ^ vnw
    gu = jnp.uint32(0) - _u(live)
    VP_o[:] = (jnp.full_like(VP, vpw) & gu) | (VP & ~gu)
    VN_o[:] = (jnp.full_like(VN, vnw) & gu) | (VN & ~gu)
    Db_o[:] = jnp.where(live, CTR + 1, Db)
    vbb_o[:] = jnp.where(live, vb_com - CTR + 1, vbb)
    dcom_o[:] = d_com
    vbcom_o[:] = vb_com


@functools.partial(jax.jit, static_argnames=("tspace", "max_segs",
                                             "L", "W", "SB", "packed"))
def trace_wave_bp_pl(a_bases, b_bases, astart, bstart, abpos, bbpos,
                     alim, blim, tspace: int = 100,
                     max_segs: int = 660, L: int = 128,
                     W: int = 128, SB: int = 256,
                     packed: bool = False):
    """Pallas drop-in for ops.wave_bp.trace_wave_bp (same returns,
    bit-identical outputs).  packed: see extend_wave_bp_pl."""
    S0 = abpos.shape[0]
    SBLK = 8 * L
    S = -(-S0 // SBLK) * SBLK
    if S != S0:
        pad = lambda x: jnp.pad(x, (0, S - S0))
        astart, bstart = pad(astart), pad(bstart)
        abpos, bbpos = pad(abpos), pad(bbpos)
        alim, blim = pad(alim), pad(blim)
    a_words = a_bases if packed else _pack_bases(a_bases)
    b_words = b_bases if packed else _pack_bases(b_bases)
    aorigin = astart + abpos
    borigin = bstart + bbpos

    def seg_rows_of(done):
        a = abpos + done
        nxt = (a // tspace + 1) * tspace - a
        return jnp.minimum(nxt, alim - done)

    VP0, VN0, Db0 = _vinit_words((S // L, L))
    z = jnp.zeros(S, jnp.int32)
    state = dict(VP=VP0, VN=VN0, Db=Db0,
                 vbb=jnp.full((S // L, L), 1 - CTR, jnp.int32),
                 done=z, nseg=z, prev_vb=z, dsum=z)
    kernel = functools.partial(_trace_chunk_kernel, TS=tspace)
    alim_t = _to_tiles(alim.astype(jnp.int32), S, L)
    blim_t = _to_tiles(blim.astype(jnp.int32), S, L)
    tt = lambda x: _to_tiles(x, S, L)

    def body(st, _):
        live = st["done"] < alim
        seg_rows = jnp.where(live, seg_rows_of(st["done"]), 0)
        vbb_f = st["vbb"].reshape(S)
        a_tile = _gather_packed_words(a_words, aorigin, st["done"],
                                      tspace, False)
        b_tile = _gather_packed_words(b_words, borigin, vbb_f - 1,
                                      tspace + BW, False)
        outs = _grid_call(
            kernel, -(-tspace // 16), -(-(tspace + BW) // 16), S, L,
            (st["VP"], st["VN"], st["Db"], st["vbb"], tt(seg_rows),
             tt(live.astype(jnp.int32)), blim_t, alim_t,
             tt(st["done"]), tt(st["prev_vb"])),
            _to_rows(a_tile, S, L), _to_rows(b_tile, S, L),
            jnp.array([0, tspace], jnp.int32), n_out=6)
        VP, VN, Db, vbb, d_com_t, vb_com_t = outs
        d_com = d_com_t.reshape(S)
        vb_com = vb_com_t.reshape(S)
        bspan = vb_com - st["prev_vb"]
        # commits are stacked scan outputs (lockstep: a live seed's
        # k-th iteration is its k-th segment) — carrying a
        # [S, max_segs, 2] buffer through the loop made every
        # iteration pay a buffer-scale scatter (see wave_bp twin)
        out = (jnp.where(live, d_com, 0), jnp.where(live, bspan, 0))
        return dict(
            VP=VP, VN=VN, Db=Db, vbb=vbb,
            done=st["done"] + seg_rows,
            nseg=jnp.where(live, st["nseg"] + 1, st["nseg"]),
            prev_vb=jnp.where(live, vb_com, st["prev_vb"]),
            dsum=jnp.where(live, st["dsum"] + d_com, st["dsum"])), out

    st, (ds, bs) = jax.lax.scan(body, state, None, length=max_segs)
    trace = jnp.stack([ds, bs], axis=-1).transpose(1, 0, 2)
    return trace[:S0], st["nseg"][:S0], st["dsum"][:S0]


extend_wave_bp_pl.takes_packed = True
trace_wave_bp_pl.takes_packed = True
extend_wave_bp_pl.supports_active = True
