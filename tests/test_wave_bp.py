"""Bit-parallel wave kernel tests (ops.wave_bp).

Layers:
  1. exact row-step equivalence against a brute-force banded DP with
     identical boundary conventions (V-init, virtual-top +1, base
     D'[-1] = D[0] + 1) — the carry-trick algebra must match cell for
     cell;
  2. extension parity against the lane-per-diagonal reference kernel
     (ops.wave.extend_wave) on realistic mutated-overlap cases with
     exact anchors: near-equal scores, all extensions reaching ends;
  3. trace self-consistency: per-record b-span sums equal the forced
     endpoints and diff totals track the reference kernel.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from damar_tpu.ops.wave import extend_wave, trace_wave
from damar_tpu.ops.wave_bp import (BW, CTR, _pack_bits, _reconstruct,
                                   _row_step, _vinit, extend_wave_bp,
                                   trace_wave_bp)


def brute_rows(subs):
    """Reference banded recurrence over one seed: subs [ROWS, BW]."""
    D = np.abs(np.arange(BW) - CTR)
    hist = []
    for r in range(len(subs)):
        Dv = np.append(D, D[-1] + 1)
        T = np.minimum(D + subs[r], Dv[1:] + 1)
        Dp = np.empty(BW, np.int64)
        prev = D[0] + 1
        for j in range(BW):
            prev = min(T[j], prev + 1)
            Dp[j] = prev
        D = Dp
        hist.append(D.copy())
    return np.array(hist)


class TestRowStep:
    def test_exact_vs_brute_force(self):
        rng = np.random.default_rng(0)
        S, ROWS = 32, 120
        subs = (rng.random((ROWS, S, BW)) < 0.3).astype(np.int32)
        truth = np.stack([brute_rows(subs[:, i]) for i in range(S)], 1)
        VP, VN, Db, Dc = _vinit(S)
        for r in range(ROWS):
            Eq = _pack_bits(jnp.asarray(1 - subs[r]))
            VP, VN, Db, Dc, _ = _row_step(VP, VN, Db, Dc, Eq)
            Dw = np.asarray(_reconstruct(VP, VN, Db))
            assert np.array_equal(Dw, truth[r]), f"row {r}"
            assert np.array_equal(np.asarray(Dc), truth[r][:, CTR])

    def test_all_match_and_all_mismatch(self):
        S = 4
        VP, VN, Db, Dc = _vinit(S)
        ones = jnp.full(S, jnp.uint32(0xFFFFFFFF))
        for r in range(10):
            VP, VN, Db, Dc, _ = _row_step(VP, VN, Db, Dc, ones)
        Dw = np.asarray(_reconstruct(VP, VN, Db))
        # pure diagonal matches: center stays 0
        assert (Dw[:, CTR] == 0).all()
        VP, VN, Db, Dc = _vinit(S)
        zero = jnp.zeros(S, jnp.uint32)
        for r in range(10):
            VP, VN, Db, Dc, _ = _row_step(VP, VN, Db, Dc, zero)
        Dw = np.asarray(_reconstruct(VP, VN, Db))
        assert (Dw[:, CTR] == 10).all()


def _mutate_map(rng, seq, err):
    out, amap = [], []
    for c in seq:
        r = rng.random()
        if r < err * 0.4:
            amap.append(len(out))
            out.append((c + rng.integers(1, 4)) % 4)
        elif r < err * 0.7:
            out.append(rng.integers(0, 4))
            amap.append(len(out))
            out.append(c)
        elif r < err:
            amap.append(-1)
        else:
            amap.append(len(out))
            out.append(c)
    return np.array(out, np.uint8), amap


@pytest.fixture(scope="module")
def overlap_cases():
    rng = np.random.default_rng(1)
    S = 32
    a_all, b_all, ao, bo, alim, blim = [], [], [], [], [], []
    apos = bpos = 0
    for _ in range(S):
        L = int(rng.integers(1500, 3500))
        a = rng.integers(0, 4, L).astype(np.uint8)
        b, amap = _mutate_map(rng, a, 0.15)
        while True:
            anchor = int(rng.integers(100, L - 100))
            if amap[anchor] >= 0 and a[anchor] == b[amap[anchor]]:
                break
        a_all.append(a)
        b_all.append(b)
        ao.append(apos + anchor)
        bo.append(bpos + amap[anchor])
        alim.append(L - anchor)
        blim.append(len(b) - amap[anchor])
        apos += L
        bpos += len(b)
    mk = lambda v: jnp.asarray(np.array(v, np.int32))
    return (jnp.asarray(np.concatenate(a_all)),
            jnp.asarray(np.concatenate(b_all)),
            mk(ao), mk(bo), mk(alim), mk(blim)), np.array(alim)


class TestExtension:
    def test_score_parity_and_reach(self, overlap_cases):
        args, alim = overlap_cases
        _, _, _, s_ref = [np.asarray(x) for x in extend_wave(*args)]
        va, vb, d, s = [np.asarray(x) for x in extend_wave_bp(*args)]
        rel = s.astype(float) / np.maximum(s_ref, 1)
        assert rel.mean() > 0.98, rel.mean()
        assert rel.min() > 0.9, rel.min()
        # every true overlap must extend to (near) the read end
        assert (va >= alim - 64).all()
        # derived diffs are consistent: score = va + vb - 5 d
        assert np.array_equal(s, va + vb - 5 * d)

    def test_xdrop_stops_in_garbage(self):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 4, 4000).astype(np.uint8)
        b = a.copy()
        a[1000:1300] = rng.integers(0, 4, 300)      # long bad stretch
        mk = lambda v: jnp.asarray(np.array(v, np.int32))
        va, vb, d, s = [np.asarray(x) for x in extend_wave_bp(
            jnp.asarray(a), jnp.asarray(b), mk([100]), mk([100]),
            mk([3900]), mk([3900]))]
        assert va[0] <= 1000, va  # stopped at the corruption


class TestTrace:
    def test_bspan_and_diffs(self, overlap_cases):
        args, alim_np = overlap_cases
        a_b, b_b, ao, bo, alim, blim = args
        va, vb, d, s = [np.asarray(x) for x in extend_wave_bp(*args)]
        S = len(va)
        z = jnp.zeros(S, jnp.int32)
        al = jnp.asarray(va.astype(np.int32))
        bl = jnp.asarray(vb.astype(np.int32))
        tr, ns, ds = [np.asarray(x) for x in trace_wave_bp(
            a_b, b_b, ao, bo, z, z, al, bl, tspace=100, max_segs=64)]
        tr_r, ns_r, ds_r = [np.asarray(x) for x in trace_wave(
            a_b, b_b, ao, bo, z, z, al, bl, tspace=100, max_segs=64)]
        for i in range(S):
            assert tr[i, :ns[i], 1].sum() == vb[i]
            assert (tr[i, :ns[i], 1] >= 0).all()
        assert (ns == ns_r).all()
        # diff totals near the wide-band reference (greedy chaining on
        # a narrower band may cost slightly more)
        assert (ds <= ds_r * 1.2 + 10).all()


class TestTraceClamp:
    def test_commit_never_overruns_blim(self, rng):
        """A partially-alignable pair whose tail drifts past the band
        must still commit b coordinates inside [0, blim] (the kernel
        stays self-consistent; callers' checks catch the bad record)."""
        import jax.numpy as jnp
        from damar_tpu.ops.wave_bp import trace_wave_bp
        from damar_tpu.utils.sim import mutate
        r = np.random.default_rng(33)
        head = r.integers(0, 4, 150).astype(np.uint8)
        a = np.concatenate([head, r.integers(0, 4, 100).astype(np.uint8)])
        b = mutate(head, 0.1, r)          # B ends where A keeps going
        blim = len(b)
        tr, nseg, dsum = trace_wave_bp(
            jnp.asarray(a), jnp.asarray(b),
            jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
            jnp.array([len(a)], jnp.int32), jnp.array([blim], jnp.int32),
            tspace=100, max_segs=8)
        rows = np.asarray(tr)[0, :int(nseg[0])]
        assert rows[:, 1].min() >= 0
        assert rows[:, 1].sum() <= blim, rows.tolist()
