"""Differential and property tests for the banded-DP alignment kernels
(SURVEY.md §7 'Hard parts' #1: kernel vs scalar-model equivalence)."""
import numpy as np
import jax.numpy as jnp
import pytest

from damar_tpu.ops.wave import extend_wave, trace_wave
from damar_tpu.utils.sim import mutate

W = 128
S = 32


def lev(a, b):
    """Exact Levenshtein distance (scalar oracle)."""
    prev = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = np.empty(len(b) + 1, int)
        cur[0] = i
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[-1]


class TestExtend:
    def test_perfect_overlap_reaches_ends(self, rng):
        g = rng.integers(0, 4, 6000).astype(np.uint8)
        A, B = g[0:3000], g[2000:5000]
        ao = jnp.array([2500] * S, jnp.int32)
        bo = jnp.array([500] * S, jnp.int32)
        live = np.zeros(S, np.int32)
        live[0] = 1
        va, vb, d, sc = extend_wave(
            jnp.asarray(A), jnp.asarray(B), ao, bo,
            jnp.asarray(live * 500), jnp.asarray(live * 2500),
            reverse=False, W=W)
        assert int(va[0]) == 500 and int(vb[0]) == 500 and int(d[0]) == 0
        # padded slots stay at zero
        assert int(va[1]) == 0

        va, vb, d, _ = extend_wave(
            jnp.asarray(A), jnp.asarray(B), ao, bo,
            jnp.asarray(live * 2500), jnp.asarray(live * 500),
            reverse=True, W=W)
        assert int(va[0]) == 500 and int(vb[0]) == 500 and int(d[0]) == 0

    def test_noisy_overlap_extends_through_errors(self):
        import numpy as np
        rng = np.random.default_rng(1234)  # own rng: test is
        # sensitive to the sample; shared fixture state made it
        # order-dependent
        core = rng.integers(0, 4, 3000).astype(np.uint8)
        A = np.concatenate([rng.integers(0, 4, 500).astype(np.uint8),
                            mutate(core, 0.14, rng)])
        B = np.concatenate([mutate(core, 0.14, rng),
                            rng.integers(0, 4, 600).astype(np.uint8)])
        # anchor on an exact shared 16-mer on a plausible diagonal
        # (A position ~ B position + 1000) near the overlap middle
        ka = {}
        for i in range(len(A) - 16):
            ka.setdefault(bytes(A[i:i + 16]), i)
        anchor = None
        for j in range(600, len(B) - 616):
            i = ka.get(bytes(B[j:j + 16]))
            if i is not None and abs((i - 500) - j) < 400:
                anchor = (i, j)
                break
        assert anchor, "no shared 16-mer found (mutation too heavy?)"
        ia, ib = anchor
        ao = jnp.array([ia] * S, jnp.int32)
        bo = jnp.array([ib] * S, jnp.int32)
        live = np.zeros(S, np.int32)
        live[0] = 1
        va, vb, d, _ = extend_wave(
            jnp.asarray(A), jnp.asarray(B), ao, bo,
            jnp.asarray(live * (len(A) - ia)),
            jnp.asarray(live * (len(B) - ib)), reverse=False, W=W)
        # must reach the end of A (within the noise tail tolerance)
        assert int(va[0]) >= (len(A) - ia) - 40
        # must NOT extend deep into B's random tail
        blen_core = len(B) - 600
        assert int(vb[0]) <= (blen_core - ib) + 60
        # error estimate in the right ballpark (~0.25 pair rate)
        rate = int(d[0]) / max(int(va[0]), 1)
        assert 0.1 < rate < 0.35

    def test_xdrop_stops_in_random_sequence(self, rng):
        A = rng.integers(0, 4, 4000).astype(np.uint8)
        B = rng.integers(0, 4, 4000).astype(np.uint8)
        ao = jnp.array([0] * S, jnp.int32)
        bo = jnp.array([0] * S, jnp.int32)
        live = np.zeros(S, np.int32)
        live[0] = 1
        va, vb, d, _ = extend_wave(
            jnp.asarray(A), jnp.asarray(B), ao, bo,
            jnp.asarray(live * 4000), jnp.asarray(live * 4000),
            reverse=False, W=W)
        assert int(va[0]) < 500, "extension ran away through random seq"


class TestTrace:
    def test_single_segment_exact(self, rng):
        """Recorded diffs == exact Levenshtein when the full span is one
        segment with a forced endpoint."""
        n = 16
        A = rng.integers(0, 4, (n, 100)).astype(np.uint8)
        Bl = [mutate(A[i], 0.25, rng) for i in range(n)]
        bspan = np.array([min(len(b), 160) for b in Bl])
        maxb = 200
        Barr = np.zeros((n, maxb), np.uint8)
        for i, b in enumerate(Bl):
            Barr[i, :min(len(b), maxb)] = b[:maxb]
        basesA = jnp.asarray(A.reshape(-1))
        basesB = jnp.asarray(Barr.reshape(-1))
        tr, nseg, dsum = trace_wave(
            basesA, basesB,
            jnp.arange(n, dtype=jnp.int32) * 100,
            jnp.arange(n, dtype=jnp.int32) * maxb,
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.full(n, 100, jnp.int32), jnp.asarray(bspan, jnp.int32),
            tspace=100, W=W)
        tr = np.asarray(tr)
        for i in range(n):
            assert int(nseg[i]) == 1
            assert int(tr[i, 0, 1]) == bspan[i]
            assert int(tr[i, 0, 0]) == lev(A[i], Barr[i, :bspan[i]])

    def test_multisegment_consistency(self, rng):
        """Multi-segment traces: correct segment count, b-span total,
        per-segment diffs >= |aspan - bspan| and <= exact lev + slack."""
        core = rng.integers(0, 4, 1200).astype(np.uint8)
        A = core
        # substitutions only: the test forces the trace through the
        # endpoint (alim, blim), which must be a REACHABLE alignment
        # endpoint; with indels the arbitrary 'len(B)-30' b-span can
        # exceed the band at the final forced commit (the driver drops
        # such records; here we want the exactness property instead)
        B = mutate(core, 0.2, rng, ins_frac=0.0, del_frac=0.0)
        abpos, aepos = 37, 1163
        # align the exact A interval against the whole of B
        basesA = jnp.asarray(A)
        basesB = jnp.asarray(B)
        n = 8
        z = jnp.zeros(n, jnp.int32)
        live = np.zeros(n, np.int32)
        live[0] = 1
        # with substitution-only noise, A and B are positionally
        # aligned: the true alignment of A[abpos, aepos) is exactly
        # B[abpos, aepos) — the trace starts ON the committed path
        tr, nseg, dsum = trace_wave(
            basesA, basesB, z, z,
            jnp.full(n, abpos, jnp.int32),
            jnp.asarray(live * abpos),
            jnp.asarray(live * (aepos - abpos)),
            jnp.asarray(live * (aepos - abpos)),
            tspace=100, W=W)
        from damar_tpu.formats.las import n_segments
        ns = int(nseg[0])
        assert ns == n_segments(abpos, aepos, 100)
        t = np.asarray(tr)[0, :ns]
        assert int(t[:, 1].sum()) == aepos - abpos  # == blim (b-span)
        assert int(t[:, 0].sum()) == int(dsum[0])
        a0, b0 = abpos, abpos
        for s in range(ns):
            a1 = min((a0 // 100 + 1) * 100, aepos)
            d, bs = int(t[s, 0]), int(t[s, 1])
            assert d >= abs((a1 - a0) - bs)
            exact = lev(A[a0:a1], B[b0:b0 + bs])
            assert d == exact, f"seg {s}: {d} != {exact}"
            a0, b0 = a1, b0 + bs
