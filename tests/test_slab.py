"""ops/slab.py differential tests (interpret mode on CPU): the DMA
slab fill + char-align transpose must reproduce a plain numpy gather
— the fused kernels' correctness rests on this contract."""
import numpy as np
import pytest

from damar_tpu.ops.slab import align_transpose, fill_slab, slab_params


def _np_fill(pool, ws, W):
    return pool[np.asarray(ws)[:, None] + np.arange(W)[None, :]]


def _chars_of_words(words_row):
    u = words_row.astype(np.uint32)
    out = np.empty(len(u) * 16, np.uint8)
    for i in range(16):
        out[i::16] = (u >> (2 * i)) & 3
    return out


class TestFillSlab:
    def test_matches_numpy_gather(self):
        rng = np.random.default_rng(0)
        N, S, W = 1 << 14, 2048, 16
        pool = rng.integers(0, 1 << 30, N).astype(np.int32)
        ws = rng.integers(0, N - W, S).astype(np.int32)
        out = np.asarray(fill_slab(pool, ws, W, BS=1024))
        assert np.array_equal(out, _np_fill(pool, ws, W))

    def test_wide_windows(self):
        rng = np.random.default_rng(1)
        N, S, W = 1 << 15, 1024, 128
        pool = rng.integers(-(1 << 30), 1 << 30, N).astype(np.int32)
        ws = rng.integers(0, N - W, S).astype(np.int32)
        out = np.asarray(fill_slab(pool, ws, W, BS=1024))
        assert np.array_equal(out, _np_fill(pool, ws, W))


class TestAlignTranspose:
    def test_char_alignment(self):
        rng = np.random.default_rng(2)
        S, W, L = 256, 8, 128
        slab = rng.integers(0, 1 << 31, (S, W)).astype(np.int32)
        phase = rng.integers(0, 16, S).astype(np.int32)
        out = np.asarray(align_transpose(slab, phase, L=L))
        assert out.shape == (W, S // L, L)
        flat = out.transpose(1, 2, 0).reshape(S, W)
        for s in range(0, S, 37):
            want = _chars_of_words(slab[s])[phase[s]:]
            got = _chars_of_words(flat[s])[:len(want)]
            assert np.array_equal(got[:len(want)], want), s


class TestSlabParams:
    def test_origin_decomposition(self):
        origins = np.array([0, 15, 16, 17, 1000, 12345])
        ws, ph = slab_params(origins, 8, 1 << 12)
        assert np.array_equal(ws * 16 + ph, origins)
        ws2, ph2 = slab_params(np.array([(1 << 12) * 16 - 1]), 8,
                               1 << 12)
        assert ws2[0] == (1 << 12) - 8      # clamped into the pool
