"""Pallas kernel vs pure-JAX reference: outputs must match exactly
(interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from damar_tpu.ops.wave import extend_wave, trace_wave
from damar_tpu.ops.wave_pallas import extend_wave_pl, trace_wave_pl
from damar_tpu.utils.sim import mutate


@pytest.fixture(scope="module")
def noisy_pair():
    rng = np.random.default_rng(3)
    core = rng.integers(0, 4, 1500).astype(np.uint8)
    A = np.concatenate([rng.integers(0, 4, 300).astype(np.uint8),
                        mutate(core, 0.14, rng)])
    B = np.concatenate([mutate(core, 0.14, rng),
                        rng.integers(0, 4, 300).astype(np.uint8)])
    ka = {}
    for i in range(len(A) - 16):
        ka.setdefault(bytes(A[i:i + 16]), i)
    anchors = []
    for j in range(len(B) - 16):
        i = ka.get(bytes(B[j:j + 16]))
        if i is not None and abs((i - 300) - j) < 300:
            anchors.append((i, j))
    assert anchors
    return A, B, anchors


class TestPallasDifferential:
    def test_extend_matches(self, noisy_pair):
        A, B, anchors = noisy_pair
        S = 40  # deliberately not a multiple of the seed block
        ao = np.zeros(S, np.int32)
        bo = np.zeros(S, np.int32)
        af = np.zeros(S, np.int32)
        bf = np.zeros(S, np.int32)
        for k, (i, j) in enumerate(anchors[:S]):
            ao[k], bo[k] = i, j
            af[k], bf[k] = len(A) - i, len(B) - j
        args = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(ao),
                jnp.asarray(bo), jnp.asarray(af), jnp.asarray(bf))
        for rev in (False, True):
            if rev:
                args = args[:4] + (jnp.asarray(ao), jnp.asarray(bo))
            r1 = extend_wave(*args, reverse=rev)
            r2 = extend_wave_pl(*args, reverse=rev)
            for name, x, y in zip(("va", "vb", "d", "score"), r1, r2):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y),
                    err_msg=f"extend[rev={rev}] {name}")

    def test_trace_matches(self, noisy_pair):
        A, B, anchors = noisy_pair
        S = 12
        z = jnp.zeros(S, jnp.int32)
        abp = jnp.full((S,), 310, jnp.int32)
        bbp = jnp.full((S,), 12, jnp.int32)
        al = np.zeros(S, np.int32)
        bl = np.zeros(S, np.int32)
        al[:4] = min(len(A) - 310, 1200)
        bl[:4] = min(len(B) - 12, 1230)
        args = (jnp.asarray(A), jnp.asarray(B), z, z, abp, bbp,
                jnp.asarray(al), jnp.asarray(bl))
        t1 = trace_wave(*args)
        t2 = trace_wave_pl(*args)
        for name, x, y in zip(("trace", "nseg", "dsum"), t1, t2):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"trace {name}")
