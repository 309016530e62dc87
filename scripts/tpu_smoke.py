"""Real-TPU smoke of the Pallas kernels vs their pure-JAX twins.

VERDICT.md round-1 weak #2: the Pallas kernels had only ever run in
interpret mode on CPU; a Mosaic rejection on real hardware would
invalidate the "TPU production path" claim.  This script runs, on the
DEFAULT backend (the tunneled TPU when alive):

  1. extend_wave_pl  vs extend_wave    (lane-per-diagonal wide layout;
     exercises the Pallas dp_rows kernel through its production entry)
  2. trace_wave_pl   vs trace_wave
  3. extend_wave_bp  vs native C bp_extend_batch (bit-identical
     contract: the C replicas are lockstep twins of the JAX bp math)
  4. trace_wave_bp   vs native C bp_trace_batch

and writes a JSON artifact (default TPU_SMOKE.json) with pass/fail and
wall times.  Mismatches print per-field diffs.  Run with a wall budget
from the caller; compiles are the dominant cost (~20-40 s each).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(out_path: str = "TPU_SMOKE.json") -> int:
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    from damar_tpu.utils.sim import mutate
    from damar_tpu.ops.wave import extend_wave, trace_wave
    from damar_tpu.ops import wave_pallas as wp
    from damar_tpu.ops import wave_bp as wb

    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    res = {"backend": backend, "device": dev, "steps": {}}
    print(f"# backend={backend} device={dev} "
          f"(init {time.time()-t0:.1f}s)", flush=True)

    rng = np.random.default_rng(3)
    core = rng.integers(0, 4, 1500).astype(np.uint8)
    A = np.concatenate([rng.integers(0, 4, 300).astype(np.uint8),
                        mutate(core, 0.14, rng)])
    B = np.concatenate([mutate(core, 0.14, rng),
                        rng.integers(0, 4, 300).astype(np.uint8)])
    ka = {}
    for i in range(len(A) - 16):
        ka.setdefault(bytes(A[i:i + 16]), i)
    anchors = [(i, j) for j in range(len(B) - 16)
               if (i := ka.get(bytes(B[j:j + 16]))) is not None
               and abs((i - 300) - j) < 300]
    assert anchors

    def record(name, fn):
        t = time.time()
        try:
            fn()
            res["steps"][name] = {"ok": True,
                                  "wall_s": round(time.time() - t, 2)}
            print(f"# {name}: OK ({time.time()-t:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — smoke records failures
            res["steps"][name] = {"ok": False, "error": repr(e)[:2000],
                                  "wall_s": round(time.time() - t, 2)}
            print(f"# {name}: FAIL ({time.time()-t:.1f}s): {e!r}",
                  flush=True)

    S = 40
    ao = np.zeros(S, np.int32); bo = np.zeros(S, np.int32)
    af = np.zeros(S, np.int32); bf = np.zeros(S, np.int32)
    for k, (i, j) in enumerate(anchors[:S]):
        ao[k], bo[k] = i, j
        af[k], bf[k] = len(A) - i, len(B) - j
    args = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(ao),
            jnp.asarray(bo), jnp.asarray(af), jnp.asarray(bf))
    rargs = args[:4] + (jnp.asarray(ao), jnp.asarray(bo))

    def cmp(tag, r1, r2, names):
        for name, x, y in zip(names, r1, r2):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{tag} {name}")

    def step_extend_pl():
        for rev, a in ((False, args), (True, rargs)):
            cmp(f"extend_pl[rev={rev}]",
                jax.block_until_ready(extend_wave(*a, reverse=rev)),
                jax.block_until_ready(wp.extend_wave_pl(*a, reverse=rev)),
                ("va", "vb", "d", "score"))

    from damar_tpu import native
    kw = dict(R=128, max_rows=65536, diff_cost=5, xdrop=60)

    def step_extend_bp():
        for rev, (ca, cb) in ((False, (af, bf)), (True, (ao, bo))):
            rv = np.full(S, rev, bool)
            nat = native.bp_extend_batch(A, B, ao, bo, ca, cb, rv, **kw)
            dev = jax.block_until_ready(wb.extend_wave_bp(
                jnp.asarray(A), jnp.asarray(B), jnp.asarray(ao),
                jnp.asarray(bo), jnp.asarray(ca), jnp.asarray(cb),
                dirs=jnp.asarray(rv), **kw))
            cmp(f"extend_bp[rev={rev}]", dev, nat,
                ("va", "vb", "d", "score"))

    St = 12
    z = jnp.zeros(St, jnp.int32)
    abp = jnp.full((St,), 310, jnp.int32)
    bbp = jnp.full((St,), 12, jnp.int32)
    al = np.zeros(St, np.int32); bl = np.zeros(St, np.int32)
    al[:4] = min(len(A) - 310, 1200)
    bl[:4] = min(len(B) - 12, 1230)
    targs = (jnp.asarray(A), jnp.asarray(B), z, z, abp, bbp,
             jnp.asarray(al), jnp.asarray(bl))

    def step_trace_pl():
        cmp("trace_pl", jax.block_until_ready(trace_wave(*targs)),
            jax.block_until_ready(wp.trace_wave_pl(*targs)),
            ("trace", "nseg", "dsum"))

    def step_trace_bp():
        zn = np.zeros(St, np.int32)
        nat = native.bp_trace_batch(A, B, zn, zn,
                                    np.asarray(abp), np.asarray(bbp),
                                    al, bl, tspace=100, max_segs=660)
        dev = jax.block_until_ready(wb.trace_wave_bp(*targs))
        cmp("trace_bp", dev, nat, ("trace", "nseg", "dsum"))

    from damar_tpu.ops import wave_bp_pallas as wbp

    def step_extend_bp_pl():
        for rev, (ca, cb) in ((False, (af, bf)), (True, (ao, bo))):
            rv = np.full(S, rev, bool)
            nat = native.bp_extend_batch(A, B, ao, bo, ca, cb, rv, **kw)
            dev = jax.block_until_ready(wbp.extend_wave_bp_pl(
                jnp.asarray(A), jnp.asarray(B), jnp.asarray(ao),
                jnp.asarray(bo), jnp.asarray(ca), jnp.asarray(cb),
                dirs=jnp.asarray(rv), **kw))
            cmp(f"extend_bp_pl[rev={rev}]", dev, nat,
                ("va", "vb", "d", "score"))

    def step_trace_bp_pl():
        zn = np.zeros(St, np.int32)
        nat = native.bp_trace_batch(A, B, zn, zn,
                                    np.asarray(abp), np.asarray(bbp),
                                    al, bl, tspace=100, max_segs=660)
        dev = jax.block_until_ready(wbp.trace_wave_bp_pl(
            *targs, tspace=100, max_segs=660))
        cmp("trace_bp_pl", dev, nat, ("trace", "nseg", "dsum"))

    record("extend_wave_pl", step_extend_pl)
    record("trace_wave_pl", step_trace_pl)
    record("extend_wave_bp", step_extend_bp)
    record("trace_wave_bp", step_trace_bp)
    record("extend_wave_bp_pallas", step_extend_bp_pl)
    record("trace_wave_bp_pallas", step_trace_bp_pl)

    res["ok"] = all(s["ok"] for s in res["steps"].values())
    res["wall_s"] = round(time.time() - t0, 2)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v.get("ok") for k, v in res["steps"].items()}))
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
