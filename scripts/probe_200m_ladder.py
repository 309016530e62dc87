"""200 Mbp pass-2 OOM ladder, one FRESH PROCESS per eviction level.

r4's probe_200m_mem walked its eviction ladder in ONE process: after
the first OOM the axon backend is poisoned (even a fully-evicted pass
fails in 0.8 s), so levels L1+ never measured anything.  Here the
parent runs each level in a subprocess (fresh backend) and stops at
the first level whose pass 2 succeeds.

Levels (cumulative):
  L0  keep everything — WORKS with sliced seeding (r5): pass 2 52.3 s
      with the index resident; the production default
  L1  + drop packed-word caches on blk and its rc twin (on-device
      rebuild is one cheap repack per pass)
  L2  + drop the rc twin's dev arrays entirely (re-upload ~27 s at
      9 MB/s unless rebuilt on device)
  L3  full release_device_buffers (index rebuild per pass; 111.8 s —
      what DAMAR_HUGE_RELEASE=1 restores)

History: with the UNSLICED pipeline (pre-r5) L0-L2 all OOMed and only
L3 ran — seeding's peak left no residency headroom.  The sliced
pipeline (ops/seeding._find_seeds_sliced) bounds the working sets and
flipped the answer to L0.

Usage:  python scripts/probe_200m_ladder.py            # parent
        python scripts/probe_200m_ladder.py --level N  # one level
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

GENOME = 10_000_000
CACHE = f"/tmp/damar_200m_block_{GENOME}.npz"


def run_level(level: int) -> None:
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/damar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from damar_tpu.core.blocks import block_from_reads
    from damar_tpu.core.config import OverlapConfig
    from damar_tpu.pipeline import overlap as ov

    t0 = time.time()
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        lens, flat = z["lens"], z["flat"]
        reads = [flat[o:o + n] for o, n in
                 zip(np.concatenate([[0], np.cumsum(lens[:-1])]), lens)]
    else:
        from damar_tpu.utils.sim import make_genome, sample_reads
        g = make_genome(GENOME, seed=2024)
        sim = sample_reads(g, coverage=20.0, mean_len=6_000, err=0.14,
                           seed=2025)
        reads = sim.reads
        np.savez(CACHE, lens=np.array([len(r) for r in reads]),
                 flat=np.concatenate(reads))
    blk = block_from_reads(reads)
    print(f"# L{level}: {len(reads)} reads, cap {blk.cap}, setup "
          f"{time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    cfg = OverlapConfig()
    hints: dict = {}
    kw = dict(hit_cap=1 << 28, seed_cap=1 << 23, emit_mirrors=False,
              size_hints=hints)
    t0 = time.time()
    la, _, st = ov.overlap_block_pair(blk, blk, cfg, self_block=True,
                                      **kw)
    print(f"# L{level} pass1: {time.time()-t0:.1f}s, {la.novl} ovls, "
          f"hints {hints}", file=sys.stderr, flush=True)

    if level >= 1:
        for b in [blk] + [v for v in blk.cache.values()
                          if hasattr(v, "cache")]:
            b.cache.get("dev_arrs", {}).pop("words", None)
    if level >= 2:
        for v in blk.cache.values():
            if hasattr(v, "cache"):
                v.cache.pop("dev_arrs", None)
    if level >= 3:
        ov.release_device_buffers(blk)

    t0 = time.time()
    la, _, st = ov.overlap_block_pair(blk, blk, cfg, self_block=True,
                                      **kw)
    wall = time.time() - t0
    al = int(la.a_spans().sum())
    print(f"# L{level} pass2: {wall:.2f}s, {al/1e9:.2f} Gbp = "
          f"{al/wall/1e9:.4f} Gbp/s, stats "
          f"{ {k: v for k, v in st.items() if k.startswith('t_') or 'retr' in k or k == 'dropped_trace'} }",
          file=sys.stderr, flush=True)
    from damar_tpu.formats.las import check_las
    errs = check_las(la, blk.rlen)
    print(f"# L{level} check_las: {'CLEAN' if not errs else errs[:3]}",
          file=sys.stderr, flush=True)


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


if __name__ == "__main__":
    if "--level" in sys.argv:
        run_level(_arg("--level", 0))
        sys.exit(0)
    for level in (1, 2, 3, 0):
        print(f"## trying level {level}", file=sys.stderr, flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--level", str(level)], timeout=1800)
        if r.returncode == 0:
            print(f"## level {level} SUCCEEDED", file=sys.stderr)
            break
        print(f"## level {level} failed (rc {r.returncode})",
              file=sys.stderr, flush=True)
