"""200 Mbp block-unit HBM diagnosis: pass-1 succeeds, pass-2 seeding
OOMs on the 16 GB chip.  Measures device memory_stats (if the axon
backend exposes them) after each phase and walks an eviction ladder to
find the minimal cross-pass residency that fits:

  L0  keep everything (the steady-state ideal)
  L1  + drop rc-block dev arrays (rebuilt/uploaded at extension)
  L2  + drop read_id dev array (only needed to BUILD the cached index)
  L3  full release_device_buffers (pass == cold pass; this fit once)

Block arrays are cached to /tmp/damar_200m_block.npz so iterations
skip the 72 s simulation.

Usage: python scripts/probe_200m_mem.py [--genome N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/damar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from damar_tpu.core.blocks import block_from_reads
from damar_tpu.core.config import OverlapConfig
from damar_tpu.pipeline import overlap as ov


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


GENOME = _arg("--genome", 10_000_000)
CACHE = f"/tmp/damar_200m_block_{GENOME}.npz"

t0 = time.time()
if os.path.exists(CACHE):
    z = np.load(CACHE)
    lens = z["lens"]
    flat = z["flat"]
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
total_bp = sum(len(r) for r in reads)
print(f"# {len(reads)} reads, {total_bp/1e6:.0f} Mbp, cap {blk.cap}, "
      f"setup {time.time()-t0:.1f}s", file=sys.stderr, flush=True)


def mem(tag):
    try:
        s = jax.devices()[0].memory_stats()
        used = s.get("bytes_in_use", 0) / 1e9
        peak = s.get("peak_bytes_in_use", 0) / 1e9
        print(f"# mem[{tag}]: in_use {used:.2f} GB, peak {peak:.2f} GB",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"# mem[{tag}]: unavailable ({type(e).__name__})",
              file=sys.stderr, flush=True)


cfg = OverlapConfig()
hints: dict = {}
kw = dict(hit_cap=1 << 28, seed_cap=1 << 23, emit_mirrors=False,
          size_hints=hints)

mem("start")
t0 = time.time()
la, lb, st = ov.overlap_block_pair(blk, blk, cfg, self_block=True, **kw)
al = int(la.a_spans().sum())
print(f"# pass1(+compile+upload): {time.time()-t0:.1f}s, {la.novl} "
      f"ovls, {al/1e9:.2f} Gbp aligned, hints {hints}",
      file=sys.stderr, flush=True)
mem("after-pass1")


def evict(level):
    if level >= 1:
        # drop the rc block's device arrays (cached as 'rc_block' by
        # _rc_cached; generic scan keeps this robust to key changes)
        for k, v in list(blk.cache.items()):
            if hasattr(v, "cache"):
                v.cache.pop("dev_arrs", None)
    if level >= 2:
        blk.cache.get("dev_arrs", {}).pop("read_id", None)
    if level >= 3:
        ov.release_device_buffers(blk)


for level in (0, 1, 2, 3):
    evict(level)
    mem(f"evict-L{level}")
    t0 = time.time()
    try:
        la, lb, st = ov.overlap_block_pair(blk, blk, cfg,
                                           self_block=True, **kw)
    except Exception as e:
        print(f"# pass2 @L{level}: FAIL {type(e).__name__} after "
              f"{time.time()-t0:.1f}s", file=sys.stderr, flush=True)
        continue
    wall = time.time() - t0
    al = int(la.a_spans().sum())
    print(f"# pass2 @L{level}: {wall:.2f}s, {al/1e9:.2f} Gbp = "
          f"{al/wall/1e9:.4f} Gbp/s, stats "
          f"{ {k: v for k, v in st.items() if k.startswith('t_')} }",
          file=sys.stderr, flush=True)
    mem(f"after-pass2-L{level}")
    break

from damar_tpu.formats.las import check_las
errs = check_las(la, blk.rlen)
print(f"# check_las: {'CLEAN' if not errs else errs[:3]}",
      file=sys.stderr, flush=True)
