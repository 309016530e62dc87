"""Probe the heterogeneous pipelined sweep's per-pass timing.

The round-4 full bench measured the pipelined x3 sweep at 50 s/pass
vs 17.35 s for the single-pass driver at 50 Mbp — the opposite of its
design goal (host trace hidden behind device phases).  This probe
times each phase of each pass separately: device wall (seed+extend+
dedupe on the main thread), emit wall (host C trace on the worker),
and the yield-to-yield wall the sweep actually delivers.

Usage:  python scripts/probe_pipelined.py [genome_bp] [passes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    genome = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/damar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from damar_tpu.core.blocks import block_from_reads
    from damar_tpu.core.config import OverlapConfig
    from damar_tpu.pipeline import overlap as ov
    from damar_tpu.utils.sim import make_genome, sample_reads

    g = make_genome(genome, seed=2024)
    sim = sample_reads(g, coverage=20.0, mean_len=6000, err=0.14,
                       seed=2025)
    blk = block_from_reads(sim.reads)
    cfg = OverlapConfig()
    hit_cap = 1 << 27 if genome > 1_000_000 else 1 << 25
    seed_cap = 1 << 21 if genome > 1_000_000 else 1 << 19
    hints: dict = {}
    kw = dict(hit_cap=hit_cap, seed_cap=seed_cap, emit_mirrors=False,
              size_hints=hints)
    t0 = time.time()
    ov.overlap_block_pair(blk, blk, cfg, self_block=True, **kw)
    print(f"# warmup {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    _, _, st = ov.overlap_block_pair(blk, blk, cfg, self_block=True,
                                     **kw)
    print(f"# single-pass wall {time.time()-t0:.2f}s stats {st}",
          flush=True)

    # pipelined sweep with per-phase walls
    import concurrent.futures as cf
    ex = cf.ThreadPoolExecutor(max_workers=1)
    pend = None
    t_sweep = time.time()
    for k in range(R):
        td = time.time()
        state = ov.overlap_pair_device(blk, blk, cfg, self_block=True,
                                       **kw)
        td = time.time() - td
        tw = time.time()
        if pend is not None:
            la, lb, pst = pend[1].result()
            print(f"# pass {pend[0]}: emit-result wait "
                  f"{time.time()-tw:.2f}s  emit-thread t_trace "
                  f"{pst.get('t_trace')}  split "
                  f"{ {k2: v for k2, v in pst.items() if k2.startswith('t_trace_')} }",
                  flush=True)
        print(f"# pass {k}: device wall {td:.2f}s "
              f"(seed {state['stats'].get('t_seed')}, "
              f"extend {state['stats'].get('t_extend')})", flush=True)
        pend = (k, ex.submit(ov.overlap_pair_emit, state, True))
    tw = time.time()
    la, lb, pst = pend[1].result()
    print(f"# pass {pend[0]}: emit-result wait {time.time()-tw:.2f}s "
          f"emit t_trace {pst.get('t_trace')}", flush=True)
    w = time.time() - t_sweep
    print(f"# pipelined x{R}: {w:.2f}s total, {w/R:.2f}s/pass",
          flush=True)
    ex.shutdown(wait=False)


if __name__ == "__main__":
    main()
