"""200 Mbp block self-overlap ON CHIP — the reference's actual block
unit (SURVEY §0; DBsplit defaults to 200 MB).  Round-2/3 only ever ran
this on the CPU path (13-19 min, ~55 GB RSS); this probe runs the
device path: single pass + a pipelined x3 steady state, with phase
walls and host RSS.

Usage: python scripts/probe_200m.py [--genome N] [--passes N]
"""
from __future__ import annotations

import os
import resource
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
from damar_tpu.utils.sim import make_genome, sample_reads


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


GENOME = _arg("--genome", 10_000_000)
PASSES = _arg("--passes", 3)

t0 = time.time()
g = make_genome(GENOME, seed=2024)
sim = sample_reads(g, coverage=20.0, mean_len=6_000, err=0.14,
                   seed=2025)
blk = block_from_reads(sim.reads)
total_bp = sum(len(r) for r in sim.reads)
print(f"# {len(sim.reads)} reads, {total_bp} bp ({total_bp/1e6:.0f} "
      f"Mbp), block cap {blk.cap}, setup {time.time()-t0:.1f}s",
      file=sys.stderr, flush=True)
cfg = OverlapConfig()
hints: dict = {}
kw = dict(hit_cap=1 << 28, seed_cap=1 << 23, emit_mirrors=False,
          size_hints=hints)

t0 = time.time()
la, lb, st = ov.overlap_block_pair(blk, blk, cfg, self_block=True, **kw)
print(f"# warmup(+compile+upload): {time.time()-t0:.1f}s",
      file=sys.stderr, flush=True)
t0 = time.time()
la, lb, st = ov.overlap_block_pair(blk, blk, cfg, self_block=True, **kw)
wall = time.time() - t0
al = int(la.a_spans().sum())
print(f"# single pass: {wall:.2f}s, {la.novl} overlaps, {al} aligned "
      f"bp = {al/wall/1e9:.4f} Gbp/s, stats {st}", file=sys.stderr,
      flush=True)

from damar_tpu.formats.las import check_las
errs = check_las(la, blk.rlen)
print(f"# check_las: {'CLEAN' if not errs else errs[:3]}",
      file=sys.stderr, flush=True)

jobs = [dict(tag=k, blk_a=blk, blk_b=blk, self_block=True, **kw)
        for k in range(PASSES)]
t0 = time.time()
outs = list(ov.overlap_pairs_pipelined(jobs, cfg))
pwall = time.time() - t0
pal = sum(int(a.a_spans().sum()) for _, a, _, _ in outs)
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"# pipelined x{PASSES}: {pwall:.2f}s ({pwall/PASSES:.2f}s/pass)"
      f" = {pal/pwall/1e9:.4f} Gbp/s; host RSS {rss:.1f} GB",
      file=sys.stderr, flush=True)
