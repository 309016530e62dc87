"""ON-CHIP wall profile of the two-phase extension at the bench's
large config: phase-1 shallow launches, the active-mask fetch, phase-2
full-depth launches, and the final harvest transfer, plus launch/batch
statistics.  Times are tiny-fetch synced (the axon tunnel does not
honor block_until_ready).

Usage: python scripts/probe_extend_phases.py [--genome N] [--runs N] [--cpu]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
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


GENOME = _arg("--genome", 2_500_000)
RUNS = _arg("--runs", 2)

g = make_genome(GENOME, seed=2024)
sim = sample_reads(g, coverage=20.0, mean_len=6_000, err=0.14,
                   seed=2025)
blk = block_from_reads(sim.reads)
cfg = OverlapConfig()
_bpc = _arg("--bp-chunk", 0)
if _bpc:
    cfg = __import__("dataclasses").replace(cfg, bp_chunk=_bpc)
print(f"# backend={jax.default_backend()} reads={len(sim.reads)} "
      f"bp={sum(len(r) for r in sim.reads)}", file=sys.stderr)

hit_cap = 1 << 27 if GENOME > 1_000_000 else 1 << 25
seed_cap = 1 << 21 if GENOME > 1_000_000 else 1 << 19
hints: dict = {}
state = ov.overlap_pair_device(blk, blk, cfg, self_block=True,
                               hit_cap=hit_cap, seed_cap=seed_cap,
                               emit_mirrors=False, size_hints=hints)
print("# warmed up driver once", file=sys.stderr)


def sync_stacked(stacked):
    np.asarray(stacked[0, -1:])


for it in range(RUNS):
    print(f"run {it}:", file=sys.stderr)
    # re-run seeding to get fresh seeds (device-resident caches warm)
    from damar_tpu.ops.seeding import find_seeds_canonical_dev
    from damar_tpu.pipeline.overlap import (fetch_seeds,
                                            dedupe_anchor_seeds,
                                            split_seeds_by_comp,
                                            _rc_cached, _dev_arr)
    t0 = time.time()
    a_bases_d = _dev_arr(blk, "bases")
    a_rid_d = _dev_arr(blk, "read_id")
    from damar_tpu.ops.seeding import canonical_index_dev
    tag_idx = ov._cached_a_index(
        blk, "dev3", cfg.kmer, None,
        lambda: (a_bases_d, a_rid_d,
                 canonical_index_dev(a_bases_d, a_rid_d, blk,
                                     cfg.kmer, None)))
    a_bases_d, a_rid_d, a_index = tag_idx
    seeds = fetch_seeds(find_seeds_canonical_dev(
        blk, blk, cfg, upper_only=True, hit_cap=hit_cap,
        seed_cap=seed_cap, a_index=a_index, self_pair=True,
        dev_arrays=(a_bases_d, a_rid_d, a_bases_d, a_rid_d)))
    seeds = dedupe_anchor_seeds(seeds)
    print(f"  seeding+fetch               {time.time()-t0:7.3f}s "
          f"({seeds['nseeds']} seeds)", file=sys.stderr)
    by_comp = split_seeds_by_comp(seeds)
    blk_rc = _rc_cached(blk)
    for comp in (False, True):
        bb = blk_rc if comp else blk
        t0 = time.time()
        pend = ov.extend_seeds_launch(
            blk, bb, by_comp[comp], cfg, comp,
            dev_bases=(a_bases_d, _dev_arr(bb, "bases")))
        if pend is None:
            continue
        nb1 = len(pend["batches"])
        sync_stacked(pend["stacked"])
        t1 = time.time()
        print(f"  [comp={comp}] phase1 {nb1} launches "
              f"{t1-t0:7.3f}s ({pend['n']*2} units)", file=sys.stderr)
        ov.extend_seeds_dispatch_p2(pend)
        t2 = time.time()
        nsurv = len(pend["p2"]["order"]) if pend.get("p2") else 0
        nb2 = len(pend["p2"]["batches"]) if pend.get("p2") else 0
        print(f"  [comp={comp}] mask-fetch+p2-dispatch "
              f"{t2-t1:7.3f}s ({nsurv} survivors, {nb2} launches)",
              file=sys.stderr)
        if pend.get("p2"):
            sync_stacked(pend["p2"]["stacked"])
        t3 = time.time()
        print(f"  [comp={comp}] phase2 wait    {t3-t2:7.3f}s",
              file=sys.stderr)
        exts = ov.extend_seeds_harvest(pend)
        print(f"  [comp={comp}] harvest        {time.time()-t3:7.3f}s "
              f"({exts['n']} extents)", file=sys.stderr)
