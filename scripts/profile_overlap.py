"""Per-phase wall profile of the overlap driver on the live backend.

Runs the same workload as bench.py but times each phase separately
(seeding / anchor dedupe / extension / extent dedupe / trace+emit).
Safe on the tunneled TPU: pure in-process timing, no process kills.
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

from damar_tpu.core.blocks import block_from_reads, revcomp_block
from damar_tpu.core.config import OverlapConfig
from damar_tpu.pipeline import overlap as ov
from damar_tpu.utils.sim import make_genome, sample_reads

GENOME = int(sys.argv[sys.argv.index("--genome") + 1]) \
    if "--genome" in sys.argv else 100_000

g = make_genome(GENOME, seed=2024)
sim = sample_reads(g, coverage=20.0, mean_len=6_000, err=0.14,
                   seed=2025)
blk = block_from_reads(sim.reads)
blk_rc = revcomp_block(blk)


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


cfg = OverlapConfig(seed_batch=_arg("--seed-batch", 1024),
                    bp_chunk=_arg("--bp-chunk", 64))
print(f"# backend={jax.default_backend()} reads={len(sim.reads)} "
      f"bp={sum(len(r) for r in sim.reads)}", file=sys.stderr)

hints: dict = {}


def run_once(label):
    t_all = time.time()
    blk_b_rc = blk_rc
    host = ov._host_compute_enabled()
    t0 = time.time()
    if host:
        from damar_tpu.ops import seeding_host as sh
        a_index = ov._cached_a_index(
            blk, "host3", cfg.kmer, None,
            lambda: sh.canon_index_host(blk, cfg.kmer, None))
        a_bases_d = blk.bases
        def run_seeding(kw):
            return sh.fetch_seeds_host(
                sh.find_seeds_canonical_host(blk, blk, cfg, **kw))
    else:
        from damar_tpu.ops.seeding import (canonical_index_dev,
                                           find_seeds_canonical_dev)
        def _build_dev():
            ab = jnp.asarray(blk.bases)
            rid = jnp.asarray(blk.read_id)
            return ab, rid, canonical_index_dev(ab, rid, blk,
                                                cfg.kmer, None)
        a_bases_d, a_rid_d, a_index = ov._cached_a_index(
            blk, "dev3", cfg.kmer, None, _build_dev)
        def run_seeding(kw):
            kw = dict(kw, dev_arrays=(a_bases_d, a_rid_d,
                                      a_bases_d, a_rid_d))
            return ov.fetch_seeds(find_seeds_canonical_dev(blk, blk, cfg, **kw))
    kw = dict(mask_a=None, mask_b=None, upper_only=True,
              hit_cap=_arg("--hit-cap",
                           1 << 27 if GENOME > 1_000_000 else 1 << 22),
              seed_cap=_arg("--seed-cap",
                            1 << 21 if GENOME > 1_000_000 else 1 << 17),
              a_index=a_index,
              self_pair=True)
    if hints.get("raw"):
        kw["raw_hint"] = (hints["raw"] * 5) // 4
    seeds = run_seeding(kw)
    t_seed = time.time() - t0
    hints["raw"] = seeds["total_hits"]
    if seeds.get("overflow"):
        print(f"# WARNING: seeding buffers saturated "
              f"(hits {seeds['total_hits']}, seeds {seeds['nseeds']}) — "
              "phase times understate real work; raise hit_cap/seed_cap",
              file=sys.stderr)

    t0 = time.time()
    seeds = ov.dedupe_anchor_seeds(seeds)
    t_dd = time.time() - t0

    t0 = time.time()
    by_comp = ov.split_seeds_by_comp(seeds)
    pends = []
    for comp in (False, True):
        bb = blk_b_rc if comp else blk
        pends.append((comp, ov.extend_seeds_launch(
            blk, bb, by_comp[comp], cfg, comp,
            dev_bases=None if host
            else (a_bases_d, ov._dev_arr(bb, "bases")))))
    ext_parts = []
    for comp, pend in pends:
        exts = ov.extend_seeds_harvest(pend)
        exts["comp"] = comp
        ext_parts.append(exts)
    t_ext = time.time() - t0

    t0 = time.time()
    kept_parts = [ov.dedupe_extents(p, cfg.min_len, max_err=1.0 - cfg.err)
                  for p in ext_parts]
    for kp, p in zip(kept_parts, ext_parts):
        kp["comp"] = p["comp"]
    t_dde = time.time() - t0

    t0 = time.time()
    stats = dict(dropped_trace=0)
    las_a, las_b = ov.las_from_extents(
        blk, blk, kept_parts, cfg, emit_mirrors=False, stats=stats,
        a_bases_d=a_bases_d, blk_b_rc=blk_b_rc, blk_a_rc=None)
    t_trace = time.time() - t0
    wall = time.time() - t_all
    aligned = int(las_a.a_spans().sum())
    print(f"{label}: total {wall:.2f}s | seed {t_seed:.2f} dd {t_dd:.2f} "
          f"ext {t_ext:.2f} dde {t_dde:.2f} trace+emit {t_trace:.2f} | "
          f"seeds {seeds['nseeds']} kept {sum(p['n'] for p in kept_parts)} "
          f"aligned {aligned/1e6:.1f} Mbp -> {aligned/wall/1e9:.4f} Gbp/s",
          file=sys.stderr)


run_once("warmup1")
run_once("warmup2")
run_once("run1")
run_once("run2")
