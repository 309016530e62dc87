"""Fine-grained ON-CHIP wall profile of the seeding sub-phases at the
bench's large config (50 Mbp reads, exact-sized hit buffer).

Times each jitted stage by fetching a real output element (the axon
tunnel does not honor block_until_ready), so numbers are true
end-to-end device walls including the compile-free steady state.

Usage: python scripts/probe_seed_phases.py [--genome N] [--runs N]
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
from damar_tpu.utils.sim import make_genome, sample_reads
from damar_tpu.ops.seeding import (
    build_index_canonical_packed, packed_payload_host, match_count_self,
    match_fill_packed, diagonal_filter_packed, seeds_to_block_coords,
    quantize_bits, _pow2_cap)


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


GENOME = _arg("--genome", 2_500_000)
RUNS = _arg("--runs", 2)

g = make_genome(GENOME, seed=2024)
sim = sample_reads(g, coverage=20.0, mean_len=6_000, err=0.14, seed=2025)
blk = block_from_reads(sim.reads)
cfg = OverlapConfig()
print(f"# backend={jax.default_backend()} reads={len(sim.reads)} "
      f"bp={sum(len(r) for r in sim.reads)} cap={blk.cap}",
      file=sys.stderr)

mp_base, rid_bits, rpos_bits = packed_payload_host(blk)
bases_d = jnp.asarray(blk.bases)
rid_d = jnp.asarray(blk.read_id)
mp_d = jnp.asarray(mp_base)
np.asarray(bases_d[:1])  # force uploads


def sync(x):
    return np.asarray(x if x.ndim == 0 else x[-1:])


def timed(label, fn, *a, **k):
    t0 = time.time()
    out = fn(*a, **k)
    leaf = jax.tree_util.tree_leaves(out)[0]
    sync(leaf)
    dt = time.time() - t0
    print(f"  {label:<28s} {dt:7.3f}s", file=sys.stderr)
    return out


for it in range(RUNS):
    print(f"run {it} {'(incl. compile)' if it == 0 else ''}:",
          file=sys.stderr)
    t_all = time.time()
    idx = timed("index build (sort kmers)", build_index_canonical_packed,
                bases_d, rid_d, mp_d, cfg.kmer)
    ac, amp = idx
    cnt = timed("match_count_self", match_count_self, ac, k=cfg.kmer,
                max_count=cfg.max_kmer_count or 128)
    lo, c, cum, _total = cnt
    total = int(np.asarray(_total))
    cap = _pow2_cap(min(total, 1 << 27), 1 << 27)
    print(f"  total hits {total}, cap {cap}", file=sys.stderr)
    fill = timed("match_fill_packed", match_fill_packed, amp, amp, lo,
                 c, cum, hit_cap=cap)
    ap_mp, bp_mp, nhits, total_hits, _n_emit = fill
    flt = timed("diagonal_filter_packed", diagonal_filter_packed,
                ap_mp, bp_mp, nhits,
                a_rid_bits=rid_bits, a_rpos_bits=rpos_bits,
                b_rid_bits=rid_bits, b_rpos_bits=rpos_bits,
                read_bits=quantize_bits(blk.nreads + 1),
                band_shift=cfg.band_shift, hit_min=cfg.hit_min,
                kmer=cfg.kmer, seed_cap=1 << 21, upper_only=True,
                include_self=False)
    ar, br, arp, brp, score, scomp, nseeds, total_seeds = flt
    st = jnp.asarray(blk.starts.astype(np.int32))
    sb = timed("seeds_to_block_coords", seeds_to_block_coords, ar, br,
               arp, brp, scomp, st, st, cfg.kmer)
    t0 = time.time()
    n = int(np.asarray(nseeds))
    cols = np.asarray(jnp.stack([ar[:n], br[:n], sb[0][:n], sb[1][:n],
                                 score[:n], scomp[:n]]))
    print(f"  fetch ({n} seeds)           {time.time()-t0:7.3f}s",
          file=sys.stderr)
    print(f"  TOTAL                       {time.time()-t_all:7.3f}s",
          file=sys.stderr)
