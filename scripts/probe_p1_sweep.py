"""Survivor counts vs phase-1 depth: sizes the payoff of a mid-depth
compaction rung in the device extension."""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/damar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from damar_tpu.core.blocks import block_from_reads
from damar_tpu.core.config import OverlapConfig
from damar_tpu.pipeline import overlap as ov
from damar_tpu.utils.sim import make_genome, sample_reads

g = make_genome(2_500_000, seed=2024)
sim = sample_reads(g, coverage=20.0, mean_len=6_000, err=0.14, seed=2025)
blk = block_from_reads(sim.reads)

for p1 in (128, 512, 1024, 2048):
    cfg = dataclasses.replace(OverlapConfig(), ext_phase1_rows=p1)
    for r in range(2):                      # run 2 = compile-warm
        t0 = time.time()
        st = ov.overlap_pair_device(blk, blk, cfg, True,
                                    emit_mirrors=False)
        stats = st["stats"]
    print(f"P1={p1} (warm): t_seed {stats.get('t_seed')} t_extend "
          f"{stats.get('t_extend')} extents {stats.get('extents')} "
          f"wall {time.time()-t0:.2f}", file=sys.stderr, flush=True)
