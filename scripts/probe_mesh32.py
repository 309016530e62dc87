"""32-block virtual-mesh sweep: host-glue share of wall (VERDICT r3
item 6 'done' criterion: host glue < 10% of wall at 32 blocks).

Runs the full distributed sweep (extend ring sweeps + columnar host
dedupe + trace ring sweeps + host validate/emit) over 32 small blocks
on an 8-device virtual CPU mesh and reports the wall split between
mesh programs (device) and the host glue (dedupe, tensor assembly,
validation, .las encode).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/probe_mesh32.py [--blocks 32]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from damar_tpu.core.blocks import block_from_reads  # noqa: E402
from damar_tpu.core.config import OverlapConfig  # noqa: E402
from damar_tpu.parallel import distributed as D  # noqa: E402
from damar_tpu.utils.sim import make_genome, sample_reads  # noqa: E402


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


NB = _arg("--blocks", 32)
# per-block sizing: the instrument measures HOST GLUE (dedupe, tensor
# assembly, validation, encode — scales with pairs and records), not
# mesh exec (pure-JAX bp kernels are ~100x slower on the virtual CPU
# mesh than on chip, so big blocks just drown the measurement in
# emulation time — r4's 27-min-before-round-0).  --full restores the
# r3 sizes.
FULL = "--full" in sys.argv
g = make_genome((60_000 if FULL else 16_000) * NB // 4, seed=11)
sim = sample_reads(g, coverage=6.0 if FULL else 5.0,
                   mean_len=3000 if FULL else 1500, err=0.12, seed=12)
order = np.argsort([len(r) for r in sim.reads])
per = len(sim.reads) // NB
cap = max(len(r) for r in sim.reads) * per + 64
blocks = []
for b in range(NB):
    rs = [sim.reads[i] for i in
          sorted(order[b * per:(b + 1) * per])]
    blocks.append(block_from_reads(rs, cap=cap))
cfg = OverlapConfig(min_len=400)
print(f"# {NB} blocks, {sum(b.nreads for b in blocks)} reads, "
      f"{sum(int(b.starts[-1]) for b in blocks)} bp, "
      f"{len(jax.devices())} devices", file=sys.stderr)

for rnd in range(2):                     # round 2 = compile-warm
    tm: dict = {}
    t0 = time.time()
    las_list, counts, total = D.distributed_overlap_las(
        blocks, cfg, seed_cap=1 << 15, hit_cap=1 << 20, timings=tm)
    wall = time.time() - t0
    t_mesh = tm.get("mesh", 0.0)
    glue = wall - t_mesh
    novl = sum(l.novl for l in las_list)
    print(f"# round {rnd}: wall {wall:.1f}s, mesh programs "
          f"{t_mesh:.1f}s, host glue {glue:.1f}s "
          f"({glue / wall * 100:.1f}%), {novl} records",
          file=sys.stderr)
print(f"# host glue share (warm): {glue / wall * 100:.1f}% "
      f"({'PASS' if glue / wall < 0.10 else 'MISS'} <10% bar)",
      file=sys.stderr)
