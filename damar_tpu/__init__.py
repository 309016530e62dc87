"""damar_tpu — a TPU-native long-read overlapper and assembly engine.

A from-scratch rebuild of the capabilities of MartinPippel/DAmar
(Dazzler/MARVEL lineage): block-split 2-bit read databases, k-mer
seed + sort-merge hit detection, trace-point local alignment,
tandem/repeat masking, read scrubbing (patch/trim/split), overlap
filtering, and string-graph touring to contigs — with the alignment
compute path implemented as batched JAX/Pallas kernels over
HBM-resident read blocks, and scale-out via jax.sharding meshes.

Layer map (mirrors SURVEY.md §1):
  formats/   — byte-level .db/.idx/.bps, .las, .anno/.data track codecs (L0)
  core/      — typed phase configs, device block layout (L0)
  ops/       — JAX/Pallas compute kernels: k-mer seeding, banded DP waves,
               trace-point alignment (L2 core)
  pipeline/  — tool-level drivers: ingest, overlap, las ops, masking,
               scrubbing, graph, touring, planning (L1-L8)
  parallel/  — mesh construction, block sharding, ring rotation (L8)
  utils/     — read simulator, DUST, small helpers
"""

__version__ = "0.1.0"
