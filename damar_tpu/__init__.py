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

import os as _os


def _enable_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache unless the user already
    configured one.  The alignment kernels compile large loop nests
    (minutes on CPU); caching makes every process after the first start
    instantly.  Opt out with DAMAR_NO_COMPILE_CACHE=1."""
    if _os.environ.get("DAMAR_NO_COMPILE_CACHE"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax
    cache = _os.path.join(
        _os.path.expanduser("~"), ".cache", "damar_tpu", "jax_cache")
    _os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compilation_cache()
