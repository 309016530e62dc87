#!/usr/bin/env python
"""Worked end-to-end example (the MARVEL examples/do.py equivalent,
SURVEY.md §4.2): simulate a small PacBio-like dataset with ground
truth, run the complete pipeline (mask -> overlap -> patch ->
re-overlap -> scrub -> assemble -> polish), and validate the contigs
against the truth genome.

    python examples/do.py [workdir] [--genome-bp 50000] [--coverage 12]

The reference ships an E. coli dataset; this environment has no
network, so the example carries its own simulator-backed dataset —
which also gives it an oracle the reference example lacks: read
positions and the truth genome, letting it REPORT assembly identity
instead of eyeballing contigs.
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

# runnable from any cwd, installed or straight from the checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default=None)
    ap.add_argument("--genome-bp", type=int, default=50_000)
    ap.add_argument("--coverage", type=float, default=12.0)
    ap.add_argument("--err", type=float, default=0.13)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from damar_tpu.formats.fasta import read_fasta
    from damar_tpu.pipeline.run import run_pipeline
    from damar_tpu.utils.sim import (make_genome, sample_reads,
                                     write_sim_fasta)

    w = args.workdir or tempfile.mkdtemp(prefix="damar_example_")
    os.makedirs(w, exist_ok=True)
    print(f"== workdir {w}")
    g = make_genome(args.genome_bp, seed=args.seed)
    sim = sample_reads(g, coverage=args.coverage, mean_len=4000,
                       err=args.err, seed=args.seed + 1)
    fa = os.path.join(w, "reads.fasta")
    write_sim_fasta(fa, sim)
    print(f"== simulated {len(sim.reads)} reads, "
          f"{sum(len(r) for r in sim.reads)} bp at {args.err:.0%} error")

    rep = run_pipeline(fa, w, polish=True, verbose=True)
    names, seqs = read_fasta(rep["contig_fasta"])
    total = sum(len(s) for s in seqs)
    print(f"== contigs: {[(n.split()[0], len(s)) for n, s in zip(names, seqs)]}")

    # identity oracle: exact k-mer hit rate of the longest contig
    # against the truth genome (both strands)
    from damar_tpu.utils.sim import kmer_hit_rate
    best = max(seqs, key=len)
    hit = kmer_hit_rate(g, best)
    print(f"== longest contig {len(best)} bp vs {len(g)} bp genome; "
          f"k16 hit-rate {hit:.3f} (~identity {hit ** (1 / 16):.4f})")
    ok = total > 0.85 * len(g) and hit > 0.6
    print("== PASS" if ok else "== FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
