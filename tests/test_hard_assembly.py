"""Hard-mode full-pipeline assembly: repeats + tandem + chimeras.

The plain worked example (examples/do.py) assembles a uniform random
genome, where the masking tracks stay empty and LAgap never fires.
This test runs the complete pipeline (mask -> overlap -> patch ->
re-overlap -> scrub -> assemble) on a genome with planted exact
repeats and a tandem array, plus chimeric reads — the inputs the
DAMASKER/scrubber layers (SURVEY.md §2.5-2.6) exist for — and checks
contig identity against the truth genome.
"""
import os

import numpy as np
import pytest


class TestHardAssembly:
    @pytest.fixture(scope="class")
    def report(self, tmp_path_factory):
        from damar_tpu.pipeline.run import run_pipeline
        from damar_tpu.utils.sim import (make_genome, sample_reads,
                                         write_sim_fasta)
        w = str(tmp_path_factory.mktemp("hard"))
        g = make_genome(60_000, seed=41, n_repeats=3, repeat_len=1500,
                        tandem=1, tandem_period=90, tandem_len=1800)
        sim = sample_reads(g, coverage=14, mean_len=4500, err=0.13,
                           seed=42, chimera_frac=0.06)
        fa = os.path.join(w, "reads.fasta")
        write_sim_fasta(fa, sim)
        rep = run_pipeline(fa, w, polish=True, verbose=False)
        rep["_genome"] = g
        rep["_sim"] = sim
        return rep

    def test_masking_found_planted_features(self, report):
        """The tandem array must produce a non-empty tan track."""
        ph = report["phases"]
        assert ph["mask"]["tan_bp"] > 500, ph["mask"]

    def test_contigs_cover_genome(self, report):
        from damar_tpu.formats.fasta import read_fasta
        g = report["_genome"]
        names, seqs = read_fasta(report["contig_fasta"])
        assert seqs, "no contigs"
        total = sum(len(s) for s in seqs)
        assert total > 0.85 * len(g), \
            f"contigs {total} bp vs genome {len(g)} bp"

    def test_contig_identity(self, report):
        """Exact k-mer hit rate of the longest contig vs the truth
        genome (both strands) — the do.py oracle."""
        from damar_tpu.formats.fasta import read_fasta
        from damar_tpu.utils.sim import kmer_hit_rate
        g = report["_genome"]
        _, seqs = read_fasta(report["contig_fasta"])
        hit = kmer_hit_rate(g, max(seqs, key=len))
        # ~identity = hit ** (1/k); 0.45 hit-rate ~ 95% identity
        assert hit > 0.45, f"k-mer hit rate {hit:.3f}"

    def test_contig_count_not_fragmented(self, report):
        """Chimeric junctions must not shatter the assembly: the
        patch/scrub layers (LAfix gap splitting, LAgap, LAfilter)
        should leave a handful of contigs, not one per chimera."""
        sim = report["_sim"]
        n_chim = int(sim.chimeric.sum())
        assert n_chim >= 3, "fixture produced too few chimeras to test"
        n_contigs = report["phases"]["assemble"]["contigs"]
        assert n_contigs <= max(4, n_chim // 2), \
            f"{n_contigs} contigs from {n_chim} chimeras"


class TestMultiblockPipeline:
    def test_two_block_assembly(self, tmp_path):
        """run_pipeline across a SPLIT DB (multiple blocks -> block
        pair matrix -> per-block rounds -> merge): the single-block
        path cannot catch block-boundary bugs in the job matrix,
        merge gating, or the FIX-round columnar merge."""
        import os
        from damar_tpu.core.config import PipelineConfig
        from damar_tpu.formats.fasta import read_fasta
        from damar_tpu.pipeline.run import run_pipeline
        from damar_tpu.utils.sim import (make_genome, sample_reads,
                                         write_sim_fasta)
        w = str(tmp_path)
        g = make_genome(120_000, seed=51)
        sim = sample_reads(g, coverage=12, mean_len=4500, err=0.13,
                           seed=52)
        fa = os.path.join(w, "reads.fasta")
        write_sim_fasta(fa, sim)
        rep = run_pipeline(fa, w, cfg=PipelineConfig(block_mb=1),
                           polish=False, verbose=False)
        assert rep["phases"]["overlap1"]["pairs"] >= 3, \
            "DB did not split into multiple blocks"
        _, seqs = read_fasta(rep["contig_fasta"])
        total = sum(len(s) for s in seqs)
        assert total > 0.85 * len(g), f"{total} vs {len(g)}"
