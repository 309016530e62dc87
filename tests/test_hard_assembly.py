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


class TestSharedJunctionChimeras:
    """LAgap's raison d'etre: chimeras sharing one junction cover each
    other's junction segment, so LAfix's uncovered-gap split keeps
    them intact — only pile-break detection (gap_breaks -> gap_trim ->
    clip) can stop them fusing unrelated sequence."""

    def test_chimeras_do_not_fuse_genomes(self, tmp_path):
        from damar_tpu.formats.fasta import read_fasta, write_fasta
        from damar_tpu.pipeline.run import run_pipeline
        from damar_tpu.utils.sim import make_genome, mutate, sample_reads

        g1 = make_genome(40_000, seed=51)
        g2 = make_genome(40_000, seed=52)
        s1 = sample_reads(g1, coverage=12, mean_len=4000, err=0.12,
                          seed=53, circular=False)
        s2 = sample_reads(g2, coverage=12, mean_len=4000, err=0.12,
                          seed=54, circular=False)
        rng = np.random.default_rng(55)
        reads = list(s1.reads) + list(s2.reads)
        # two BRIDGE chimeras with the SAME junction (g1 end -> g2
        # start, the missed-adapter artifact): they dovetail cleanly
        # into both genomes' end piles, so without a pile-break the
        # tour walks straight through and fuses the genomes
        for off_l, off_r in ((4000, 4000), (5000, 3000)):
            left = mutate(g1[40_000 - off_l:], 0.12, rng)
            right = mutate(g2[:off_r], 0.12, rng)
            reads.append(np.concatenate([left, right]))
        fa = os.path.join(str(tmp_path), "reads.fasta")
        write_fasta(fa, [f"read/{i}/0_{len(r)}"
                         for i, r in enumerate(reads)], reads)
        rep = run_pipeline(fa, str(tmp_path), polish=True, verbose=False)
        _, contigs = read_fasta(rep["contig_fasta"])
        assert len(contigs) >= 2, "genomes fused into one contig"

        def kmer_set(g):
            s = set()
            b = bytes(g.astype(np.uint8))
            rb = bytes((g[::-1] ^ 3).astype(np.uint8))
            for src in (b, rb):
                for p in range(0, len(src) - 16):
                    s.add(src[p:p + 16])
            return s

        k1, k2 = kmer_set(g1), kmer_set(g2)
        saw = {1: False, 2: False}
        for c in contigs:
            cb = bytes(c.astype(np.uint8))
            kms = [cb[p:p + 16] for p in range(0, len(cb) - 16, 7)]
            h1 = sum(1 for x in kms if x in k1)
            h2 = sum(1 for x in kms if x in k2)
            tot = max(h1 + h2, 1)
            assert min(h1, h2) / tot < 0.05, \
                f"mixed contig: {h1} g1-kmers vs {h2} g2-kmers"
            if h1 > h2:
                saw[1] = True
            else:
                saw[2] = True
        assert saw[1] and saw[2], "one genome missing from contigs"
