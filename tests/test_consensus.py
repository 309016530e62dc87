"""Consensus/polishing tests (L7): contig polishing must cut the error
rate several-fold; read correction likewise."""
import numpy as np
import pytest

from damar_tpu.pipeline.consensus import (banded_align_path,
                                          consensus_window,
                                          polish_contig)
from damar_tpu.utils.sim import mutate


def lev(a, b):
    prev = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = np.empty(len(b) + 1, int)
        cur[0] = i
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[-1]


class TestAlignPath:
    def test_perfect(self, rng):
        a = rng.integers(0, 4, 150).astype(np.uint8)
        p = banded_align_path(a, a)
        assert len(p) == 150 and all(op == 0 for op, _, _ in p)

    def test_path_cost_reasonable(self, rng):
        a = rng.integers(0, 4, 300).astype(np.uint8)
        b = mutate(a, 0.15, rng)
        p = banded_align_path(a, b, semiglobal=False)
        cost = sum(1 for op, i, j in p if op != 0 or a[i] != b[j])
        assert cost <= lev(a, b) + 5  # banded within slack of exact
        # path must consume both sequences fully
        assert sum(1 for op, _, _ in p if op in (0, 1)) == len(a)
        assert sum(1 for op, _, _ in p if op in (0, 2)) == len(b)


class TestConsensus:
    def test_majority_recovers_truth(self, rng):
        truth = rng.integers(0, 4, 400).astype(np.uint8)
        template = mutate(truth, 0.14, rng)
        covers = [mutate(truth, 0.14, rng) for _ in range(12)]
        cons = consensus_window(template, covers, band=96)
        e_before = lev(template, truth)
        e_after = lev(cons, truth)
        assert e_after < e_before * 0.5, (e_before, e_after)

    def test_low_coverage_keeps_template(self, rng):
        t = rng.integers(0, 4, 100).astype(np.uint8)
        out = consensus_window(t, [], band=32)
        np.testing.assert_array_equal(out, t)


class TestPolishContig:
    def test_polishing_improves_identity(self, rng):
        """Contig built exactly the way tour_to_seq builds it (read
        pieces concatenated at overlap cuts, layout in exact contig
        coordinates); polishing with the tiling reads must cut the
        error substantially."""
        truth = rng.integers(0, 4, 6000).astype(np.uint8)
        reads = {}
        tstarts = list(range(0, 5000, 350))
        for k, start in enumerate(tstarts):
            reads[k] = mutate(truth[start:start + 2000], 0.12, rng)

        def seq_of(i, d):
            return reads[i]

        # contig from every 4th read (like a tour through dovetails):
        # append the part of each read past the previous read's end
        tour_reads = list(range(0, len(tstarts), 4))  # stride 1400bp
        layout = [(tour_reads[0], 0, 0)]
        parts = [reads[tour_reads[0]]]
        clen = len(reads[tour_reads[0]])
        for k in tour_reads[1:]:
            # true overlap = prev read end - this read start in truth
            olap_truth = (tstarts[layout[-1][0]] + 2000) - tstarts[k]
            cut = olap_truth  # approx cut in read coords (indels drift)
            start = clen - cut
            layout.append((k, 0, start))
            parts.append(reads[k][cut:])
            clen = start + len(reads[k])
        contig = np.concatenate(parts)
        # full coverage: place the remaining reads at their implied
        # contig positions (what consensus.full_layout does from .las
        # records in the real pipeline)
        tour_pos = {k: p for k, _, p in layout}
        for k, tstart in enumerate(tstarts):
            if k in tour_pos:
                continue
            anchor = max(t for t in tour_reads if tstarts[t] <= tstart)
            layout.append((k, 0,
                           tour_pos[anchor] + tstart - tstarts[anchor]))
        polished = polish_contig(contig, layout, seq_of, window=400,
                                 margin=150, band=160)
        e_before = lev(contig[:4000], truth[:4000])
        e_after = lev(polished[:4000], truth[:4000])
        assert e_after < e_before * 0.75, (e_before, e_after)


class TestPolishRounds:
    def test_two_rounds_reach_high_identity(self, rng):
        """polish_rounds on an erroneous draft with exact-position
        12x covers must reach >=97% identity (regression guard for
        the chained-anchor + plurality-insertion consensus)."""
        from damar_tpu.pipeline.consensus import polish_rounds
        from damar_tpu.utils.sim import make_genome, mutate
        g = make_genome(3000, seed=11)
        r = np.random.default_rng(11)
        draft = mutate(g, 0.13, r)
        seqs, layout = {}, []
        rid = 0
        for start in range(0, 2200, 70):
            seqs[rid] = mutate(g[start:start + 800], 0.13, r)
            layout.append((rid, 0, start))
            rid += 1
        pol = polish_rounds(draft, layout, lambda i, d: seqs[i])
        span = 2200
        e_before = lev(draft[:span], g[:span])
        e_after = lev(pol[:span], g[:span])
        # prefix-lev is pessimistic at the cut boundary; the guard is
        # the RATIO: 13% draft error must drop to well under half
        assert e_after < span * 0.05, (e_before, e_after)
        assert e_after < e_before * 0.4, (e_before, e_after)


class TestPolishRead:
    def test_read_correction_from_pile(self, rng):
        """polish_read (corrector equivalent): a raw read's pile must
        consensus-correct it well below its input error."""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from damar_tpu.core.blocks import block_from_reads
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.formats.fasta import revcomp
        from damar_tpu.formats.las import LasFile
        from damar_tpu.pipeline.consensus import polish_read
        from damar_tpu.pipeline.overlap import overlap_block_pair
        from damar_tpu.utils.sim import make_genome, sample_reads
        g = make_genome(20_000, seed=51)
        sim = sample_reads(g, coverage=12, mean_len=3000, err=0.12,
                           seed=52, min_len=1500)
        blk = block_from_reads(sim.reads)
        cfg = OverlapConfig(min_len=800)
        la, lb, _ = overlap_block_pair(blk, blk, cfg, self_block=True,
                                       hit_cap=1 << 20, seed_cap=1 << 15)
        las = LasFile.concat([la, lb])
        las.sort()

        def seqs_of(i, comp):
            return revcomp(sim.reads[i]) if comp else sim.reads[i]

        # pick a read with decent pile coverage
        from collections import Counter
        cnt = Counter(int(a) for a in
                      las.columns.headers[:, 7])
        aread = max(cnt, key=cnt.get)
        rl = len(sim.reads[aread])
        fixed = polish_read(aread, las, seqs_of, rl)
        gg = np.concatenate([g, g])      # circular sampling can wrap
        truth = gg[sim.start[aread]:sim.end[aread]]
        if sim.strand[aread]:
            truth = revcomp(truth)
        e_raw = lev(sim.reads[aread][:2000], truth[:2000])
        e_fix = lev(fixed[:2000], truth[:2000])
        assert e_fix < e_raw * 0.6, (e_raw, e_fix)


class TestConsensusTwins:
    def test_vote_ops_multi_matches_sequential(self, rng):
        """_vote_ops_multi's batched pass must produce the same votes
        AND the same ins-dict insertion order as registering each
        cover separately (tie-breaking is order-visible)."""
        from damar_tpu.pipeline.consensus import (_new_votes,
                                                  _vote_ops_multi)
        m = 260                  # >= any cover's template consumption
        items = []
        for _ in range(20):
            nops = int(rng.integers(0, 200))
            ops = rng.choice([0, 0, 0, 1, 2], nops).astype(np.uint8)
            c = rng.integers(0, 4, 400).astype(np.uint8)
            j0 = int(rng.integers(0, 50))
            items.append((ops, j0, c))
        v1, iv1 = _new_votes(m)
        _vote_ops_multi(v1, iv1, items)
        v2, iv2 = _new_votes(m)
        for it in items:
            _vote_ops_multi(v2, iv2, [it])
        np.testing.assert_array_equal(v1, v2)
        for d1, d2 in zip(iv1, iv2):
            assert list(d1.items()) == list(d2.items())

    def test_full_layout_columnar_matches_object(self, small_sim):
        """full_layout's columnar pre-filter branch must place the
        same reads at the same positions as the per-record walk."""
        from damar_tpu.core.blocks import block_from_reads
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.formats.fasta import revcomp
        from damar_tpu.formats.las import LasFile
        from damar_tpu.pipeline.consensus import full_layout
        from damar_tpu.pipeline.overlap import overlap_block_pair
        from damar_tpu.pipeline.touring import assemble, tour_layout
        sim = small_sim
        blk = block_from_reads(sim.reads)
        la, lb, _ = overlap_block_pair(
            blk, blk, OverlapConfig(min_len=900), self_block=True,
            hit_cap=1 << 20, seed_cap=1 << 15)
        both = LasFile.concat([la, lb])
        both.sort()
        rlen = {i: len(r) for i, r in enumerate(sim.reads)}

        def seq_of(i, d):
            return revcomp(sim.reads[i]) if d else sim.reads[i]

        _, tours, _ = assemble(both, rlen, seq_of, min_dovetail=900)
        assert tours
        lay = tour_layout(tours[0], seq_of)
        l1 = full_layout(lay, both, rlen)                  # columnar
        obj = LasFile(both.tspace, overlaps=list(both.overlaps))
        l2 = full_layout(lay, obj, rlen)
        assert sorted(l1) == sorted(l2) and len(l1) > len(lay)


class TestPartialWindowCovers:
    """Round-3: reads starting or ending mid-window vote the partial
    template span they cover (offset votes) instead of being dropped
    until / after their full windows."""

    def test_mid_window_start_votes(self, rng):
        truth = rng.integers(0, 4, 1000).astype(np.uint8)
        # template: corrupt ONLY the second half of window 0
        # (positions 250..500) so fixing it requires votes there
        contig = truth.copy()
        contig[300:480] = mutate(truth[300:480], 0.30, rng,
                         ins_frac=0.0, del_frac=0.0)
        # covers: three reads starting INSIDE window 0 at 250 (would
        # enter at window 1 under ceil-entry and never vote w0), plus
        # one spanning read so windows have >= min_cov
        reads = {0: truth[250:1000].copy(),
                 1: truth[250:1000].copy(),
                 2: truth[250:1000].copy(),
                 3: truth[0:1000].copy()}
        layout = [(3, 0, 0), (0, 0, 250), (1, 0, 250), (2, 0, 250)]
        polished = polish_contig(contig, layout,
                                 lambda i, d: reads[i],
                                 window=500, margin=80, band=96)
        e_before = lev(contig[250:500], truth[250:500])
        e_after = lev(polished[250:500], truth[250:500])
        assert e_after <= e_before // 4, (e_before, e_after)

    def test_mid_window_end_votes(self, rng):
        truth = rng.integers(0, 4, 1000).astype(np.uint8)
        contig = truth.copy()
        contig[520:680] = mutate(truth[520:680], 0.30, rng,
                         ins_frac=0.0, del_frac=0.0)
        # covers end at 700 (mid window 1): their tails must vote
        # window 1's prefix
        reads = {0: truth[0:700].copy(), 1: truth[0:700].copy(),
                 2: truth[0:700].copy(), 3: truth[0:1000].copy()}
        layout = [(3, 0, 0), (0, 0, 0), (1, 0, 0), (2, 0, 0)]
        polished = polish_contig(contig, layout,
                                 lambda i, d: reads[i],
                                 window=500, margin=80, band=96)
        e_before = lev(contig[500:680], truth[500:680])
        e_after = lev(polished[500:680], truth[500:680])
        assert e_after <= e_before // 4, (e_before, e_after)
